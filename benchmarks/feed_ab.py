"""A/B: the uint8 device feed vs the legacy f32 host-normalize feed.

Round-4 finding: on real folder data the steady-state epoch rate was
transfer-bound, not decode-bound — the tunneled host→device link delivers
~94 MB/s with a fixed ~37 ms per-dispatch latency (probe numbers in
DataLoader._device_norm_split), so shipping each 256-image batch as
float32 (12.6 MB, ~171 ms) caps the feed at ~1,500 img/s against a
~5,200 img/s step. The u8 fast path ships 3.1 MB per batch and
normalizes on device; ``DMT_TRANSFER_CHUNK`` stacks k batches per copy to
amortize the dispatch latency.

Method: one process, fully pre-warmed decode cache (isolates the feed
path — epoch-1 decode economics are benchmarks/decode_warm_ab.py's
subject), the real full-width β-VAE-GAN jitted step consuming the
batches. Modes alternate per window (README_PERF: only in-process
interleaved A/Bs are valid on the drifting tunneled chip):

    f32      — DMT_DEVICE_NORMALIZE=0 (the round-3 path)
    u8c1     — uint8 feed, one batch per transfer
    u8c4     — uint8 feed, four batches per transfer (production default)
    u8c8     — uint8 feed, eight batches per transfer (is the latency
               amortization still paying past the default?)

    python -m benchmarks.feed_ab --image_root /tmp/ab_imgs/train \
        --out FEED_AB_r4.json
"""

from __future__ import annotations

import argparse
import json
import os
import time


def run_epoch(loader, states, jit_step, sync_key, rng_key):
    """One epoch of real feed → step; returns (img/s, states)."""
    import jax

    n = 0
    metrics = None
    t0 = time.perf_counter()
    for i, (x, _) in enumerate(loader):
        *states, metrics = jit_step(*states, x,
                                    jax.random.fold_in(rng_key, i))
        n += x.shape[0]
    float(metrics[sync_key])  # the reliable axon dispatch barrier
    wall = time.perf_counter() - t0
    return n / wall, states


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--image_root", default="/tmp/ab_imgs/train")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--repeats", type=int, default=3,
                    help="windows per mode (interleaved)")
    ap.add_argument("--out", default="FEED_AB_r4.json")
    ns = ap.parse_args(argv)

    # host-idleness guard (VERDICT r4 #7): on this 1-CPU host a
    # concurrent heavy process invalidates interleaved A/Bs (ROUND4.md);
    # DMT_LOAD_LIMIT overrides the threshold if a stamped-but-contested
    # run is explicitly wanted.
    from benchmarks.hostcheck import host_idle_check
    idle = host_idle_check(refuse=True)

    from disentangle_mlp_tpu.utils.runtime import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import numpy as np

    from benchmarks.op_profile import make_profile_harness
    from disentangle_mlp_tpu.data.pipeline import DataLoader, ImageFolderSource

    states, step_fn, _, sync_key = make_profile_harness("betavaegan")
    jit_step = jax.jit(step_fn, donate_argnums=tuple(range(len(states))))

    src = ImageFolderSource(ns.image_root, img_size=64, cache="on")
    if len(src) < ns.batch:
        raise SystemExit(f"--image_root holds {len(src)} images; need at "
                         f"least --batch ({ns.batch}) for one epoch batch")
    print(f"[feed_ab] warming decode cache ({len(src)} images) ...",
          flush=True)
    t0 = time.perf_counter()
    for lo in range(0, len(src), 1024):  # chunked: never materialize the
        src.load_batch_u8(np.arange(lo,   # whole set as one temp batch
                                    min(lo + 1024, len(src))))
    print(f"[feed_ab] cache warm in {time.perf_counter() - t0:.0f}s",
          flush=True)

    modes = {
        "f32": dict(env="0", chunk=1),
        "u8c1": dict(env="1", chunk=1),
        "u8c4": dict(env="1", chunk=4),
        "u8c8": dict(env="1", chunk=8),
    }

    # compile outside the timed windows: the donated-state step plus every
    # mode's normalize programs INCLUDING the tail-group size (nb % chunk),
    # so a full warmup epoch per mode — the module-level _NORM_JITS cache
    # then carries the compiled programs into the timed windows' fresh
    # DataLoader instances
    print("[feed_ab] compile warmup ...", flush=True)
    for name, m in modes.items():
        os.environ["DMT_DEVICE_NORMALIZE"] = m["env"]
        dl = DataLoader(src, ns.batch, shuffle=True, seed=0,
                        transfer_chunk=m["chunk"])
        x = None
        for x, _ in dl:
            pass
        *states, met = jit_step(*states, x, jax.random.key(0))
        float(met[sync_key])

    results = {k: [] for k in modes}
    for w in range(ns.repeats):
        for name, m in modes.items():
            os.environ["DMT_DEVICE_NORMALIZE"] = m["env"]
            dl = DataLoader(src, ns.batch, shuffle=True, seed=w,
                            transfer_chunk=m["chunk"])
            rate, states = run_epoch(dl, states, jit_step, sync_key,
                                     jax.random.key(w * 7 + 1))
            results[name].append(round(rate, 1))
            print(f"[feed_ab] w{w} {name}: {rate:.1f} img/s", flush=True)

    report = {
        "host_load": idle,
        "image_root": ns.image_root,
        "n_images": len(src),
        "batch": ns.batch,
        "windows": results,
        "best": {k: max(v) for k, v in results.items()},
        "speedup_u8c4_vs_f32": round(
            max(results["u8c4"]) / max(results["f32"]), 2),
        "note": "steady-state folder-data epochs, warm decode cache, real "
                "full-width betavaegan step, in-process interleaved windows",
    }
    with open(ns.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({"best": report["best"],
                      "speedup_u8c4_vs_f32": report["speedup_u8c4_vs_f32"]}))
    print(f"report → {ns.out}")


if __name__ == "__main__":
    main()
