"""A/B: compute_dataset_statistics device-resident vs host-round-trip.

Round 4: the stats builder pulled every loader batch back to host
(``jax.device_get``) and re-uploaded it for Inception — ~25 MB of tunnel
traffic per 256-image batch for an elementwise rescale. The fix keeps
device batches on device (eval/fid.py). This harness measures both modes
in-process with interleaved windows (the only valid comparison on the
drifting tunneled chip — benchmarks/README_PERF.md), reusing one warm
Inception program.

    python -m benchmarks.stats_feed_ab --image_root /tmp/ab_imgs/train \
        --out STATS_FEED_AB_r4.json
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--image_root", default="/tmp/ab_imgs/train")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--n_images", type=int, default=5120)
    ap.add_argument("--windows", type=int, default=3)
    ap.add_argument("--out", default="STATS_FEED_AB_r4.json")
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

    from disentangle_mlp_tpu.config import Config
    from disentangle_mlp_tpu.data.pipeline import get_data_loader
    from disentangle_mlp_tpu.eval.fid import compute_dataset_statistics

    cfg = Config(name="stats_ab", dataset="celebA",
                 image_root_train=ns.image_root,
                 batch_size_train=ns.batch,
                 save_path=".e2e_runs/%", log_path=".e2e_runs/%/log",
                 ).finalize(make_dirs=False)
    train, _, _ = get_data_loader(cfg)
    train.shuffle = False  # identical image subset in every window/mode
    # warm the decode cache + compile both programs outside the windows
    train.start_cache_warmup()
    compute_dataset_statistics(train, max_images=ns.batch * 2)

    def host_roundtrip(loader):
        # the pre-fix behavior, byte-for-byte: device → host f32 → re-upload
        for x, y in loader:
            yield np.asarray(jax.device_get(x), np.float32), y

    windows = {"device": [], "host_roundtrip": []}
    mus = {}
    for w in range(ns.windows):
        for mode in ("device", "host_roundtrip"):
            it = host_roundtrip(train) if mode == "host_roundtrip" else train
            t0 = time.perf_counter()
            mu, _ = compute_dataset_statistics(it, max_images=ns.n_images)
            windows[mode].append(time.perf_counter() - t0)
            mus[mode] = mu
    np.testing.assert_allclose(mus["device"], mus["host_roundtrip"],
                               rtol=1e-5, atol=1e-5)

    best_d, best_h = min(windows["device"]), min(windows["host_roundtrip"])
    report = {
        "host_load": idle,
        "image_root": ns.image_root, "n_images": ns.n_images,
        "batch": ns.batch,
        "wall_s": {k: [round(v, 2) for v in vs] for k, vs in windows.items()},
        "best_wall_s": {"device": round(best_d, 2),
                        "host_roundtrip": round(best_h, 2)},
        "img_s_best": {"device": round(ns.n_images / best_d, 1),
                       "host_roundtrip": round(ns.n_images / best_h, 1)},
        "speedup": round(best_h / best_d, 2),
        "note": "interleaved in-process windows, warm decode cache + "
                "compiled programs; mu agreement asserted to 1e-5",
    }
    with open(ns.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report["img_s_best"] | {"speedup": report["speedup"]}))
    print(f"report → {ns.out}")


if __name__ == "__main__":
    main()
