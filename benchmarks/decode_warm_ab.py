"""A/B: decode-cache warm-up during the first compile (VERDICT r3 #5).

Epoch 1 on real folder data is input-bound: JPEG decode delivers ~1,300
img/s against the ~5,200 img/s flagship step (PARITY.md measurements),
while the first XLA compile blocks the host for minutes with the CPU idle.
``DataLoader.start_cache_warmup`` decodes the epoch-1 order into the RAM
cache during that window; this harness measures the effect.

Method: spawn one full-size 1-epoch β-VAE-GAN train per mode
(DMT_DECODE_WARMUP=0 vs 1) over a generated CelebA-sized JPEG tree, each
with a FRESH JAX_COMPILATION_CACHE_DIR so every run pays the true
first-compile window the feature targets. The readout is the epoch-0
images/sec printed by the run (train/loop.py Throughput — compile warmup
batches excluded, so it isolates the steady epoch rate) plus total wall.
Runs alternate off/on/off/on to expose chip drift.

    python -m benchmarks.decode_warm_ab --image_root /tmp/ab_imgs/train \
        --out DECODE_WARM_AB_r4.json
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

EPOCH_RE = re.compile(r"====> Epoch: 0 .*\(([\d.]+) img/s\)")


def run_once(image_root: str, warm: bool, batch: int, tag: str) -> dict:
    env = dict(os.environ)
    env["DMT_DECODE_WARMUP"] = "1" if warm else "0"
    env["PYTHONUNBUFFERED"] = "1"
    cache_dir = tempfile.mkdtemp(prefix=f"xlacache_{tag}_")
    env["JAX_COMPILATION_CACHE_DIR"] = cache_dir

    cmd = [
        sys.executable, "-m", "disentangle_mlp_tpu.cli.train",
        "--model", "betavaegan", "--name", f"warmab_{tag}",
        "--beta", "25", "--epochs", "1",
        "--batch_size_train", str(batch),
        "--image_root_train", image_root,
        "--image_root_val", image_root, "--image_root_test", image_root,
        "--calc_fid", "False", "--checkpoint_every", "0",
        "--cache_decoded", "on",
        "--save_path", tempfile.mkdtemp(prefix=f"warmab_{tag}_") + "/%",
        "--log_path", tempfile.mkdtemp(prefix=f"warmablog_{tag}_") + "/%",
    ]
    t0 = time.time()
    # NEVER SIGKILL a TPU process (the chip claim wedges the tunnel —
    # CLAUDE.md); a tunnel wedge can also stall a healthy run for 30+ min
    # and resume. Generous deadline + SIGTERM-only, then WAIT for the
    # child to release the chip before giving up the whole A/B.
    proc = subprocess.Popen(cmd, env=env, cwd=REPO,
                            stdout=subprocess.PIPE,
                            stderr=subprocess.PIPE, text=True)
    try:
        out, err = proc.communicate(timeout=7200)
    except subprocess.TimeoutExpired:
        proc.terminate()
        out, err = proc.communicate()  # wait for a clean chip release
        raise RuntimeError(f"run {tag} exceeded 2 h (tunnel wedge?); "
                           f"terminated cleanly:\n{(out or '')[-1000:]}")
    wall = time.time() - t0
    if proc.returncode != 0:
        raise RuntimeError(
            f"run {tag} failed:\n{out[-2000:]}\n{err[-2000:]}")
    m = EPOCH_RE.search(out)
    rate = float(m.group(1)) if m else None
    return {"warm": warm, "epoch0_img_s": rate, "total_wall_s": round(wall, 1),
            "tag": tag}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--image_root", default="/tmp/ab_imgs/train")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--repeats", type=int, default=2,
                    help="off/on pairs (alternated for drift)")
    ap.add_argument("--out", default="DECODE_WARM_AB_r4.json")
    ns = ap.parse_args(argv)

    # host-idleness guard (VERDICT r4 #7): on this 1-CPU host a
    # concurrent heavy process invalidates interleaved A/Bs (ROUND4.md);
    # DMT_LOAD_LIMIT overrides the threshold if a stamped-but-contested
    # run is explicitly wanted.
    from benchmarks.hostcheck import host_idle_check
    idle = host_idle_check(refuse=True)

    runs = []
    for r in range(ns.repeats):
        for warm in (False, True):
            tag = f"{'on' if warm else 'off'}{r}"
            print(f"[ab] run {tag} ...", flush=True)
            res = run_once(ns.image_root, warm, ns.batch, tag)
            print(f"[ab] {tag}: epoch0 {res['epoch0_img_s']} img/s, "
                  f"wall {res['total_wall_s']}s", flush=True)
            runs.append(res)

    on = [r["epoch0_img_s"] for r in runs if r["warm"] and r["epoch0_img_s"]]
    off = [r["epoch0_img_s"] for r in runs
           if not r["warm"] and r["epoch0_img_s"]]
    report = {
        "host_load": idle,
        "image_root": ns.image_root,
        "n_images": sum(len(fs) for _, _, fs in os.walk(ns.image_root)),
        "batch": ns.batch,
        "runs": runs,
        "epoch0_img_s_warm": on,
        "epoch0_img_s_cold": off,
        "speedup_epoch0": (max(on) / max(off)) if on and off else None,
        "note": "fresh XLA cache per run (true first-compile window); "
                "epoch-0 rate excludes compile warmup batches",
    }
    with open(ns.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({k: report[k] for k in
                      ("epoch0_img_s_warm", "epoch0_img_s_cold",
                       "speedup_epoch0")}))
    print(f"report → {ns.out}")


if __name__ == "__main__":
    main()
