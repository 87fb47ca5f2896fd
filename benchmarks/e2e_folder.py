"""End-to-end production-path run on real folder data (round 4).

Every earlier trajectory artifact fed the chip from the in-memory
synthetic stream; this harness drives the ACTUAL user surface — the
``dmt-train``/`cli.train` CLI on a JPEG ImageFolder tree — with all the
round-4 production levers engaged at once:

  - decode-cache warm-up overlapping the first compile (VERDICT r3 #5),
  - the uint8 device feed with stacked transfers (FEED_AB_r4.json),
  - per-epoch FID against precomputed folder stats (reference
    new_betavaegan.py:230-235 cadence),
  - async checkpoints with bf16-stored Adam moments + rotation
    (CKPT_DTYPE_AB_r4.json),
  - the fastest production config (freeze_mode=intent,
    optimizer_dtype=bfloat16 — benchmarks/opt_dtype_ab.py).

Stage 1 computes dataset FID statistics from the folder in-process;
stage 2 shells out to the real CLI (the surface a reference user runs);
stage 3 parses the run's log + checkpoint directory into one JSON
artifact. Stages run sequentially — ONE TPU process at a time.

    python -m benchmarks.e2e_folder --image_root /tmp/ab_imgs/train \
        --out E2E_FOLDER_r4.json
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import subprocess
import sys
import time


def ensure_stats(image_root: str, stats_path: str, batch: int) -> float:
    """Compute folder FID stats in-process if absent; returns wall s."""
    if os.path.exists(stats_path):
        print(f"[e2e] stats exist: {stats_path}")
        return 0.0
    t0 = time.perf_counter()
    from disentangle_mlp_tpu.utils.runtime import enable_compilation_cache
    enable_compilation_cache()
    from disentangle_mlp_tpu.config import Config
    from disentangle_mlp_tpu.data.pipeline import get_data_loader
    from disentangle_mlp_tpu.eval.fid import compute_dataset_statistics

    cfg = Config(name="e2e_stats", dataset="celebA",
                 image_root_train=image_root, batch_size_train=batch,
                 save_path=".e2e_runs/%", log_path=".e2e_runs/%/log",
                 ).finalize(make_dirs=False)
    train, _, _ = get_data_loader(cfg)
    compute_dataset_statistics(train, stats_path)
    return time.perf_counter() - t0


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--image_root", default="/tmp/ab_imgs/train")
    ap.add_argument("--stats", default="/tmp/e2e_stats.npz")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--n_samples", type=int, default=2048)
    ap.add_argument("--name", default="e2e_folder")
    ap.add_argument("--out", default="E2E_FOLDER_r4.json")
    ns = ap.parse_args(argv)

    stats_wall = ensure_stats(ns.image_root, ns.stats, ns.batch)

    run_dir = f".e2e_runs/{ns.name}"
    cmd = [
        sys.executable, "-m", "disentangle_mlp_tpu.cli.train",
        "--model", "betavaegan", "--name", ns.name, "--beta", "25",
        "--epochs", str(ns.epochs), "--batch_size_train", str(ns.batch),
        "--dataset", "celebA", "--image_root_train", ns.image_root,
        "--calc_fid", "True", "--fid_path_pretrained", ns.stats,
        "--n_samples", str(ns.n_samples),
        "--freeze_mode", "intent", "--optimizer_dtype", "bfloat16",
        "--checkpoint_every", "4", "--keep_checkpoints", "2",
        "--checkpoint_save_dtype", "bfloat16",
        "--save_path", ".e2e_runs/%", "--log_path", ".e2e_runs/%/log",
    ]
    print("[e2e] launching:", " ".join(cmd), flush=True)
    env = dict(os.environ, PYTHONUNBUFFERED="1")
    t0 = time.perf_counter()
    # stream output through (the driver log is the live progress view)
    ret = subprocess.call(cmd, env=env)
    train_wall = time.perf_counter() - t0
    if ret != 0:
        raise SystemExit(f"train CLI exited {ret}")

    logs = sorted(glob.glob(f"{run_dir}/log/log_*.json"))
    with open(logs[-1]) as f:
        log = json.load(f)
    epochs = log["output"]
    fids = [e["FID"] for e in epochs]
    num_fids = [f for f in fids if isinstance(f, (int, float))]
    ckpts = sorted(glob.glob(f"{run_dir}/models/model_*"))
    ckpt_bytes = {os.path.basename(c): os.path.getsize(c) for c in ckpts}

    n_imgs = len(glob.glob(f"{ns.image_root}/*/*.jpg"))
    report = {
        "image_root": ns.image_root, "n_images": n_imgs,
        "batch": ns.batch, "epochs": ns.epochs,
        "config": {"freeze_mode": "intent", "optimizer_dtype": "bfloat16",
                   "checkpoint_save_dtype": "bfloat16",
                   "checkpoint_every": 4, "keep_checkpoints": 2,
                   "n_samples": ns.n_samples, "beta": 25.0},
        "eec_curve": [e["Avg Eec Loss"] for e in epochs],
        "fid_curve": fids,
        "fid_final": num_fids[-1] if num_fids else None,
        "fid_min": min(num_fids) if num_fids else None,
        "checkpoints_kept": ckpt_bytes,
        "stats_wall_s": round(stats_wall, 1),
        "train_wall_s": round(train_wall, 1),
        "note": "real CLI on a 20k JPEG ImageFolder tree; all round-4 "
                "production levers engaged (decode warmup, u8 stacked "
                "feed, per-epoch FID vs folder stats, async bf16-moment "
                "checkpoints with rotation); smooth low-frequency "
                "synthetic JPEGs (benchmarks/gen_jpeg_tree.py)",
    }
    with open(ns.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({"fid_curve": fids, "train_wall_s": train_wall,
                      "ckpts": ckpt_bytes}))
    print(f"report → {ns.out}")


if __name__ == "__main__":
    main()
