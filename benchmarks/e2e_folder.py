"""End-to-end production-path run on folder data, QUALITY-GATED (r4→r5).

Every earlier trajectory artifact fed the chip from the in-memory
synthetic stream; this harness drives the ACTUAL user surface — the
``dmt-train``/`cli.train` CLI on a JPEG ImageFolder tree — with the
production levers engaged:

  - decode-cache warm-up overlapping the first compile (VERDICT r3 #5),
  - the uint8 device feed with stacked transfers (FEED_AB_r4.json),
  - per-epoch (async) FID against precomputed folder stats (reference
    new_betavaegan.py:230-235 cadence),
  - async checkpoints with bf16-stored Adam moments + rotation
    (CKPT_DTYPE_AB_r4.json).

Round-5 additions (VERDICT r4 #2): each run's FID/Eec curves are gated
with the SAME checks the reproduce harness enforces
(eval/reproduce.py::_curve_shape — curve_ok, eec_ok), the harness stamps
host load (benchmarks/hostcheck) and refuses to measure on a busy host,
and ``--arm`` is repeatable so one invocation runs a config/data A/B
(e.g. prod intent+bf16 vs exact-semantics observed+f32 on the same tree,
or the same config on the legacy block8 tree vs the learnable LF tree —
the root-cause matrix for E2E_FOLDER_r4b.json's non-monotone curves).

Stage 1 computes dataset FID statistics from the folder in-process;
stage 2 shells out to the real CLI (the surface a reference user runs);
stage 3 parses the run's log + checkpoint directory into one JSON
artifact. Stages run sequentially — ONE TPU process at a time.

    python -m benchmarks.e2e_folder --image_root /tmp/lf_imgs/train \
        --out E2E_FOLDER_r5.json \
        --arm prod:intent:bfloat16 --arm exact:observed:float32
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


def run_arm(label: str, freeze_mode: str, opt_dtype: str, ns,
            image_root: str, stats_path: str) -> dict:
    """One cli.train run + gate extraction; returns the arm's record."""
    from disentangle_mlp_tpu.eval.reproduce import _curve_shape

    name = f"{ns.name}_{label}"
    run_dir = f".e2e_runs/{name}"
    cmd = [
        sys.executable, "-m", "disentangle_mlp_tpu.cli.train",
        "--model", "betavaegan", "--name", name, "--beta", "25",
        "--epochs", str(ns.epochs), "--batch_size_train", str(ns.batch),
        "--dataset", "celebA", "--image_root_train", image_root,
        "--calc_fid", "True", "--fid_path_pretrained", stats_path,
        "--n_samples", str(ns.n_samples),
        "--freeze_mode", freeze_mode, "--optimizer_dtype", opt_dtype,
        "--checkpoint_every", "4", "--keep_checkpoints", "2",
        "--checkpoint_save_dtype", "bfloat16",
        "--save_path", ".e2e_runs/%", "--log_path", ".e2e_runs/%/log",
    ]
    print(f"[e2e:{label}] launching:", " ".join(cmd), flush=True)
    env = dict(os.environ, PYTHONUNBUFFERED="1")
    t0 = time.perf_counter()
    # stream output through (the driver log is the live progress view)
    ret = subprocess.call(cmd, env=env)
    train_wall = time.perf_counter() - t0
    if ret != 0:
        raise SystemExit(f"train CLI exited {ret}")

    ckpts = sorted(glob.glob(f"{run_dir}/models/model_*"))
    arm = {
        "label": label, "image_root": image_root,
        "config": {"freeze_mode": freeze_mode, "optimizer_dtype": opt_dtype,
                   "checkpoint_save_dtype": "bfloat16",
                   "checkpoint_every": 4, "keep_checkpoints": 2,
                   "n_samples": ns.n_samples, "beta": 25.0},
        "train_wall_s": round(train_wall, 1),
        "checkpoints_kept": {os.path.basename(c): os.path.getsize(c)
                             for c in ckpts},
    }
    # the reproduce harness's gates, applied verbatim to this run's log
    arm.update(_curve_shape(f"{run_dir}/log"))
    return arm


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--image_root", default="/tmp/lf_imgs/train")
    ap.add_argument("--stats", default="",
                    help="stats .npz (default: <image_root>'s own dir, "
                         "one per tree)")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--n_samples", type=int, default=2048)
    ap.add_argument("--name", default="e2e_r5")
    ap.add_argument("--out", default="E2E_FOLDER_r5.json")
    ap.add_argument("--arm", action="append", default=[],
                    help="label:freeze_mode:optimizer_dtype[:image_root] "
                         "(repeatable; default one 'prod:intent:bfloat16' "
                         "arm on --image_root)")
    ap.add_argument("--allow_busy_host", action="store_true",
                    help="measure anyway on a non-idle host (artifact is "
                         "stamped contaminated)")
    ns = ap.parse_args(argv)

    from benchmarks.hostcheck import finish, host_idle_check
    idle = host_idle_check(refuse=not ns.allow_busy_host)

    arms_spec = ns.arm or ["prod:intent:bfloat16"]
    parsed = []
    for spec in arms_spec:
        parts = spec.split(":")
        if len(parts) not in (3, 4):
            raise SystemExit(f"bad --arm {spec!r}: want "
                             "label:freeze_mode:opt_dtype[:image_root]")
        label, mode, dtype = parts[:3]
        root = parts[3] if len(parts) == 4 else ns.image_root
        parsed.append((label, mode, dtype, root))

    # one stats file per distinct tree, computed once
    stats_for = {}
    stats_wall = 0.0
    for _, _, _, root in parsed:
        if root not in stats_for:
            stats_for[root] = ns.stats or os.path.join(
                os.path.dirname(os.path.abspath(root)),
                "e2e_stats.npz")
            stats_wall += ensure_stats(root, stats_for[root], ns.batch)

    arms = []
    for label, mode, dtype, root in parsed:
        arms.append(run_arm(label, mode, dtype, ns, root, stats_for[root]))

    report = {
        "batch": ns.batch, "epochs": ns.epochs,
        "n_images": {root: len(glob.glob(f"{root}/*/*.jpg"))
                     for root in stats_for},
        "stats_wall_s": round(stats_wall, 1),
        "host_load": finish(idle),
        "contaminated": idle["contaminated"],
        "arms": arms,
        # per-arm verdicts — an aggregate bool would misread matrices
        # that INTEND a failing control arm (e.g. the block8 tree)
        "gates": {a["label"]: bool(a.get("curve_ok") and a.get("eec_ok"))
                  for a in arms},
        "note": "real CLI on JPEG ImageFolder tree(s); round-4 production "
                "levers engaged (decode warmup, u8 stacked feed, per-epoch "
                "async FID vs folder stats, async bf16-moment checkpoints "
                "with rotation); gated with eval/reproduce.py curve checks "
                "(VERDICT r4 #2)",
    }
    with open(ns.out, "w") as f:
        json.dump(report, f, indent=2, default=float)
    print(json.dumps({"gates": report["gates"],
                      "arms": [{a["label"]: {"curve_ok": a.get("curve_ok"),
                                             "eec_ok": a.get("eec_ok"),
                                             "eec_ratio": a.get("eec_ratio")}}
                               for a in arms]}))
    print(f"report → {ns.out}")


if __name__ == "__main__":
    main()
