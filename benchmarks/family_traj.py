"""Trajectory evidence for the birds / mnist model families (VERDICT r4 #4).

The reference defines these families but never trains them (SURVEY.md
C8/C9) — round 4 left "trainable" asserted via unit tests rather than
demonstrated. This harness banks the demonstration: for each family it
drives the REAL ``cli.train`` surface (the same code path a user runs)
on synthetic data for ``--epochs`` epochs, then RESUMES from the last
rotated checkpoint for ``--resume_epochs`` more — so checkpoint
write/restore is exercised on the same surface. Gate per family:

  - ``loss_ok``: the RECON component ("Avg Recon Loss" — the quantity
    that must fall when the autoencoder learns; the total EG loss floors
    at the adversarial+KLD equilibrium) declines to < ``gate_ratio``
    (default 0.8) of the first epoch's, and the resumed leg continues
    below the pre-resume final (continued, not restarted);
  - families have no eval sweep by design (celebA-only —
    train/loop.py::run_family raises on multi --load_path); the resume
    leg stands in for the sweep's checkpoint-consumption role.

Synthetic data is forced for both families (no MNIST idx files or birds
images ship with this zero-egress host; `dmt-fetch-assets` is the gated
downloader when a network exists).

    python -m benchmarks.family_traj --out FAMILY_TRAJ_r5.json
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import subprocess
import sys
import time

RUN_ROOT = ".family_runs"


def family_args(family: str, ns) -> list:
    common = [
        "--model", "betavaegan",  # routed to run_family by --dataset
        "--dataset", family, "--synthetic_data", "True",
        "--synthetic_train_size", str(ns.train_size),
        "--calc_fid", "False",
        "--checkpoint_every", "2", "--keep_checkpoints", "2",
        "--save_path", f"{RUN_ROOT}/%", "--log_path", f"{RUN_ROOT}/%/log",
    ]
    if family == "birds":
        # the birds ladders are hard-wired to 128×128 (models/birds.py);
        # β=1 = the original unweighted Σ-KLD (trains cleanly here)
        return common + ["--img_size", "128", "--batch_size_train", "64",
                         "--beta", "1", "--lr", "3e-4"]
    if family == "mnist":
        # the mnist family couples 196 latent dims to 784 recon dims, so
        # unweighted KLD pins it at the predict-mean floor; β=0.1 and the
        # small-model lr restore a healthy recon trajectory (train/
        # families.py docstring; CPU grid: β0.1/lr1e-3 → recon 80→45 in
        # 150 single-batch steps vs flat at β1/lr3e-4)
        return common + ["--img_size", "28", "--input_channels", "1",
                         "--batch_size_train", "128",
                         "--beta", "0.1", "--lr", "1e-3"]
    raise ValueError(family)


def read_losses(run_dir: str) -> dict:
    """Concatenate ALL the run's logs chronologically: each cli.train
    process writes its own timestamped log file (reference logger.py
    one-file-per-run semantics), so after the resume leg the trajectory
    spans two files — gating on only the newest would score the 2-epoch
    resumed tail as if it were the whole curve. Returns both the total
    EG loss curve and the recon component (the gated quantity: the total
    carries an irreducible adversarial+KLD floor at equilibrium)."""
    total, recon = [], []
    for path in sorted(glob.glob(f"{run_dir}/log/log_*.json"),
                       key=os.path.getmtime):
        with open(path) as f:
            for e in json.load(f)["output"]:
                total.append(e["Avg Loss"])
                recon.append(e["Avg Recon Loss"])
    return {"total": total, "recon": recon}


def run_cli(args: list) -> float:
    cmd = [sys.executable, "-m", "disentangle_mlp_tpu.cli.train"] + args
    print("[family_traj] launching:", " ".join(cmd), flush=True)
    t0 = time.perf_counter()
    ret = subprocess.call(cmd, env=dict(os.environ, PYTHONUNBUFFERED="1"))
    if ret != 0:
        raise SystemExit(f"train CLI exited {ret}")
    return time.perf_counter() - t0


def run_family_traj(family: str, ns) -> dict:
    name = f"traj_{family}"
    run_dir = f"{RUN_ROOT}/{name}"
    if os.path.isdir(run_dir):  # stale logs would pollute the curve concat
        import shutil
        shutil.rmtree(run_dir)
    base = family_args(family, ns)

    wall = run_cli(base + ["--name", name, "--epochs", str(ns.epochs)])
    pre = read_losses(run_dir)

    ckpts = sorted(glob.glob(f"{run_dir}/models/model_*"),
                   key=lambda p: int(p.rsplit("_", 1)[1]))
    # Staleness guard: the newest checkpoint must be the one THIS leg just
    # wrote. A concurrent/earlier run sharing the dir (observed r5: a
    # double-launched harness) would otherwise feed the resume leg a
    # foreign checkpoint and silently no-op it (start_epoch >= epochs).
    if os.path.basename(ckpts[-1]) != f"model_{ns.epochs}":
        raise SystemExit(
            f"{run_dir}: newest checkpoint {ckpts[-1]} != model_"
            f"{ns.epochs} — another process wrote here; aborting")
    resume_wall = run_cli(base + [
        "--name", name, "--epochs", str(ns.epochs + ns.resume_epochs),
        "--load_path", ckpts[-1]])
    losses = read_losses(run_dir)  # same log file, appended

    recon, total = losses["recon"], losses["total"]
    rec = {
        "family": family,
        "epochs": ns.epochs, "resume_epochs": ns.resume_epochs,
        "train_size": ns.train_size,
        "data": "synthetic",  # forced above; no MNIST idx files on host
        "loss_curve": total,
        "recon_curve": recon,
        "loss_ratio": total[-1] / total[0],
        "recon_ratio": recon[-1] / recon[0],
        # gate the recon component: it MUST fall if the autoencoder
        # learns, while the total floors at the adversarial equilibrium
        "loss_ok": bool(recon[-1] < ns.gate_ratio * recon[0]),
        "resume_continued": bool(recon[-1] <= pre["recon"][-1] * 1.05),
        "resumed_from": os.path.basename(ckpts[-1]),
        "checkpoints_kept": [os.path.basename(c) for c in sorted(
            glob.glob(f"{run_dir}/models/model_*"))],
        "train_wall_s": round(wall, 1),
        "resume_wall_s": round(resume_wall, 1),
    }
    print(f"[family_traj] {family}: recon_ratio={rec['recon_ratio']:.3f} "
          f"(total {rec['loss_ratio']:.3f}) loss_ok={rec['loss_ok']} "
          f"resume_continued={rec['resume_continued']}", flush=True)
    return rec


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--families", default="birds,mnist")
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--resume_epochs", type=int, default=2)
    ap.add_argument("--train_size", type=int, default=2048)
    ap.add_argument("--gate_ratio", type=float, default=0.8)
    ap.add_argument("--out", default="FAMILY_TRAJ_r5.json")
    ns = ap.parse_args(argv)

    from benchmarks.hostcheck import finish, host_idle_check
    idle = host_idle_check(refuse=False)  # quality evidence, not timing

    fams = [run_family_traj(f.strip(), ns)
            for f in ns.families.split(",") if f.strip()]
    report = {
        "families": fams,
        "all_ok": all(f["loss_ok"] and f["resume_continued"] for f in fams),
        "host_load": finish(idle),
        "note": "real cli.train surface per family (run_family loop: jitted "
                "step, u8/synthetic feed, async rotated checkpoints), then "
                "resume from the newest checkpoint; reference never trained "
                "these models (SURVEY C8/C9 'unused') — this artifact "
                "demonstrates the capability the reference only carries",
    }
    with open(ns.out, "w") as f:
        json.dump(report, f, indent=2, default=float)
    print(json.dumps({"all_ok": report["all_ok"],
                      "ratios": {f["family"]: round(f["loss_ratio"], 3)
                                 for f in fams}}))
    print(f"report → {ns.out}")


if __name__ == "__main__":
    main()
