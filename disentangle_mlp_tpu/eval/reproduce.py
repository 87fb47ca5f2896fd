"""One-command reproduction of the reference's headline quality number.

Build target (BASELINE.md; reference results/logs/log_beta_vaegan_25.json
last entry, report Table 4): β=25 β-VAE-GAN, 10 epochs, CelebA 64×64,
batch 256, FID over 1000 generated samples = **128.34 ± 2**, with the
FID-pipeline calibration real-vs-real ≈ 2 (report §5.1: 50k real CelebA
images scored against the full-dataset statistics).

No CelebA images or pt_inception weights ship with this machine (zero
egress), so the pipeline is gated on asset presence and reports exactly
what is missing. The moment the two assets exist, the whole claim is
testable with one command:

    dmt-reproduce --name repro \
        --image_root_train /data/celebA/train \
        --image_root_val  /data/celebA/val \
        --image_root_test /data/celebA/test

Pipeline: (1) asset check (Inception weights, image roots); (2) build
reference statistics from the train split (cli/stats.py's path);
(3) real-vs-real calibration — score held-out real images against those
statistics, expect ≈ 2; (4) train β=25 for 10 epochs with FID-in-the-loop;
(5) verdict vs 128.34 ± 2. A synthetic mode exercises the identical
stats→train→score→log plumbing end to end without the assets (tested by
tests/test_reproduce.py).
"""

from __future__ import annotations

import dataclasses
import json
from typing import Dict

from ..config import Config

FID_TARGET = 128.34   # log_beta_vaegan_25.json, epoch 10
FID_TOLERANCE = 2.0   # BASELINE.json build-target band
CALIBRATION_TARGET = 2.0  # report §5.1, 50k real vs full-dataset stats


def calibration_fid(loader, stats_path: str, max_images: int) -> float:
    """Real-vs-real: activations of up to ``max_images`` REAL images from
    ``loader`` scored against the reference statistics at ``stats_path``.
    ≈ 2 at the reference's 50k scale; grows as the sample count shrinks
    (finite-sample covariance bias), so the report records the count."""
    from .fid import (compute_dataset_statistics, frechet_distance,
                      load_stats_npz)

    mu1, s1 = compute_dataset_statistics(loader, max_images=max_images)
    mu2, s2 = load_stats_npz(stats_path)
    return frechet_distance(mu1, s1, mu2, s2)


def _curve_shape(log_path: str) -> Dict:
    """FID curve-shape check over the run's per-epoch log (VERDICT r2 #5,
    asserted here — at full size, where FID is meaningful — rather than in
    the toy-width unit suite, where the random-weight Inception does not
    order quality at all; see tests/test_training_dynamics.py). Reference
    shape: log_beta_vaegan_25.json 223.4 → 128.3 over 10 epochs, a 0.57
    ratio; ``curve_ok`` requires final < 0.7 × initial."""
    import pathlib

    # newest by mtime — the filename stamp is month-first
    # (%m_%d_%Y_...), so a lexical sort is NOT chronological across years
    logs = sorted(pathlib.Path(log_path).glob("log_*.json"),
                  key=lambda p: p.stat().st_mtime)
    if not logs:
        return {}
    records = json.loads(logs[-1].read_text()).get("output", [])
    fids = [r["FID"] for r in records
            if isinstance(r.get("FID"), (int, float))]
    out: Dict = {"fid_curve": fids} if fids else {}
    # Avg Eec Loss is the width-robust health signal (ROUND4.md): the
    # reference's healthy CelebA run declines steadily (1138 → 776, 0.68×
    # over 11 epochs, log_beta_vaegan_25.json) while the collapsed
    # white-basis synthetic runs sit flat at the predict-mean floor
    # (5064 → 4791, 0.95×). Unlike FID — meaningless under the
    # random-weight Inception fallback at proxy widths — Eec needs no
    # pretrained assets, so it gates quality at any width.
    eecs = [r["Avg Eec Loss"] for r in records
            if isinstance(r.get("Avg Eec Loss"), (int, float))]
    if len(eecs) >= 2:
        out["eec_curve"] = eecs
        out["eec_ratio"] = eecs[-1] / eecs[0]
        out["eec_ok"] = bool(eecs[-1] < 0.85 * eecs[0])
    if len(fids) >= 2:
        out["curve_ratio"] = fids[-1] / fids[0]
        out["curve_ok"] = bool(fids[-1] < 0.7 * fids[0])
        # the synthetic 2048-image set destabilizes after ~epoch 4 (the
        # discriminator overfits the tiny set; identical curve in rounds
        # 2 and 3 with bit-matching epoch losses) — record the best epoch
        # too, since a checkpoint sweep would select it; curve_ok targets
        # the reference's monotone CelebA shape once assets land
        best = min(range(len(fids)), key=fids.__getitem__)
        out["fid_min"] = fids[best]
        out["fid_min_epoch"] = best
        out["curve_min_ok"] = bool(fids[best] < 0.7 * fids[0])
    return out


def rescore(log_dir: str, report_path: str = "") -> Dict:
    """Post-hoc re-gate: recompute the FID/Eec curve-shape fields from an
    existing run's per-epoch JSON log and (when ``report_path`` names an
    existing report) merge them into it. Lets historical runs be re-gated
    after a gate change without retraining — first use: banking
    REPRODUCTION_QUARTER_LF_r4.json, whose training run predated the Eec
    gate. Pure host-side JSON work; no devices touched."""
    import os
    import pathlib

    if not list(pathlib.Path(log_dir).glob("log_*.json")):
        raise FileNotFoundError(
            f"no log_*.json under {log_dir!r} — nothing to re-gate "
            "(check the --rescore_log path)")
    shape = _curve_shape(log_dir)
    if "curve_ok" not in shape and "eec_ok" not in shape:
        raise ValueError(
            f"log under {log_dir!r} has fewer than 2 FID and 2 Eec entries"
            " — no gate can be recomputed from it")

    report: Dict = {}
    if report_path and os.path.exists(report_path):
        with open(report_path) as f:
            report = json.load(f)
    # Drop every gate field the old report carried before merging, so a
    # rescore can never leave a stale curve_ok next to a fresh curve (e.g.
    # re-gating against a --calc_fid False run must REMOVE the FID gates,
    # not keep the previous run's).
    for k in ("fid_curve", "curve_ratio", "curve_ok", "fid_min",
              "fid_min_epoch", "curve_min_ok",
              "eec_curve", "eec_ratio", "eec_ok"):
        report.pop(k, None)
    report.update(shape)
    if report_path:
        with open(report_path, "w") as f:
            json.dump(report, f, indent=2, default=float)
    return report


def run_reproduction(cfg: Config, stats_out: str,
                     stats_images: int = 50000,
                     calib_images: int = 50000,
                     skip_train: bool = False,
                     report_out: str = "") -> Dict:
    """Execute the full reproduction pipeline; returns (and optionally
    writes) the report dict."""
    from ..data.pipeline import get_data_loader
    from ..eval.fid import compute_dataset_statistics, inception_is_pretrained
    from ..train.loop import run_vaegan

    report: Dict = {
        "target_fid": FID_TARGET, "tolerance": FID_TOLERANCE,
        "calibration_target": CALIBRATION_TARGET,
    }
    report["inception_pretrained"] = bool(inception_is_pretrained())
    if not report["inception_pretrained"]:
        print("WARNING: no pretrained FID Inception weights on disk "
              "(eval/inception.py WEIGHT_SEARCH_PATHS). The pipeline runs, "
              "but scores are NOT comparable to the published 128.34.")

    train, val, test = get_data_loader(cfg)
    report["synthetic_data"] = bool(cfg.synthetic_data) or val is None
    if report["synthetic_data"]:
        # provenance: the r3 destabilization traced to the legacy white
        # basis (posterior collapse at the predict-mean floor, ROUND4.md);
        # record which generator this run used so curves are comparable
        report["synthetic_basis_sigma"] = getattr(
            train.source, "basis_sigma", None)

    # (2) reference statistics from the train split
    print(f"[1/3] building reference statistics → {stats_out}")
    compute_dataset_statistics(train, path_out=stats_out,
                               max_images=stats_images)
    report["stats_path"] = stats_out
    report["stats_images"] = int(min(stats_images, train.dataset_size))

    # (3) real-vs-real calibration on held-out real images; fall back to
    # the train stream when a split is absent or smaller than its batch
    # (drop_last would yield zero batches)
    calib_loader = next(
        (ld for ld in (val, test, train) if ld is not None and len(ld) > 0),
        train)
    n_calib = int(min(calib_images, calib_loader.dataset_size))
    print(f"[2/3] real-vs-real calibration over {n_calib} images")
    report["calibration_fid"] = calibration_fid(
        calib_loader, stats_out, n_calib)
    report["calibration_images"] = n_calib
    print(f"      real-vs-real FID = {report['calibration_fid']:.3f} "
          f"(reference ≈ {CALIBRATION_TARGET} at 50k)")

    # (4) the β=25 run with FID-in-the-loop against the fresh statistics
    if not skip_train:
        print(f"[3/3] training β={cfg.beta} for {cfg.epochs} epochs")
        run_cfg = dataclasses.replace(
            cfg, calc_fid=True, fid_path_pretrained=stats_out)
        last = run_vaegan(run_cfg)
        report["final_fid"] = last.get("FID", "N/A")
        report["images_per_sec"] = last.get("images_per_sec")
        report.update(_curve_shape(run_cfg.log_path))
        if isinstance(report["final_fid"], (int, float)):
            report["within_tolerance"] = bool(
                abs(report["final_fid"] - FID_TARGET) <= FID_TOLERANCE
            ) and report["inception_pretrained"]
            print(f"FID = {report['final_fid']:.2f} vs target "
                  f"{FID_TARGET} ± {FID_TOLERANCE} → "
                  f"{'WITHIN' if report['within_tolerance'] else 'OUTSIDE'}"
                  " tolerance"
                  + ("" if report["inception_pretrained"] else
                     " (random Inception weights — not comparable)"))

    if report_out:
        with open(report_out, "w") as f:
            json.dump(report, f, indent=2, default=float)
        print(f"report → {report_out}")
    return report
