"""Quarter-width mechanistic study of the synthetic-set destabilization.

Round-3 context (VERDICT r3 #1): the full-size synthetic β=25 trajectory
destabilizes after epoch 4 (REPRODUCTION_SYNTH_r3.json curve 252→102→275)
while the reference's CelebA run is monotone 223→128 (reference
results/logs/log_beta_vaegan_25.json). The discriminating loss signature
(ROUND4.md) is `Avg Eec Loss`: the reference declines steadily (1138→776,
−32% over 11 epochs) where the synthetic full-width runs are flat
(5064→4791, −5%, non-monotone).

A toy-width CPU probe (img 32) was uninformative — flat smooth losses at
every data size. This study keeps the PRODUCTION geometry (img_size 64,
batch 256, β=25, same lr/optimizer/init) and divides every channel knob by
4 (~1/16 FLOPs, CPU-feasible at ~2 img/s), then asks the decision question
one width closer to production:

    does Avg Eec Loss DECLINE at the large size while staying FLAT at 2048?

    yes        -> data-quantity is the root cause (supports the 32k-image
                  TPU trajectory's hypothesis even without the chip)
    flat both  -> the synthetic data's NATURE (16-dim tanh-blob manifold),
                  not its size, is the cause; the knob matrix (β, lr,
                  bn_groups) at data scale is the next probe
    both decline -> the pathology does not reproduce at this width either;
                  only the full-width chip run can discriminate

Run mode trains the legs sequentially (hours on the 1-core host); verdict
mode is instant — it parses the per-leg JSON logs (the exact reference log
schema, utils/logger.py) and writes the repo-root artifact:

    python -m benchmarks.dstudy_quarter --sizes 2048,8192 --epochs 6
    python -m benchmarks.dstudy_quarter --verdict --out DSTUDY_QUARTER_r4.json

OUTCOME (round 4): the 2048 leg reproduced the flat signature at a level
within 0.3% of the dataset's predict-the-mean floor, pinning the cause as
posterior collapse on an unlearnable basis — the legacy white-noise basis,
not data quantity (the floor is size-invariant; the 8192 leg was therefore
skipped). A Gaussian-blurred basis in the identical setup declined
monotonically BELOW the floor (4951→4543 over 3 epochs). The production
generator now defaults to the low-frequency basis
(``--synthetic_basis_sigma``); this harness pins ``sigma=0`` to keep the
pathology reproducible.
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Comparators, from the logs named above (per-epoch Avg Eec Loss).
REF_EEC_DECLINE = -0.32      # reference CelebA β=25: 1138 → 776 over 11 epochs
R3_FULLWIDTH_DECLINE = -0.05  # round-3 full-width synthetic: 5064 → 4791, flat

# "Flat" = post-epoch-1 relative change within this of zero. The healthy
# reference declines ~3%/epoch; the failed runs sit within ±0.5%/epoch.
FLAT_TOL = 0.02


def quarter_cfg(size: int, epochs: int, out_root: str,
                basis_sigma: float = 0.0):
    from disentangle_mlp_tpu.config import Config

    return Config(
        name=f"ds{'lf' if basis_sigma != 0.0 else 'q'}{size}",
        beta=25.0, epochs=epochs, batch_size_train=256,
        synthetic_data=True, synthetic_train_size=size,
        # production architecture with every channel knob / 4 (~1/16 FLOPs)
        n_hidden=32, n_z=[64, 8, 8], representation_size=16, head_width=512,
        decoder_channels=[64, 32, 8], disc_channels=[8, 32, 64, 64],
        disc_feature_dim=512, img_size=64, dtype="float32",
        # sigma=0 pins the LEGACY white basis (the pathology arm); the
        # production default is now low-frequency (the fix) — pass
        # --basis_sigma -1 to run the fixed-generator control arm
        synthetic_basis_sigma=basis_sigma,
        calc_fid=False, checkpoint_every=0,
        save_path=f"{out_root}/%", log_path=f"{out_root}/%/log",
    ).finalize()


def run(sizes, epochs, out_root, basis_sigma=0.0):
    import jax

    jax.config.update("jax_platforms", "cpu")
    from disentangle_mlp_tpu.train.loop import run_vaegan

    for size in sizes:
        t0 = time.time()
        cfg = quarter_cfg(size, epochs, out_root, basis_sigma=basis_sigma)
        run_vaegan(cfg)
        print(f"SIZE={size} wall={time.time() - t0:.0f}s", flush=True)


def eec_series(out_root: str, leg: str):
    log_dir = pathlib.Path(out_root) / leg / "log"
    logs = sorted(log_dir.glob("log_*.json"), key=lambda p: p.stat().st_mtime)
    if not logs:
        return None
    out = json.loads(logs[-1].read_text())["output"]
    return [r["Avg Eec Loss"] for r in out]


def classify(series):
    """Label a per-epoch Eec series flat/declining after the epoch-0 drop."""
    if not series or len(series) < 3:
        return {"series": series, "label": "insufficient"}
    post = series[1:]  # epoch 0 always drops; the signature is what follows
    rel = (post[-1] - post[0]) / post[0]
    monotone = all(b <= a * 1.002 for a, b in zip(post, post[1:]))
    label = "declining" if (rel <= -FLAT_TOL and monotone) else "flat"
    return {
        "series": [round(v, 2) for v in series],
        "post_epoch1_rel_change": round(rel, 4),
        "post_epoch1_monotone": monotone,
        "total_rel_change": round((series[-1] - series[0]) / series[0], 4),
        "label": label,
    }


def verdict(sizes, out_root, out_path, lf_root=None):
    legs = {f"white_{s}": classify(eec_series(out_root, f"dsq{s}"))
            for s in sizes}
    if lf_root:
        for s in sizes:
            series = eec_series(lf_root, f"dslf{s}")
            if series:
                legs[f"lf_{s}"] = classify(series)
    white = [legs[f"white_{s}"]["label"] for s in sizes
             if legs[f"white_{s}"]["label"] != "insufficient"]
    lf = [v["label"] for k, v in legs.items() if k.startswith("lf_")]
    if white and all(l == "flat" for l in white) and "declining" in lf:
        decision = ("basis-nature PINNED: the white-noise basis keeps Eec "
                    "flat at the predict-mean floor at every size, while "
                    "the identical config on the Gaussian-blurred basis "
                    "declines monotonically below the floor — the legacy "
                    "white basis is the root cause; the generator now "
                    "defaults to the low-frequency basis")
    elif len(white) >= 2 and white[0] == "flat" and white[-1] == "declining":
        decision = ("data-quantity: the pathology vanishes with more data at "
                    "identical width/config — supports the 32k full-width run")
    elif white and all(l == "flat" for l in white):
        decision = ("data-nature: more data does not recover a declining "
                    "Eec; the synthetic manifold, not its size, drives the "
                    "destabilization — the LF control arm discriminates next")
    elif white and white[0] == "declining":
        decision = ("not-reproduced: the 2048 leg already declines at this "
                    "width; only the full-width chip run can discriminate")
    else:
        decision = "insufficient data"
    report = {
        "study": "quarter-width destabilization probe (production geometry, "
                 "channels/4, img 64, batch 256, beta 25, CPU f32)",
        "reference_eec_decline": REF_EEC_DECLINE,
        "r3_fullwidth_synth_decline": R3_FULLWIDTH_DECLINE,
        "flat_tolerance": FLAT_TOL,
        "predict_mean_floor_note": (
            "measured Eec floor of a predict-the-dataset-mean model: "
            "white basis 4740.5 (2048 imgs) / 4753.1 (8192); LF basis "
            "4867.5 — the white arm's flat segment sits within 0.3% of "
            "its floor (posterior collapse); the LF arm crosses BELOW "
            "its floor by epoch 2 (real per-image reconstruction)"),
        "legs": legs,
        "decision": decision,
    }
    with open(out_path, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({"legs": {k: v["label"] for k, v in legs.items()},
                      "decision": decision}))
    print(f"report → {out_path}")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="2048,8192")
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--out_root", default="/tmp/dstudy_q")
    ap.add_argument("--basis_sigma", type=float, default=0.0,
                    help="0 = legacy white basis (pathology arm); -1 = the "
                         "fixed generator's resolution-scaled default "
                         "(control arm, legs named dslf<size>)")
    ap.add_argument("--lf_root", default=None,
                    help="out_root of a control-arm run to fold into the "
                         "verdict (legs dslf<size>)")
    ap.add_argument("--verdict", action="store_true",
                    help="parse existing logs and write the artifact")
    ap.add_argument("--out", default="DSTUDY_QUARTER_r4.json")
    ns = ap.parse_args(argv)
    sizes = [int(s) for s in ns.sizes.split(",")]
    if ns.verdict:
        verdict(sizes, ns.out_root, ns.out, lf_root=ns.lf_root)
    else:
        sys.path.insert(0, REPO)
        run(sizes, ns.epochs, ns.out_root, basis_sigma=ns.basis_sigma)


if __name__ == "__main__":
    main()
