"""A/B: Adam moment storage dtype (--optimizer_dtype) on the flagship step.

The 3-phase β-VAE-GAN step spends ~16 of its ~50 ms streaming Adam state
(2× EG Adam 6.4 ms each + 1× D Adam ~3 ms — benchmarks/README_PERF.md
phase attribution); carrying mu/nu in bfloat16 halves that state's HBM
traffic while keeping all update math in float32
(train/common.py _scale_by_adam_compact).

This reuses bench.py's interleaved-window harness (the only drift-valid
methodology on the tunneled chip — cross-process comparisons are
meaningless) and reports the f32-vs-bf16 delta per freeze mode.

Run from the repo root (NO PYTHONPATH — it breaks axon plugin registration):
    python -m benchmarks.opt_dtype_ab
"""

from __future__ import annotations

import json


def main() -> None:
    from bench import BATCH, tpu_images_per_sec

    rates = tpu_images_per_sec()
    out = {}
    for key in ("observed", "intent", "observed_opt_bf16",
                "intent_opt_bf16"):
        r = rates[key]
        out[key] = {"best_img_s": round(r["best"], 1),
                    "median_img_s": round(r["median"], 1),
                    "ms_per_step_best": round(1000.0 * BATCH / r["best"], 2)}
    for mode in ("observed", "intent"):
        out[f"{mode}_speedup_best"] = round(
            rates[f"{mode}_opt_bf16"]["best"] / rates[mode]["best"], 4)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
