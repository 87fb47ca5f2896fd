"""A/B: Adam moment storage dtype (--optimizer_dtype) on the flagship step.

The 3-phase β-VAE-GAN step spends ~16 of its ~50 ms streaming Adam state
(2× EG Adam 6.4 ms each + 1× D Adam ~3 ms — benchmarks/README_PERF.md
phase attribution); carrying mu/nu in bfloat16 halves that state's HBM
traffic while keeping all update math in float32
(train/common.py _scale_by_adam_compact). This script measures the real
effect in one process with interleaved windows (the tunneled chip's
delivered rate drifts — cross-process comparisons are meaningless).

Run from the repo root (NO PYTHONPATH — it breaks axon plugin registration):
    python -m benchmarks.opt_dtype_ab
"""

from __future__ import annotations

import json
import statistics
import time

BATCH = 256
TIMED_STEPS = 20
WINDOWS = 3


def main() -> None:
    from disentangle_mlp_tpu.utils.runtime import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from disentangle_mlp_tpu.config import Config
    from disentangle_mlp_tpu.train.scan import make_multi_step
    from disentangle_mlp_tpu.train.vaegan import create_vaegan_experiment

    batches = jax.random.uniform(
        jax.random.key(100), (TIMED_STEPS, BATCH, 64, 64, 3),
        jnp.float32, -1.0, 1.0)

    runs = {}
    for opt_dtype in ("float32", "bfloat16"):
        cfg = Config(name=f"ab_{opt_dtype}", beta=25.0,
                     batch_size_train=BATCH, dtype="bfloat16", lr=3e-4,
                     freeze_mode="observed", optimizer_dtype=opt_dtype)
        exp = create_vaegan_experiment(cfg, jax.random.key(0))
        multi = make_multi_step(exp.step_fn, n_states=2, donate=True)
        eg, d, m = multi(exp.eg_state, exp.d_state, batches,
                         jax.random.key(0))
        float(m["recon_enc"][-1])  # scalar fetch = the only axon barrier
        runs[opt_dtype] = {"multi": multi, "eg": eg, "d": d, "rates": []}

    for w in range(WINDOWS):
        for dt_name, r in runs.items():
            t0 = time.perf_counter()
            r["eg"], r["d"], m = r["multi"](
                r["eg"], r["d"], batches, jax.random.key(w + 1))
            value = float(m["recon_enc"][-1])
            dt = time.perf_counter() - t0
            assert value == value, f"NaN during {dt_name} window"
            r["rates"].append(BATCH * TIMED_STEPS / dt)

    out = {dt_name: {"best_img_s": round(max(r["rates"]), 1),
                     "median_img_s": round(statistics.median(r["rates"]), 1),
                     "ms_per_step_best": round(
                         1000.0 * BATCH / max(r["rates"]), 2)}
           for dt_name, r in runs.items()}
    out["speedup_best"] = round(
        out["bfloat16"]["best_img_s"] / out["float32"]["best_img_s"], 4)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
