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
import statistics


def measure_rates(windows: int = 3) -> dict:
    """The four flagship variants, interleaved windows, via bench.py's
    round-5 builders (the old single-shot tpu_images_per_sec was replaced
    by bench's incremental-emission structure)."""
    from disentangle_mlp_tpu.utils.runtime import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    import bench

    batches = jax.random.uniform(
        jax.random.key(100), (bench.TIMED_STEPS, bench.BATCH, 64, 64, 3),
        jnp.float32, -1.0, 1.0)
    runs = {}
    for key in ("observed", "intent", "observed_opt_bf16",
                "intent_opt_bf16"):
        runs[key] = bench._build_variant(key, batches)
        runs[key]["batches"] = batches
    for w in range(windows):
        bench._time_window(runs, seed=w + 1)
    return {k: {"best": max(r["rates"]),
                "median": statistics.median(r["rates"])}
            for k, r in runs.items()}


def main() -> None:
    # host-idleness guard (VERDICT r4 #7): contention invalidates the A/B
    from benchmarks.hostcheck import host_idle_check
    idle = host_idle_check(refuse=True)

    from bench import BATCH

    rates = measure_rates()
    out = {"host_load": idle}
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
