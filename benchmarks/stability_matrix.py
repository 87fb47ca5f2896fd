"""Stability matrix: 50 full-size steps (batch 256 bf16) of every
experiment family — VAE, DCGAN, β-VAE-GAN observed AND intent — on the
real chip; all tracked metrics must stay finite. Writes
STABILITY_MATRIX.json (or argv[1]). Run: python -m benchmarks.stability_matrix"""

from __future__ import annotations

import json
import time


def main():
    from disentangle_mlp_tpu.utils.runtime import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from disentangle_mlp_tpu.config import Config
    from disentangle_mlp_tpu.train.gan import create_gan_experiment
    from disentangle_mlp_tpu.train.vae import create_vae_experiment
    from disentangle_mlp_tpu.train.vaegan import create_vaegan_experiment

    B, STEPS = 256, 50
    xs = jax.random.uniform(jax.random.key(0), (B, 64, 64, 3),
                            jnp.float32, -1.0, 1.0)
    results = {}

    def run(name, make, step_of, states_of, set_states, **cfg_kw):
        cfg = Config(name=f"stab_{name}", beta=25.0, batch_size_train=B,
                     dtype="bfloat16", lr=3e-4,
                     freeze_mode="intent" if name.endswith("intent")
                     else "observed", **cfg_kw)
        exp = make(cfg, jax.random.key(1))
        states = states_of(exp)
        t0 = time.perf_counter()
        m = None
        for i in range(STEPS):
            out = step_of(exp)(*states, xs, jax.random.fold_in(
                jax.random.key(2), i))
            *states, m = out
        metrics = {k: float(v) for k, v in m.items()}
        dt = time.perf_counter() - t0
        ok = all(v == v and abs(v) != float("inf") for v in metrics.values())
        results[name] = {"ok": ok, "steps": STEPS,
                         "last_metrics": metrics,
                         "img_s_incl_dispatch_and_compile": round(
                             B * STEPS / dt, 1)}
        print(name, "ok" if ok else "NOT FINITE", metrics)

    run("vae", create_vae_experiment,
        lambda e: e.train_step, lambda e: [e.state], None)
    run("gan", create_gan_experiment,
        lambda e: e.train_step, lambda e: [e.g_state, e.d_state], None)
    run("betavaegan_observed", create_vaegan_experiment,
        lambda e: e.train_step, lambda e: [e.eg_state, e.d_state], None)
    run("betavaegan_intent", create_vaegan_experiment,
        lambda e: e.train_step, lambda e: [e.eg_state, e.d_state], None)
    # round 3: the grouped-BN (torch-DataParallel emulation) step at full
    # size — a distinct XLA program (per-group reductions)
    run("betavaegan_bn_groups2", create_vaegan_experiment,
        lambda e: e.train_step, lambda e: [e.eg_state, e.d_state], None,
        bn_groups=2)
    # round 3: bf16 Adam moments (--optimizer_dtype bfloat16, the opt-in
    # perf mode) — 50 full-size steps must stay finite too
    run("betavaegan_opt_bf16", create_vaegan_experiment,
        lambda e: e.train_step, lambda e: [e.eg_state, e.d_state], None,
        optimizer_dtype="bfloat16")

    import sys
    out = sys.argv[1] if len(sys.argv) > 1 else "STABILITY_MATRIX.json"
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print("wrote", out)


if __name__ == "__main__":
    main()
