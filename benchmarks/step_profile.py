"""Decompose the β-VAE-GAN train step: scan-timed cost of each network
forward/backward at the production shapes (B=256, bf16), to locate where
the step's wall time goes. Run: python -m benchmarks.step_profile"""

from __future__ import annotations

import time


def main():
    from disentangle_mlp_tpu.utils.runtime import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from disentangle_mlp_tpu.config import Config
    from disentangle_mlp_tpu.train.vaegan import create_vaegan_experiment

    B, K = 256, 16
    cfg = Config(name="prof", beta=25.0, batch_size_train=B,
                 dtype="bfloat16", lr=3e-4)
    exp = create_vaegan_experiment(cfg, jax.random.key(0))
    vae, disc = exp.vae, exp.discriminator
    eg, d = exp.eg_state, exp.d_state

    xs = jax.random.uniform(jax.random.key(1), (K, B, 64, 64, 3),
                            jnp.float32, -1.0, 1.0)
    zs = jax.random.normal(jax.random.key(2), (K, B, 128), jnp.float32)

    def timed(name, fn, inputs):
        # states are passed as jit ARGS (closing over them embeds ~GB of
        # constants in the HLO and overflows the tunnel's upload limit)
        @jax.jit
        def run(inputs, eg_, d_):
            def body(acc, x):
                return acc + fn(x, eg_, d_), ()
            acc, _ = jax.lax.scan(body, jnp.float32(0), inputs)
            return acc

        float(run(inputs, eg, d))
        t0 = time.perf_counter()
        v = float(run(inputs, eg, d))
        dt = (time.perf_counter() - t0) / K
        print(f"{name:26s}: {dt*1e3:7.2f} ms")
        return dt

    def vae_fwd(x, eg, d):
        (recon, mu, logvar), _ = vae.apply(
            {"params": eg.params, "batch_stats": eg.batch_stats}, x,
            train=True, rngs={"reparam": jax.random.key(3)},
            mutable=["batch_stats"])
        return jnp.sum(recon.astype(jnp.float32)) + jnp.sum(mu)

    def vae_fwd_bwd(x, eg, d):
        def loss(p):
            (recon, mu, logvar), _ = vae.apply(
                {"params": p, "batch_stats": eg.batch_stats}, x,
                train=True, rngs={"reparam": jax.random.key(3)},
                mutable=["batch_stats"])
            return jnp.sum(jnp.square(recon.astype(jnp.float32) - x)) \
                + jnp.sum(mu)
        g = jax.grad(loss)(eg.params)
        return sum(jnp.sum(l.astype(jnp.float32))
                   for l in jax.tree_util.tree_leaves(g))

    def dec_fwd(z, eg, d):
        out, _ = vae.apply(
            {"params": eg.params, "batch_stats": eg.batch_stats}, z,
            train=True, method=type(vae).decode, mutable=["batch_stats"])
        return jnp.sum(out.astype(jnp.float32))

    def dec_fwd_bwd(z, eg, d):
        def loss(p):
            out, _ = vae.apply(
                {"params": p, "batch_stats": eg.batch_stats}, z,
                train=True, method=type(vae).decode,
                mutable=["batch_stats"])
            return jnp.sum(out.astype(jnp.float32))
        g = jax.grad(loss)(eg.params)
        return sum(jnp.sum(l.astype(jnp.float32))
                   for l in jax.tree_util.tree_leaves(g))

    def enc_fwd(x, eg, d):
        (mu, lv) = vae.apply(
            {"params": eg.params, "batch_stats": eg.batch_stats}, x,
            train=True, method=type(vae).encode,
            mutable=["batch_stats"])[0]
        return jnp.sum(mu) + jnp.sum(lv)

    def d_fwd(x, eg, d):
        (logit, feats), _ = disc.apply(
            {"params": d.params, "batch_stats": d.batch_stats}, x,
            train=True, return_logits=True, mutable=["batch_stats"])
        return jnp.sum(logit) + jnp.sum(feats.astype(jnp.float32))

    def d_fwd_bwd(x, eg, d):
        def loss(p):
            (logit, feats), _ = disc.apply(
                {"params": p, "batch_stats": d.batch_stats}, x,
                train=True, return_logits=True, mutable=["batch_stats"])
            return jnp.sum(logit) + jnp.sum(feats.astype(jnp.float32))
        g = jax.grad(loss)(d.params)
        return sum(jnp.sum(l.astype(jnp.float32))
                   for l in jax.tree_util.tree_leaves(g))

    def d_input_bwd(x, eg, d):
        def loss(xx):
            (logit, feats), _ = disc.apply(
                {"params": d.params, "batch_stats": d.batch_stats}, xx,
                train=True, return_logits=True, mutable=["batch_stats"])
            return jnp.sum(logit) + jnp.sum(feats.astype(jnp.float32))
        return jnp.sum(jax.grad(loss)(x))

    def full_step(x, eg, d):
        eg2, d2, m = exp.step_fn(eg, d, x, jax.random.key(7))
        return m["recon_enc"]

    t_full = timed("FULL 3-phase step", full_step, xs)
    t = {}
    t["vae_fwd"] = timed("VAE fwd", vae_fwd, xs)
    t["vae_fb"] = timed("VAE fwd+bwd", vae_fwd_bwd, xs)
    t["enc_fwd"] = timed("encoder fwd", enc_fwd, xs)
    t["dec_fwd"] = timed("decoder fwd", dec_fwd, zs)
    t["dec_fb"] = timed("decoder fwd+bwd", dec_fwd_bwd, zs)
    t["d_fwd"] = timed("D fwd", d_fwd, xs)
    t["d_fb"] = timed("D fwd+bwd(params)", d_fwd_bwd, xs)
    t["d_ib"] = timed("D fwd+bwd(input)", d_input_bwd, xs)

    # reference-semantics composition of the step:
    # P1: dec_fwd + 2×d_fwd-ish fused fwd+bwd(params)  P2: d_fwd(sim_real)
    #     + [dec_fwd + vae + 2×D input-bwd] fwd+bwd    P3: vae fwd+bwd
    approx = (t["dec_fwd"] + t["d_fb"] * 2 - t["d_fwd"]  # rough P1
              + t["d_fwd"]                               # sim_real
              + t["vae_fb"] + t["dec_fb"] + 2 * t["d_ib"]  # rough P2
              + t["vae_fb"])                             # P3
    print(f"{'sum of pieces (approx)':26s}: {approx*1e3:7.2f} ms "
          f"vs full {t_full*1e3:.2f} ms")
    print(f"step throughput: {B/t_full:.0f} img/s")


if __name__ == "__main__":
    main()
