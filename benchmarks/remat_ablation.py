"""A/B: rematerialized D / VAE forwards inside the 3-phase step. Remat
trades residual HBM traffic (the step is HBM-bound on this chip: 24.9 GB
accessed, ~170-400 GB/s effective) for recompute FLOPs.
Run: python -m benchmarks.remat_ablation"""

import time


def main():
    from disentangle_mlp_tpu.utils.runtime import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from disentangle_mlp_tpu.config import Config
    from disentangle_mlp_tpu.models.vae import VAE
    from disentangle_mlp_tpu.ops.losses import (bce_logits, kld,
                                                reconstruction_loss, sim_loss)
    from disentangle_mlp_tpu.train.common import (apply_updates, make_adam,
                                                  sample_labels)
    from disentangle_mlp_tpu.train.vaegan import create_vaegan_experiment

    B, K = 256, 10
    cfg = Config(name="rem", beta=25.0, batch_size_train=B,
                 dtype="bfloat16", lr=3e-4)
    exp = create_vaegan_experiment(cfg, jax.random.key(0))
    vae, disc = exp.vae, exp.discriminator
    tx_eg, tx_d = make_adam(cfg.lr), make_adam(cfg.lr)

    def make_step(remat_d, remat_eg):
        def d_apply(params, stats, x):
            def f(params, stats, x):
                return disc.apply(
                    {"params": params, "batch_stats": stats}, x, train=True,
                    return_logits=True, mutable=["batch_stats"])
            return (jax.checkpoint(f) if remat_d else f)(params, stats, x)

        def eg_forward(params, stats, x, eps_rng):
            def f(params, stats, x, eps_rng):
                return vae.apply(
                    {"params": params, "batch_stats": stats}, x, train=True,
                    rngs={"reparam": eps_rng}, mutable=["batch_stats"])
            return (jax.checkpoint(f) if remat_eg else f)(
                params, stats, x, eps_rng)

        def eg_decode(params, stats, z):
            def f(params, stats, z):
                return vae.apply(
                    {"params": params, "batch_stats": stats}, z, train=True,
                    method=VAE.decode, mutable=["batch_stats"])
            return (jax.checkpoint(f) if remat_eg else f)(params, stats, z)

        def step(eg_state, d_state, batch, rng):
            rl, rn, red_, ren = jax.random.split(rng, 4)
            labels = sample_labels(rl)
            noise = jax.random.normal(rn, (batch.shape[0], 128), jnp.float32)
            fake, eg_mut = eg_decode(eg_state.params, eg_state.batch_stats,
                                     noise)
            fake = jax.lax.stop_gradient(fake)
            eg_state = eg_state.replace(batch_stats=eg_mut["batch_stats"])

            def d_loss_fn(d_params):
                (l_real, _), mut1 = d_apply(d_params, d_state.batch_stats,
                                            batch)
                (l_fake, _), mut2 = d_apply(d_params, mut1["batch_stats"],
                                            fake)
                loss = (bce_logits(l_real, labels["real"])
                        + bce_logits(l_fake, labels["fake"]))
                return loss, mut2["batch_stats"]

            (_, d_stats), d_grads = jax.value_and_grad(
                d_loss_fn, has_aux=True)(d_state.params)
            d_state = apply_updates(d_state, d_grads, tx_d,
                                    new_batch_stats=d_stats)

            (_, sim_real), d_mut = d_apply(d_state.params,
                                           d_state.batch_stats, batch)
            sim_real = jax.lax.stop_gradient(sim_real)
            d_state = d_state.replace(batch_stats=d_mut["batch_stats"])

            def dec_loss_fn(eg_params):
                fake_g, _ = eg_decode(eg_params, eg_state.batch_stats, noise)
                (recon, mu, logvar), mut = eg_forward(
                    eg_params, eg_state.batch_stats, batch, red_)
                (l_fake, _), d_mut1 = d_apply(d_state.params,
                                              d_state.batch_stats, fake_g)
                (l_recon, sim_recon), d_mut2 = d_apply(
                    d_state.params, d_mut1["batch_stats"], recon)
                loss = (bce_logits(l_fake, labels["real"])
                        + bce_logits(l_recon, labels["real"])
                        + sim_loss(sim_recon, sim_real)
                        + reconstruction_loss(recon, batch))
                return loss, (mut["batch_stats"], d_mut2["batch_stats"])

            (_, (eg_stats, d_stats2)), dec_grads = jax.value_and_grad(
                dec_loss_fn, has_aux=True)(eg_state.params)
            d_state = d_state.replace(batch_stats=d_stats2)
            eg_state = apply_updates(eg_state, dec_grads, tx_eg,
                                     new_batch_stats=eg_stats)

            def enc_loss_fn(eg_params):
                (recon, mu, logvar), mut = eg_forward(
                    eg_params, eg_state.batch_stats, batch, ren)
                return (25.0 * kld(mu, logvar)
                        + reconstruction_loss(recon, batch)), \
                    mut["batch_stats"]

            (_, eg_stats3), enc_grads = jax.value_and_grad(
                enc_loss_fn, has_aux=True)(eg_state.params)
            eg_state = apply_updates(eg_state, enc_grads, tx_eg,
                                     new_batch_stats=eg_stats3)
            return eg_state, d_state
        return step

    batches = jax.random.uniform(jax.random.key(9), (K, B, 64, 64, 3),
                                 jnp.float32, -1.0, 1.0)

    runners = {}
    for name, (rd, re_) in [("baseline", (False, False)),
                            ("remat D", (True, False)),
                            ("remat EG", (False, True)),
                            ("remat both", (True, True))]:
        step = make_step(rd, re_)

        @jax.jit
        def run(eg, d, batches, rng, step=step):
            def body(carry, xs):
                eg, d = carry
                batch, i = xs
                return step(eg, d, batch, jax.random.fold_in(rng, i)), ()
            (eg, d), _ = jax.lax.scan(body, (eg, d),
                                      (batches, jnp.arange(K)))
            return eg, d
        eg2, d2 = run(exp.eg_state, exp.d_state, batches, jax.random.key(0))
        float(jax.tree_util.tree_leaves(eg2.params)[0]
              .astype(jnp.float32).sum())
        runners[name] = run

    res = {k: [] for k in runners}
    for trial in range(3):
        for name, run in runners.items():
            t0 = time.perf_counter()
            eg2, d2 = run(exp.eg_state, exp.d_state, batches,
                          jax.random.key(trial + 1))
            float(jax.tree_util.tree_leaves(eg2.params)[0]
                  .astype(jnp.float32).sum())
            res[name].append((time.perf_counter() - t0) / K)
    for name, ts in res.items():
        dt = min(ts)
        print(f"{name:12s}: {dt*1e3:6.2f} ms  ({B/dt:.0f} img/s)")


if __name__ == "__main__":
    main()
