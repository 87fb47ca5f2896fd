"""Train-step behaviour tests: each jitted step runs, updates parameters,
produces finite metrics; the VAE loss decreases on a repeated batch; the
β-VAE-GAN freeze modes differ as documented (SURVEY.md §3.1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from disentangle_mlp_tpu.config import Config
from disentangle_mlp_tpu.train.gan import create_gan_experiment
from disentangle_mlp_tpu.train.vae import create_vae_experiment
from disentangle_mlp_tpu.train.vaegan import create_vaegan_experiment


def tiny_cfg(**kw):
    """Reference graph at toy widths: img 32 (4×4 bottleneck), thin convs."""
    return Config(name="t", n_hidden=16, batch_size_train=4,
                  dtype="float32", lr=1e-3, img_size=32,
                  n_z=[8, 4, 4], representation_size=4, head_width=32,
                  decoder_channels=[8, 8, 8], disc_channels=[4, 8, 8, 8],
                  disc_feature_dim=32, **kw)


@pytest.fixture(scope="module")
def batch():
    return jax.random.uniform(
        jax.random.key(0), (4, 32, 32, 3), jnp.float32, -1.0, 1.0)


def _params_changed(a, b) -> bool:
    return any(
        not np.allclose(np.asarray(x), np.asarray(y))
        for x, y in zip(jax.tree_util.tree_leaves(a),
                        jax.tree_util.tree_leaves(b)))


def test_vae_step_decreases_loss(batch):
    cfg = tiny_cfg()
    exp = create_vae_experiment(cfg, jax.random.key(1))
    init_params = jax.device_get(exp.state.params)  # snapshot: step donates
    state, losses = exp.state, []
    for i in range(4):
        state, m = exp.train_step(state, batch, jax.random.key(i))
        losses.append(float(m["loss"]))
        assert np.isfinite(losses[-1])
    assert losses[-1] < losses[0]
    assert _params_changed(init_params, state.params)


def test_gan_step_runs(batch):
    cfg = tiny_cfg()
    exp = create_gan_experiment(cfg, jax.random.key(2))
    init_g = jax.device_get(exp.g_state.params)
    g, d = exp.g_state, exp.d_state
    g2, d2, m = exp.train_step(g, d, batch, jax.random.key(3))
    for k in ["errD", "errG", "D_x", "D_G_z1", "D_G_z2"]:
        assert np.isfinite(float(m[k])), k
    assert 0.0 <= float(m["D_x"]) <= 1.0
    g3, d3, _ = exp.train_step(g2, d2, batch, jax.random.key(4))
    assert _params_changed(init_g, g3.params)


def test_vaegan_step_runs_and_metrics(batch):
    cfg = tiny_cfg(beta=25.0)
    exp = create_vaegan_experiment(cfg, jax.random.key(5))
    init_eg = jax.device_get(exp.eg_state.params)
    init_d = jax.device_get(exp.d_state.params)
    eg, d = exp.eg_state, exp.d_state
    eg2, d2, m = exp.train_step(eg, d, batch, jax.random.key(6))
    for k in ["recon_enc", "recon_dec", "dis", "D_x", "kld", "sim"]:
        assert np.isfinite(float(m[k])), k
    # reference wart preserved: enc and dec running losses are the same
    # quantity (new_betavaegan.py:189-190)
    assert float(m["recon_enc"]) == float(m["recon_dec"])
    assert _params_changed(init_eg, eg2.params)
    assert _params_changed(init_d, d2.params)


def test_vaegan_freeze_intent_masks_gradients(batch):
    """'intent' mode: phase-2 must not move encoder params and phase-3 must
    not move decoder params. Run one step in each mode from identical init
    and compare which subtrees moved relative to init."""
    cfg_obs = tiny_cfg(beta=25.0, freeze_mode="observed")
    cfg_int = tiny_cfg(beta=25.0, freeze_mode="intent")
    exp_o = create_vaegan_experiment(cfg_obs, jax.random.key(7))
    exp_i = create_vaegan_experiment(cfg_int, jax.random.key(7))

    ego, _, _ = exp_o.train_step(exp_o.eg_state, exp_o.d_state, batch,
                                 jax.random.key(8))
    egi, _, _ = exp_i.train_step(exp_i.eg_state, exp_i.d_state, batch,
                                 jax.random.key(8))
    # both modes move both subtrees overall (enc phase moves encoder,
    # dec phase moves decoder), but the updates must differ between modes.
    assert _params_changed(ego.params["encoder"], egi.params["encoder"])
    assert _params_changed(ego.params["decoder"], egi.params["decoder"])


def test_vaegan_reproducible(batch):
    cfg = tiny_cfg(beta=50.0)
    exp1 = create_vaegan_experiment(cfg, jax.random.key(9))
    exp2 = create_vaegan_experiment(cfg, jax.random.key(9))
    _, _, m1 = exp1.train_step(exp1.eg_state, exp1.d_state, batch,
                               jax.random.key(10))
    _, _, m2 = exp2.train_step(exp2.eg_state, exp2.d_state, batch,
                               jax.random.key(10))
    assert float(m1["recon_enc"]) == float(m2["recon_enc"])
    assert float(m1["kld"]) == float(m2["kld"])


def test_vaegan_intent_true_freeze_semantics(batch, tmp_path):
    """'intent' keeps independent per-subtree Adam states (torch
    requires_grad=False semantics: frozen params are skipped entirely) and
    the state round-trips through a checkpoint."""
    import optax

    from disentangle_mlp_tpu.utils.checkpoint import (load_checkpoint,
                                                      save_checkpoint)

    cfg = tiny_cfg(beta=25.0, freeze_mode="intent")
    exp = create_vaegan_experiment(cfg, jax.random.key(3))
    assert set(exp.eg_state.opt_state.keys()) == {"dec", "enc"}

    eg, d, m = exp.train_step(exp.eg_state, exp.d_state, batch,
                              jax.random.key(4))
    eg, d, m = exp.train_step(eg, d, batch, jax.random.key(5))
    # each subtree's Adam advanced once per step, independently
    dec_count = eg.opt_state["dec"][0].count
    enc_count = eg.opt_state["enc"][0].count
    assert int(dec_count) == 2 and int(enc_count) == 2
    # moments exist only for the matching subtree
    assert set(eg.opt_state["dec"][0].mu.keys()) == \
        set(exp.eg_state.params["decoder"].keys())

    path = str(tmp_path / "ckpt_intent")
    save_checkpoint(path, 1, {"eg": eg, "d": d})
    exp2 = create_vaegan_experiment(cfg, jax.random.key(3))
    epoch, states = load_checkpoint(path, {"eg": exp2.eg_state,
                                           "d": exp2.d_state})
    import numpy as np
    got = jax.tree_util.tree_leaves(states["eg"].opt_state["enc"][0].mu)
    want = jax.tree_util.tree_leaves(eg.opt_state["enc"][0].mu)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_vaegan_vjp_reuse_matches_naive(batch):
    """The shipped step pulls errG_fake's gradient back through the saved
    phase-1 decode vjp (one decoder forward per step). Must be
    BIT-IDENTICAL to the naive formulation that recomputes decode(noise)
    inside the phase-2 loss — the reference's retained-graph semantics."""
    import numpy as np

    from disentangle_mlp_tpu.models.vae import VAE
    from disentangle_mlp_tpu.ops.losses import (bce_logits, kld,
                                                reconstruction_loss,
                                                sim_loss)
    from disentangle_mlp_tpu.train.common import (apply_updates, make_adam,
                                                  sample_labels)

    cfg = tiny_cfg(beta=25.0)
    cfg.dtype = "float32"
    exp = create_vaegan_experiment(cfg, jax.random.key(21))
    vae, disc = exp.vae, exp.discriminator
    tx_eg, tx_d = make_adam(cfg.lr), make_adam(cfg.lr)

    def d_apply(p, s, x):
        return disc.apply({"params": p, "batch_stats": s}, x, train=True,
                          return_logits=True, mutable=["batch_stats"])

    def eg_forward(p, s, x, r):
        return vae.apply({"params": p, "batch_stats": s}, x, train=True,
                         rngs={"reparam": r}, mutable=["batch_stats"])

    def eg_decode(p, s, z):
        return vae.apply({"params": p, "batch_stats": s}, z, train=True,
                         method=VAE.decode, mutable=["batch_stats"])

    def naive_step(eg_state, d_state, batch, rng):
        rl, rn, red_, ren = jax.random.split(rng, 4)
        labels = sample_labels(rl)
        noise = jax.random.normal(rn, (batch.shape[0], cfg.n_hidden),
                                  jnp.float32)
        fake, eg_mut = eg_decode(eg_state.params, eg_state.batch_stats,
                                 noise)
        fake = jax.lax.stop_gradient(fake)
        eg_state = eg_state.replace(batch_stats=eg_mut["batch_stats"])

        def d_loss_fn(dp):
            (lr_, _), m1 = d_apply(dp, d_state.batch_stats, batch)
            (lf, _), m2 = d_apply(dp, m1["batch_stats"], fake)
            return (bce_logits(lr_, labels["real"])
                    + bce_logits(lf, labels["fake"])), m2["batch_stats"]
        (_, ds), dg = jax.value_and_grad(d_loss_fn, has_aux=True)(
            d_state.params)
        d_state = apply_updates(d_state, dg, tx_d, new_batch_stats=ds)

        (_, sim_real), dm = d_apply(d_state.params, d_state.batch_stats,
                                    batch)
        sim_real = jax.lax.stop_gradient(sim_real)
        d_state = d_state.replace(batch_stats=dm["batch_stats"])

        def dec_loss_fn(egp):
            fake_g, _ = eg_decode(egp, eg_state.batch_stats, noise)
            (recon, mu, lv), mut = eg_forward(egp, eg_state.batch_stats,
                                              batch, red_)
            (lf, _), dm1 = d_apply(d_state.params, d_state.batch_stats,
                                   fake_g)
            (lrc, simr), dm2 = d_apply(d_state.params, dm1["batch_stats"],
                                       recon)
            loss = (bce_logits(lf, labels["real"])
                    + bce_logits(lrc, labels["real"])
                    + sim_loss(simr, sim_real)
                    + reconstruction_loss(recon, batch))
            return loss, (mut["batch_stats"], dm2["batch_stats"])
        (_, (es, ds2)), degr = jax.value_and_grad(
            dec_loss_fn, has_aux=True)(eg_state.params)
        d_state = d_state.replace(batch_stats=ds2)
        eg_state = apply_updates(eg_state, degr, tx_eg, new_batch_stats=es)

        def enc_loss_fn(egp):
            (recon, mu, lv), mut = eg_forward(egp, eg_state.batch_stats,
                                              batch, ren)
            return (cfg.beta * kld(mu, lv)
                    + reconstruction_loss(recon, batch)), \
                mut["batch_stats"]
        (_, es3), eng = jax.value_and_grad(enc_loss_fn, has_aux=True)(
            eg_state.params)
        eg_state = apply_updates(eg_state, eng, tx_eg, new_batch_stats=es3)
        return eg_state, d_state

    rng = jax.random.key(22)
    # naive first: exp.train_step donates (deletes) its input state buffers
    eg_b, d_b = jax.jit(naive_step)(exp.eg_state, exp.d_state, batch, rng)
    eg_a, d_a, _ = exp.train_step(exp.eg_state, exp.d_state, batch, rng)

    import numpy as np
    for got, want in zip(jax.tree_util.tree_leaves(eg_a.params),
                         jax.tree_util.tree_leaves(eg_b.params)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=0, atol=0)
    for got, want in zip(jax.tree_util.tree_leaves(eg_a.batch_stats),
                         jax.tree_util.tree_leaves(eg_b.batch_stats)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=0, atol=0)
    for got, want in zip(jax.tree_util.tree_leaves(d_a.params),
                         jax.tree_util.tree_leaves(d_b.params)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=0, atol=0)


def test_gan_vjp_reuse_matches_naive(batch):
    """DCGAN: the G-step gradient through the saved G(z) residuals must be
    bit-identical to recomputing G(z) inside the G loss."""
    import numpy as np

    from disentangle_mlp_tpu.ops.losses import bce_logits
    from disentangle_mlp_tpu.train.common import (apply_updates, make_adam,
                                                  sample_labels)
    from disentangle_mlp_tpu.train.gan import create_gan_experiment

    cfg = tiny_cfg()
    cfg.dtype = "float32"
    exp = create_gan_experiment(cfg, jax.random.key(31))
    gen, disc = exp.generator, exp.discriminator
    tx_g, tx_d = make_adam(cfg.lr), make_adam(cfg.lr)

    def d_apply(p, s, x):
        return disc.apply({"params": p, "batch_stats": s}, x, train=True,
                          return_logits=True, mutable=["batch_stats"])

    def g_apply(p, s, z):
        return gen.apply({"params": p, "batch_stats": s}, z, train=True,
                         mutable=["batch_stats"])

    def naive_step(g_state, d_state, batch, rng):
        rl, rn = jax.random.split(rng)
        labels = sample_labels(rl)
        noise = jax.random.normal(rn, (batch.shape[0], cfg.n_hidden),
                                  jnp.float32)
        fake, g_mut = g_apply(g_state.params, g_state.batch_stats, noise)
        fake = jax.lax.stop_gradient(fake)

        def d_loss_fn(dp):
            (lr_, _), m1 = d_apply(dp, d_state.batch_stats, batch)
            (lf, _), m2 = d_apply(dp, m1["batch_stats"], fake)
            return (bce_logits(lr_, labels["real"])
                    + bce_logits(lf, labels["fake"])), m2["batch_stats"]
        (_, ds), dg = jax.value_and_grad(d_loss_fn, has_aux=True)(
            d_state.params)
        d_state = apply_updates(d_state, dg, tx_d, new_batch_stats=ds)

        def g_loss_fn(gp):
            fg, mut = g_apply(gp, g_state.batch_stats, noise)
            (lf, _), dm = d_apply(d_state.params, d_state.batch_stats, fg)
            return bce_logits(lf, labels["real"]), \
                (mut["batch_stats"], dm["batch_stats"])
        (_, (gs, ds2)), gg = jax.value_and_grad(g_loss_fn, has_aux=True)(
            g_state.params)
        d_state = d_state.replace(batch_stats=ds2)
        g_state = apply_updates(g_state, gg, tx_g, new_batch_stats=gs)
        return g_state, d_state

    rng = jax.random.key(32)
    g_b, d_b = jax.jit(naive_step)(exp.g_state, exp.d_state, batch, rng)
    g_a, d_a, _ = exp.train_step(exp.g_state, exp.d_state, batch, rng)
    for got, want in zip(
            jax.tree_util.tree_leaves((g_a.params, g_a.batch_stats,
                                       d_a.params)),
            jax.tree_util.tree_leaves((g_b.params, g_b.batch_stats,
                                       d_b.params))):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=0, atol=0)


def test_vaegan_beta_runtime_operand(batch):
    """β is a traced operand of the step, not a baked constant: two
    experiments at different β lower to the IDENTICAL HLO program, so a β
    sweep / the BO loop compiles the step once (persistent-cache hits for
    every subsequent β). The bound train_step must equal step_with_beta at
    the config's β."""
    e25 = create_vaegan_experiment(tiny_cfg(beta=25.0), jax.random.key(31))
    e100 = create_vaegan_experiment(tiny_cfg(beta=100.0), jax.random.key(31))
    rng = jax.random.key(32)

    args = (e25.eg_state, e25.d_state, batch, rng)
    low25 = jax.jit(e25.step_with_beta).lower(*args, jnp.float32(25.0))
    low100 = jax.jit(e100.step_with_beta).lower(*args, jnp.float32(100.0))
    assert low25.as_text() == low100.as_text()

    eg_b, _, m_b = jax.jit(e25.step_with_beta)(
        e25.eg_state, e25.d_state, batch, rng, jnp.float32(25.0))

    # different β operands change the encoder update through the SAME fn
    eg_c, _, m_c = jax.jit(e25.step_with_beta)(
        e25.eg_state, e25.d_state, batch, rng, jnp.float32(100.0))
    assert float(m_c["kld"]) != float(m_b["kld"])

    # the bound train_step (donating — call it last) equals the explicit-β
    # form at the config's β
    eg_a, _, m_a = e25.train_step(e25.eg_state, e25.d_state, batch, rng)
    np.testing.assert_allclose(float(m_a["kld"]), float(m_b["kld"]),
                               rtol=1e-6)
    for x, y in zip(jax.tree_util.tree_leaves(eg_a.params),
                    jax.tree_util.tree_leaves(eg_b.params)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-6)
