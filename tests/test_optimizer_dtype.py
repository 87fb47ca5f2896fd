"""--optimizer_dtype bfloat16 (opt-in perf mode): Adam moments carried in
bf16, update math float32 (train/common.py _scale_by_adam_compact). The
reference's torch.optim.Adam is all-f32 (experiments/new_betavaegan.py:49-50),
so f32 stays the default; this suite pins the mode's semantics:
the compact transform is optax.adam-exact when storing f32, the bf16 mode
produces bf16 moment leaves and a close (not bit-equal) trajectory, and a
checkpoint written in one mode resumes in the other."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from disentangle_mlp_tpu.train.common import _scale_by_adam_compact, make_adam
from disentangle_mlp_tpu.train.vae import create_vae_experiment
from disentangle_mlp_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

from test_train_steps import tiny_cfg


def _moment_dtypes(opt_state):
    return {
        l.dtype
        for s in jax.tree_util.tree_leaves(
            opt_state, is_leaf=lambda x: isinstance(x, optax.ScaleByAdamState))
        if isinstance(s, optax.ScaleByAdamState)
        for l in jax.tree_util.tree_leaves((s.mu, s.nu))
    }


def test_compact_adam_f32_matches_optax():
    """Storing moments in f32 the compact transform IS optax.adam (same
    bias correction, same m̂/(√v̂+eps) form) to float rounding."""
    params = {"w": jnp.linspace(-1.0, 1.0, 64).reshape(8, 8),
              "b": jnp.ones((8,))}
    ref_tx = optax.adam(1e-3, b1=0.9, b2=0.999, eps=1e-8)
    cmp_tx = optax.chain(
        _scale_by_adam_compact(0.9, 0.999, 1e-8, jnp.float32),
        optax.scale(-1e-3))
    ref_s, cmp_s = ref_tx.init(params), cmp_tx.init(params)
    ref_p = cmp_p = params
    for i in range(5):
        g = jax.tree.map(
            lambda p: jnp.sin(p + i) * 0.1 + p * 0.01, ref_p)
        ref_u, ref_s = ref_tx.update(g, ref_s, ref_p)
        cmp_u, cmp_s = cmp_tx.update(g, cmp_s, cmp_p)
        ref_p = optax.apply_updates(ref_p, ref_u)
        cmp_p = optax.apply_updates(cmp_p, cmp_u)
    for a, b in zip(jax.tree_util.tree_leaves(ref_p),
                    jax.tree_util.tree_leaves(cmp_p)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-5)


def test_make_adam_f32_is_plain_optax_adam():
    tx = make_adam(1e-3)
    st = tx.init({"w": jnp.zeros((2,))})
    assert _moment_dtypes(st) == {jnp.dtype(jnp.float32)}


def test_bf16_moments_train_close_to_f32():
    """Tiny VAE, 5 repeated-batch steps per mode: bf16-moment leaves are
    bfloat16, the loss decreases, and the trajectory tracks f32 within a
    few percent (moments round at store; math is f32)."""
    x = jax.random.uniform(jax.random.key(0), (4, 32, 32, 3),
                           jnp.float32, -1.0, 1.0)
    losses = {}
    for mode in ("float32", "bfloat16"):
        exp = create_vae_experiment(tiny_cfg(optimizer_dtype=mode),
                                    jax.random.key(1))
        expect = (jnp.dtype(jnp.bfloat16) if mode == "bfloat16"
                  else jnp.dtype(jnp.float32))
        assert _moment_dtypes(exp.state.opt_state) == {expect}, mode
        state, ls = exp.state, []
        for i in range(5):
            state, m = exp.train_step(state, x, jax.random.key(i))
            ls.append(float(m["loss"]))
        assert all(np.isfinite(ls)), mode
        assert ls[-1] < ls[0], mode
        assert _moment_dtypes(state.opt_state) == {expect}, mode
        losses[mode] = ls
    np.testing.assert_allclose(losses["bfloat16"], losses["float32"],
                               rtol=0.05)


def test_bf16_moments_gan_step():
    """The DCGAN loop shares make_adam; one bf16-moments step runs with
    finite metrics and bf16 moment leaves on both G and D states."""
    from disentangle_mlp_tpu.train.gan import create_gan_experiment
    x = jax.random.uniform(jax.random.key(0), (4, 32, 32, 3),
                           jnp.float32, -1.0, 1.0)
    exp = create_gan_experiment(tiny_cfg(optimizer_dtype="bfloat16"),
                                jax.random.key(2))
    g, d, m = exp.train_step(exp.g_state, exp.d_state, x, jax.random.key(3))
    assert np.isfinite(float(m["errD"])) and np.isfinite(float(m["errG"]))
    assert _moment_dtypes(g.opt_state) == {jnp.dtype(jnp.bfloat16)}
    assert _moment_dtypes(d.opt_state) == {jnp.dtype(jnp.bfloat16)}


def test_bf16_moments_vaegan_intent_split_states(tmp_path):
    """freeze_mode=intent keeps the split {dec, enc} Adam states
    (train/vaegan.py:111-117); bf16 moments must thread through that
    structurally different opt-state tree, one 3-phase step must run
    finite, and the cross-mode checkpoint normalization must handle the
    split tree too."""
    from disentangle_mlp_tpu.train.vaegan import create_vaegan_experiment
    x = jax.random.uniform(jax.random.key(0), (4, 32, 32, 3),
                           jnp.float32, -1.0, 1.0)
    exp = create_vaegan_experiment(
        tiny_cfg(beta=25.0, freeze_mode="intent",
                 optimizer_dtype="bfloat16"),
        jax.random.key(4))
    assert set(exp.eg_state.opt_state) == {"dec", "enc"}
    assert _moment_dtypes(exp.eg_state.opt_state) == \
        {jnp.dtype(jnp.bfloat16)}
    eg, d, m = exp.train_step(exp.eg_state, exp.d_state, x,
                              jax.random.key(5))
    assert all(np.isfinite(float(v)) for v in m.values())
    assert _moment_dtypes(eg.opt_state) == {jnp.dtype(jnp.bfloat16)}

    # f32-intent checkpoint → bf16-intent template: split tree normalizes
    exp32 = create_vaegan_experiment(tiny_cfg(freeze_mode="intent"),
                                     jax.random.key(4))
    path = str(tmp_path / "model_1")
    save_checkpoint(path, 0, {"eg": exp32.eg_state, "d": exp32.d_state})
    _, restored = load_checkpoint(path, {"eg": exp.eg_state,
                                         "d": exp.d_state})
    assert _moment_dtypes(restored["eg"].opt_state) == \
        {jnp.dtype(jnp.bfloat16)}


def test_checkpoint_resumes_across_optimizer_dtype(tmp_path):
    """An f32-moments checkpoint loads into a bf16-mode experiment (and
    back): load_checkpoint normalizes restored leaves to the template's
    dtypes, so resume never hits a signature-mismatch recompile."""
    exp32 = create_vae_experiment(tiny_cfg(), jax.random.key(1))
    x = jax.random.uniform(jax.random.key(0), (4, 32, 32, 3),
                           jnp.float32, -1.0, 1.0)
    state, _ = exp32.train_step(exp32.state, x, jax.random.key(2))
    path = str(tmp_path / "model_1")
    save_checkpoint(path, 0, {"vae": state})

    exp16 = create_vae_experiment(tiny_cfg(optimizer_dtype="bfloat16"),
                                  jax.random.key(1))
    _, restored = load_checkpoint(path, {"vae": exp16.state})
    assert _moment_dtypes(restored["vae"].opt_state) == \
        {jnp.dtype(jnp.bfloat16)}
    # params stay f32 and carry the trained values
    p = jax.tree_util.tree_leaves(restored["vae"].params)[0]
    assert p.dtype == jnp.float32
    # and the restored state steps fine in the bf16-mode program
    state2, m = exp16.train_step(restored["vae"], x, jax.random.key(3))
    assert np.isfinite(float(m["loss"]))
    assert _moment_dtypes(state2.opt_state) == {jnp.dtype(jnp.bfloat16)}
