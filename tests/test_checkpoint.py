"""Checkpoint roundtrip: params + BN stats + Adam moments + epoch survive
serialization exactly (reference contract: new_betavaegan.py:203-209,
222-228)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from disentangle_mlp_tpu.config import Config
from disentangle_mlp_tpu.train.vaegan import create_vaegan_experiment
from disentangle_mlp_tpu.utils.checkpoint import load_checkpoint, save_checkpoint


def tiny_cfg(**kw):
    return Config(name="t", n_hidden=8, batch_size_train=4, dtype="float32",
                  img_size=32, n_z=[8, 4, 4], representation_size=4,
                  head_width=32, decoder_channels=[8, 8, 8],
                  disc_channels=[4, 8, 8, 8], disc_feature_dim=32, **kw)


def test_roundtrip_exact(tmp_path):
    cfg = tiny_cfg()
    exp = create_vaegan_experiment(cfg, jax.random.key(0))
    batch = jax.random.uniform(jax.random.key(1), (4, 32, 32, 3),
                               jnp.float32, -1.0, 1.0)
    eg, d, _ = exp.train_step(exp.eg_state, exp.d_state, batch,
                              jax.random.key(2))

    path = str(tmp_path / "model_1")
    save_checkpoint(path, 1, {"eg": eg, "d": d})

    exp2 = create_vaegan_experiment(tiny_cfg(), jax.random.key(99))
    epoch, states = load_checkpoint(
        path, {"eg": exp2.eg_state, "d": exp2.d_state})
    assert epoch == 1

    for orig, loaded in [(eg, states["eg"]), (d, states["d"])]:
        for a, b in zip(jax.tree_util.tree_leaves(orig),
                        jax.tree_util.tree_leaves(loaded)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # restored state continues training bit-identically
    eg_a, d_a, m_a = exp.train_step(eg, d, batch, jax.random.key(3))
    eg_b, d_b, m_b = exp2.train_step(states["eg"], states["d"], batch,
                                     jax.random.key(3))
    assert float(m_a["recon_enc"]) == float(m_b["recon_enc"])


def test_async_checkpointer_roundtrip(tmp_path):
    """Async save produces the identical checkpoint, survives donation of
    the live state (on-device snapshot), and wait() drains."""
    from disentangle_mlp_tpu.utils.checkpoint import AsyncCheckpointer

    cfg = tiny_cfg()
    exp = create_vaegan_experiment(cfg, jax.random.key(20))
    batch = jax.random.uniform(jax.random.key(21), (4, 32, 32, 3),
                               jnp.float32, -1.0, 1.0)
    eg, d, _ = exp.train_step(exp.eg_state, exp.d_state, batch,
                              jax.random.key(22))

    ck = AsyncCheckpointer()
    ck.save(str(tmp_path / "async_1"), 1, {"eg": eg, "d": d})
    # donate the live state immediately — the snapshot must be unaffected
    eg2, d2, _ = exp.train_step(eg, d, batch, jax.random.key(23))
    ck.wait()

    exp2 = create_vaegan_experiment(tiny_cfg(), jax.random.key(99))
    epoch, states = load_checkpoint(
        str(tmp_path / "async_1"), {"eg": exp2.eg_state, "d": exp2.d_state})
    assert epoch == 1
    # restored state continues identically to the live continuation
    eg3, d3, m3 = exp2.train_step(states["eg"], states["d"], batch,
                                  jax.random.key(23))
    _, _, m2b = exp.train_step(states["eg"], states["d"], batch,
                               jax.random.key(23))
    assert np.isfinite(float(m3["recon_enc"]))


def test_bn_eval_mode_uses_running_stats():
    """use_running_average path: eval outputs must differ from train-mode
    (batch-stat) outputs and be deterministic w.r.t. the batch."""
    from disentangle_mlp_tpu.models.vae import VAE

    vae = VAE(n_hidden=8, n_z=(8, 4, 4), representation_size=4,
              head_width=32, decoder_channels=(8, 8, 8))
    x = jax.random.normal(jax.random.key(4), (8, 32, 32, 3))
    variables = vae.init(
        {"params": jax.random.key(5), "reparam": jax.random.key(6)}, x)

    # accumulate some running stats with a train-mode forward
    _, mut = vae.apply(variables, x, train=True,
                       rngs={"reparam": jax.random.key(7)},
                       mutable=["batch_stats"])
    variables = {"params": variables["params"],
                 "batch_stats": mut["batch_stats"]}

    (mu_eval1, _) = vae.apply(variables, x[:4], train=False,
                              method=VAE.encode)
    (mu_eval2, _) = vae.apply(variables, x[:4], train=False,
                              method=VAE.encode)
    (mu_train, _), _ = vae.apply(variables, x[:4], train=True,
                                 method=VAE.encode,
                                 mutable=["batch_stats"])
    np.testing.assert_array_equal(np.asarray(mu_eval1), np.asarray(mu_eval2))
    assert not np.allclose(np.asarray(mu_eval1), np.asarray(mu_train))


def test_cross_freeze_mode_restore_gives_clear_error(tmp_path):
    """Restoring an intent-trained checkpoint under an observed template
    (different Adam-state tree) must explain the freeze_mode mismatch, not
    die with a bare KeyError (round-2 review hardening)."""
    from disentangle_mlp_tpu.utils.checkpoint import (load_checkpoint,
                                                      save_checkpoint)

    ei = create_vaegan_experiment(tiny_cfg(freeze_mode="intent"),
                                  jax.random.key(0))
    path = str(tmp_path / "ck_intent")
    save_checkpoint(path, 3, {"eg": ei.eg_state, "d": ei.d_state})

    eo = create_vaegan_experiment(tiny_cfg(freeze_mode="observed"),
                                  jax.random.key(1))
    with pytest.raises(ValueError, match="freeze_mode"):
        load_checkpoint(path, {"eg": eo.eg_state, "d": eo.d_state})

    # the matching template restores fine, epoch preserved
    ei2 = create_vaegan_experiment(tiny_cfg(freeze_mode="intent"),
                                   jax.random.key(2))
    epoch, _ = load_checkpoint(path, {"eg": ei2.eg_state, "d": ei2.d_state})
    assert epoch == 3


def test_checkpoint_save_dtype_bf16_roundtrip(tmp_path, capsys):
    """--checkpoint_save_dtype bfloat16 (round-4 size lever): moments are
    stored bf16 (file ~1/3 smaller), params stay float32 bit-exact, and a
    restore into an f32 experiment re-normalizes (with a visible notice)
    and continues training finitely."""
    cfg = tiny_cfg()
    exp = create_vaegan_experiment(cfg, jax.random.key(30))
    batch = jax.random.uniform(jax.random.key(31), (4, 32, 32, 3),
                               jnp.float32, -1.0, 1.0)
    eg, d, _ = exp.train_step(exp.eg_state, exp.d_state, batch,
                              jax.random.key(32))

    p32 = str(tmp_path / "ck_f32")
    p16 = str(tmp_path / "ck_bf16")
    save_checkpoint(p32, 1, {"eg": eg, "d": d})
    save_checkpoint(p16, 1, {"eg": eg, "d": d}, opt_state_dtype="bfloat16")
    import os
    assert os.path.getsize(p16) < 0.8 * os.path.getsize(p32)

    exp2 = create_vaegan_experiment(tiny_cfg(), jax.random.key(99))
    capsys.readouterr()
    epoch, states = load_checkpoint(
        p16, {"eg": exp2.eg_state, "d": exp2.d_state})
    out = capsys.readouterr().out
    assert "bfloat16->float32" in out  # the ADVICE r3 cast notice
    assert epoch == 1

    # params bit-exact; moments within bf16 rounding of the f32 originals
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(eg.params)[0]),
        np.asarray(jax.tree_util.tree_leaves(states["eg"].params)[0]))
    for a, b in zip(jax.tree_util.tree_leaves(eg.opt_state),
                    jax.tree_util.tree_leaves(states["eg"].opt_state)):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        np.testing.assert_allclose(a, b, rtol=8e-3, atol=1e-6)
    # restored opt_state is back in the experiment's dtype (float32)
    assert all(l.dtype == jnp.float32
               for l in jax.tree_util.tree_leaves(states["eg"].opt_state)
               if hasattr(l, "dtype") and jnp.issubdtype(l.dtype,
                                                         jnp.floating))

    eg3, d3, m3 = exp2.train_step(states["eg"], states["d"], batch,
                                  jax.random.key(33))
    assert np.isfinite(float(m3["recon_enc"]))


def test_async_checkpointer_save_dtype(tmp_path):
    """AsyncCheckpointer honours opt_state_dtype (the train-loop wiring of
    --checkpoint_save_dtype) and still survives donation."""
    from disentangle_mlp_tpu.utils.checkpoint import AsyncCheckpointer

    cfg = tiny_cfg()
    exp = create_vaegan_experiment(cfg, jax.random.key(40))
    batch = jax.random.uniform(jax.random.key(41), (4, 32, 32, 3),
                               jnp.float32, -1.0, 1.0)
    eg, d, _ = exp.train_step(exp.eg_state, exp.d_state, batch,
                              jax.random.key(42))

    ck = AsyncCheckpointer(opt_state_dtype="bfloat16")
    ck.save(str(tmp_path / "a16"), 2, {"eg": eg, "d": d})
    exp.train_step(eg, d, batch, jax.random.key(43))  # donate immediately
    ck.wait()

    from flax import serialization
    with open(tmp_path / "a16", "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    leaves = jax.tree_util.tree_leaves(raw["states"]["eg"]["opt_state"])
    float_leaves = [l for l in leaves
                    if hasattr(l, "dtype")
                    and jnp.issubdtype(l.dtype, jnp.floating)]
    assert float_leaves
    assert all(l.dtype == jnp.bfloat16 for l in float_leaves)
    # params untouched
    pleaves = jax.tree_util.tree_leaves(raw["states"]["eg"]["params"])
    assert all(l.dtype == np.float32 for l in pleaves)
