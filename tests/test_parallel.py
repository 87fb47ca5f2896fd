"""Data-parallel correctness on an 8-device virtual CPU mesh: the sharded
step must (a) run with batch sharded along axis 0 and params replicated,
(b) produce the same numbers as the unsharded step (the reference's implicit
DataParallel contract — new_betavaegan.py:42-44 — made exact by global-batch
BN under SPMD)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from disentangle_mlp_tpu.config import Config
from disentangle_mlp_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                               replicate, shard_batch)
from disentangle_mlp_tpu.train.vaegan import create_vaegan_experiment


def tiny_cfg(**kw):
    return Config(name="t", n_hidden=16, batch_size_train=8,
                  dtype="float32", lr=1e-3, img_size=32,
                  n_z=[8, 4, 4], representation_size=4, head_width=32,
                  decoder_channels=[8, 8, 8], disc_channels=[4, 8, 8, 8],
                  disc_feature_dim=32, **kw)


@pytest.fixture(scope="module")
def batch():
    return jax.random.uniform(
        jax.random.key(0), (8, 32, 32, 3), jnp.float32, -1.0, 1.0)


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_vaegan_step_sharded_matches_unsharded(batch):
    cfg = tiny_cfg(beta=25.0)
    mesh = make_mesh()
    assert mesh.devices.size == 8

    exp1 = create_vaegan_experiment(cfg, jax.random.key(1))
    _, _, m_ref = exp1.train_step(exp1.eg_state, exp1.d_state, batch,
                                  jax.random.key(2))

    exp2 = create_vaegan_experiment(cfg, jax.random.key(1))
    eg = replicate(exp2.eg_state, mesh)
    d = replicate(exp2.d_state, mesh)
    xb = shard_batch(batch, mesh)
    assert len(xb.sharding.device_set) == 8
    eg2, d2, m_sh = exp2.train_step(eg, d, xb, jax.random.key(2))

    # rtol covers fp32 reduction-order drift across shards, amplified by
    # two Adam phases; the math is otherwise identical.
    for k in ["recon_enc", "kld", "dis"]:
        np.testing.assert_allclose(
            float(m_ref[k]), float(m_sh[k]), rtol=2e-3, err_msg=k)
    # updated params stay replicated across all 8 devices
    leaf = jax.tree_util.tree_leaves(eg2.params)[0]
    assert len(leaf.sharding.device_set) == 8


def test_scan_driver_composes_with_sharding(batch):
    """The lax.scan multi-step driver must run with replicated states and
    batch-sharded inputs (the pod-scale configuration)."""
    from disentangle_mlp_tpu.train.scan import make_multi_step

    cfg = tiny_cfg(beta=25.0)
    mesh = make_mesh()
    exp = create_vaegan_experiment(cfg, jax.random.key(5))
    multi = make_multi_step(exp.step_fn, n_states=2, donate=False)
    eg = replicate(exp.eg_state, mesh)
    d = replicate(exp.d_state, mesh)
    batches = jnp.stack([batch, batch[::-1]])
    batches = jax.device_put(
        batches, jax.NamedSharding(
            mesh, jax.sharding.PartitionSpec(None, "data")))
    eg2, d2, metrics = multi(eg, d, batches, jax.random.key(6))
    assert metrics["recon_enc"].shape == (2,)
    assert np.all(np.isfinite(np.asarray(metrics["recon_enc"])))
    leaf = jax.tree_util.tree_leaves(eg2.params)[0]
    assert len(leaf.sharding.device_set) == 8


def test_sharded_steps_keep_sharding_stable(batch):
    """Multiple chained sharded steps: no resharding churn, finite losses."""
    cfg = tiny_cfg(beta=50.0)
    mesh = make_mesh()
    exp = create_vaegan_experiment(cfg, jax.random.key(3))
    eg = replicate(exp.eg_state, mesh)
    d = replicate(exp.d_state, mesh)
    xb = shard_batch(batch, mesh)
    for i in range(3):
        eg, d, m = exp.train_step(eg, d, xb, jax.random.key(10 + i))
        assert np.isfinite(float(m["recon_enc"]))
    leaf = jax.tree_util.tree_leaves(eg.params)[0]
    assert len(leaf.sharding.device_set) == 8


def test_vaegan_intent_step_sharded_matches_unsharded(batch):
    """freeze_mode=intent (per-subtree grads, split Adam states — the fast
    production mode) must also be shard-invariant."""
    cfg = tiny_cfg(beta=25.0, freeze_mode="intent")
    mesh = make_mesh()
    exp1 = create_vaegan_experiment(cfg, jax.random.key(7))
    _, _, m_ref = exp1.train_step(exp1.eg_state, exp1.d_state, batch,
                                  jax.random.key(8))

    exp2 = create_vaegan_experiment(cfg, jax.random.key(7))
    eg = replicate(exp2.eg_state, mesh)
    d = replicate(exp2.d_state, mesh)
    eg2, _, m_sh = exp2.train_step(eg, d, shard_batch(batch, mesh),
                                   jax.random.key(8))
    for k in ["recon_enc", "kld", "dis"]:
        np.testing.assert_allclose(
            float(m_ref[k]), float(m_sh[k]), rtol=2e-3, err_msg=k)
    leaf = jax.tree_util.tree_leaves(eg2.params)[0]
    assert len(leaf.sharding.device_set) == 8


def test_vaegan_bn_groups_step_sharded_matches_unsharded(batch):
    """--bn_groups 2 reshapes the batch to (g, B/g, ...) for per-group
    statistics; under a batch-sharded mesh that split must still compile,
    execute, and agree with the unsharded step (XLA inserts whatever
    resharding the (2, B/2) view needs)."""
    cfg = tiny_cfg(beta=25.0, bn_groups=2)

    exp1 = create_vaegan_experiment(cfg, jax.random.key(1))
    _, _, m_ref = exp1.train_step(exp1.eg_state, exp1.d_state, batch,
                                  jax.random.key(2))

    mesh = make_mesh()
    exp2 = create_vaegan_experiment(cfg, jax.random.key(1))
    eg = replicate(exp2.eg_state, mesh)
    d = replicate(exp2.d_state, mesh)
    xb = shard_batch(batch, mesh)
    eg2, _, m_sh = exp2.train_step(eg, d, xb, jax.random.key(2))

    for k in ["recon_enc", "kld", "dis"]:
        np.testing.assert_allclose(
            float(m_ref[k]), float(m_sh[k]), rtol=2e-3, err_msg=k)
    leaf = jax.tree_util.tree_leaves(eg2.params)[0]
    assert len(leaf.sharding.device_set) == 8
