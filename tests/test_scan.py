"""Multi-step scan driver: K steps per dispatch must match K sequential
jitted dispatches (same rng folding) for the flagship experiment."""

import jax
import jax.numpy as jnp
import numpy as np

from disentangle_mlp_tpu.config import Config
from disentangle_mlp_tpu.train.scan import make_multi_step
from disentangle_mlp_tpu.train.vaegan import create_vaegan_experiment


def tiny_cfg():
    return Config(name="t", n_hidden=8, batch_size_train=4, dtype="float32",
                  img_size=32, n_z=[8, 4, 4], representation_size=4,
                  head_width=32, decoder_channels=[8, 8, 8],
                  disc_channels=[4, 8, 8, 8], disc_feature_dim=32, beta=25.0)


def test_single_scan_step_matches_jitted_step():
    """K=1: the scanned body computes the same phase metrics as the plain
    jitted step. (Parameter bit-identity is not asserted: Adam's first-step
    update is sign(g)-like, so one-ULP reduction-order differences between
    the two compiled programs legitimately flip near-zero updates.)"""
    batches = jax.random.uniform(jax.random.key(0), (1, 4, 32, 32, 3),
                                 jnp.float32, -1.0, 1.0)
    rng = jax.random.key(7)

    exp1 = create_vaegan_experiment(tiny_cfg(), jax.random.key(1))
    eg, d, m = exp1.train_step(exp1.eg_state, exp1.d_state, batches[0],
                               jax.random.fold_in(rng, 0))

    exp2 = create_vaegan_experiment(tiny_cfg(), jax.random.key(1))
    multi = make_multi_step(exp2.step_fn, n_states=2)
    eg2, d2, metrics = multi(exp2.eg_state, exp2.d_state, batches, rng)

    # phase-1/2 metrics are exact; phase-3 metrics sit downstream of two
    # in-step updates, where the reassociation drift shows up
    np.testing.assert_allclose(float(m["dis"]),
                               float(metrics["dis"][0]), rtol=1e-6)
    np.testing.assert_allclose(float(m["sim"]),
                               float(metrics["sim"][0]), rtol=1e-4)
    np.testing.assert_allclose(float(m["recon_enc"]),
                               float(metrics["recon_enc"][0]), rtol=1e-4)
    np.testing.assert_allclose(float(m["kld"]),
                               float(metrics["kld"][0]), rtol=1e-3)


def test_multi_scan_steps_track_sequential():
    """K=3: per-step metrics track the sequential run. Bit-identity of
    params is NOT expected — one-ULP reassociation differences are
    chaotically amplified by Adam+GAN dynamics — but the loss trajectory
    must match closely."""
    K = 3
    batches = jax.random.uniform(jax.random.key(0), (K, 4, 32, 32, 3),
                                 jnp.float32, -1.0, 1.0)
    rng = jax.random.key(7)

    exp1 = create_vaegan_experiment(tiny_cfg(), jax.random.key(1))
    eg, d = exp1.eg_state, exp1.d_state
    seq_metrics = []
    for i in range(K):
        eg, d, m = exp1.train_step(eg, d, batches[i],
                                   jax.random.fold_in(rng, i))
        seq_metrics.append(float(m["recon_enc"]))

    exp2 = create_vaegan_experiment(tiny_cfg(), jax.random.key(1))
    multi = make_multi_step(exp2.step_fn, n_states=2)
    _, _, metrics = multi(exp2.eg_state, exp2.d_state, batches, rng)
    scan_metrics = np.asarray(metrics["recon_enc"])

    assert scan_metrics.shape == (K,)
    np.testing.assert_allclose(scan_metrics, seq_metrics, rtol=1e-3)
