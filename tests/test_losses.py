"""Golden-value loss tests vs torch (the reference's loss definitions:
new_betavaegan.py:64-75, new_vae.py:39-48)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from disentangle_mlp_tpu.ops.losses import (
    bce, bce_logits, kld, reconstruction_loss, sim_loss, vae_loss)

rng = np.random.default_rng(0)


def test_bce_matches_torch():
    p = rng.uniform(1e-4, 1 - 1e-4, size=(64,)).astype(np.float32)
    for target in (0.1, 0.9):
        ours = float(bce(jnp.asarray(p), target))
        theirs = float(F.binary_cross_entropy(
            torch.from_numpy(p), torch.full((64,), target)))
        assert abs(ours - theirs) < 1e-5


def test_bce_matches_torch_full_domain():
    """Value parity down to the p ∈ {0, 1} endpoints, where torch clamps
    each log term at −100 (the round-1 deviation: a 1e-7 prob clip capped
    the value at ≈16.1 instead of torch's 100)."""
    # smallest NORMAL f32 upward: denormals are flushed to zero on TPU, so
    # they are documented as clamping to −100 (losses.py _log_clamped)
    p = np.array([0.0, np.finfo(np.float32).tiny, 1e-30, 1e-20, 1e-10,
                  1e-7, 1e-4, 0.5, 1 - 1e-4, 1 - 1e-7, 1.0], np.float32)
    for target in (0.0, 0.1, 0.9, 1.0):
        ours = float(bce(jnp.asarray(p), target))
        theirs = float(F.binary_cross_entropy(
            torch.from_numpy(p), torch.full((len(p),), target)))
        np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


def test_bce_extreme_probs_finite_value_and_grad():
    p = jnp.asarray([0.0, 1.0, 0.5])
    assert np.isfinite(float(bce(p, 0.9)))
    # the gradient must be finite at saturated probabilities too (clamping
    # only the log value leaves a 0·inf NaN in the VJP)
    g = jax.grad(lambda q: bce(q, 0.9))(p)
    assert np.all(np.isfinite(np.asarray(g)))


def test_bce_logits_matches_torch():
    logits = rng.normal(size=(64,)).astype(np.float32) * 5.0
    for target in (0.1, 0.9):
        ours = float(bce_logits(jnp.asarray(logits), target))
        theirs = float(F.binary_cross_entropy_with_logits(
            torch.from_numpy(logits), torch.full((64,), target)))
        assert abs(ours - theirs) < 1e-5
    # bounded gradient even at extreme logits
    big = jnp.asarray([-1e4, 1e4])
    g = jax.grad(lambda l: bce_logits(l, 0.9))(big)
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.all(np.abs(np.asarray(g)) <= 1.0)


def test_kld_matches_torch():
    mu = rng.normal(size=(8, 16)).astype(np.float32)
    logvar = rng.normal(size=(8, 16)).astype(np.float32)
    ours = float(kld(jnp.asarray(mu), jnp.asarray(logvar)))
    mu_t, lv_t = torch.from_numpy(mu), torch.from_numpy(logvar)
    theirs = float(-0.5 * torch.sum(1 + lv_t - mu_t.pow(2) - lv_t.exp()))
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)


def test_sim_and_recon_match_torch():
    a = rng.normal(size=(4, 2048)).astype(np.float32)
    b = rng.normal(size=(4, 2048)).astype(np.float32)
    ours = float(sim_loss(jnp.asarray(a), jnp.asarray(b)))
    theirs = float(0.5 * F.mse_loss(torch.from_numpy(a), torch.from_numpy(b),
                                    reduction="sum"))
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)

    x = rng.normal(size=(4, 8, 8, 3)).astype(np.float32)
    y = rng.normal(size=(4, 8, 8, 3)).astype(np.float32)
    ours = float(reconstruction_loss(jnp.asarray(x), jnp.asarray(y)))
    theirs = float(F.mse_loss(torch.from_numpy(x), torch.from_numpy(y),
                              reduction="sum"))
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)


def test_vae_loss_composition():
    x = rng.normal(size=(2, 4, 4, 3)).astype(np.float32)
    r = rng.normal(size=(2, 4, 4, 3)).astype(np.float32)
    mu = rng.normal(size=(2, 8)).astype(np.float32)
    lv = rng.normal(size=(2, 8)).astype(np.float32)
    total = float(vae_loss(jnp.asarray(r), jnp.asarray(x),
                           jnp.asarray(mu), jnp.asarray(lv)))
    parts = float(reconstruction_loss(jnp.asarray(r), jnp.asarray(x))) + \
        float(kld(jnp.asarray(mu), jnp.asarray(lv)))
    np.testing.assert_allclose(total, parts, rtol=1e-6)


def test_bce_denormal_probs_flush_to_clamp():
    """Documented deviation (PARITY.md / ops/losses.py): XLA flushes f32
    denormals to zero in every op, so denormal probabilities take the -100
    clamp (torch-on-CPU would return the true log in (-87.3, -104) for the
    larger denormals). The clamp value and a finite VJP are the contract
    here; torch agrees wherever the backend can represent the input."""
    probs = np.array([1e-40, 1e-44, 1.4e-45, 0.0], np.float32)
    targets = np.ones_like(probs)
    ours = float(bce(jnp.asarray(probs), jnp.asarray(targets)))
    np.testing.assert_allclose(ours, 100.0, rtol=1e-6)
    # torch on the SAME effective input (flushed to zero) matches exactly
    want = float(torch.nn.BCELoss()(torch.from_numpy(np.zeros(4, np.float32)),
                                    torch.from_numpy(targets)))
    np.testing.assert_allclose(ours, want, rtol=1e-6)
    # VJP stays finite at the denormal/zero inputs
    g = jax.grad(lambda p: bce(p, jnp.asarray(targets)))(jnp.asarray(probs))
    assert np.isfinite(np.asarray(g)).all()
