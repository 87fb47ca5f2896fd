"""Loss functions with exact PyTorch-reduction semantics.

The reference mixes three loss families (all float32 math here regardless of
model compute dtype):

- ``bce``: torch.nn.BCELoss (mean reduction, log clamped at -100) applied to
  sigmoid probabilities — used for every real/fake objective
  (reference: experiments/new_betavaegan.py:53,101,118,153-154 and
  new_gan.py:68,92,106,123).
- ``kld``: unweighted KL divergence −½·Σ(1 + logσ² − μ² − exp(logσ²)),
  summed over batch and latent dim (new_vae.py:46; the β weight is applied
  by the caller, matching new_betavaegan.py:64-65).
- ``sim_loss``: the Larsen et al. feature-wise ("Dis_l") similarity loss,
  0.5·Σ(f_recon − f_real)² over the discriminator's 2048-d penultimate
  features (new_betavaegan.py:67-69).
- ``reconstruction_loss``: sum-reduction pixel MSE (new_betavaegan.py:71-75,
  new_vae.py:40).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# torch.nn.BCELoss clamps each log term at -100 for p → 0/1 stability.
_LOG_CLAMP = -100.0


_F32_TINY = float(np.finfo(np.float32).tiny)


def _log_clamped(x: jax.Array) -> jax.Array:
    """log(x) with torch BCELoss's value clamp max(log x, −100) and a
    finite VJP at x = 0. Every normal float32 has log ≥ −87.34; below
    _F32_TINY (denormals and 0) the value is max(log x, −100) computed
    through stop_gradient, so the VJP stays 0 there instead of
    1/denormal = inf.

    Known deviation (PARITY.md): XLA flushes float32 denormals to zero in
    EVERY op (measured: ``x * 2**64`` of a denormal is 0 on the CPU
    backend), so denormal probabilities p ∈ (0, 1.2e−38) behave as 0 and
    take the −100 clamp, where torch-on-CPU returns the true
    log p ∈ (−87.3, −104). Unreachable from any [0,1]-producing op under
    the same flushing; asserted by
    tests/test_losses.py::test_bce_denormal_probs_flush_to_clamp."""
    safe = jnp.log(jnp.maximum(x, _F32_TINY))  # grad 0 where the max clamps
    denorm = jnp.maximum(jnp.log(jax.lax.stop_gradient(x)),
                         jnp.float32(_LOG_CLAMP))
    return jnp.where(x < _F32_TINY, denorm, safe)


def _log1m_clamped(p: jax.Array) -> jax.Array:
    """log(1−p) with the same −100 clamp at p = 1 and a finite VJP there.
    Split at 0.5: below, log1p is accurate for small p; above, 1−p is an
    EXACT float32 subtraction (Sterbenz), so _log_clamped handles the p = 1
    endpoint. Each branch's input is clamped into its own safe range so the
    untaken branch cannot inject inf into the VJP (0·inf = NaN)."""
    small = jnp.log1p(-jnp.minimum(p, 0.5))
    large = _log_clamped(1.0 - jnp.maximum(p, 0.5))
    return jnp.where(p > 0.5, large, small)


def bce(probs: jax.Array, targets: jax.Array) -> jax.Array:
    """Binary cross entropy on probabilities, mean reduction — value-exact
    vs torch.nn.BCELoss over the float32 domain, including the p ∈ {0, 1}
    endpoints where torch clamps each log term at −100. The VJP is finite
    everywhere (zero where a clamp is active). Prefer :func:`bce_logits`
    inside training steps (bounded gradients under saturation)."""
    probs = probs.astype(jnp.float32)
    targets = jnp.broadcast_to(jnp.asarray(targets, jnp.float32), probs.shape)
    return -jnp.mean(targets * _log_clamped(probs)
                     + (1.0 - targets) * _log1m_clamped(probs))


def bce_logits(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Binary cross entropy on raw logits, mean reduction.

    Equals bce(sigmoid(logits), t) with the numerically exact formulation
    max(l,0) − l·t + log(1+e^{−|l|}); its gradient σ(l) − t is bounded, so a
    saturated discriminator cannot produce inf/NaN gradients — the failure
    mode of prob-space BCE that the reference never hits only because torch
    BCELoss clamps its backward internally. Used by the GAN/VAE-GAN steps
    (loss combinations unchanged — new_betavaegan.py:101,118,153-154)."""
    logits = logits.astype(jnp.float32)
    targets = jnp.broadcast_to(jnp.asarray(targets, jnp.float32), logits.shape)
    return jnp.mean(jnp.maximum(logits, 0.0) - logits * targets
                    + jnp.log1p(jnp.exp(-jnp.abs(logits))))


def kld(mu: jax.Array, logvar: jax.Array) -> jax.Array:
    """−½ Σ (1 + logσ² − μ² − σ²), summed over all elements."""
    mu = mu.astype(jnp.float32)
    logvar = logvar.astype(jnp.float32)
    return -0.5 * jnp.sum(1.0 + logvar - jnp.square(mu) - jnp.exp(logvar))


def sim_loss(features_recon: jax.Array, features_real: jax.Array) -> jax.Array:
    """0.5 · Σ (Dis_l(x̂) − Dis_l(x))² — feature-wise similarity."""
    diff = features_recon.astype(jnp.float32) - features_real.astype(jnp.float32)
    return 0.5 * jnp.sum(jnp.square(diff))


def reconstruction_loss(recon_x: jax.Array, x: jax.Array) -> jax.Array:
    """Sum-reduction pixel MSE."""
    diff = recon_x.astype(jnp.float32) - x.astype(jnp.float32)
    return jnp.sum(jnp.square(diff))


def vae_loss(recon_x: jax.Array, x: jax.Array, mu: jax.Array,
             logvar: jax.Array) -> jax.Array:
    """Plain-VAE objective: MSE_sum + KLD (reference: new_vae.py:39-48)."""
    return reconstruction_loss(recon_x, x) + kld(mu, logvar)
