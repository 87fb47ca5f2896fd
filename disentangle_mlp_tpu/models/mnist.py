"""MNIST model family (capability parity; unused by the reference's
experiments — SURVEY.md C9, reference: models/model.py:103-183), NHWC.

- ``MnistEncoder``: conv+BN+ReLU+maxpool stem, then per-branch conv heads
  for mean/logvar; returns (z, kld) with z flattened per sample
  (model.py:103-140 — the reference flattens across the whole batch, a
  bug; we flatten per sample, the evident intent).
- ``MnistGenerator``: 2× stride-2 ConvT to 1-channel Sigmoid output
  (model.py:143-155).
- ``MnistDiscriminator``: two valid convs → Linear 1024 features → validity
  head; returns (prob, features) (model.py:158-183).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax


def _max_pool_2x2(x):
    return lax.reduce_window(x, -jnp.inf, lax.max, (1, 2, 2, 1),
                             (1, 2, 2, 1), "VALID")


class MnistEncoder(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True
                 ) -> Tuple[jax.Array, jax.Array]:
        bn = lambda h: nn.BatchNorm(use_running_average=not train,
                                    momentum=0.9, epsilon=1e-5,
                                    dtype=jnp.float32)(h)
        h = _max_pool_2x2(nn.relu(bn(nn.Conv(16, (3, 3), padding=1)(x))))
        mu = _max_pool_2x2(nn.relu(bn(nn.Conv(4, (3, 3), padding=1)(h))))
        lv = _max_pool_2x2(nn.relu(bn(nn.Conv(4, (3, 3), padding=1)(h))))
        mu = mu.reshape(x.shape[0], -1)
        lv = lv.reshape(x.shape[0], -1)
        eps = jax.random.normal(self.make_rng("reparam"), mu.shape)
        z = mu + eps * jnp.exp(0.5 * lv)
        kld = -0.5 * jnp.sum(1.0 + lv - jnp.square(mu) - jnp.exp(lv), axis=1)
        return z, kld


class MnistGenerator(nn.Module):
    """Latent feature map (B, 7, 7, 4) for 28×28 MNIST → (B, 28, 28, C).

    ``out_channels`` defaults to the reference's hard-coded 1
    (model.py:143-155); synthetic-data runs may ask for 3 so the recon can
    feed the 3-channel discriminator/encoder (families.py passes
    cfg.input_channels)."""

    dtype: Any = jnp.float32
    out_channels: int = 1

    @nn.compact
    def __call__(self, z: jax.Array, train: bool = True) -> jax.Array:
        h = nn.ConvTranspose(16, (2, 2), strides=(2, 2))(z)
        h = nn.relu(h)
        h = nn.ConvTranspose(self.out_channels, (2, 2), strides=(2, 2))(h)
        return jax.nn.sigmoid(h)


class MnistDiscriminator(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True,
                 return_logits: bool = False):
        bn = lambda h: nn.BatchNorm(use_running_average=not train,
                                    momentum=0.9, epsilon=1e-5,
                                    dtype=jnp.float32)(h)
        h = nn.relu(bn(nn.Conv(6, (3, 3), padding="VALID")(x)))
        h = nn.relu(bn(nn.Conv(12, (3, 3), padding="VALID")(h)))
        feats = nn.relu(nn.Dense(1024)(h.reshape(x.shape[0], -1)))
        logit = nn.Dense(1)(feats).reshape(x.shape[0])
        # return_logits: bounded-gradient BCE inside train steps (the
        # framework-wide logits-BCE invariant; compare gan.py)
        out = logit if return_logits else jax.nn.sigmoid(logit)
        return out, feats
