"""Birds model family (multi-dataset capability parity; unused by the
reference's experiments but part of its model inventory — SURVEY.md C8,
reference: models/model.py:16-100), NHWC.

- ``BirdsEncoder``: ResNet-18 features → μ/logσ² heads; ``__call__``
  returns (z, kld_per_sample) like Encoder_birds.forward
  (model.py:27-38; per-sample KLD, summed over latent dim only).
- ``BirdsGenerator``: DCGAN ConvT stack z → 512·4·4 → … → 3×128×128 Tanh
  (model.py:41-67, including its LeakyReLU on the fifth stage).
- ``BirdsDiscriminator``: 4×4-stride-2 conv ladder, final 4×4 valid conv +
  Sigmoid; returns (prob, avg-pooled conv features) (model.py:70-100).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax

from .resnet import ResNet18Features

Dtype = Any


class BirdsEncoder(nn.Module):
    n_z: int = 128
    dtype: Dtype = jnp.float32

    def setup(self):
        self.resnet = ResNet18Features(dtype=self.dtype)
        self.x_to_mu = nn.Dense(self.n_z)
        self.x_to_logvar = nn.Dense(self.n_z)

    def reparameterize(self, feats: jax.Array) -> Tuple[jax.Array, jax.Array]:
        mu = self.x_to_mu(feats)
        logvar = self.x_to_logvar(feats)
        eps = jax.random.normal(self.make_rng("reparam"), mu.shape)
        z = mu + eps * jnp.exp(0.5 * logvar)
        kld = -0.5 * jnp.sum(
            1.0 + logvar - jnp.square(mu) - jnp.exp(logvar), axis=1)
        return z, kld

    def __call__(self, x: jax.Array, train: bool = True):
        return self.reparameterize(self.resnet(x, train=train))


def _convT(features, kernel, stride, padding, use_bias=False, dtype=jnp.float32):
    """PyTorch-style ConvTranspose via input dilation (see layers.py)."""
    class _CT(nn.Module):
        @nn.compact
        def __call__(self, x):
            in_ch = x.shape[-1]
            k = self.param("kernel", nn.initializers.normal(0.02),
                           (kernel, kernel, in_ch, features))
            pad = kernel - 1 - padding
            y = lax.conv_general_dilated(
                x.astype(dtype), k.astype(dtype), (1, 1),
                ((pad, pad), (pad, pad)), lhs_dilation=(stride, stride),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return y
    return _CT()


class BirdsGenerator(nn.Module):
    n_z: int = 128
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jax.Array, train: bool = True) -> jax.Array:
        dt = self.dtype
        bn = lambda h: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=jnp.float32)(h).astype(dt)
        x = z.reshape(z.shape[0], 1, 1, z.shape[-1])
        x = nn.relu(_convT(512, 4, 1, 0, dtype=dt)(x))          # 1→4
        x = nn.relu(bn(_convT(384, 4, 2, 1, dtype=dt)(x)))      # 4→8
        x = nn.relu(bn(_convT(192, 4, 2, 1, dtype=dt)(x)))      # 8→16
        x = nn.relu(bn(_convT(96, 4, 2, 1, dtype=dt)(x)))       # 16→32
        x = nn.leaky_relu(bn(_convT(64, 4, 2, 1, dtype=dt)(x)), 0.01)  # 32→64
        x = _convT(3, 4, 2, 1, dtype=dt)(x)                     # 64→128
        return jnp.tanh(x).astype(dt)


class BirdsDiscriminator(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True,
                 return_logits: bool = False):
        dt = self.dtype
        conv = lambda ch, h: nn.Conv(
            ch, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)),
            use_bias=False, kernel_init=nn.initializers.normal(0.02),
            dtype=dt)(h)
        bn = lambda h: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=jnp.float32)(h).astype(dt)
        lrelu = lambda h: nn.leaky_relu(h, 0.2)
        h = lrelu(conv(64, x))
        h = lrelu(bn(conv(128, h)))
        h = lrelu(bn(conv(256, h)))
        h = lrelu(bn(conv(512, h)))
        f_d = lrelu(bn(conv(512, h)))              # (B, 4, 4, 512)
        logit = nn.Conv(1, (4, 4), padding="VALID",
                        kernel_init=nn.initializers.normal(0.02),
                        dtype=dt)(f_d).reshape(x.shape[0]).astype(jnp.float32)
        # return_logits: bounded-gradient BCE inside train steps (the
        # framework-wide logits-BCE invariant; compare gan.py)
        out = logit if return_logits else jax.nn.sigmoid(logit)
        feats = jnp.mean(f_d, axis=(1, 2)).astype(jnp.float32)  # avg-pool 4×4
        return out, feats
