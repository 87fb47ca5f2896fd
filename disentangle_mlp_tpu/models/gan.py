"""CelebA DCGAN generator and feature-returning discriminator, NHWC.

Parity targets:
- ``GeneratorCeleba`` = the reference's ``Generator_celeba``
  (reference: models/model.py:331-378), architecturally identical to the
  VAE decoder; implemented by reusing :class:`CelebaDecoder`.
- ``DiscriminatorCeleba`` = ``Discriminator_celeba`` (model.py:381-416):
  Conv(3→32, s1) → Conv(32→128, s2) → Conv(128→256, s2) → Conv(256→256, s2),
  each 5×5 pad 2 + BN + LeakyReLU(0.2); flatten 8·8·256 →
  Linear→2048 + LeakyReLU (the ``Dis_l`` feature layer used by the
  feature-wise similarity loss, new_betavaegan.py:67-69,160) →
  Linear 2048→1 + Sigmoid. ``__call__`` returns (probability, features),
  matching model.py:410-416.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import BatchNorm, TorchConv, TorchLinear, flatten_batch
from .vae import CelebaDecoder

Dtype = Any


class GeneratorCeleba(CelebaDecoder):
    """Latent (B, n_hidden) → image (B, 64, 64, 3) in [-1, 1]."""


class DiscriminatorCeleba(nn.Module):
    n_z: Sequence[int] = (256, 8, 8)
    input_channels: int = 3
    channels: Sequence[int] = (32, 128, 256, 256)  # conv widths (model.py:388-400)
    feature_dim: int = 2048
    dtype: Dtype = jnp.float32
    bn_axis_name: Any = None
    bn_groups: int = 1

    def setup(self):
        dt = self.dtype
        c1, c2, c3, c4 = self.channels
        bn = lambda: BatchNorm(dtype=dt, axis_name=self.bn_axis_name,
                               groups=self.bn_groups)
        self.conv1, self.bn1 = TorchConv(c1, 5, stride=1, padding=2, dtype=dt), bn()
        self.conv2, self.bn2 = TorchConv(c2, 5, stride=2, padding=2, dtype=dt), bn()
        self.conv3, self.bn3 = TorchConv(c3, 5, stride=2, padding=2, dtype=dt), bn()
        self.conv4, self.bn4 = TorchConv(c4, 5, stride=2, padding=2, dtype=dt), bn()
        self.lth_features = TorchLinear(self.feature_dim, dtype=dt)
        self.sigmoid_output = TorchLinear(1, dtype=dt)

    def __call__(self, x: jax.Array, train: bool = True,
                 return_logits: bool = False) -> Tuple[jax.Array, jax.Array]:
        """(probability, Dis_l features) like the reference (model.py:410-416).
        With ``return_logits=True`` the first output is the pre-sigmoid
        logit — the numerically safe input for bce_logits in train steps."""
        ura = not train
        lrelu = lambda h: nn.leaky_relu(h, negative_slope=0.2)
        h = lrelu(self.bn1(self.conv1(x), ura))
        h = lrelu(self.bn2(self.conv2(h), ura))
        h = lrelu(self.bn3(self.conv3(h), ura))
        h = lrelu(self.bn4(self.conv4(h), ura))
        features = lrelu(self.lth_features(flatten_batch(h))).astype(jnp.float32)
        logit = jnp.squeeze(self.sigmoid_output(features).astype(jnp.float32),
                            axis=-1)
        if return_logits:
            return logit, features
        return jax.nn.sigmoid(logit), features
