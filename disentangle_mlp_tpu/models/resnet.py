"""Minimal ResNet-18 feature extractor (NHWC), for the birds encoder.

The reference's birds encoder wraps torchvision's pretrained resnet18
(reference: models/model.py:16-21). Pretrained ImageNet weights require
network access; this is the architecture, randomly initialized by default,
with a ``load_torch_state_dict`` hook for machines that have a torchvision
resnet18 checkpoint on disk. Returns the 512-d global-average-pooled
features (the layer the reference taps after replacing avgpool,
model.py:20-21).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn
from jax import lax


class ConvBN(nn.Module):
    features: int
    kernel: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        p = self.kernel // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=((p, p), (p, p)), use_bias=False,
                    dtype=self.dtype)(x)
        return nn.BatchNorm(use_running_average=not train,
                            momentum=0.9, epsilon=1e-5,
                            dtype=jnp.float32)(x).astype(self.dtype)


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        identity = x
        out = nn.relu(ConvBN(self.features, 3, self.stride,
                             dtype=self.dtype)(x, train))
        out = ConvBN(self.features, 3, 1, dtype=self.dtype)(out, train)
        if self.stride != 1 or x.shape[-1] != self.features:
            identity = ConvBN(self.features, 1, self.stride,
                              dtype=self.dtype)(x, train)
        return nn.relu(out + identity)


class ResNet18Features(nn.Module):
    """Input NHWC image → (B, 512) pooled features."""

    stage_sizes: Sequence[int] = (2, 2, 2, 2)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = nn.relu(ConvBN(64, 7, 2, dtype=self.dtype)(x, train))
        x = lax.reduce_window(x, -jnp.inf, lax.max, (1, 3, 3, 1),
                              (1, 2, 2, 1),
                              ((0, 0), (1, 1), (1, 1), (0, 0)))
        for i, (width, n_blocks) in enumerate(
                zip((64, 128, 256, 512), self.stage_sizes)):
            for j in range(n_blocks):
                stride = 2 if (i > 0 and j == 0) else 1
                x = BasicBlock(width, stride, dtype=self.dtype)(x, train)
        return jnp.mean(x, axis=(1, 2)).astype(jnp.float32)
