"""Minimal ResNet-18 feature extractor (NHWC), for the birds encoder.

The reference's birds encoder wraps torchvision's pretrained resnet18
(reference: models/model.py:16-21). Pretrained ImageNet weights require
network access; this is the architecture, randomly initialized by default,
plus :func:`load_torch_state_dict` / :func:`load_torch_checkpoint` which
convert a torchvision ``resnet18().state_dict()`` on disk into the flax
variable tree (OIHW→HWIO kernels, BN params + running stats — the same
mapping scheme as the Inception converter, eval/inception.py). Returns the
512-d global-average-pooled features (the layer the reference taps after
replacing avgpool, model.py:20-21).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Sequence

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


def _convbn_from_torch(sd: Dict, conv_key: str, bn_key: str):
    """One torch (Conv2d, BatchNorm2d) pair → ConvBN variables: kernel
    OIHW→HWIO; BN weight/bias→scale/bias, running stats→batch_stats.
    Tensor/kernel-layout helpers shared with utils/torch_compat.py."""
    from ..utils.torch_compat import conv_kernel_hwio, to_numpy as _np

    params = {
        "Conv_0": {"kernel": conv_kernel_hwio(sd[f"{conv_key}.weight"])},
        "BatchNorm_0": {"scale": _np(sd[f"{bn_key}.weight"]),
                        "bias": _np(sd[f"{bn_key}.bias"])},
    }
    stats = {
        "BatchNorm_0": {"mean": _np(sd[f"{bn_key}.running_mean"]),
                        "var": _np(sd[f"{bn_key}.running_var"])},
    }
    return params, stats


def load_torch_state_dict(sd: Dict) -> Dict:
    """torchvision ``resnet18().state_dict()`` → flax variables
    {'params', 'batch_stats'} for :class:`ResNet18Features`.

    Key layout (compact auto-naming): the stem is ``ConvBN_0``; torch
    ``layer{L}.{b}`` is ``BasicBlock_{2(L−1)+b}`` whose conv1/conv2 are
    ``ConvBN_0``/``ConvBN_1`` and whose ``downsample.{0,1}`` (present in
    layer{2,3,4}.0) is ``ConvBN_2``. The classifier ``fc.*`` is dropped —
    the reference replaces it with Identity (models/model.py:20-21)."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def put(name, pair):
        p, s = pair
        params[name] = p
        stats[name] = s

    put("ConvBN_0", _convbn_from_torch(sd, "conv1", "bn1"))
    for layer in range(1, 5):
        for b in range(2):
            idx = 2 * (layer - 1) + b
            block_p: Dict[str, Any] = {}
            block_s: Dict[str, Any] = {}
            for i, (c, bn) in enumerate(
                    [("conv1", "bn1"), ("conv2", "bn2")]):
                p, s = _convbn_from_torch(
                    sd, f"layer{layer}.{b}.{c}", f"layer{layer}.{b}.{bn}")
                block_p[f"ConvBN_{i}"] = p
                block_s[f"ConvBN_{i}"] = s
            if f"layer{layer}.{b}.downsample.0.weight" in sd:
                p, s = _convbn_from_torch(
                    sd, f"layer{layer}.{b}.downsample.0",
                    f"layer{layer}.{b}.downsample.1")
                block_p["ConvBN_2"] = p
                block_s["ConvBN_2"] = s
            params[f"BasicBlock_{idx}"] = block_p
            stats[f"BasicBlock_{idx}"] = block_s
    return {"params": params, "batch_stats": stats}


def load_torch_checkpoint(path: str):
    """Load a torchvision resnet18 checkpoint file into flax variables,
    or return None when the file is absent (no network egress here — the
    reference downloads pretrained=True, models/model.py:19)."""
    if not path or not os.path.isfile(path):
        return None
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return load_torch_state_dict(sd)
