"""Building-block layers with PyTorch-parity shape semantics, NHWC layout.

The reference's models (reference: models/model.py) are plain torch.nn
stacks: Conv2d / ConvTranspose2d(output_size=...) / Linear / BatchNorm with
DCGAN init (model.py:8-13). Here each is re-expressed TPU-first:

- NHWC layout end to end (the native TPU conv layout).
- Convolutions via ``lax.conv_general_dilated`` with explicit padding that
  reproduces PyTorch output sizes exactly; under the bfloat16 policy the
  MXU still accumulates in float32 (hardware behaviour), and loss-side
  tensors are promoted to float32 at the module boundaries.
- ConvTranspose expressed as an input-dilated convolution with asymmetric
  padding ``(k-1-p, k-1-p+output_padding)`` — the exact equivalent of
  PyTorch's ``output_size=`` disambiguation (model.py:558-564) with
  ``output_padding=1`` for the stride-2 8→16→32→64 ladder.
- BatchNorm runs its statistics in float32 regardless of compute dtype and
  supports a mesh ``axis_name`` for cross-replica statistics under data
  parallelism (the reference's DataParallel computes per-GPU stats; global
  stats are the TPU-native improvement).

Initialization matches the reference's ``weights_init`` (model.py:8-13):
conv kernels ~ N(0, 0.02²), BatchNorm scale ~ N(1, 0.02²) and bias 0;
Linear layers and conv biases keep PyTorch's default
U(-1/sqrt(fan_in), +1/sqrt(fan_in)), which ``weights_init`` never touches.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax

Dtype = Any

DCGAN_STD = 0.02


def dcgan_normal_init(std: float = DCGAN_STD):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.normal(key, shape, dtype) * std
    return init


def torch_uniform_init(fan_in: int):
    """PyTorch's default Linear/Conv bias init: U(±1/sqrt(fan_in))."""
    bound = 1.0 / (fan_in ** 0.5) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


def bn_scale_init(key, shape, dtype=jnp.float32):
    return 1.0 + jax.random.normal(key, shape, dtype) * DCGAN_STD


class TorchConv(nn.Module):
    """2D convolution on NHWC with PyTorch Conv2d(k, stride, padding) shape
    semantics: out = floor((in + 2p - k)/s) + 1."""

    features: int
    kernel_size: int = 5
    stride: int = 1
    padding: int = 2
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k, s, p = self.kernel_size, self.stride, self.padding
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel", dcgan_normal_init(), (k, k, in_ch, self.features)
        )
        # No preferred_element_type upcast: its conv VJP rejects mixed
        # bf16/f32 operands; the TPU MXU accumulates bf16 in f32 regardless.
        y = lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            window_strides=(s, s),
            padding=((p, p), (p, p)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param(
                "bias", torch_uniform_init(in_ch * k * k), (self.features,)
            )
            y = y + bias.astype(y.dtype)
        return y.astype(self.dtype)


class TorchConvTranspose(nn.Module):
    """2D transposed convolution on NHWC with PyTorch
    ConvTranspose2d(k, stride, padding, output_padding) shape semantics:
    out = (in - 1)*s - 2p + k + output_padding.

    Implemented as an input-dilated (fractionally-strided) convolution with
    asymmetric padding — the canonical XLA form, which fuses cleanly and maps
    onto the MXU. ``output_padding`` plays the role of the reference's
    ``output_size=`` argument (reference: models/model.py:558-564)."""

    features: int
    kernel_size: int = 5
    stride: int = 2
    padding: int = 2
    output_padding: int = 1
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k, s, p, op = self.kernel_size, self.stride, self.padding, self.output_padding
        if op >= s and not (s == 1 and op == 0):
            raise ValueError("output_padding must be smaller than stride")
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel", dcgan_normal_init(), (k, k, in_ch, self.features)
        )
        pad_lo = k - 1 - p
        pad_hi = k - 1 - p + op
        y = lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            window_strides=(1, 1),
            padding=((pad_lo, pad_hi), (pad_lo, pad_hi)),
            lhs_dilation=(s, s),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            # PyTorch ConvTranspose2d fan_in = out_channels * k * k.
            bias = self.param(
                "bias", torch_uniform_init(self.features * k * k), (self.features,)
            )
            y = y + bias.astype(y.dtype)
        return y.astype(self.dtype)


class TorchLinear(nn.Module):
    """Dense layer with PyTorch's default init (weights_init leaves Linear
    untouched in the reference, models/model.py:8-13)."""

    features: int
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_f = x.shape[-1]
        kernel = self.param(
            "kernel", torch_uniform_init(in_f), (in_f, self.features)
        )
        bias = (self.param("bias", torch_uniform_init(in_f), (self.features,))
                if self.use_bias else None)
        y = jnp.dot(x.astype(self.dtype), kernel.astype(self.dtype))
        if bias is not None:
            y = y + bias.astype(y.dtype)
        return y.astype(self.dtype)


class _ManualBN(nn.Module):
    """BatchNorm core with torch semantics (eps 1e-5, running-stat momentum
    0.1, E[x²]−E[x]² "fast" variance like flax) — hand-rolled so statistics
    accumulate in float32 while the normalized activations stay in the
    compute dtype. Under the bf16 policy this halves BatchNorm's HBM
    traffic, the dominant cost of the train step (XLA cost analysis:
    27.2 GB/step at batch 256, ~64% of v5e HBM bandwidth). Param/stat names
    ("scale"/"bias", "mean"/"var") match flax nn.BatchNorm so checkpoints
    are layout-compatible."""

    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None
    momentum: float = 0.9
    epsilon: float = 1e-5
    groups: int = 1

    @nn.compact
    def __call__(self, x: jax.Array, use_running_average: bool) -> jax.Array:
        features = x.shape[-1]
        reduce_axes = tuple(range(x.ndim - 1))
        scale = self.param("scale", bn_scale_init, (features,))
        bias = self.param("bias", nn.initializers.zeros, (features,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda s: jnp.zeros(s, jnp.float32),
                                (features,))
        ra_var = self.variable("batch_stats", "var",
                               lambda s: jnp.ones(s, jnp.float32),
                               (features,))

        if not use_running_average and self.groups > 1:
            return self._grouped(x, scale, bias, ra_mean, ra_var)
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)  # fused into the reduce by XLA
            mean = jnp.mean(xf, axis=reduce_axes)
            mean2 = jnp.mean(jnp.square(xf), axis=reduce_axes)
            if self.axis_name is not None:
                mean = jax.lax.pmean(mean, self.axis_name)
                mean2 = jax.lax.pmean(mean2, self.axis_name)
            var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
            if not self.is_initializing():
                m = self.momentum
                # torch parity: normalization uses the biased batch
                # variance, but running_var accumulates the UNBIASED
                # (Bessel-corrected) estimate — n/(n−1) over the reduced
                # element count (torch BatchNorm semantics; caught by the
                # composed-dynamics test tests/test_torch_trajectory.py —
                # the factor is 1.004 for a batch-256 1d BN but 4/3 at
                # toy-test widths).
                n = 1
                for ax in reduce_axes:
                    n *= x.shape[ax]
                if self.axis_name is not None:
                    n = n * jax.lax.psum(1, self.axis_name)
                bessel = n / (n - 1) if n > 1 else 1.0
                ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
                ra_var.value = m * ra_var.value + (1.0 - m) * var * bessel

        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        # fold (x − μ)·inv + β into x·inv + (β − μ·inv): one multiply-add in
        # the compute dtype
        shift = bias - mean * inv
        y = x.astype(self.dtype) * inv.astype(self.dtype) \
            + shift.astype(self.dtype)
        return y

    def _grouped(self, x, scale, bias, ra_mean, ra_var) -> jax.Array:
        """torch-DataParallel BN emulation (``--bn_groups g``): split the
        batch into g contiguous groups, normalize each with its OWN batch
        statistics, and update running stats from group 0 only — exactly
        what DataParallel does (each replica normalizes its scatter slice;
        buffer updates survive only on device 0, whose replica shares the
        master module's storage). The published runs trained this way on
        2× K80 (reference: new_betavaegan.py:42-44)."""
        if self.axis_name is not None:
            raise ValueError("bn_groups is a single-process DataParallel "
                             "emulation; combine it with cross-replica "
                             "axis_name statistics is contradictory")
        b = x.shape[0]
        if b % self.groups:
            raise ValueError(
                f"bn_groups={self.groups} must divide the batch ({b})")
        per = b // self.groups
        xg = x.reshape((self.groups, per) + x.shape[1:]).astype(jnp.float32)
        axes = tuple(range(1, xg.ndim - 1))
        gmean = jnp.mean(xg, axis=axes)                      # (g, C)
        gmean2 = jnp.mean(jnp.square(xg), axis=axes)
        gvar = jnp.maximum(gmean2 - jnp.square(gmean), 0.0)  # biased
        if not self.is_initializing():
            n = per
            for ax in axes[1:]:
                n *= xg.shape[ax]
            bessel = n / (n - 1) if n > 1 else 1.0
            m = self.momentum
            ra_mean.value = m * ra_mean.value + (1.0 - m) * gmean[0]
            ra_var.value = m * ra_var.value + (1.0 - m) * gvar[0] * bessel
        inv = jax.lax.rsqrt(gvar + self.epsilon) * scale     # (g, C)
        shift = bias - gmean * inv
        bshape = (self.groups,) + (1,) * (xg.ndim - 2) + (x.shape[-1],)
        y = xg.astype(self.dtype) * inv.reshape(bshape).astype(self.dtype) \
            + shift.reshape(bshape).astype(self.dtype)
        return y.reshape(x.shape)


class BatchNorm(nn.Module):
    """BatchNorm with torch semantics; float32 statistics, compute-dtype
    activations. ``axis_name`` enables cross-replica statistics under
    shard_map/pmap; under jit+mesh the plain batch mean is already global
    (XLA inserts the collective)."""

    use_running_average: bool = False
    axis_name: Optional[str] = None
    dtype: Dtype = jnp.float32
    groups: int = 1

    @nn.compact
    def __call__(self, x: jax.Array,
                 use_running_average: Optional[bool] = None) -> jax.Array:
        ura = (self.use_running_average if use_running_average is None
               else use_running_average)
        return _ManualBN(dtype=self.dtype, axis_name=self.axis_name,
                         groups=self.groups, name="bn")(x, ura)


def flatten_batch(x: jax.Array) -> jax.Array:
    return x.reshape(x.shape[0], -1)
