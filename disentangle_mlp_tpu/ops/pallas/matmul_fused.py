"""Tiled Pallas matmul with a fused bias + activation epilogue.

Targets the framework's big dense layers (encoder μ/logσ² heads
16384→2048, decoder preprocess 128→16384, discriminator ``lth_features``
16384→2048 — reference: models/model.py:304-314, 402-404, 490-493): the
matmul runs on the MXU in bf16 with float32 accumulation in a VMEM scratch,
and bias + LeakyReLU/ReLU apply in the same kernel, so the activation never
makes an extra HBM round trip.

Grid is (M/TM, N/TN, K/TK) with the K axis innermost; the accumulator is
zeroed at k==0 and the epilogue fires at the last K tile — the canonical
Pallas accumulation pattern. Shapes are padded to tile multiples by the
wrapper. EXAMPLE ONLY — not wired into any model or Config flag: XLA's
own fusion is strong for these
shapes, so the kernel must win on-silicon before becoming the default.

MEASURED (v5e via axon, 2026-08-16, M=256 K=16384 N=2048 bf16): this kernel
1474 ms/call vs XLA dot+epilogue 2.2 ms — the XLA lowering wins decisively
at these skinny-M shapes (the layer is weight-load-bound, and the
3-level grid serializes). Kept as an EXPERIMENTAL opt-in and a base for
future shapes where a hand pipeline can win; do not enable by default.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_M = 128
TILE_N = 128
TILE_K = 512


def _matmul_kernel(x_ref, w_ref, b_ref, o_ref, acc_ref, *, activation: str,
                   n_k: int):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(
        x_ref[:], w_ref[:], preferred_element_type=jnp.float32)

    @pl.when(k == n_k - 1)
    def _():
        y = acc_ref[:] + b_ref[:].astype(jnp.float32)
        if activation == "relu":
            y = jnp.maximum(y, 0.0)
        elif activation == "leaky_relu":
            y = jnp.where(y >= 0.0, y, 0.2 * y)
        o_ref[:] = y.astype(o_ref.dtype)


def _pad_to(x: jax.Array, axis: int, multiple: int) -> jax.Array:
    pad = (-x.shape[axis]) % multiple
    if not pad:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(
    jax.jit, static_argnames=("activation", "out_dtype", "interpret"))
def fused_linear(x: jax.Array, w: jax.Array, b: Optional[jax.Array] = None,
                 activation: str = "none", out_dtype=None,
                 interpret: bool = False) -> jax.Array:
    """y = act(x @ w + b) with x:(M,K), w:(K,N), b:(N,) — fused in one
    Pallas kernel. Computes in bfloat16 on the MXU, accumulates float32."""
    assert activation in ("none", "relu", "leaky_relu")
    m, k_dim = x.shape
    _, n = w.shape
    out_dtype = out_dtype or x.dtype
    if b is None:
        b = jnp.zeros((n,), jnp.float32)

    xp = _pad_to(_pad_to(x.astype(jnp.bfloat16), 0, TILE_M), 1, TILE_K)
    wp = _pad_to(_pad_to(w.astype(jnp.bfloat16), 0, TILE_K), 1, TILE_N)
    bp = _pad_to(b.astype(jnp.float32).reshape(1, -1), 1, TILE_N)

    mp, kp = xp.shape
    np_ = wp.shape[1]
    n_k = kp // TILE_K

    out = pl.pallas_call(
        functools.partial(_matmul_kernel, activation=activation, n_k=n_k),
        grid=(mp // TILE_M, np_ // TILE_N, n_k),
        in_specs=[
            pl.BlockSpec((TILE_M, TILE_K), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_K, TILE_N), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_N), lambda i, j, k: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_M, TILE_N), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
        scratch_shapes=[pltpu.VMEM((TILE_M, TILE_N), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=mp * kp * 2 + kp * np_ * 2 + mp * np_ * 4,
            transcendentals=0),
        interpret=interpret,
    )(xp, wp, bp)
    return out[:m, :n]
