"""Pallas kernels, interpret mode (CPU): golden parity with jnp references."""

import jax
import jax.numpy as jnp
import numpy as np

from disentangle_mlp_tpu.ops.pallas.image_ops import per_image_normalize_pallas
from disentangle_mlp_tpu.ops.pallas.matmul_fused import fused_linear


def test_per_image_normalize():
    x = jax.random.uniform(jax.random.key(0), (4, 64, 64, 3),
                           jnp.float32, -1.0, 1.0)
    got = per_image_normalize_pallas(x, interpret=True)
    xn = np.asarray(x)
    flat = xn.reshape(4, -1)
    lo = flat.min(1).reshape(-1, 1, 1, 1)
    hi = flat.max(1).reshape(-1, 1, 1, 1)
    ref = (xn - lo) / np.maximum(hi - lo, 1e-5)
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-6)


def test_per_image_normalize_odd_sizes():
    # feature dim 5*7*3 = 105, not a lane multiple → exercises padding
    x = jax.random.normal(jax.random.key(1), (3, 5, 7, 3), jnp.float32)
    got = per_image_normalize_pallas(x, interpret=True)
    assert got.shape == x.shape
    g = np.asarray(got)
    for i in range(3):
        assert abs(g[i].min() - 0.0) < 1e-6
        assert abs(g[i].max() - 1.0) < 1e-6


def test_fused_linear_matches_jnp():
    x = jax.random.normal(jax.random.key(2), (100, 300), jnp.float32)
    w = jax.random.normal(jax.random.key(3), (300, 70), jnp.float32) * 0.05
    b = jax.random.normal(jax.random.key(4), (70,), jnp.float32)
    for act, fn in [("none", lambda y: y),
                    ("relu", lambda y: np.maximum(y, 0)),
                    ("leaky_relu", lambda y: np.where(y >= 0, y, 0.2 * y))]:
        got = fused_linear(x, w, b, activation=act, out_dtype=jnp.float32,
                           interpret=True)
        ref = fn(np.asarray(x, np.float32).astype(np.float32).astype("f")
                 .astype(np.float32) @ np.asarray(w) + np.asarray(b))
        # bf16 inputs on the MXU: compare against the bf16-quantized ref
        ref_bf16 = fn(
            np.asarray(jnp.asarray(x, jnp.bfloat16), np.float32)
            @ np.asarray(jnp.asarray(w, jnp.bfloat16), np.float32)
            + np.asarray(b))
        assert got.shape == (100, 70)
        np.testing.assert_allclose(np.asarray(got), ref_bf16,
                                   rtol=2e-2, atol=2e-2, err_msg=act)


def test_fused_linear_tile_multiples():
    # exact tile-multiple shapes (no padding path)
    x = jax.random.normal(jax.random.key(5), (128, 512), jnp.bfloat16)
    w = jax.random.normal(jax.random.key(6), (512, 128), jnp.bfloat16) * 0.05
    got = fused_linear(x, w, activation="none", out_dtype=jnp.float32,
                       interpret=True)
    ref = (np.asarray(x, np.float32) @ np.asarray(w, np.float32))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-2, atol=2e-2)
