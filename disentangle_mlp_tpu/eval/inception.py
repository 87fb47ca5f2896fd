"""JAX InceptionV3 pool3 feature extractor for FID, inference-only.

TPU-native replacement for BOTH of the reference's Inception paths:
- the frozen TF-1 GraphDef executed in a separate TF session reading images
  back from disk (reference: scoring/fid.py:34-105, 268-317), and
- the unused PyTorch port it kept on hand (scoring/inception.py:16-310),
  whose FID-specific patches this module reproduces:
  * average-pool branches exclude padded zeros from the divisor
    (inception.py:209-212, 236-239, 269-273 — TF avg-pool semantics),
  * the second InceptionE (Mixed_7c) uses MAX pooling in its pool branch
    (inception.py:302-307),
  * 1008-class FID weight layout (inception.py:175-177) — only feature
    extraction up to the final global average pool is implemented here.

Design: a purely functional network over a flat params pytree. BatchNorm is
folded into the conv kernels at load time (inference-only: y = conv(x)·s + b
with s = γ/√(σ²+ε), exactly BN after conv), so the whole forward is
conv+bias+relu chains and pools — one XLA program, bf16-friendly, nothing
mutable. Weights come from the standard pt_inception-2015-12-05 checkpoint
when present (see ``find_fid_weights``); otherwise a seeded random network
is used so the full FID pipeline (features → statistics → Fréchet) stays
exercisable end-to-end — scores are then self-consistent but not comparable
to published FID numbers.
"""

from __future__ import annotations

import functools
import os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# --------------------------------------------------------------------------
# Architecture spec: name -> (kh, kw, cin, cout, stride, (pad_h, pad_w))
# Torchvision-compatible module names so torch checkpoints map 1:1.
# --------------------------------------------------------------------------

def _conv(kh, kw, cin, cout, stride=1, pad=(0, 0)):
    return (kh, kw, cin, cout, stride, pad)


def _inception_a(cin: int, pool_features: int) -> Dict[str, tuple]:
    return {
        "branch1x1": _conv(1, 1, cin, 64),
        "branch5x5_1": _conv(1, 1, cin, 48),
        "branch5x5_2": _conv(5, 5, 48, 64, pad=(2, 2)),
        "branch3x3dbl_1": _conv(1, 1, cin, 64),
        "branch3x3dbl_2": _conv(3, 3, 64, 96, pad=(1, 1)),
        "branch3x3dbl_3": _conv(3, 3, 96, 96, pad=(1, 1)),
        "branch_pool": _conv(1, 1, cin, pool_features),
    }


def _inception_b(cin: int) -> Dict[str, tuple]:
    return {
        "branch3x3": _conv(3, 3, cin, 384, stride=2),
        "branch3x3dbl_1": _conv(1, 1, cin, 64),
        "branch3x3dbl_2": _conv(3, 3, 64, 96, pad=(1, 1)),
        "branch3x3dbl_3": _conv(3, 3, 96, 96, stride=2),
    }


def _inception_c(cin: int, c7: int) -> Dict[str, tuple]:
    return {
        "branch1x1": _conv(1, 1, cin, 192),
        "branch7x7_1": _conv(1, 1, cin, c7),
        "branch7x7_2": _conv(1, 7, c7, c7, pad=(0, 3)),
        "branch7x7_3": _conv(7, 1, c7, 192, pad=(3, 0)),
        "branch7x7dbl_1": _conv(1, 1, cin, c7),
        "branch7x7dbl_2": _conv(7, 1, c7, c7, pad=(3, 0)),
        "branch7x7dbl_3": _conv(1, 7, c7, c7, pad=(0, 3)),
        "branch7x7dbl_4": _conv(7, 1, c7, c7, pad=(3, 0)),
        "branch7x7dbl_5": _conv(1, 7, c7, 192, pad=(0, 3)),
        "branch_pool": _conv(1, 1, cin, 192),
    }


def _inception_d(cin: int) -> Dict[str, tuple]:
    return {
        "branch3x3_1": _conv(1, 1, cin, 192),
        "branch3x3_2": _conv(3, 3, 192, 320, stride=2),
        "branch7x7x3_1": _conv(1, 1, cin, 192),
        "branch7x7x3_2": _conv(1, 7, 192, 192, pad=(0, 3)),
        "branch7x7x3_3": _conv(7, 1, 192, 192, pad=(3, 0)),
        "branch7x7x3_4": _conv(3, 3, 192, 192, stride=2),
    }


def _inception_e(cin: int) -> Dict[str, tuple]:
    return {
        "branch1x1": _conv(1, 1, cin, 320),
        "branch3x3_1": _conv(1, 1, cin, 384),
        "branch3x3_2a": _conv(1, 3, 384, 384, pad=(0, 1)),
        "branch3x3_2b": _conv(3, 1, 384, 384, pad=(1, 0)),
        "branch3x3dbl_1": _conv(1, 1, cin, 448),
        "branch3x3dbl_2": _conv(3, 3, 448, 384, pad=(1, 1)),
        "branch3x3dbl_3a": _conv(1, 3, 384, 384, pad=(0, 1)),
        "branch3x3dbl_3b": _conv(3, 1, 384, 384, pad=(1, 0)),
        "branch_pool": _conv(1, 1, cin, 192),
    }


INCEPTION_SPEC: Dict[str, object] = {
    "Conv2d_1a_3x3": _conv(3, 3, 3, 32, stride=2),
    "Conv2d_2a_3x3": _conv(3, 3, 32, 32),
    "Conv2d_2b_3x3": _conv(3, 3, 32, 64, pad=(1, 1)),
    "Conv2d_3b_1x1": _conv(1, 1, 64, 80),
    "Conv2d_4a_3x3": _conv(3, 3, 80, 192),
    "Mixed_5b": _inception_a(192, 32),
    "Mixed_5c": _inception_a(256, 64),
    "Mixed_5d": _inception_a(288, 64),
    "Mixed_6a": _inception_b(288),
    "Mixed_6b": _inception_c(768, 128),
    "Mixed_6c": _inception_c(768, 160),
    "Mixed_6d": _inception_c(768, 160),
    "Mixed_6e": _inception_c(768, 192),
    "Mixed_7a": _inception_d(768),
    "Mixed_7b": _inception_e(1280),
    "Mixed_7c": _inception_e(2048),
}

FEATURE_DIM = 2048


# --------------------------------------------------------------------------
# Params
# --------------------------------------------------------------------------

def init_random_params(seed: int = 0) -> Dict:
    """Deterministic He-normal random weights — the no-pretrained-file
    fallback. FID computed with these is self-consistent (X vs X ≈ 0) but
    not comparable to published numbers."""
    root = jax.random.key(seed)
    params: Dict = {}

    def init_leaf(key, spec):
        kh, kw, cin, cout, _, _ = spec
        fan_in = kh * kw * cin
        k = jax.random.normal(key, (kh, kw, cin, cout), jnp.float32)
        return {"kernel": k * np.sqrt(2.0 / fan_in),
                "bias": jnp.zeros((cout,), jnp.float32)}

    i = 0
    for name, spec in INCEPTION_SPEC.items():
        if isinstance(spec, dict):
            params[name] = {}
            for bname, bspec in spec.items():
                params[name][bname] = init_leaf(
                    jax.random.fold_in(root, i), bspec)
                i += 1
        else:
            params[name] = init_leaf(jax.random.fold_in(root, i), spec)
            i += 1
    return params


def fold_bn_into_conv(weight_oihw: np.ndarray, bn_gamma: np.ndarray,
                      bn_beta: np.ndarray, bn_mean: np.ndarray,
                      bn_var: np.ndarray, eps: float = 1e-3
                      ) -> Tuple[np.ndarray, np.ndarray]:
    """(conv → BN) ≡ (scaled conv → bias): kernel·γ/√(σ²+ε), β − μ·γ/√(σ²+ε).
    Returns HWIO kernel + bias."""
    scale = bn_gamma / np.sqrt(bn_var + eps)
    w = weight_oihw * scale[:, None, None, None]
    b = bn_beta - bn_mean * scale
    return np.transpose(w, (2, 3, 1, 0)).astype(np.float32), b.astype(np.float32)


def load_torch_fid_weights(path: str) -> Dict:
    """Convert the pt_inception-2015-12-05 torch checkpoint (the FID weights
    the reference's scoring/inception.py:13 downloads) into our folded-BN
    params pytree."""
    import torch

    sd = torch.load(path, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd = {k: v.numpy() for k, v in sd.items()}

    params: Dict = {}
    for name, spec in INCEPTION_SPEC.items():
        if isinstance(spec, dict):
            params[name] = {}
            for bname in spec:
                prefix = f"{name}.{bname}"
                k, b = fold_bn_into_conv(
                    sd[f"{prefix}.conv.weight"],
                    sd[f"{prefix}.bn.weight"], sd[f"{prefix}.bn.bias"],
                    sd[f"{prefix}.bn.running_mean"],
                    sd[f"{prefix}.bn.running_var"])
                params[name][bname] = {"kernel": jnp.asarray(k),
                                       "bias": jnp.asarray(b)}
        else:
            k, b = fold_bn_into_conv(
                sd[f"{name}.conv.weight"],
                sd[f"{name}.bn.weight"], sd[f"{name}.bn.bias"],
                sd[f"{name}.bn.running_mean"], sd[f"{name}.bn.running_var"])
            params[name] = {"kernel": jnp.asarray(k), "bias": jnp.asarray(b)}
    return params


WEIGHT_SEARCH_PATHS = (
    os.environ.get("FID_INCEPTION_WEIGHTS", ""),
    "/home/shared/evaluation/fid/pt_inception-2015-12-05-6726825d.pth",
    os.path.expanduser(
        "~/.cache/torch/hub/checkpoints/pt_inception-2015-12-05-6726825d.pth"),
    # where dmt-fetch-assets --allow_network installs it (cli/fetch_assets.py)
    os.path.expanduser(
        "~/.cache/disentangle_mlp_tpu/pt_inception-2015-12-05-6726825d.pth"),
)


def find_fid_weights() -> Optional[str]:
    for p in WEIGHT_SEARCH_PATHS:
        if p and os.path.isfile(p):
            return p
    return None


@functools.lru_cache(maxsize=1)
def get_params_cached() -> Tuple[Dict, bool]:
    """(params, pretrained?) — loads real FID weights when available."""
    path = find_fid_weights()
    if path is not None:
        return load_torch_fid_weights(path), True
    return init_random_params(seed=20151205), False


# --------------------------------------------------------------------------
# Forward
# --------------------------------------------------------------------------

def _conv_relu(x, p, spec, dtype):
    kh, kw, cin, cout, stride, pad = spec
    y = lax.conv_general_dilated(
        x.astype(dtype), p["kernel"].astype(dtype),
        window_strides=(stride, stride),
        padding=(( pad[0], pad[0]), (pad[1], pad[1])),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    return jnp.maximum(y + p["bias"], 0.0).astype(dtype)


def _max_pool(x, window=3, stride=2, pad=0):
    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, window, window, 1),
        (1, stride, stride, 1),
        ((0, 0), (pad, pad), (pad, pad), (0, 0)))


def _avg_pool_exclude_pad(x, window=3, stride=1, pad=1):
    """TF-semantics average pool: the divisor counts only in-bounds taps
    (the FID patch — reference scoring/inception.py:209-212)."""
    sums = lax.reduce_window(
        x, 0.0, lax.add, (1, window, window, 1), (1, stride, stride, 1),
        ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    ones = jnp.ones((1, x.shape[1], x.shape[2], 1), x.dtype)
    counts = lax.reduce_window(
        ones, 0.0, lax.add, (1, window, window, 1), (1, stride, stride, 1),
        ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    return sums / counts


def _run_block_a(x, p, spec, dtype):
    b1 = _conv_relu(x, p["branch1x1"], spec["branch1x1"], dtype)
    b5 = _conv_relu(x, p["branch5x5_1"], spec["branch5x5_1"], dtype)
    b5 = _conv_relu(b5, p["branch5x5_2"], spec["branch5x5_2"], dtype)
    b3 = _conv_relu(x, p["branch3x3dbl_1"], spec["branch3x3dbl_1"], dtype)
    b3 = _conv_relu(b3, p["branch3x3dbl_2"], spec["branch3x3dbl_2"], dtype)
    b3 = _conv_relu(b3, p["branch3x3dbl_3"], spec["branch3x3dbl_3"], dtype)
    bp = _avg_pool_exclude_pad(x)
    bp = _conv_relu(bp, p["branch_pool"], spec["branch_pool"], dtype)
    return jnp.concatenate([b1, b5, b3, bp], axis=-1)


def _run_block_b(x, p, spec, dtype):
    b3 = _conv_relu(x, p["branch3x3"], spec["branch3x3"], dtype)
    bd = _conv_relu(x, p["branch3x3dbl_1"], spec["branch3x3dbl_1"], dtype)
    bd = _conv_relu(bd, p["branch3x3dbl_2"], spec["branch3x3dbl_2"], dtype)
    bd = _conv_relu(bd, p["branch3x3dbl_3"], spec["branch3x3dbl_3"], dtype)
    bp = _max_pool(x)
    return jnp.concatenate([b3, bd, bp], axis=-1)


def _run_block_c(x, p, spec, dtype):
    b1 = _conv_relu(x, p["branch1x1"], spec["branch1x1"], dtype)
    b7 = x
    for n in ["branch7x7_1", "branch7x7_2", "branch7x7_3"]:
        b7 = _conv_relu(b7, p[n], spec[n], dtype)
    bd = x
    for n in ["branch7x7dbl_1", "branch7x7dbl_2", "branch7x7dbl_3",
              "branch7x7dbl_4", "branch7x7dbl_5"]:
        bd = _conv_relu(bd, p[n], spec[n], dtype)
    bp = _avg_pool_exclude_pad(x)
    bp = _conv_relu(bp, p["branch_pool"], spec["branch_pool"], dtype)
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


def _run_block_d(x, p, spec, dtype):
    b3 = _conv_relu(x, p["branch3x3_1"], spec["branch3x3_1"], dtype)
    b3 = _conv_relu(b3, p["branch3x3_2"], spec["branch3x3_2"], dtype)
    b7 = x
    for n in ["branch7x7x3_1", "branch7x7x3_2", "branch7x7x3_3",
              "branch7x7x3_4"]:
        b7 = _conv_relu(b7, p[n], spec[n], dtype)
    bp = _max_pool(x)
    return jnp.concatenate([b3, b7, bp], axis=-1)


def _run_block_e(x, p, spec, dtype, pool: str):
    b1 = _conv_relu(x, p["branch1x1"], spec["branch1x1"], dtype)
    b3 = _conv_relu(x, p["branch3x3_1"], spec["branch3x3_1"], dtype)
    b3 = jnp.concatenate([
        _conv_relu(b3, p["branch3x3_2a"], spec["branch3x3_2a"], dtype),
        _conv_relu(b3, p["branch3x3_2b"], spec["branch3x3_2b"], dtype),
    ], axis=-1)
    bd = _conv_relu(x, p["branch3x3dbl_1"], spec["branch3x3dbl_1"], dtype)
    bd = _conv_relu(bd, p["branch3x3dbl_2"], spec["branch3x3dbl_2"], dtype)
    bd = jnp.concatenate([
        _conv_relu(bd, p["branch3x3dbl_3a"], spec["branch3x3dbl_3a"], dtype),
        _conv_relu(bd, p["branch3x3dbl_3b"], spec["branch3x3dbl_3b"], dtype),
    ], axis=-1)
    if pool == "max":  # Mixed_7c FID patch (scoring/inception.py:302-307)
        bp = _max_pool(x, stride=1, pad=1)
    else:
        bp = _avg_pool_exclude_pad(x)
    bp = _conv_relu(bp, p["branch_pool"], spec["branch_pool"], dtype)
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


def pool3_features(params: Dict, images01: jax.Array,
                   dtype=jnp.float32) -> jax.Array:
    """NHWC images in [0, 1] → (N, 2048) pool3 activations.

    Mirrors the PyTorch port's preprocessing (scoring/inception.py:146-153):
    bilinear resize to 299×299 (half-pixel centers — torch
    ``align_corners=False``; pinned vs torch at 64×64 by
    tests/test_inception_parity.py), scale to [-1, 1], then the FID-patched
    InceptionV3 up to the global average pool.

    ``dtype`` is the conv compute dtype. float32 default: the ±2-point FID
    build target leaves no budget for bf16 activation drift through 94
    convs (VERDICT r2); pass jnp.bfloat16 for throughput-bound scoring
    (measured delta/cost: benchmarks/README_PERF.md)."""
    x = images01.astype(jnp.float32)
    if x.shape[1] != 299 or x.shape[2] != 299:
        x = jax.image.resize(
            x, (x.shape[0], 299, 299, x.shape[3]), method="bilinear")
    x = 2.0 * x - 1.0

    S = INCEPTION_SPEC
    x = _conv_relu(x, params["Conv2d_1a_3x3"], S["Conv2d_1a_3x3"], dtype)
    x = _conv_relu(x, params["Conv2d_2a_3x3"], S["Conv2d_2a_3x3"], dtype)
    x = _conv_relu(x, params["Conv2d_2b_3x3"], S["Conv2d_2b_3x3"], dtype)
    x = _max_pool(x)
    x = _conv_relu(x, params["Conv2d_3b_1x1"], S["Conv2d_3b_1x1"], dtype)
    x = _conv_relu(x, params["Conv2d_4a_3x3"], S["Conv2d_4a_3x3"], dtype)
    x = _max_pool(x)
    for n in ["Mixed_5b", "Mixed_5c", "Mixed_5d"]:
        x = _run_block_a(x, params[n], S[n], dtype)
    x = _run_block_b(x, params["Mixed_6a"], S["Mixed_6a"], dtype)
    for n in ["Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"]:
        x = _run_block_c(x, params[n], S[n], dtype)
    x = _run_block_d(x, params["Mixed_7a"], S["Mixed_7a"], dtype)
    x = _run_block_e(x, params["Mixed_7b"], S["Mixed_7b"], dtype, pool="avg")
    x = _run_block_e(x, params["Mixed_7c"], S["Mixed_7c"], dtype, pool="max")
    return jnp.mean(x, axis=(1, 2)).astype(jnp.float32)  # global avg pool
