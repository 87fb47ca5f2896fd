"""Layer parity vs PyTorch: identical weights → identical outputs (shape and
value) for conv / conv-transpose / linear. This pins the exact
``output_size=`` semantics of the reference decoder (models/model.py:558-564).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from disentangle_mlp_tpu.models.layers import (
    TorchConv, TorchConvTranspose, TorchLinear)


def _np(key, *shape):
    return np.asarray(
        jax.random.normal(jax.random.key(key), shape, jnp.float32))


@pytest.mark.parametrize("stride,size_in,size_out", [(2, 64, 32), (2, 32, 16),
                                                     (2, 16, 8), (1, 64, 64)])
def test_conv_matches_torch(stride, size_in, size_out):
    cin, cout, k, p = 3, 8, 5, 2
    x = _np(0, 2, size_in, size_in, cin)
    w = _np(1, k, k, cin, cout) * 0.02
    b = _np(2, cout) * 0.1

    layer = TorchConv(cout, k, stride=stride, padding=p)
    y = layer.apply({"params": {"kernel": w, "bias": b}}, jnp.asarray(x))
    assert y.shape == (2, size_out, size_out, cout)

    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    # torch conv weight is (cout, cin, kh, kw)
    wt = torch.from_numpy(w).permute(3, 2, 0, 1)
    yt = F.conv2d(xt, wt, torch.from_numpy(b), stride=stride, padding=p)
    np.testing.assert_allclose(
        np.asarray(y), yt.permute(0, 2, 3, 1).numpy(), atol=2e-4, rtol=1e-4)


@pytest.mark.parametrize("stride,op,size_in,size_out", [
    (2, 1, 8, 16), (2, 1, 16, 32), (2, 1, 32, 64), (1, 0, 64, 64)])
def test_conv_transpose_matches_torch(stride, op, size_in, size_out):
    cin, cout, k, p = 4, 6, 5, 2
    x = _np(3, 2, size_in, size_in, cin)
    w = _np(4, k, k, cin, cout) * 0.02
    b = _np(5, cout) * 0.1

    layer = TorchConvTranspose(cout, k, stride=stride, padding=p,
                               output_padding=op)
    y = layer.apply({"params": {"kernel": w, "bias": b}}, jnp.asarray(x))
    assert y.shape == (2, size_out, size_out, cout)

    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    # torch convT weight is (cin, cout, kh, kw); our HWIO kernel correlates
    # (no flip), torch convT convolves the flipped kernel — flip spatials.
    wt = torch.from_numpy(w[::-1, ::-1].copy()).permute(2, 3, 0, 1)
    yt = F.conv_transpose2d(xt, wt, torch.from_numpy(b), stride=stride,
                            padding=p, output_padding=op)
    np.testing.assert_allclose(
        np.asarray(y), yt.permute(0, 2, 3, 1).numpy(), atol=2e-4, rtol=1e-4)


def test_linear_matches_torch():
    x = _np(6, 4, 32)
    w = _np(7, 32, 16) * 0.1
    b = _np(8, 16) * 0.1
    layer = TorchLinear(16)
    y = layer.apply({"params": {"kernel": w, "bias": b}}, jnp.asarray(x))
    yt = F.linear(torch.from_numpy(x), torch.from_numpy(w).T,
                  torch.from_numpy(b))
    np.testing.assert_allclose(np.asarray(y), yt.numpy(), atol=2e-5, rtol=1e-5)
