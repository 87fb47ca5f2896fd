"""Manual BatchNorm vs flax nn.BatchNorm and torch golden values."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from disentangle_mlp_tpu.models.layers import BatchNorm


def test_matches_flax_batchnorm_train_and_eval():
    from flax import linen as nn

    x = jax.random.normal(jax.random.key(0), (16, 8, 8, 12), jnp.float32) * 3 + 1

    ours = BatchNorm(dtype=jnp.float32)
    ov = ours.init(jax.random.key(1), x)
    theirs = nn.BatchNorm(use_running_average=False, momentum=0.9,
                          epsilon=1e-5, dtype=jnp.float32)
    tv = theirs.init(jax.random.key(1), x)
    # same scale/bias for comparison
    tv = {"params": {"scale": ov["params"]["bn"]["scale"],
                     "bias": ov["params"]["bn"]["bias"]},
          "batch_stats": tv["batch_stats"]}

    y1, m1 = ours.apply(ov, x, mutable=["batch_stats"])
    y2, m2 = theirs.apply(tv, x, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(m1["batch_stats"]["bn"]["mean"]),
        np.asarray(m2["batch_stats"]["mean"]), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(m1["batch_stats"]["bn"]["var"]),
        np.asarray(m2["batch_stats"]["var"]), rtol=1e-4)

    # eval mode from updated stats
    ov_eval = {"params": ov["params"], "batch_stats": m1["batch_stats"]}
    tv_eval = {"params": tv["params"], "batch_stats": m2["batch_stats"]}
    e1 = ours.apply(ov_eval, x[:4], use_running_average=True)
    e2 = nn.BatchNorm(use_running_average=True, momentum=0.9, epsilon=1e-5,
                      dtype=jnp.float32).apply(tv_eval, x[:4])
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2),
                               rtol=1e-4, atol=1e-4)


def test_matches_torch_batchnorm():
    x = np.random.default_rng(0).normal(size=(8, 4, 4, 6)).astype(np.float32)
    bn = BatchNorm(dtype=jnp.float32)
    v = bn.init(jax.random.key(2), jnp.asarray(x))
    scale = np.asarray(v["params"]["bn"]["scale"])
    bias = np.asarray(v["params"]["bn"]["bias"])
    y, mut = bn.apply(v, jnp.asarray(x), mutable=["batch_stats"])

    tbn = torch.nn.BatchNorm2d(6, eps=1e-5, momentum=0.1)
    with torch.no_grad():
        tbn.weight.copy_(torch.from_numpy(scale))
        tbn.bias.copy_(torch.from_numpy(bias))
    tbn.train()
    yt = tbn(torch.from_numpy(x).permute(0, 3, 1, 2))
    np.testing.assert_allclose(
        np.asarray(y), yt.detach().permute(0, 2, 3, 1).numpy(),
        rtol=2e-4, atol=2e-4)
    # torch running_var blends the UNBIASED batch variance (×n/(n−1));
    # ours (like flax) blends the biased one: recover torch's batch-var
    # term and re-blend with the bias correction removed
    n = x.shape[0] * x.shape[1] * x.shape[2]
    torch_rv = np.asarray(tbn.running_var)
    batch_var_biased = (torch_rv - 0.9) * 10.0 * (n - 1) / n
    np.testing.assert_allclose(
        np.asarray(mut["batch_stats"]["bn"]["var"]),
        0.9 + 0.1 * batch_var_biased, rtol=2e-4)


def test_bf16_output_dtype():
    x = jax.random.normal(jax.random.key(3), (4, 8, 8, 16), jnp.bfloat16)
    bn = BatchNorm(dtype=jnp.bfloat16)
    v = bn.init(jax.random.key(4), x)
    y, _ = bn.apply(v, x, mutable=["batch_stats"])
    assert y.dtype == jnp.bfloat16
    # stats stay float32
    assert v["batch_stats"]["bn"]["mean"].dtype == jnp.float32
