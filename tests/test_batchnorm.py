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
    # flax blends the BIASED batch variance into running_var; ours blends
    # the unbiased one (torch semantics — see test_matches_torch_batchnorm)
    n = x.shape[0] * x.shape[1] * x.shape[2]
    flax_var = np.asarray(m2["batch_stats"]["var"])
    expected = 0.9 + (flax_var - 0.9) * n / (n - 1)
    np.testing.assert_allclose(
        np.asarray(m1["batch_stats"]["bn"]["var"]), expected, rtol=1e-4)

    # eval mode: feed flax OUR updated stats (running_var semantics differ
    # by the torch Bessel correction, asserted above) so this compares the
    # eval-path normalization formula itself
    ov_eval = {"params": ov["params"], "batch_stats": m1["batch_stats"]}
    tv_eval = {"params": tv["params"],
               "batch_stats": {"mean": m1["batch_stats"]["bn"]["mean"],
                               "var": m1["batch_stats"]["bn"]["var"]}}
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
    # since round 3 ours does too (the Bessel correction in _ManualBN —
    # the composed-dynamics trajectory tests depend on it), so running
    # stats match torch DIRECTLY
    np.testing.assert_allclose(
        np.asarray(mut["batch_stats"]["bn"]["var"]),
        np.asarray(tbn.running_var), rtol=2e-4)
    np.testing.assert_allclose(
        np.asarray(mut["batch_stats"]["bn"]["mean"]),
        np.asarray(tbn.running_mean), rtol=2e-4, atol=1e-6)


def test_bf16_output_dtype():
    x = jax.random.normal(jax.random.key(3), (4, 8, 8, 16), jnp.bfloat16)
    bn = BatchNorm(dtype=jnp.bfloat16)
    v = bn.init(jax.random.key(4), x)
    y, _ = bn.apply(v, x, mutable=["batch_stats"])
    assert y.dtype == jnp.bfloat16
    # stats stay float32
    assert v["batch_stats"]["bn"]["mean"].dtype == jnp.float32


def test_grouped_bn_emulates_torch_dataparallel():
    """--bn_groups 2 (VERDICT r2 #4): each contiguous half of the batch is
    normalized with its OWN statistics (what torch DataParallel's scatter
    does per replica), and running stats update from group 0 only (replica
    0 shares the master module's buffers; other replicas' updates are
    lost). Verified against two independent torch BatchNorms fed the two
    halves."""
    x = np.random.default_rng(5).normal(size=(8, 4, 4, 6)).astype(np.float32)
    bn = BatchNorm(dtype=jnp.float32, groups=2)
    v = bn.init(jax.random.key(6), jnp.asarray(x))
    scale = np.asarray(v["params"]["bn"]["scale"])
    bias = np.asarray(v["params"]["bn"]["bias"])
    y, mut = bn.apply(v, jnp.asarray(x), mutable=["batch_stats"])

    halves = []
    for lo, hi in ((0, 4), (4, 8)):
        tbn = torch.nn.BatchNorm2d(6, eps=1e-5, momentum=0.1)
        with torch.no_grad():
            tbn.weight.copy_(torch.from_numpy(scale))
            tbn.bias.copy_(torch.from_numpy(bias))
        tbn.train()
        yt = tbn(torch.from_numpy(x[lo:hi]).permute(0, 3, 1, 2))
        halves.append((yt.detach().permute(0, 2, 3, 1).numpy(), tbn))
    np.testing.assert_allclose(np.asarray(y[:4]), halves[0][0],
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(y[4:]), halves[1][0],
                               rtol=2e-4, atol=2e-4)
    # running stats == replica 0's torch update, NOT replica 1's
    np.testing.assert_allclose(
        np.asarray(mut["batch_stats"]["bn"]["var"]),
        np.asarray(halves[0][1].running_var), rtol=2e-4)
    np.testing.assert_allclose(
        np.asarray(mut["batch_stats"]["bn"]["mean"]),
        np.asarray(halves[0][1].running_mean), rtol=2e-4, atol=1e-6)
    assert not np.allclose(np.asarray(mut["batch_stats"]["bn"]["mean"]),
                           np.asarray(halves[1][1].running_mean))


def test_grouped_bn_threads_through_models():
    """bn_groups reaches every BatchNorm in the flagship step and the step
    stays finite; groups=1 and groups=2 genuinely differ."""
    from disentangle_mlp_tpu.config import Config
    from disentangle_mlp_tpu.train.vaegan import create_vaegan_experiment

    base = dict(name="bng", n_hidden=8, n_z=[8, 4, 4],
                representation_size=4, head_width=16,
                decoder_channels=[8, 8, 8], disc_channels=[4, 8, 8, 8],
                disc_feature_dim=16, img_size=32, batch_size_train=4,
                dtype="float32", lr=1e-3)
    x = jnp.asarray(np.random.default_rng(7).uniform(
        -1, 1, (4, 32, 32, 3)).astype(np.float32))
    outs = {}
    for g in (1, 2):
        cfg = Config(**base, bn_groups=g)
        exp = create_vaegan_experiment(cfg, jax.random.key(0))
        eg, d, m = exp.step_fn(exp.eg_state, exp.d_state, x,
                               jax.random.key(1))
        assert np.isfinite(float(m["recon_enc"])), g
        outs[g] = float(m["recon_enc"])
    assert outs[1] != outs[2]
