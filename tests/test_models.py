"""Model shape/behaviour tests (SURVEY.md §4: 64×64×3 → 8×8×256 → 128 →
64×64×3 per models/model.py:289-302,340-377)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from disentangle_mlp_tpu.models.gan import DiscriminatorCeleba, GeneratorCeleba
from disentangle_mlp_tpu.models.vae import VAE, CelebaDecoder, CelebaEncoder


@pytest.fixture(scope="module")
def x():
    return jax.random.normal(jax.random.key(0), (4, 64, 64, 3), jnp.float32)


def test_encoder_shapes(x):
    enc = CelebaEncoder(n_hidden=128)
    variables = enc.init(jax.random.key(1), x)
    (mu, logvar), _ = enc.apply(variables, x, mutable=["batch_stats"])
    assert mu.shape == (4, 128) and logvar.shape == (4, 128)
    assert mu.dtype == jnp.float32


def test_decoder_shapes_and_range():
    dec = CelebaDecoder(n_hidden=128, n_z=(256, 8, 8))
    z = jax.random.normal(jax.random.key(2), (4, 128), jnp.float32)
    variables = dec.init(jax.random.key(3), z)
    out, _ = dec.apply(variables, z, mutable=["batch_stats"])
    assert out.shape == (4, 64, 64, 3)
    assert float(jnp.max(jnp.abs(out))) <= 1.0  # Tanh output


def test_generator_is_decoder_arch():
    gen = GeneratorCeleba(n_hidden=128, n_z=(256, 8, 8))
    z = jax.random.normal(jax.random.key(4), (2, 128), jnp.float32)
    variables = gen.init(jax.random.key(5), z)
    out, _ = gen.apply(variables, z, mutable=["batch_stats"])
    assert out.shape == (2, 64, 64, 3)


def test_discriminator_prob_and_features(x):
    disc = DiscriminatorCeleba()
    variables = disc.init(jax.random.key(6), x)
    (prob, feats), _ = disc.apply(variables, x, mutable=["batch_stats"])
    assert prob.shape == (4,)
    assert feats.shape == (4, 2048)
    assert float(jnp.min(prob)) >= 0.0 and float(jnp.max(prob)) <= 1.0


def test_vae_roundtrip_and_methods(x):
    vae = VAE(n_hidden=128, n_z=(256, 8, 8))
    variables = vae.init(
        {"params": jax.random.key(7), "reparam": jax.random.key(8)}, x)
    (recon, mu, logvar), _ = vae.apply(
        variables, x, rngs={"reparam": jax.random.key(9)},
        mutable=["batch_stats"])
    assert recon.shape == x.shape
    assert mu.shape == (4, 128)

    z = jax.random.normal(jax.random.key(10), (4, 128), jnp.float32)
    out, _ = vae.apply(variables, z, method=VAE.decode,
                       mutable=["batch_stats"])
    assert out.shape == (4, 64, 64, 3)


def test_reparameterize_statistics():
    """z = μ + ε·exp(0.5·logσ²) (model.py:532-535): check mean/std."""
    vae = VAE(n_hidden=16, n_z=(4, 8, 8), representation_size=4)
    x = jnp.zeros((2, 64, 64, 3))
    variables = vae.init(
        {"params": jax.random.key(11), "reparam": jax.random.key(12)}, x)
    mu = jnp.full((4096, 16), 3.0)
    logvar = jnp.full((4096, 16), jnp.log(0.25))
    z = vae.apply(variables, mu, logvar, method=VAE.reparameterize,
                  rngs={"reparam": jax.random.key(13)})
    assert abs(float(jnp.mean(z)) - 3.0) < 0.02
    assert abs(float(jnp.std(z)) - 0.5) < 0.02


def test_dcgan_init_statistics():
    """weights_init parity (model.py:8-13): conv kernels ~ N(0, 0.02²),
    BN scale ~ N(1, 0.02²), BN bias = 0."""
    enc = CelebaEncoder(n_hidden=128)
    x = jnp.zeros((2, 64, 64, 3))
    params = enc.init(jax.random.key(14), x)["params"]
    k = np.asarray(params["conv2"]["kernel"])
    assert abs(k.std() - 0.02) < 0.002 and abs(k.mean()) < 0.002
    bn_scale = np.asarray(params["bn2"]["bn"]["scale"])
    assert abs(bn_scale.mean() - 1.0) < 0.01
    assert np.all(np.asarray(params["bn2"]["bn"]["bias"]) == 0.0)


def test_bfloat16_policy(x):
    """bf16 compute path: outputs cast per policy, params stay fp32."""
    vae = VAE(n_hidden=128, n_z=(256, 8, 8), dtype=jnp.bfloat16)
    variables = vae.init(
        {"params": jax.random.key(15), "reparam": jax.random.key(16)}, x)
    leaf = jax.tree_util.tree_leaves(variables["params"])[0]
    assert leaf.dtype == jnp.float32
    (recon, mu, logvar), _ = vae.apply(
        variables, x, rngs={"reparam": jax.random.key(17)},
        mutable=["batch_stats"])
    assert recon.dtype == jnp.bfloat16
    assert mu.dtype == jnp.float32  # loss-side tensors promoted
