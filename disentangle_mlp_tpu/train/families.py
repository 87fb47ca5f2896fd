"""Train path for the birds / mnist model families.

The reference defines these families (models/model.py:16-100 birds,
:103-183 mnist) but no experiment script ever instantiates them — they are
capability inventory only (SURVEY.md C8/C9). Here ``--dataset birds|mnist``
gets a real, jitted VAE-GAN training step over the real per-dataset
transforms (data/pipeline.py):

per batch: (1) D step — BCE(D(x), real) + BCE(D(G(z~N(0,1))), fake);
(2) EG step — β·Σ KLD + Σ(x̂−x)² + BCE(D(x̂), real), where (z, kld) =
E(x) and x̂ = G(z). One Adam per network, same three-loss shape as the
flagship β-VAE-GAN but single-phase per network (the reference never
published behaviour to match). β = cfg.beta, the same knob the flagship
weights its KLD with: it matters structurally here because the mnist
family couples 196 latent dims to only 784 recon dims (1:4, vs the
flagship's 128:12288 ≈ 1:96), so unweighted Σ-KLD overpowers the
reachable recon gain and the model sits at the predict-the-mean floor
(round-5 trajectory study; β≈0.1 trains, β=1 collapses).

For birds, a torchvision resnet18 checkpoint (``cfg.resnet18_ckpt``) is
converted and loaded into the encoder when present — the reference uses
``resnet18(pretrained=True)`` (models/model.py:19-21).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import Config
from ..models.birds import BirdsDiscriminator, BirdsEncoder, BirdsGenerator
from ..models.mnist import MnistDiscriminator, MnistEncoder, MnistGenerator
from ..ops.losses import bce_logits, reconstruction_loss
from .common import ModelState, apply_updates, init_model_state, make_adam, sample_labels


class FamilyVAE(nn.Module):
    """Encoder (returns (z, kld_per_sample)) + generator, as one module so
    a single optimizer state covers both — the EG pairing of the flagship."""

    encoder: nn.Module
    generator: nn.Module
    latent_hw: int = 0  # >0: reshape flat z to (hw, hw, -1) for the generator

    def _gen_input(self, z: jax.Array) -> jax.Array:
        if self.latent_hw:
            return z.reshape(z.shape[0], self.latent_hw, self.latent_hw, -1)
        return z

    def __call__(self, x: jax.Array, train: bool = True):
        z, kld = self.encoder(x, train=train)
        recon = self.generator(self._gen_input(z), train=train)
        return recon, z, kld

    def decode(self, z: jax.Array, train: bool = True) -> jax.Array:
        return self.generator(self._gen_input(z), train=train)


@dataclasses.dataclass
class FamilyExperiment:
    vae: FamilyVAE
    discriminator: nn.Module
    eg_state: ModelState
    d_state: ModelState
    train_step: Callable
    decode: Callable[[ModelState, jax.Array], jax.Array]
    z_dim: int


def _build_models(cfg: Config) -> Tuple[FamilyVAE, nn.Module, int]:
    dtype = jnp.dtype(cfg.dtype)
    if cfg.dataset == "birds":
        if cfg.img_size != 128:
            raise ValueError(
                "the birds G/D ladders are hard-wired to 128x128 "
                "(reference models/model.py:41-100); pass --img_size 128")
        vae = FamilyVAE(encoder=BirdsEncoder(n_z=cfg.n_hidden, dtype=dtype),
                        generator=BirdsGenerator(n_z=cfg.n_hidden, dtype=dtype))
        return vae, BirdsDiscriminator(dtype=dtype), cfg.n_hidden
    if cfg.dataset == "mnist":
        if cfg.img_size % 4:
            raise ValueError("mnist encoder pools 2x2 twice; "
                             "--img_size must be divisible by 4")
        from ..data.pipeline import uses_real_mnist
        if cfg.input_channels != 1 and uses_real_mnist(cfg):
            # the real MNIST idx loader yields 1-channel batches;
            # initializing the models on the 3-channel default would crash
            # at step 1. The synthetic fallback honours --input_channels,
            # so synthetic-data mnist runs stay valid at any channel count.
            raise ValueError("mnist is single-channel; pass "
                             "--input_channels 1")
        hw = cfg.img_size // 4  # encoder downsamples 2×2 pooling twice
        z_dim = hw * hw * 4
        vae = FamilyVAE(encoder=MnistEncoder(dtype=dtype),
                        generator=MnistGenerator(
                            dtype=dtype, out_channels=cfg.input_channels),
                        latent_hw=hw)
        return vae, MnistDiscriminator(dtype=dtype), z_dim
    raise ValueError(f"no model family for dataset {cfg.dataset!r}")


def create_family_experiment(cfg: Config, rng: jax.Array) -> FamilyExperiment:
    vae, disc, z_dim = _build_models(cfg)
    tx_eg, tx_d = (make_adam(cfg.lr, cfg.optimizer_dtype),
                   make_adam(cfg.lr, cfg.optimizer_dtype))

    rng_eg, rng_d = jax.random.split(rng)
    x_sample = jnp.zeros(
        (2, cfg.img_size, cfg.img_size, cfg.input_channels), jnp.float32)
    eg_state = init_model_state(vae, rng_eg, x_sample, tx_eg, train=True)
    d_state = init_model_state(disc, rng_d, x_sample, tx_d, train=True)

    if cfg.dataset == "birds" and getattr(cfg, "resnet18_ckpt", ""):
        from ..models.resnet import load_torch_checkpoint
        converted = load_torch_checkpoint(cfg.resnet18_ckpt)
        if converted is not None:
            params = dict(eg_state.params)
            enc = dict(params["encoder"])
            enc["resnet"] = converted["params"]
            params["encoder"] = enc
            stats = dict(eg_state.batch_stats)
            enc_s = dict(stats.get("encoder", {}))
            enc_s["resnet"] = converted["batch_stats"]
            stats["encoder"] = enc_s
            eg_state = ModelState(params=params, batch_stats=stats,
                                  opt_state=tx_eg.init(params))

    def eg_apply(params, stats, x, eps_rng, method=None):
        return vae.apply(
            {"params": params, "batch_stats": stats}, x, train=True,
            rngs={"reparam": eps_rng}, mutable=["batch_stats"],
            method=method)

    def d_apply(params, stats, x):
        # logits out: bounded BCE gradients even when D saturates (the
        # framework-wide logits-BCE invariant; CLAUDE.md, ops/losses.py)
        return disc.apply(
            {"params": params, "batch_stats": stats}, x, train=True,
            return_logits=True, mutable=["batch_stats"])

    def train_step(eg_state: ModelState, d_state: ModelState,
                   batch: jax.Array, rng: jax.Array
                   ) -> Tuple[ModelState, ModelState, Dict[str, jax.Array]]:
        rng_label, rng_prior, rng_eps = jax.random.split(rng, 3)
        labels = sample_labels(rng_label)
        z_prior = jax.random.normal(
            rng_prior, (batch.shape[0], z_dim), jnp.float32)

        fake, eg_mut = eg_apply(eg_state.params, eg_state.batch_stats,
                                z_prior, rng_eps, method=FamilyVAE.decode)
        fake = jax.lax.stop_gradient(fake)
        eg_state = eg_state.replace(batch_stats=eg_mut["batch_stats"])

        def d_loss_fn(d_params):
            (l_real, _), mut1 = d_apply(d_params, d_state.batch_stats, batch)
            (l_fake, _), mut2 = d_apply(d_params, mut1["batch_stats"], fake)
            loss = (bce_logits(l_real, labels["real"])
                    + bce_logits(l_fake, labels["fake"]))
            return loss, {"stats": mut2["batch_stats"],
                          "D_x": jnp.mean(jax.nn.sigmoid(l_real))}
        (d_loss, d_aux), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(d_state.params)
        d_state = apply_updates(d_state, d_grads, tx_d,
                                new_batch_stats=d_aux["stats"])

        def eg_loss_fn(eg_params):
            (recon, z, kld_ps), mut = eg_apply(
                eg_params, eg_state.batch_stats, batch, rng_eps)
            (l_recon, _), d_mut = d_apply(
                d_state.params, d_state.batch_stats, recon)
            recon_l = reconstruction_loss(recon, batch)
            loss = (cfg.beta * jnp.sum(kld_ps) + recon_l
                    + bce_logits(l_recon, labels["real"]))
            # recon reported separately: the total carries an irreducible
            # adversarial(+KLD) floor at equilibrium, so trajectory gates
            # (benchmarks/family_traj.py) watch the component that MUST
            # fall when the autoencoder learns
            return loss, {"eg_stats": mut["batch_stats"],
                          "d_stats": d_mut["batch_stats"],
                          "recon": recon_l}
        (eg_loss, eg_aux), eg_grads = jax.value_and_grad(
            eg_loss_fn, has_aux=True)(eg_state.params)
        eg_state = apply_updates(eg_state, eg_grads, tx_eg,
                                 new_batch_stats=eg_aux["eg_stats"])
        d_state = d_state.replace(batch_stats=eg_aux["d_stats"])

        return eg_state, d_state, {"loss": eg_loss, "errD": d_loss,
                                   "recon": eg_aux["recon"],
                                   "D_x": d_aux["D_x"]}

    def decode(eg_state: ModelState, z: jax.Array) -> jax.Array:
        out, _ = eg_apply(eg_state.params, eg_state.batch_stats, z,
                          jax.random.key(0), method=FamilyVAE.decode)
        return out

    return FamilyExperiment(
        vae=vae, discriminator=disc, eg_state=eg_state, d_state=d_state,
        train_step=jax.jit(train_step, donate_argnums=(0, 1)),
        decode=jax.jit(decode), z_dim=z_dim)
