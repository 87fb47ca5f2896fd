"""DCGAN experiment: alternating D/G update in one jitted step.

Parity target: experiments/new_gan.py:66-141.
Per batch: draw smoothed/flipped labels (new_gan.py:77-78); D step on
BCE(D(x), real) + BCE(D(G(z)), fake) (:84-113); G step on
BCE(D_updated(G(z)), real) with the same z (:118-128 — ``fake`` is reused,
and G's params are unchanged since it was produced, so recomputing
G(z) under grad gives the identical value and gradient).

Deviation (documented): the reference's epoch normalization overwrites
``avg_loss_D`` with ``avg_loss_G / len(dataset)`` (new_gan.py:138-139),
a bug that only affects the logged value; we report the true D loss.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from ..config import Config
from ..models.gan import DiscriminatorCeleba, GeneratorCeleba
from ..ops.losses import bce_logits
from .common import ModelState, apply_updates, init_model_state, make_adam, sample_labels


@dataclasses.dataclass
class GANExperiment:
    generator: GeneratorCeleba
    discriminator: DiscriminatorCeleba
    g_state: ModelState
    d_state: ModelState
    train_step: Callable
    step_fn: Callable  # pure, un-jitted — for lax.scan multi-step drivers
    generate: Callable[[ModelState, jax.Array], jax.Array]


def create_gan_experiment(cfg: Config, rng: jax.Array) -> GANExperiment:
    dtype = jnp.dtype(cfg.dtype)
    bn_groups = getattr(cfg, "bn_groups", 1)
    generator = GeneratorCeleba(
        n_hidden=cfg.n_hidden, n_z=tuple(cfg.n_z),
        channels=tuple(cfg.decoder_channels),
        output_channels=cfg.input_channels, dtype=dtype,
        bn_groups=bn_groups,
    )
    discriminator = DiscriminatorCeleba(
        n_z=tuple(cfg.n_z), input_channels=cfg.input_channels,
        channels=tuple(cfg.disc_channels),
        feature_dim=cfg.disc_feature_dim, dtype=dtype,
        bn_groups=bn_groups,
    )
    tx_g, tx_d = (make_adam(cfg.lr, cfg.optimizer_dtype),
                  make_adam(cfg.lr, cfg.optimizer_dtype))

    rng_g, rng_d = jax.random.split(rng)
    z_sample = jnp.zeros((2, cfg.n_hidden), jnp.float32)
    x_sample = jnp.zeros(
        (2, cfg.img_size, cfg.img_size, cfg.input_channels), jnp.float32
    )
    g_state = init_model_state(generator, rng_g, z_sample, tx_g, train=True)
    d_state = init_model_state(discriminator, rng_d, x_sample, tx_d, train=True)

    def d_apply(params, stats, x):
        # logits out: bounded BCE gradients even when D saturates
        return discriminator.apply(
            {"params": params, "batch_stats": stats}, x, train=True,
            return_logits=True, mutable=["batch_stats"],
        )

    def g_apply(params, stats, z):
        return generator.apply(
            {"params": params, "batch_stats": stats}, z, train=True,
            mutable=["batch_stats"],
        )

    def train_step(g_state: ModelState, d_state: ModelState,
                   batch: jax.Array, rng: jax.Array
                   ) -> Tuple[ModelState, ModelState, Dict[str, jax.Array]]:
        rng_label, rng_noise = jax.random.split(rng)
        labels = sample_labels(rng_label)
        noise = jax.random.normal(
            rng_noise, (batch.shape[0], cfg.n_hidden), jnp.float32)

        # --- (1) Update D: maximize log D(x) + log(1 - D(G(z))) ----------
        # G(z) runs ONCE, keeping its vjp: the G step's gradient pulls back
        # through these residuals — the reference's retained ``fake``
        # (new_gan.py:99-128) made literal; bit-identical to recomputing
        # (tests/test_train_steps.py::test_gan_vjp_reuse_matches_naive).
        (fake, g_mut), g_vjp = jax.vjp(
            lambda p: g_apply(p, g_state.batch_stats, noise), g_state.params)
        fake_sg = jax.lax.stop_gradient(fake)

        def d_loss_fn(d_params):
            (l_real, _), mut1 = d_apply(d_params, d_state.batch_stats, batch)
            (l_fake, _), mut2 = d_apply(d_params, mut1["batch_stats"],
                                        fake_sg)
            err_real = bce_logits(l_real, labels["real"])
            err_fake = bce_logits(l_fake, labels["fake"])
            aux = {
                "errD": err_real + err_fake,
                "D_x": jnp.mean(jax.nn.sigmoid(l_real)),
                "D_G_z1": jnp.mean(jax.nn.sigmoid(l_fake)),
                "stats": mut2["batch_stats"],
            }
            return err_real + err_fake, aux

        (_, d_aux), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
            d_state.params)
        d_state = apply_updates(d_state, d_grads, tx_d,
                                new_batch_stats=d_aux["stats"])

        # --- (2) Update G: maximize log D(G(z)) with the updated D -------
        def g_loss_from_fake(x):
            (l_fake, _), d_mut = d_apply(
                d_state.params, d_state.batch_stats, x)
            err_g = bce_logits(l_fake, labels["real"])
            return err_g, {
                "errG": err_g,
                "D_G_z2": jnp.mean(jax.nn.sigmoid(l_fake)),
                "d_stats": d_mut["batch_stats"],
            }

        (_, g_aux), gx = jax.value_and_grad(g_loss_from_fake, has_aux=True)(
            fake_sg)
        g_grads, = g_vjp((gx, jax.tree.map(jnp.zeros_like, g_mut)))
        d_state = d_state.replace(batch_stats=g_aux["d_stats"])
        g_state = apply_updates(g_state, g_grads, tx_g,
                                new_batch_stats=g_mut["batch_stats"])

        metrics = {
            "errD": d_aux["errD"],
            "errG": g_aux["errG"],
            "D_x": d_aux["D_x"],
            "D_G_z1": d_aux["D_G_z1"],
            "D_G_z2": g_aux["D_G_z2"],
        }
        return g_state, d_state, metrics

    def generate(g_state: ModelState, z: jax.Array) -> jax.Array:
        out, _ = g_apply(g_state.params, g_state.batch_stats, z)
        return out

    return GANExperiment(
        generator=generator,
        discriminator=discriminator,
        g_state=g_state,
        d_state=d_state,
        train_step=jax.jit(train_step, donate_argnums=(0, 1)),
        step_fn=train_step,
        generate=jax.jit(generate),
    )
