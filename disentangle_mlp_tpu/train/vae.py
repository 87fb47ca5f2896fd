"""Plain-VAE experiment: one jitted Adam step on MSE_sum + KLD.

Parity target: experiments/new_vae.py — module wiring at new_vae.py:21-35,
loss at :39-48, per-batch update at :50-60. The whole per-batch body
(forward, loss, backward, Adam step) is a single compiled XLA program.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from ..config import Config
from ..models.vae import VAE
from ..ops.losses import vae_loss
from .common import ModelState, apply_updates, init_model_state, make_adam


@dataclasses.dataclass
class VAEExperiment:
    model: VAE
    state: ModelState
    train_step: Callable[[ModelState, jax.Array, jax.Array],
                         Tuple[ModelState, Dict[str, jax.Array]]]
    step_fn: Callable  # pure, un-jitted — for lax.scan multi-step drivers
    decode: Callable[[ModelState, jax.Array], jax.Array]
    reconstruct: Callable[[ModelState, jax.Array, jax.Array], jax.Array]


def _model_from_config(cfg: Config) -> VAE:
    return VAE(
        n_hidden=cfg.n_hidden,
        n_z=tuple(cfg.n_z),
        representation_size=cfg.representation_size,
        head_width=cfg.head_width,
        decoder_channels=tuple(cfg.decoder_channels),
        input_channels=cfg.input_channels,
        dtype=jnp.dtype(cfg.dtype),
        bn_groups=getattr(cfg, "bn_groups", 1),
    )


def create_vae_experiment(cfg: Config, rng: jax.Array) -> VAEExperiment:
    model = _model_from_config(cfg)
    tx = make_adam(cfg.lr, cfg.optimizer_dtype)
    sample = jnp.zeros(
        (2, cfg.img_size, cfg.img_size, cfg.input_channels), jnp.float32
    )
    state = init_model_state(model, rng, sample, tx, train=True)

    def train_step(state: ModelState, batch: jax.Array, rng: jax.Array):
        def loss_fn(params):
            (recon, mu, logvar), mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch, train=True,
                rngs={"reparam": rng},
                mutable=["batch_stats"],
            )
            return vae_loss(recon, batch, mu, logvar), mut["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        new_state = apply_updates(state, grads, tx, new_batch_stats=new_stats)
        return new_state, {"loss": loss}

    def decode(state: ModelState, z: jax.Array) -> jax.Array:
        # The reference samples with the model left in train() mode, so BN
        # uses the sample batch's own statistics (new_vae.py:96-97 after :51).
        out, _ = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            z, train=True, method=VAE.decode,
            mutable=["batch_stats"],
        )
        return out

    def reconstruct(state: ModelState, x: jax.Array, rng: jax.Array) -> jax.Array:
        # train-mode BN (reference behaviour, new_vae.py:122 after :51) —
        # batch_stats must be mutable even though the update is discarded
        (recon, _, _), _ = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            x, train=True, rngs={"reparam": rng},
            mutable=["batch_stats"],
        )
        return recon

    return VAEExperiment(
        model=model,
        state=state,
        train_step=jax.jit(train_step, donate_argnums=0),
        step_fn=lambda state, batch, rng: train_step(state, batch, rng),
        decode=jax.jit(decode),
        reconstruct=jax.jit(reconstruct),
    )
