"""β-VAE-GAN experiment — the flagship three-phase alternating update,
compiled as ONE jitted XLA program per batch.

Parity target: experiments/new_betavaegan.py:77-201 (Larsen et al. 2016
Algorithm 1 with a β-weighted KL). Per batch:

(1) Discriminator (new_betavaegan.py:95-123):
    loss_D = BCE(D(x), real) + BCE(D(decode(z~N(0,1))), fake); Adam step on D.
    The reference runs two backwards accumulating into the same grads —
    identical to the gradient of the sum.

(2) Decoder (new_betavaegan.py:127-164): with the *updated* D,
    loss_dec = BCE(D(fake), real) + BCE(D(x̂), real)
             + 0.5·Σ(Dis_l(x̂) − Dis_l(x))²  (feature-wise SIM)
             + Σ(x̂ − x)²                     (pixel MSE)
    where x̂, μ, logσ² = VAE(x) with fresh ε, ``fake`` is re-derived from the
    same z (VAE params unchanged since phase 1, so value and gradient are
    identical to the reference's retained graph), and Dis_l(x) is a constant
    (the reference's ``sim_real`` carries no VAE-side graph). Adam step on
    the VAE ("EG") optimizer.

(3) Encoder (new_betavaegan.py:167-193): re-forward with fresh ε,
    loss_enc = β·KLD(μ, logσ²) + Σ(x̂ − x)²; second Adam step on the same EG
    optimizer (shared moments/step count, like the single torch optimizerEG).

freeze_mode:
- 'observed' (default): phases 2 and 3 update ALL VAE parameters — the
  reference's requires_grad "freezing" (new_betavaegan.py:131-143,169-180)
  is set on Module attributes, not Parameters, and is therefore a no-op;
  the published FID numbers were produced by this behaviour.
- 'intent': true torch-freeze semantics of the stated intent of those
  lines — phase 2 differentiates and Adam-steps ONLY the decoder subtree,
  phase 3 only the encoder (torch params with requires_grad=False get
  grad=None and are skipped by torch.optim.Adam entirely: no moment decay,
  no step-count advance). The EG optimizer state is a
  {"dec": ..., "enc": ...} pair of independent Adam states, and the frozen
  side's backward is never computed — substantially cheaper per step than
  'observed' as well as more faithful to the intent.

Learning rate: the reference hardcodes Adam(lr=1e-3) at
new_betavaegan.py:49-50, but every published run was trained with lr=3e-4
(results/logs/*.json args; report Table 3). We honour ``cfg.lr``
(default 3e-4).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config import Config
from ..models.gan import DiscriminatorCeleba
from ..models.vae import VAE
from ..ops.losses import bce_logits, kld, reconstruction_loss, sim_loss
from .common import (ModelState, apply_updates, init_model_state, make_adam,
                     sample_labels)


@dataclasses.dataclass
class VAEGANExperiment:
    vae: VAE
    discriminator: DiscriminatorCeleba
    eg_state: ModelState
    d_state: ModelState
    train_step: Callable
    step_fn: Callable  # pure, un-jitted — for lax.scan multi-step drivers
    decode: Callable[[ModelState, jax.Array], jax.Array]
    reconstruct: Callable[[ModelState, jax.Array, jax.Array], jax.Array]
    # pure step with β as its LAST (traced) operand. β never appears in the
    # lowered HLO as a constant, so every β of a sweep / BO search lowers to
    # the IDENTICAL program and the persistent XLA compilation cache turns
    # the per-β compile into a seconds-long re-trace (measured on the
    # full-size step: 105 s for the first β, ~5 s per β after —
    # benchmarks/README_PERF.md; HLO equality asserted by
    # tests/test_train_steps.py::test_vaegan_beta_runtime_operand).
    step_with_beta: Callable = None


def create_vaegan_experiment(cfg: Config, rng: jax.Array) -> VAEGANExperiment:
    dtype = jnp.dtype(cfg.dtype)
    bn_groups = getattr(cfg, "bn_groups", 1)
    vae = VAE(
        n_hidden=cfg.n_hidden, n_z=tuple(cfg.n_z),
        representation_size=cfg.representation_size,
        head_width=cfg.head_width,
        decoder_channels=tuple(cfg.decoder_channels),
        input_channels=cfg.input_channels, dtype=dtype,
        bn_groups=bn_groups,
    )
    discriminator = DiscriminatorCeleba(
        n_z=tuple(cfg.n_z), input_channels=cfg.input_channels,
        channels=tuple(cfg.disc_channels),
        feature_dim=cfg.disc_feature_dim, dtype=dtype,
        bn_groups=bn_groups,
    )
    tx_eg, tx_d = (make_adam(cfg.lr, cfg.optimizer_dtype),
                   make_adam(cfg.lr, cfg.optimizer_dtype))
    beta_value = jnp.float32(cfg.beta)
    intent = cfg.freeze_mode == "intent"

    rng_eg, rng_d = jax.random.split(rng)
    x_sample = jnp.zeros(
        (2, cfg.img_size, cfg.img_size, cfg.input_channels), jnp.float32
    )
    eg_state = init_model_state(vae, rng_eg, x_sample, tx_eg, train=True)
    d_state = init_model_state(discriminator, rng_d, x_sample, tx_d, train=True)
    if intent:
        # independent per-subtree Adam states (torch: frozen params have
        # grad None and are skipped; each param's state advances only when
        # its phase trains it)
        eg_state = eg_state.replace(opt_state={
            "dec": tx_eg.init(eg_state.params["decoder"]),
            "enc": tx_eg.init(eg_state.params["encoder"]),
        })

    def d_apply(params, stats, x):
        # logits out: bounded BCE gradients even when D saturates
        return discriminator.apply(
            {"params": params, "batch_stats": stats}, x, train=True,
            return_logits=True, mutable=["batch_stats"],
        )

    def eg_forward(params, stats, x, eps_rng):
        return vae.apply(
            {"params": params, "batch_stats": stats}, x, train=True,
            rngs={"reparam": eps_rng}, mutable=["batch_stats"],
        )

    def eg_decode(params, stats, z):
        return vae.apply(
            {"params": params, "batch_stats": stats}, z, train=True,
            method=VAE.decode, mutable=["batch_stats"],
        )

    def train_step(eg_state: ModelState, d_state: ModelState,
                   batch: jax.Array, rng: jax.Array, beta: jax.Array
                   ) -> Tuple[ModelState, ModelState, Dict[str, jax.Array]]:
        """β is a traced OPERAND, not a baked constant — see
        VAEGANExperiment.step_with_beta."""
        rng_label, rng_noise, rng_eps_dec, rng_eps_enc = jax.random.split(rng, 4)
        labels = sample_labels(rng_label)
        noise = jax.random.normal(
            rng_noise, (batch.shape[0], cfg.n_hidden), jnp.float32)

        # ---------------- (1) Discriminator ------------------------------
        # decode(noise) ONCE, keeping its vjp: phase 2's errG_fake gradient
        # pulls back through THESE residuals instead of re-running the
        # decoder forward (bit-identical params out — asserted by
        # tests/test_train_steps.py::test_vaegan_vjp_reuse_matches_naive —
        # and measured 1.8 ms/step faster; the torch analogue is exactly
        # the reference's retained graph, new_betavaegan.py:113,144-156).
        if intent:
            (fake, eg_mut), dec_vjp = jax.vjp(
                lambda pd: eg_decode({**eg_state.params, "decoder": pd},
                                     eg_state.batch_stats, noise),
                eg_state.params["decoder"])
        else:
            (fake, eg_mut), dec_vjp = jax.vjp(
                lambda p: eg_decode(p, eg_state.batch_stats, noise),
                eg_state.params)
        zero_mut_ct = jax.tree.map(jnp.zeros_like, eg_mut)
        fake = jax.lax.stop_gradient(fake)
        eg_state = eg_state.replace(batch_stats=eg_mut["batch_stats"])

        def d_loss_fn(d_params):
            (l_real, _), mut1 = d_apply(d_params, d_state.batch_stats, batch)
            (l_fake, _), mut2 = d_apply(d_params, mut1["batch_stats"], fake)
            loss = (bce_logits(l_real, labels["real"])
                    + bce_logits(l_fake, labels["fake"]))
            return loss, {"D_x": jnp.mean(jax.nn.sigmoid(l_real)),
                          "stats": mut2["batch_stats"]}

        (_, d_aux), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
            d_state.params)
        d_state = apply_updates(d_state, d_grads, tx_d,
                                new_batch_stats=d_aux["stats"])
        d_x = d_aux["D_x"]

        # ---------------- (2) Decoder ------------------------------------
        # sim_real from the *updated* D on the real batch; constant w.r.t.
        # the VAE (new_betavaegan.py:129 — netD(data) carries no EG graph).
        (_, sim_real), d_mut = d_apply(d_state.params, d_state.batch_stats, batch)
        sim_real = jax.lax.stop_gradient(sim_real)
        d_state = d_state.replace(batch_stats=d_mut["batch_stats"])

        # errG_fake = BCE(D(fake), real): gradient w.r.t. the decoder via
        # the saved phase-1 vjp — `fake` is the same value the reference's
        # retained graph reuses (EG params unchanged since phase 1).
        def err_fake_loss(x):
            (l_fake, _), d_mut1 = d_apply(
                d_state.params, d_state.batch_stats, x)
            return bce_logits(l_fake, labels["real"]), \
                d_mut1["batch_stats"]

        (_, d_stats1), g_fake_input = jax.value_and_grad(
            err_fake_loss, has_aux=True)(fake)
        g_fake, = dec_vjp((g_fake_input, zero_mut_ct))

        def dec_loss_rest(eg_params):
            """Phase-2 loss WITHOUT errG_fake (handled via dec_vjp above);
            the D running-stats chain still runs fake → recon
            (new_betavaegan.py:144-156 order)."""
            (recon, mu, logvar), mut = eg_forward(
                eg_params, eg_state.batch_stats, batch, rng_eps_dec)
            (l_recon, sim_recon), d_mut2 = d_apply(
                d_state.params, d_stats1, recon)
            err_g_recon = bce_logits(l_recon, labels["real"])
            s_loss = sim_loss(sim_recon, sim_real)
            r_loss = reconstruction_loss(recon, batch)
            loss = err_g_recon + s_loss + r_loss
            return loss, {"eg_stats": mut["batch_stats"],
                          "d_stats": d_mut2["batch_stats"],
                          "sim": s_loss, "recon": r_loss}

        if intent:
            # differentiate ONLY the decoder subtree: the encoder backward
            # is never built (torch-freeze semantics + compute saving)
            def dec_loss_sub(dec_params):
                return dec_loss_rest(
                    {**eg_state.params, "decoder": dec_params})
            (_, dec_aux), sub_grads = jax.value_and_grad(
                dec_loss_sub, has_aux=True)(eg_state.params["decoder"])
            sub_grads = jax.tree.map(jnp.add, sub_grads, g_fake)
            updates, new_dec_opt = tx_eg.update(
                sub_grads, eg_state.opt_state["dec"],
                eg_state.params["decoder"])
            new_params = dict(eg_state.params)
            new_params["decoder"] = optax.apply_updates(
                eg_state.params["decoder"], updates)
            eg_state = ModelState(
                params=new_params, batch_stats=dec_aux["eg_stats"],
                opt_state={**eg_state.opt_state, "dec": new_dec_opt})
        else:
            (_, dec_aux), dec_grads = jax.value_and_grad(
                dec_loss_rest, has_aux=True)(eg_state.params)
            dec_grads = jax.tree.map(jnp.add, dec_grads, g_fake)
            eg_state = apply_updates(eg_state, dec_grads, tx_eg,
                                     new_batch_stats=dec_aux["eg_stats"])
        d_state = d_state.replace(batch_stats=dec_aux["d_stats"])

        # ---------------- (3) Encoder ------------------------------------
        def enc_loss_fn(eg_params):
            (recon, mu, logvar), mut = eg_forward(
                eg_params, eg_state.batch_stats, batch, rng_eps_enc)
            k_loss = beta * kld(mu, logvar)
            r_loss = reconstruction_loss(recon, batch)
            return k_loss + r_loss, {"eg_stats": mut["batch_stats"],
                                     "kld": k_loss, "recon": r_loss}

        if intent:
            def enc_loss_sub(enc_params):
                return enc_loss_fn({**eg_state.params, "encoder": enc_params})
            (_, enc_aux), sub_grads = jax.value_and_grad(
                enc_loss_sub, has_aux=True)(eg_state.params["encoder"])
            updates, new_enc_opt = tx_eg.update(
                sub_grads, eg_state.opt_state["enc"],
                eg_state.params["encoder"])
            new_params = dict(eg_state.params)
            new_params["encoder"] = optax.apply_updates(
                eg_state.params["encoder"], updates)
            eg_state = ModelState(
                params=new_params, batch_stats=enc_aux["eg_stats"],
                opt_state={**eg_state.opt_state, "enc": new_enc_opt})
        else:
            (_, enc_aux), enc_grads = jax.value_and_grad(
                enc_loss_fn, has_aux=True)(eg_state.params)
            eg_state = apply_updates(eg_state, enc_grads, tx_eg,
                                     new_batch_stats=enc_aux["eg_stats"])

        # Metric semantics follow the reference loop: both "enc" and "dec"
        # running losses accumulate the encoder-phase pixel MSE
        # (new_betavaegan.py:189-190), and the "dis loss" accumulator holds
        # mean D(x) (new_betavaegan.py:107).
        metrics = {
            "recon_enc": enc_aux["recon"],
            "recon_dec": enc_aux["recon"],
            "dis": d_x,
            "D_x": d_x,
            "kld": enc_aux["kld"],
            "sim": dec_aux["sim"],
        }
        return eg_state, d_state, metrics

    def decode(eg_state: ModelState, z: jax.Array) -> jax.Array:
        out, _ = eg_decode(eg_state.params, eg_state.batch_stats, z)
        return out

    def reconstruct(eg_state: ModelState, x: jax.Array, rng: jax.Array) -> jax.Array:
        (recon, _, _), _ = eg_forward(
            eg_state.params, eg_state.batch_stats, x, rng)
        return recon

    jit_step = jax.jit(train_step, donate_argnums=(0, 1))
    return VAEGANExperiment(
        vae=vae,
        discriminator=discriminator,
        eg_state=eg_state,
        d_state=d_state,
        train_step=lambda eg, d, batch, rng: jit_step(
            eg, d, batch, rng, beta_value),
        step_fn=lambda eg, d, batch, rng: train_step(
            eg, d, batch, rng, beta_value),
        decode=jax.jit(decode),
        reconstruct=jax.jit(reconstruct),
        step_with_beta=train_step,
    )
