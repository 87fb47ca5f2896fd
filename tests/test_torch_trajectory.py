"""End-to-end update-rule parity vs torch: the composed training dynamics.

VERDICT r2's top ask: every piece (losses, layers, converters, Inception)
was golden-tested in isolation, but nobody had proven the COMPOSED per-batch
update — forward order, BatchNorm batch/running statistics, loss
combinations, Adam moments, label sampling, both freeze modes — reproduces
the reference's torch trajectory. These tests implement the reference's
exact update rules in torch at toy width (from its behavior at
new_betavaegan.py:87-193, new_gan.py:74-128, new_vae.py:50-60), feed both
frameworks identical random draws, run several full steps from a converted
identical init, and assert per-phase losses AND the full parameter +
BN-running-stat trees agree within float tolerance.

Randomness coupling: labels are recomputed from the step's rng exactly as
the JAX step derives them; the normal draws (GAN/VAE-GAN noise, per-phase
reparameterization ε) are CAPTURED from the production (un-jitted) JAX step
via a recording jax.random.normal and injected into the torch mirror, so
both sides consume bit-identical values. The JAX side runs the SAME
step_fn that production jits.

Known fp-level deviations absorbed by the tolerances: BCE computed on
logits vs torch's prob-space BCELoss (identical analytic value/gradient,
ops/losses.py docstring) and NHWC vs NCHW reduction orders.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
from torch import nn

import jax
import jax.numpy as jnp

from disentangle_mlp_tpu.config import Config
from disentangle_mlp_tpu.train.common import sample_labels
from disentangle_mlp_tpu.utils.torch_compat import (
    convert_decoder_state_dict, convert_discriminator_state_dict,
    convert_vae_state_dict)
from tests.test_torch_compat import (DEC_CH, DISC_CH, FEAT_DIM, HEAD, IMG,
                                     N_HIDDEN, N_Z, RS, RefDisc, RefVAE)

LR = 1e-3
BATCH = 4
STEPS = 3
BETA = 25.0

# Tolerance rationale (measured on this exact configuration; see the
# round-3 commit). A bias feeding straight into BatchNorm has MATHEMATICALLY
# ZERO gradient (BN subtracts the batch mean), so both frameworks train
# those biases on pure fp noise — independent Adam random walks of ±LR per
# update with no effect on any train-mode forward. They are excluded from
# the strict comparison and bounded loosely; the same walk leaks into the
# running MEAN of the BN directly after them (the batch mean includes the
# bias verbatim), so running stats get a loose absolute bound too (a real
# running-stat bug — e.g. the missing Bessel correction this test caught —
# is a 33% error at these widths, far above it).
#
# Measured max deviations after 3 steps: intent params 8e-5 (the frozen
# phase never perturbs the other subtree, so fp noise stays linear);
# observed params 2e-3 (every phase updates everything, and Adam's
# g/(|g|+eps) normalization amplifies fp-level gradient differences near
# g=0 into ±LR update differences); metrics ≤4e-6 (intent) / ≤1.3e-3
# (observed, via the same amplification reaching μ/logσ²).
TOL = {
    "intent": {"metric_rtol": 1e-4, "param_atol": 5e-4},
    "observed": {"metric_rtol": 5e-3, "param_atol": 6e-3},
}
STATS_ATOL = 2e-2
CANCELLED_ATOL = 4e-2  # BN-cancelled biases: bounded random walk ≈ 2·LR·updates

# modules whose bias feeds a BatchNorm (reference arch: every conv/linear
# before a BN — model.py:449-471, 490-507, 388-404)
BN_CANCELLED = {"conv1", "conv2", "conv3", "conv4", "mu_fc1", "lv_fc1",
                "preprocess", "deconv1", "deconv2", "deconv3"}


def _tiny_cfg(mode="observed", **kw):
    return Config(name=f"traj_{mode}", n_hidden=N_HIDDEN, n_z=list(N_Z),
                  representation_size=RS, head_width=HEAD,
                  decoder_channels=list(DEC_CH), disc_channels=list(DISC_CH),
                  disc_feature_dim=FEAT_DIM, img_size=IMG,
                  batch_size_train=BATCH, dtype="float32", lr=LR,
                  beta=BETA, freeze_mode=mode, **kw)


def _batch():
    x = np.random.default_rng(0).uniform(
        -1, 1, (BATCH, IMG, IMG, 3)).astype(np.float32)
    return x, torch.from_numpy(x).permute(0, 3, 1, 2)


def _capture_normals(fn, *args):
    """Run ``fn`` eagerly with a recording jax.random.normal; returns
    (fn result, [draws in call order])."""
    real = jax.random.normal
    draws = []

    def recording(key, shape=(), dtype=jnp.float32):
        out = real(key, shape, dtype)
        # flax validates existing params by eval_shape-tracing their
        # initializers; only concrete (eager) draws are the step's actual
        # randomness
        if not isinstance(out, jax.core.Tracer):
            draws.append(np.asarray(jax.device_get(out), np.float32))
        return out

    jax.random.normal = recording
    try:
        result = fn(*args)
    finally:
        jax.random.normal = real
    return result, draws


def _labels_for(rng, n_splits):
    """The label pair exactly as the JAX step derives it: first key of the
    step's rng split feeds sample_labels."""
    keys = jax.random.split(rng, n_splits)
    lab = sample_labels(keys[0])
    return float(lab["real"]), float(lab["fake"])


def _bce(probs, label_value):
    return F.binary_cross_entropy(
        probs, torch.full_like(probs, label_value))


def _assert_tree_close(ours, theirs, atol, what):
    """Compare a JAX param/stat tree against a converted-torch tree
    leaf-by-leaf (identical structure by construction). BN-cancelled
    biases (see BN_CANCELLED) get CANCELLED_ATOL instead of ``atol``."""
    flat_o = jax.tree_util.tree_flatten_with_path(ours)[0]
    flat_t = jax.tree_util.tree_flatten_with_path(theirs)[0]
    assert len(flat_o) == len(flat_t), what
    for (path_o, leaf_o), (path_t, leaf_t) in zip(flat_o, flat_t):
        assert path_o == path_t, (what, path_o, path_t)
        ks = jax.tree_util.keystr(path_o)
        cancelled = (ks.endswith("['bias']")
                     and any(f"['{m}']" in ks for m in BN_CANCELLED))
        np.testing.assert_allclose(
            np.asarray(jax.device_get(leaf_o)), np.asarray(leaf_t),
            atol=CANCELLED_ATOL if cancelled else atol, rtol=1e-3,
            err_msg=f"{what}: {ks}")


def _enc_params(vae):
    for m in (vae.features, vae.x_to_mu, vae.x_to_logvar):
        yield from m.parameters()


def _dec_params(vae):
    for m in (vae.preprocess, vae.deconv1, vae.act1, vae.deconv2, vae.act2,
              vae.deconv3, vae.act3, vae.deconv4):
        yield from m.parameters()


def _vae_forward(vae, x, eps):
    """encode → z = μ + ε·exp(½logσ²) → decode, with ε injected (the
    reference's reparameterize, model.py:532-535, draws torch.randn)."""
    mu, logvar = vae.encode(x)
    z = mu + torch.from_numpy(eps) * torch.exp(0.5 * logvar)
    return vae.decode(z), mu, logvar


# ---------------------------------------------------------------------------
# β-VAE-GAN — the flagship 3-phase update (new_betavaegan.py:87-193)
# ---------------------------------------------------------------------------

def _torch_vaegan_step(vae, disc, opt_eg, opt_d, x, real_l, fake_l,
                       noise, eps_dec, eps_enc, beta, intent):
    out = {}
    # ---- (1) Discriminator: BCE(D(x), real) + BCE(D(dec(z)), fake) ----
    disc.zero_grad()
    prob_real, _ = disc(x)
    _bce(prob_real, real_l).backward()
    out["D_x"] = prob_real.mean().item()
    fake = vae.decode(torch.from_numpy(noise))
    prob_fake, _ = disc(fake.detach())
    _bce(prob_fake, fake_l).backward()
    opt_d.step()

    # ---- (2) Decoder: BCE(D(fake),real) + BCE(D(x̂),real) + SIM + MSE --
    vae.zero_grad()
    _, sim_real = disc(x)  # updated D; no grad path into the VAE
    if intent:  # true-freeze semantics of the reference's stated intent
        for p in _enc_params(vae):
            p.requires_grad_(False)
    recon, mu, logvar = _vae_forward(vae, x, eps_dec)
    prob_fake2, _ = disc(fake)  # NOT detached: the retained phase-1 graph
    prob_recon, sim_recon = disc(recon)
    _bce(prob_fake2, real_l).backward(retain_graph=True)
    _bce(prob_recon, real_l).backward(retain_graph=True)
    sim = 0.5 * F.mse_loss(sim_recon, sim_real, reduction="sum")
    sim.backward(retain_graph=True)
    F.mse_loss(recon, x, reduction="sum").backward()
    opt_eg.step()
    if intent:
        for p in _enc_params(vae):
            p.requires_grad_(True)
    out["sim"] = sim.item()

    # ---- (3) Encoder: β·KLD + MSE ------------------------------------
    vae.zero_grad()
    if intent:
        for p in _dec_params(vae):
            p.requires_grad_(False)
    recon, mu, logvar = _vae_forward(vae, x, eps_enc)
    kld = beta * (-0.5 * torch.sum(1 + logvar - mu.pow(2) - logvar.exp()))
    kld.backward(retain_graph=True)
    mse = F.mse_loss(recon, x, reduction="sum")
    mse.backward()
    opt_eg.step()
    if intent:
        for p in _dec_params(vae):
            p.requires_grad_(True)
    out["kld"] = kld.item()
    out["recon_enc"] = mse.item()
    return out


@pytest.mark.parametrize("mode", ["observed", "intent"])
def test_vaegan_trajectory_matches_torch(mode):
    from disentangle_mlp_tpu.train.vaegan import create_vaegan_experiment

    torch.manual_seed(41)
    vae_t, disc_t = RefVAE(), RefDisc()
    vae_t.train(), disc_t.train()
    opt_eg = torch.optim.Adam(vae_t.parameters(), lr=LR)
    opt_d = torch.optim.Adam(disc_t.parameters(), lr=LR)

    cfg = _tiny_cfg(mode)
    exp = create_vaegan_experiment(cfg, jax.random.key(0))
    eg_p, eg_s = convert_vae_state_dict(vae_t.state_dict(), RS, N_Z,
                                        feature_hw=IMG // 8)
    d_p, d_s = convert_discriminator_state_dict(
        disc_t.state_dict(), (DISC_CH[-1], IMG // 8, IMG // 8))
    eg = exp.eg_state.replace(params=eg_p, batch_stats=eg_s)
    d = exp.d_state.replace(params=d_p, batch_stats=d_s)

    x_np, x_t = _batch()
    x_j = jnp.asarray(x_np)

    for step in range(STEPS):
        rng = jax.random.fold_in(jax.random.key(7), step)
        real_l, fake_l = _labels_for(rng, 4)
        (eg, d, m), draws = _capture_normals(
            exp.step_fn, eg, d, x_j, rng)
        noise, eps_dec, eps_enc = draws
        assert noise.shape == eps_dec.shape == eps_enc.shape == (
            BATCH, N_HIDDEN)
        ref = _torch_vaegan_step(vae_t, disc_t, opt_eg, opt_d, x_t,
                                 real_l, fake_l, noise, eps_dec, eps_enc,
                                 BETA, intent=(mode == "intent"))
        for key in ("D_x", "sim", "kld", "recon_enc"):
            np.testing.assert_allclose(
                float(m[key]), ref[key], rtol=TOL[mode]["metric_rtol"],
                err_msg=f"step {step} metric {key}")

    eg_p2, eg_s2 = convert_vae_state_dict(vae_t.state_dict(), RS, N_Z,
                                          feature_hw=IMG // 8)
    d_p2, d_s2 = convert_discriminator_state_dict(
        disc_t.state_dict(), (DISC_CH[-1], IMG // 8, IMG // 8))
    atol = TOL[mode]["param_atol"]
    _assert_tree_close(eg.params, eg_p2, atol, f"[{mode}] EG params")
    _assert_tree_close(eg.batch_stats, eg_s2, STATS_ATOL,
                       f"[{mode}] EG running stats")
    _assert_tree_close(d.params, d_p2, atol, f"[{mode}] D params")
    _assert_tree_close(d.batch_stats, d_s2, STATS_ATOL,
                       f"[{mode}] D running stats")


# ---------------------------------------------------------------------------
# DCGAN (new_gan.py:74-128)
# ---------------------------------------------------------------------------

def _torch_gan_step(gen, disc, opt_g, opt_d, x, real_l, fake_l, noise):
    out = {}
    disc.zero_grad()
    prob_real, _ = disc(x)
    errD_real = _bce(prob_real, real_l)
    errD_real.backward()
    out["D_x"] = prob_real.mean().item()
    fake = gen.decode(torch.from_numpy(noise))
    prob_fake, _ = disc(fake.detach())
    errD_fake = _bce(prob_fake, fake_l)
    errD_fake.backward()
    out["D_G_z1"] = prob_fake.mean().item()
    out["errD"] = (errD_real + errD_fake).item()
    opt_d.step()

    gen.zero_grad()
    prob2, _ = disc(fake)  # retained generator graph, updated D
    errG = _bce(prob2, real_l)
    errG.backward()
    out["D_G_z2"] = prob2.mean().item()
    out["errG"] = errG.item()
    opt_g.step()
    return out


def test_gan_trajectory_matches_torch():
    from disentangle_mlp_tpu.train.gan import create_gan_experiment

    torch.manual_seed(42)
    # RefVAE's decoder half IS Generator_celeba's layout (the architecture
    # identity the reference states at model.py:331-378); only its decoder
    # submodules are optimized and converted
    gen_t, disc_t = RefVAE(), RefDisc()
    gen_t.train(), disc_t.train()
    opt_g = torch.optim.Adam(list(_dec_params(gen_t)), lr=LR)
    opt_d = torch.optim.Adam(disc_t.parameters(), lr=LR)

    cfg = _tiny_cfg()
    exp = create_gan_experiment(cfg, jax.random.key(0))
    g_p, g_s = convert_decoder_state_dict(gen_t.state_dict(), N_Z)
    d_p, d_s = convert_discriminator_state_dict(
        disc_t.state_dict(), (DISC_CH[-1], IMG // 8, IMG // 8))
    g = exp.g_state.replace(params=g_p, batch_stats=g_s)
    d = exp.d_state.replace(params=d_p, batch_stats=d_s)

    x_np, x_t = _batch()
    x_j = jnp.asarray(x_np)

    for step in range(STEPS):
        rng = jax.random.fold_in(jax.random.key(9), step)
        real_l, fake_l = _labels_for(rng, 2)
        noise = np.asarray(jax.random.normal(
            jax.random.split(rng, 2)[1], (BATCH, N_HIDDEN)), np.float32)
        g, d, m = exp.step_fn(g, d, x_j, rng)
        ref = _torch_gan_step(gen_t, disc_t, opt_g, opt_d, x_t,
                              real_l, fake_l, noise)
        for key in ("errD", "errG", "D_x", "D_G_z1", "D_G_z2"):
            np.testing.assert_allclose(
                float(m[key]), ref[key], rtol=TOL["observed"]["metric_rtol"],
                err_msg=f"step {step} metric {key}")

    g_p2, g_s2 = convert_decoder_state_dict(gen_t.state_dict(), N_Z)
    d_p2, d_s2 = convert_discriminator_state_dict(
        disc_t.state_dict(), (DISC_CH[-1], IMG // 8, IMG // 8))
    atol = TOL["observed"]["param_atol"]
    _assert_tree_close(g.params, g_p2, atol, "G params")
    _assert_tree_close(g.batch_stats, g_s2, STATS_ATOL, "G running stats")
    _assert_tree_close(d.params, d_p2, atol, "D params")
    _assert_tree_close(d.batch_stats, d_s2, STATS_ATOL, "D running stats")


# ---------------------------------------------------------------------------
# Plain VAE (new_vae.py:50-60)
# ---------------------------------------------------------------------------

def test_vae_trajectory_matches_torch():
    from disentangle_mlp_tpu.train.vae import create_vae_experiment

    torch.manual_seed(43)
    vae_t = RefVAE()
    vae_t.train()
    opt = torch.optim.Adam(vae_t.parameters(), lr=LR)

    cfg = _tiny_cfg()
    exp = create_vae_experiment(cfg, jax.random.key(0))
    p, s = convert_vae_state_dict(vae_t.state_dict(), RS, N_Z,
                                  feature_hw=IMG // 8)
    state = exp.state.replace(params=p, batch_stats=s)

    x_np, x_t = _batch()
    x_j = jnp.asarray(x_np)

    for step in range(STEPS):
        rng = jax.random.fold_in(jax.random.key(11), step)
        (state, m), draws = _capture_normals(exp.step_fn, state, x_j, rng)
        (eps,) = draws
        opt.zero_grad()
        recon, mu, logvar = _vae_forward(vae_t, x_t, eps)
        loss = (F.mse_loss(recon, x_t, reduction="sum")
                - 0.5 * torch.sum(1 + logvar - mu.pow(2) - logvar.exp()))
        loss.backward()
        opt.step()
        np.testing.assert_allclose(float(m["loss"]), loss.item(),
                                   rtol=TOL["observed"]["metric_rtol"],
                                   err_msg=f"step {step} loss")

    p2, s2 = convert_vae_state_dict(vae_t.state_dict(), RS, N_Z,
                                    feature_hw=IMG // 8)
    _assert_tree_close(state.params, p2, TOL["observed"]["param_atol"],
                       "VAE params")
    _assert_tree_close(state.batch_stats, s2, STATS_ATOL,
                       "VAE running stats")


# ---------------------------------------------------------------------------
# β-VAE-GAN under --bn_groups 2 — composed DataParallel-BN dynamics
# ---------------------------------------------------------------------------

class _GroupedBN(nn.Module):
    """torch-side DataParallel per-GPU BN emulation: contiguous halves are
    normalized with their OWN batch statistics, and only half 0 updates the
    running stats — exactly what nn.DataParallel over 2 GPUs does (each
    replica normalizes its scatter slice; buffer updates survive only on
    device 0, whose replica IS the master module). The published runs
    wrapped both nets this way (new_betavaegan.py:42-44). Wraps the
    mirror's own nn.BatchNorm so parameters/buffers stay the master's."""

    def __init__(self, bn: nn.Module):
        super().__init__()
        self.bn = bn

    def forward(self, x):
        if not self.bn.training:
            return self.bn(x)
        h = x.shape[0] // 2
        y0 = self.bn(x[:h])  # half-0 batch stats + the running-stat update
        y1 = F.batch_norm(x[h:], None, None, self.bn.weight, self.bn.bias,
                          True, self.bn.momentum, self.bn.eps)
        return torch.cat([y0, y1], 0)


def _wrap_grouped_bns(model: nn.Module) -> None:
    for name, child in list(model.named_children()):
        if isinstance(child, (nn.BatchNorm1d, nn.BatchNorm2d)):
            setattr(model, name, _GroupedBN(child))
        else:
            _wrap_grouped_bns(child)


def _unwrapped_state_dict(model: nn.Module):
    """_GroupedBN inserts '.bn' into state_dict keys; strip it to recover
    the reference key layout the converters expect."""
    return {k.replace(".bn.", "."): v for k, v in model.state_dict().items()}


def test_vaegan_trajectory_matches_torch_bn_groups2():
    """Composed-dynamics parity for the strictest-fidelity knob: the
    published runs trained under DataParallel per-GPU BN statistics, which
    ``--bn_groups 2`` reproduces (models/layers.py _ManualBN._grouped).
    Layer-level parity lives in tests/test_batchnorm.py; this runs the full
    3-phase update with grouped BN on BOTH sides for STEPS steps in the
    published 'observed' freeze mode.

    Tolerances are WIDER than the ungrouped observed test and grow per
    step, because normalizing with 2-sample group statistics amplifies the
    fp-level Adam noise (the TOL rationale above) much harder than
    batch-4 statistics do. Measured relative metric deviations:
    step 0 ≤3.4e-3 (phase-1 D_x 1e-7 — params still identical — then
    growing phase by phase through the intra-step Adam updates), step 1
    ≤1.7e-2, step 2 ≤7.2e-2; EG params ≤9.1e-3, running means ≤0.15 (the
    BN-cancelled bias walk enters a 2-sample group mean at full
    amplitude). A semantic bug is still caught: wrong grouping or a wrong
    per-group Bessel count blows phase-1 of step 0 / the 33%-scale
    running-var error immediately."""
    from disentangle_mlp_tpu.train.vaegan import create_vaegan_experiment

    torch.manual_seed(47)
    vae_t, disc_t = RefVAE(), RefDisc()
    cfg = _tiny_cfg("observed", bn_groups=2)
    exp = create_vaegan_experiment(cfg, jax.random.key(0))
    eg_p, eg_s = convert_vae_state_dict(vae_t.state_dict(), RS, N_Z,
                                        feature_hw=IMG // 8)
    d_p, d_s = convert_discriminator_state_dict(
        disc_t.state_dict(), (DISC_CH[-1], IMG // 8, IMG // 8))
    eg = exp.eg_state.replace(params=eg_p, batch_stats=eg_s)
    d = exp.d_state.replace(params=d_p, batch_stats=d_s)

    _wrap_grouped_bns(vae_t), _wrap_grouped_bns(disc_t)
    vae_t.train(), disc_t.train()
    opt_eg = torch.optim.Adam(vae_t.parameters(), lr=LR)
    opt_d = torch.optim.Adam(disc_t.parameters(), lr=LR)

    x_np, x_t = _batch()
    x_j = jnp.asarray(x_np)

    step_rtol = (1e-2, 5e-2, 2e-1)  # ~3× the measured max per step
    for step in range(STEPS):
        rng = jax.random.fold_in(jax.random.key(13), step)
        real_l, fake_l = _labels_for(rng, 4)
        (eg, d, m), draws = _capture_normals(exp.step_fn, eg, d, x_j, rng)
        noise, eps_dec, eps_enc = draws
        ref = _torch_vaegan_step(vae_t, disc_t, opt_eg, opt_d, x_t,
                                 real_l, fake_l, noise, eps_dec, eps_enc,
                                 BETA, intent=False)
        for key in ("D_x", "sim", "kld", "recon_enc"):
            np.testing.assert_allclose(
                float(m[key]), ref[key], rtol=step_rtol[step],
                err_msg=f"step {step} metric {key}")
        # phase 1 of every step runs BEFORE that step's Adam noise is
        # injected into D — grouped-BN forward semantics must stay exact
        # up to the accumulated parameter drift
        np.testing.assert_allclose(float(m["D_x"]), ref["D_x"],
                                   rtol=step_rtol[max(0, step - 1)] / 10,
                                   err_msg=f"step {step} phase-1 D_x")

    eg_p2, eg_s2 = convert_vae_state_dict(_unwrapped_state_dict(vae_t),
                                          RS, N_Z, feature_hw=IMG // 8)
    d_p2, d_s2 = convert_discriminator_state_dict(
        _unwrapped_state_dict(disc_t), (DISC_CH[-1], IMG // 8, IMG // 8))
    _assert_tree_close(eg.params, eg_p2, 3e-2, "[bn2] EG params")
    _assert_tree_close(eg.batch_stats, eg_s2, 0.5,
                       "[bn2] EG running stats")
    _assert_tree_close(d.params, d_p2, 3e-2, "[bn2] D params")
    _assert_tree_close(d.batch_stats, d_s2, 0.5,
                       "[bn2] D running stats")
