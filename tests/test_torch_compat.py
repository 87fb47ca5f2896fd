"""Golden tests for the reference-checkpoint migration
(utils/torch_compat.py): torch modules constructed with the reference's
EXACT state_dict key layout (models/model.py:419-571 VAE, :381-416
Discriminator — Sequential indices and attribute names) are randomly
initialized, converted, and must produce the same forward values through
our NHWC/flatten-(H,W,C) modules."""

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from disentangle_mlp_tpu.config import Config
from disentangle_mlp_tpu.models.gan import DiscriminatorCeleba
from disentangle_mlp_tpu.models.vae import VAE
from disentangle_mlp_tpu.utils.torch_compat import (
    convert_discriminator_state_dict, convert_reference_checkpoint,
    convert_vae_state_dict)

RS, N_HIDDEN, HEAD = 4, 16, 32
N_Z = (8, 4, 4)
DEC_CH = (8, 8, 8)
DISC_CH = (4, 8, 8, 8)
FEAT_DIM = 32
IMG = 32


class RefVAE(nn.Module):
    """Reference VAE layout (model.py:449-509) at test widths: identical
    attribute names and Sequential indices, hence identical state_dict
    keys."""

    def __init__(self):
        super().__init__()
        rs = RS
        self.features = nn.Sequential(
            nn.Conv2d(3, rs, 5, stride=2, padding=2), nn.BatchNorm2d(rs),
            nn.ReLU(),
            nn.Conv2d(rs, rs * 2, 5, stride=2, padding=2),
            nn.BatchNorm2d(rs * 2), nn.ReLU(),
            nn.Conv2d(rs * 2, rs * 4, 5, stride=2, padding=2),
            nn.BatchNorm2d(rs * 4), nn.ReLU())
        flat = rs * 4 * (IMG // 8) ** 2
        head = lambda: nn.Sequential(
            nn.Linear(flat, HEAD), nn.BatchNorm1d(HEAD), nn.ReLU(),
            nn.Linear(HEAD, N_HIDDEN))
        self.x_to_mu, self.x_to_logvar = head(), head()

        dim = N_Z[0] * N_Z[1] * N_Z[2]
        c1, c2, c3 = DEC_CH
        self.preprocess = nn.Sequential(
            nn.Linear(N_HIDDEN, dim), nn.BatchNorm1d(dim), nn.ReLU())
        self.deconv1 = nn.ConvTranspose2d(N_Z[0], c1, 5, stride=2, padding=2)
        self.act1 = nn.Sequential(nn.BatchNorm2d(c1), nn.ReLU())
        self.deconv2 = nn.ConvTranspose2d(c1, c2, 5, stride=2, padding=2)
        self.act2 = nn.Sequential(nn.BatchNorm2d(c2), nn.ReLU())
        self.deconv3 = nn.ConvTranspose2d(c2, c3, 5, stride=2, padding=2)
        self.act3 = nn.Sequential(nn.BatchNorm2d(c3), nn.ReLU())
        self.deconv4 = nn.ConvTranspose2d(c3, 3, 5, stride=1, padding=2)
        self.activation = nn.Tanh()

    def encode(self, x):
        inner = self.features(x).flatten(1)
        return self.x_to_mu(inner), self.x_to_logvar(inner)

    def decode(self, code):
        bs = code.size()[0]
        h = self.preprocess(code).view(-1, *N_Z)
        s = N_Z[1]
        h = self.act1(self.deconv1(h, output_size=(bs, DEC_CH[0], 2 * s, 2 * s)))
        h = self.act2(self.deconv2(h, output_size=(bs, DEC_CH[1], 4 * s, 4 * s)))
        h = self.act3(self.deconv3(h, output_size=(bs, DEC_CH[2], 8 * s, 8 * s)))
        return self.activation(
            self.deconv4(h, output_size=(bs, 3, 8 * s, 8 * s)))


class RefDisc(nn.Module):
    """Reference Discriminator_celeba layout (model.py:381-416) at test
    widths."""

    def __init__(self):
        super().__init__()
        a, b, c, d = DISC_CH
        self.convs = nn.Sequential(
            nn.Conv2d(3, a, 5, stride=1, padding=2), nn.BatchNorm2d(a),
            nn.LeakyReLU(0.2),
            nn.Conv2d(a, b, 5, stride=2, padding=2), nn.BatchNorm2d(b),
            nn.LeakyReLU(0.2),
            nn.Conv2d(b, c, 5, stride=2, padding=2), nn.BatchNorm2d(c),
            nn.LeakyReLU(0.2),
            nn.Conv2d(c, d, 5, stride=2, padding=2), nn.BatchNorm2d(d),
            nn.LeakyReLU(0.2))
        flat = d * (IMG // 8) ** 2
        self.lth_features = nn.Sequential(
            nn.Linear(flat, FEAT_DIM), nn.LeakyReLU(0.2))
        self.sigmoid_output = nn.Sequential(
            nn.Linear(FEAT_DIM, 1), nn.Sigmoid())

    def forward(self, x):
        f_d = self.convs(x)
        h = self.lth_features(f_d.flatten(1))
        return self.sigmoid_output(h).squeeze(), h.squeeze()


def _randomize(model: nn.Module, seed: int) -> None:
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
        for m in model.modules():
            if isinstance(m, (nn.BatchNorm1d, nn.BatchNorm2d)):
                m.running_mean.copy_(
                    torch.randn(m.running_mean.shape, generator=g) * 0.1)
                m.running_var.copy_(
                    torch.rand(m.running_var.shape, generator=g) + 0.5)
    model.eval()


def _our_vae():
    return VAE(n_hidden=N_HIDDEN, n_z=N_Z, representation_size=RS,
               head_width=HEAD, decoder_channels=DEC_CH)


@pytest.fixture(scope="module")
def x_np():
    return np.random.default_rng(0).uniform(
        -1, 1, (2, IMG, IMG, 3)).astype(np.float32)


def test_vae_conversion_forward_parity(x_np):
    ref = RefVAE()
    _randomize(ref, 1)
    params, stats = convert_vae_state_dict(
        ref.state_dict(), RS, N_Z, feature_hw=IMG // 8)

    xt = torch.from_numpy(x_np).permute(0, 3, 1, 2)
    with torch.no_grad():
        mu_t, lv_t = ref.encode(xt)
    ours = _our_vae()
    variables = {"params": params, "batch_stats": stats}
    mu, lv = ours.apply(variables, jnp.asarray(x_np), train=False,
                        method=VAE.encode)
    np.testing.assert_allclose(np.asarray(mu), mu_t.numpy(),
                               atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(lv), lv_t.numpy(),
                               atol=2e-4, rtol=1e-4)

    z = np.random.default_rng(2).normal(size=(2, N_HIDDEN)).astype(np.float32)
    with torch.no_grad():
        rec_t = ref.decode(torch.from_numpy(z))
    rec = ours.apply(variables, jnp.asarray(z), train=False,
                     method=VAE.decode)
    np.testing.assert_allclose(np.asarray(rec),
                               rec_t.permute(0, 2, 3, 1).numpy(),
                               atol=2e-4, rtol=1e-4)


def test_encoder_forward_ref_z_kld_parity(x_np):
    """The standalone Encoder_celeba.forward contract (model.py:316-328):
    (z, kld) with z = μ + ε·exp(0.5·logσ²) and per-sample
    kld = −½Σ(1+logσ²−μ²−e^logσ²), identical ε fed to both sides."""
    ref = RefVAE()
    _randomize(ref, 11)
    from disentangle_mlp_tpu.models.vae import CelebaEncoder
    from disentangle_mlp_tpu.utils.torch_compat import (
        convert_encoder_state_dict)
    params, stats = convert_encoder_state_dict(
        ref.state_dict(), RS, feature_hw=IMG // 8)

    eps_np = np.random.default_rng(12).normal(
        size=(2, N_HIDDEN)).astype(np.float32)
    xt = torch.from_numpy(x_np).permute(0, 3, 1, 2)
    with torch.no_grad():
        mu_t, lv_t = ref.encode(xt)
        z_t = mu_t + torch.from_numpy(eps_np) * torch.exp(0.5 * lv_t)
        # independent derivation (NOT the reference's closed form — that
        # transcription lives only on the JAX side): the per-sample KLD is
        # KL(N(μ, σ) ‖ N(0, 1)) summed over latent dims
        from torch.distributions import Normal, kl_divergence
        kld_t = kl_divergence(
            Normal(mu_t, torch.exp(0.5 * lv_t)),
            Normal(torch.zeros_like(mu_t), torch.ones_like(lv_t))).sum(1)

    enc = CelebaEncoder(n_hidden=N_HIDDEN, representation_size=RS,
                        head_width=HEAD)
    z, kld = enc.apply({"params": params, "batch_stats": stats},
                       jnp.asarray(x_np), train=False,
                       eps=jnp.asarray(eps_np),
                       method=CelebaEncoder.forward_ref)
    assert kld.shape == (2,)  # per-sample vector, not a scalar
    np.testing.assert_allclose(np.asarray(z), z_t.numpy(),
                               atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(kld), kld_t.numpy(),
                               atol=2e-3, rtol=1e-4)


def test_encoder_forward_ref_draws_from_reparam_rng(x_np):
    """Without an explicit ε the draw comes from the 'reparam' rng
    collection and is reproducible."""
    from disentangle_mlp_tpu.models.vae import CelebaEncoder
    enc = CelebaEncoder(n_hidden=N_HIDDEN, representation_size=RS,
                        head_width=HEAD)
    x = jnp.asarray(x_np)
    variables = enc.init(jax.random.key(0), x)
    out = []
    for _ in range(2):
        (z, kld), _ = enc.apply(variables, x, train=True,
                                method=CelebaEncoder.forward_ref,
                                rngs={"reparam": jax.random.key(1)},
                                mutable=["batch_stats"])
        out.append(np.asarray(z))
    np.testing.assert_array_equal(out[0], out[1])
    assert kld.shape == (2,)


def test_discriminator_conversion_forward_parity(x_np):
    ref = RefDisc()
    _randomize(ref, 3)
    params, stats = convert_discriminator_state_dict(
        ref.state_dict(), (DISC_CH[-1], IMG // 8, IMG // 8))

    xt = torch.from_numpy(x_np).permute(0, 3, 1, 2)
    with torch.no_grad():
        prob_t, feat_t = ref(xt)
    ours = DiscriminatorCeleba(n_z=N_Z, channels=DISC_CH,
                               feature_dim=FEAT_DIM)
    prob, feat = ours.apply({"params": params, "batch_stats": stats},
                            jnp.asarray(x_np), train=False)
    np.testing.assert_allclose(np.asarray(feat), feat_t.numpy(),
                               atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(prob), prob_t.numpy(),
                               atol=2e-4, rtol=1e-4)


def test_reference_vaegan_checkpoint_roundtrip(tmp_path, x_np):
    """Full .tar → convert → our checkpoint → resumed experiment: the
    reference's save dict keys (new_betavaegan.py:222-228), DataParallel
    'module.' prefixes included."""
    ref_vae, ref_d = RefVAE(), RefDisc()
    _randomize(ref_vae, 4)
    _randomize(ref_d, 5)
    tar = tmp_path / "model_7.tar"
    torch.save({
        "epoch": 7,
        "encoder_decoder_model": ref_vae.state_dict(),
        "discriminator_model": {
            f"module.{k}": v for k, v in ref_d.state_dict().items()},
        "encoder_decoder_optimizer": {},
        "discriminator_optimizer": {},
    }, tar)

    cfg = Config(name="t", n_hidden=N_HIDDEN, n_z=list(N_Z),
                 representation_size=RS, head_width=HEAD,
                 decoder_channels=list(DEC_CH), disc_channels=list(DISC_CH),
                 disc_feature_dim=FEAT_DIM, img_size=IMG,
                 batch_size_train=4, dtype="float32")
    out = convert_reference_checkpoint(str(tar), "betavaegan", cfg)
    assert out["epoch"] == 7

    # converted trees drop into a live experiment and drive a train step
    from disentangle_mlp_tpu.train.vaegan import create_vaegan_experiment
    exp = create_vaegan_experiment(cfg, jax.random.key(0))
    eg = exp.eg_state.replace(params=out["eg"]["params"],
                              batch_stats=out["eg"]["batch_stats"])
    d = exp.d_state.replace(params=out["d"]["params"],
                            batch_stats=out["d"]["batch_stats"])
    # eval-mode decode (running-stats BN) must match torch .eval() exactly;
    # exp.decode itself is the train-mode path (reference loops never leave
    # .train(), SURVEY §7 "hard parts") so compare via the module apply
    rec = exp.vae.apply(
        {"params": eg.params, "batch_stats": eg.batch_stats},
        jnp.zeros((2, N_HIDDEN), jnp.float32), train=False,
        method=VAE.decode)
    with torch.no_grad():
        rec_t = ref_vae.decode(torch.zeros(2, N_HIDDEN))
    np.testing.assert_allclose(np.asarray(rec),
                               rec_t.permute(0, 2, 3, 1).numpy(),
                               atol=2e-3, rtol=1e-3)
    _, _, m = exp.train_step(eg, d, jnp.asarray(x_np), jax.random.key(1))
    assert np.isfinite(float(m["recon_enc"]))


def test_convert_cli_roundtrip(tmp_path):
    """dmt-convert writes a checkpoint that --load_path machinery restores
    with the original epoch."""
    ref_vae, ref_d = RefVAE(), RefDisc()
    _randomize(ref_vae, 6)
    _randomize(ref_d, 7)
    tar = tmp_path / "model_3.tar"
    torch.save({
        "epoch": 3,
        "encoder_decoder_model": ref_vae.state_dict(),
        "discriminator_model": ref_d.state_dict(),
        "encoder_decoder_optimizer": {},
        "discriminator_optimizer": {},
    }, tar)

    from disentangle_mlp_tpu.cli.convert import main as convert_main
    out = tmp_path / "model_3"
    convert_main([
        "--model", "betavaegan", "--torch_checkpoint", str(tar),
        "--output", str(out), "--name", "conv",
        "--n_hidden", str(N_HIDDEN), "--n_z", *map(str, N_Z),
        "--representation_size", str(RS), "--head_width", str(HEAD),
        "--decoder_channels", *map(str, DEC_CH),
        "--disc_channels", *map(str, DISC_CH),
        "--disc_feature_dim", str(FEAT_DIM), "--img_size", str(IMG),
        "--save_path", str(tmp_path / "%"),
        "--log_path", str(tmp_path / "%/log"),
    ])
    assert out.exists()

    from disentangle_mlp_tpu.train.vaegan import create_vaegan_experiment
    from disentangle_mlp_tpu.utils.checkpoint import load_checkpoint
    cfg = Config(name="t2", n_hidden=N_HIDDEN, n_z=list(N_Z),
                 representation_size=RS, head_width=HEAD,
                 decoder_channels=list(DEC_CH), disc_channels=list(DISC_CH),
                 disc_feature_dim=FEAT_DIM, img_size=IMG,
                 batch_size_train=4, dtype="float32")
    exp = create_vaegan_experiment(cfg, jax.random.key(9))
    epoch, states = load_checkpoint(
        str(out), {"eg": exp.eg_state, "d": exp.d_state})
    assert epoch == 3
    rec = exp.vae.apply(
        {"params": states["eg"].params,
         "batch_stats": states["eg"].batch_stats},
        jnp.zeros((2, N_HIDDEN), jnp.float32), train=False,
        method=VAE.decode)
    with torch.no_grad():
        rec_t = ref_vae.decode(torch.zeros(2, N_HIDDEN))
    np.testing.assert_allclose(np.asarray(rec),
                               rec_t.permute(0, 2, 3, 1).numpy(),
                               atol=2e-3, rtol=1e-3)
