"""CelebA VAE: convolutional encoder + transposed-conv decoder, NHWC.

Architecture parity with the reference's ``VAE`` (reference:
models/model.py:419-571) and its standalone ``Encoder_celeba``
(model.py:282-328):

Encoder (64×64×3 → μ, logσ², each n_hidden=128):
    3× [Conv 5×5 stride 2 pad 2 + BN + ReLU]: 3→64→128→256, spatial 64→32→16→8
    flatten 8·8·256=16384 → two heads [Linear 16384→2048 + BN + ReLU +
    Linear 2048→n_hidden] for μ and logσ² (model.py:449-471).

Decoder (n_hidden → 64×64×3 in [-1, 1]):
    Linear 128→8·8·256 + BN + ReLU → reshape (8, 8, 256)
    3× [ConvT 5×5 stride 2 pad 2 out_pad 1 + BN + ReLU]: 256→256→128→32,
    spatial 8→16→32→64; ConvT 5×5 stride 1 pad 2 → 3 channels, Tanh
    (model.py:490-509; the stride-2 shapes replicate PyTorch's
    ``output_size=(…,16,16)/(…,32,32)/(…,64,64)`` calls at model.py:558-564).

The reparameterization z = μ + ε·exp(0.5·logσ²), ε~N(0,1) matches
model.py:532-535. Layout is NHWC and the flatten order is (H, W, C) —
irrelevant to learned behaviour, native to TPU.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import BatchNorm, TorchConv, TorchConvTranspose, TorchLinear, flatten_batch

Dtype = Any


class CelebaEncoder(nn.Module):
    """Conv feature stack + μ/logσ² heads (reference: models/model.py:449-471).

    ``representation_size``/``head_width`` default to the reference's 64/2048;
    they are parameterized so tests can exercise the identical graph at a
    fraction of the FLOPs."""

    n_hidden: int = 128
    representation_size: int = 64
    head_width: int = 2048
    input_channels: int = 3
    dtype: Dtype = jnp.float32
    bn_axis_name: Any = None
    bn_groups: int = 1

    def setup(self):
        rs, dt = self.representation_size, self.dtype
        conv = lambda ch: TorchConv(ch, 5, stride=2, padding=2, dtype=dt)
        bn = lambda: BatchNorm(dtype=dt, axis_name=self.bn_axis_name,
                               groups=self.bn_groups)
        lin = lambda f: TorchLinear(f, dtype=dt)
        self.conv1, self.bn1 = conv(rs), bn()
        self.conv2, self.bn2 = conv(rs * 2), bn()
        self.conv3, self.bn3 = conv(rs * 4), bn()
        self.mu_fc1, self.mu_bn = lin(self.head_width), bn()
        self.mu_fc2 = lin(self.n_hidden)
        self.lv_fc1, self.lv_bn = lin(self.head_width), bn()
        self.lv_fc2 = lin(self.n_hidden)

    def __call__(self, x: jax.Array, train: bool = True) -> Tuple[jax.Array, jax.Array]:
        ura = not train
        h = nn.relu(self.bn1(self.conv1(x), ura))
        h = nn.relu(self.bn2(self.conv2(h), ura))
        h = nn.relu(self.bn3(self.conv3(h), ura))
        h = flatten_batch(h)
        mu = self.mu_fc2(nn.relu(self.mu_bn(self.mu_fc1(h), ura)))
        logvar = self.lv_fc2(nn.relu(self.lv_bn(self.lv_fc1(h), ura)))
        # μ/logσ² feed the loss math; keep them float32.
        return mu.astype(jnp.float32), logvar.astype(jnp.float32)

    def forward_ref(self, x: jax.Array, train: bool = True,
                    eps: jax.Array | None = None
                    ) -> Tuple[jax.Array, jax.Array]:
        """The standalone ``Encoder_celeba.forward`` contract (reference:
        models/model.py:316-328): returns (z, kld) where
        z = μ + ε·exp(0.5·logσ²) with ε~N(0,1) and kld is the PER-SAMPLE
        vector −½ Σ_d (1 + logσ² − μ² − e^{logσ²}).

        ``__call__`` keeps the (μ, logσ²) contract the composed ``VAE``
        needs (model.py:532-535 draws ε in VAE.reparameterize); this
        method exposes the reference's standalone-encoder surface for
        users of that class. ``eps`` overrides the 'reparam' rng draw so
        golden tests can feed bit-identical noise to both frameworks."""
        mu, logvar = self(x, train=train)
        if eps is None:
            eps = jax.random.normal(self.make_rng("reparam"), mu.shape,
                                    jnp.float32)
        z = mu + eps * jnp.exp(0.5 * logvar)
        kld = -0.5 * jnp.sum(1.0 + logvar - jnp.square(mu) - jnp.exp(logvar),
                             axis=1)
        return z, kld


class CelebaDecoder(nn.Module):
    """Linear preprocess + 4-stage ConvT ladder to 64×64×3 Tanh output
    (reference: models/model.py:490-509; identical to Generator_celeba,
    model.py:331-378)."""

    n_hidden: int = 128
    n_z: Sequence[int] = (256, 8, 8)  # (channels, height, width), as the reference flags it
    channels: Sequence[int] = (256, 128, 32)  # ConvT ladder widths (model.py:495-507)
    output_channels: int = 3
    dtype: Dtype = jnp.float32
    bn_axis_name: Any = None
    bn_groups: int = 1

    def setup(self):
        dt = self.dtype
        ch, h, w = self.n_z
        c1, c2, c3 = self.channels
        self._reshape_to = (h, w, ch)
        bn = lambda: BatchNorm(dtype=dt, axis_name=self.bn_axis_name,
                               groups=self.bn_groups)
        self.preprocess = TorchLinear(ch * h * w, dtype=dt)
        self.pre_bn = bn()
        dconv = lambda c, s, op: TorchConvTranspose(
            c, 5, stride=s, padding=2, output_padding=op, dtype=dt)
        self.deconv1, self.dbn1 = dconv(c1, 2, 1), bn()
        self.deconv2, self.dbn2 = dconv(c2, 2, 1), bn()
        self.deconv3, self.dbn3 = dconv(c3, 2, 1), bn()
        self.deconv4 = dconv(self.output_channels, 1, 0)

    def __call__(self, z: jax.Array, train: bool = True) -> jax.Array:
        ura = not train
        h = nn.relu(self.pre_bn(self.preprocess(z.astype(self.dtype)), ura))
        h = h.reshape((-1,) + self._reshape_to)
        h = nn.relu(self.dbn1(self.deconv1(h), ura))
        h = nn.relu(self.dbn2(self.deconv2(h), ura))
        h = nn.relu(self.dbn3(self.deconv3(h), ura))
        return jnp.tanh(self.deconv4(h)).astype(self.dtype)


class VAE(nn.Module):
    """Encoder + reparameterize + decoder (reference: models/model.py:419-571).

    ``__call__`` returns (reconstruction, μ, logσ²) like VAE.forward
    (model.py:568-571). ``decode`` is exposed for sampling paths
    (new_betavaegan.py:113, utils/utils.py:21-26)."""

    n_hidden: int = 128
    n_z: Sequence[int] = (256, 8, 8)
    representation_size: int = 64
    head_width: int = 2048
    decoder_channels: Sequence[int] = (256, 128, 32)
    input_channels: int = 3
    dtype: Dtype = jnp.float32
    bn_axis_name: Any = None
    bn_groups: int = 1

    def setup(self):
        self.encoder = CelebaEncoder(
            n_hidden=self.n_hidden,
            representation_size=self.representation_size,
            head_width=self.head_width,
            input_channels=self.input_channels,
            dtype=self.dtype,
            bn_axis_name=self.bn_axis_name,
            bn_groups=self.bn_groups,
        )
        self.decoder = CelebaDecoder(
            n_hidden=self.n_hidden,
            n_z=self.n_z,
            channels=self.decoder_channels,
            output_channels=self.input_channels,
            dtype=self.dtype,
            bn_axis_name=self.bn_axis_name,
            bn_groups=self.bn_groups,
        )

    def encode(self, x: jax.Array, train: bool = True):
        return self.encoder(x, train=train)

    def reparameterize(self, mu: jax.Array, logvar: jax.Array) -> jax.Array:
        eps = jax.random.normal(self.make_rng("reparam"), mu.shape, jnp.float32)
        return mu + eps * jnp.exp(0.5 * logvar)

    def decode(self, z: jax.Array, train: bool = True) -> jax.Array:
        return self.decoder(z, train=train)

    def __call__(self, x: jax.Array, train: bool = True):
        mu, logvar = self.encode(x, train=train)
        z = self.reparameterize(mu, logvar)
        return self.decode(z, train=train), mu, logvar
