"""PyTorch-CPU β-VAE-GAN throughput baseline.

BASELINE.json's north-star compares our TPU images/sec against "a
PyTorch-CPU baseline on one v5e chip" (target ≥5×). This is that baseline:
an independent torch implementation of the same per-batch work as the
reference's flagship loop (experiments/new_betavaegan.py:87-193) — three
phases, seven forwards + backwards across the same-size VAE and
discriminator — written from the architecture spec (SURVEY.md C4/C7/C12),
not copied. Used once to produce BENCH_BASELINE.json; bench.py then reads
the cached number.
"""

from __future__ import annotations

import time


def build_models(n_hidden: int = 128):
    import torch
    import torch.nn as nn

    class Encoder(nn.Module):
        def __init__(self):
            super().__init__()
            rs = 64
            self.features = nn.Sequential(
                nn.Conv2d(3, rs, 5, 2, 2), nn.BatchNorm2d(rs), nn.ReLU(),
                nn.Conv2d(rs, rs * 2, 5, 2, 2), nn.BatchNorm2d(rs * 2), nn.ReLU(),
                nn.Conv2d(rs * 2, rs * 4, 5, 2, 2), nn.BatchNorm2d(rs * 4), nn.ReLU(),
            )
            head = lambda: nn.Sequential(
                nn.Linear(rs * 4 * 64, 2048), nn.BatchNorm1d(2048), nn.ReLU(),
                nn.Linear(2048, n_hidden))
            self.mu_head, self.lv_head = head(), head()

        def forward(self, x):
            h = self.features(x).flatten(1)
            return self.mu_head(h), self.lv_head(h)

    class Decoder(nn.Module):
        def __init__(self):
            super().__init__()
            self.pre = nn.Sequential(
                nn.Linear(n_hidden, 256 * 64), nn.BatchNorm1d(256 * 64), nn.ReLU())
            self.net = nn.Sequential(
                nn.ConvTranspose2d(256, 256, 5, 2, 2, output_padding=1),
                nn.BatchNorm2d(256), nn.ReLU(),
                nn.ConvTranspose2d(256, 128, 5, 2, 2, output_padding=1),
                nn.BatchNorm2d(128), nn.ReLU(),
                nn.ConvTranspose2d(128, 32, 5, 2, 2, output_padding=1),
                nn.BatchNorm2d(32), nn.ReLU(),
                nn.ConvTranspose2d(32, 3, 5, 1, 2), nn.Tanh(),
            )

        def forward(self, z):
            return self.net(self.pre(z).view(-1, 256, 8, 8))

    class VAE(nn.Module):
        def __init__(self):
            super().__init__()
            self.enc, self.dec = Encoder(), Decoder()

        def forward(self, x):
            import torch
            mu, lv = self.enc(x)
            z = mu + torch.randn_like(mu) * torch.exp(0.5 * lv)
            return self.dec(z), mu, lv

    class Disc(nn.Module):
        def __init__(self):
            super().__init__()
            self.convs = nn.Sequential(
                nn.Conv2d(3, 32, 5, 1, 2), nn.BatchNorm2d(32), nn.LeakyReLU(0.2),
                nn.Conv2d(32, 128, 5, 2, 2), nn.BatchNorm2d(128), nn.LeakyReLU(0.2),
                nn.Conv2d(128, 256, 5, 2, 2), nn.BatchNorm2d(256), nn.LeakyReLU(0.2),
                nn.Conv2d(256, 256, 5, 2, 2), nn.BatchNorm2d(256), nn.LeakyReLU(0.2),
            )
            self.feat = nn.Sequential(nn.Linear(256 * 64, 2048), nn.LeakyReLU(0.2))
            self.out = nn.Sequential(nn.Linear(2048, 1), nn.Sigmoid())

        def forward(self, x):
            f = self.feat(self.convs(x).flatten(1))
            return self.out(f).squeeze(-1), f

    return VAE(), Disc()


def measure(batch_size: int = 64, steps: int = 3, beta: float = 25.0) -> float:
    """images/sec of the full 3-phase update on CPU torch."""
    import torch
    import torch.nn.functional as F

    torch.manual_seed(0)
    vae, disc = build_models()
    opt_eg = torch.optim.Adam(vae.parameters(), lr=3e-4)
    opt_d = torch.optim.Adam(disc.parameters(), lr=3e-4)
    x = torch.rand(batch_size, 3, 64, 64) * 2 - 1

    def one_step():
        real, fake_lbl = 0.9, 0.1
        bsz = x.shape[0]
        # D phase
        opt_d.zero_grad()
        p_real, _ = disc(x)
        noise = torch.randn(bsz, 128)
        fake = vae.dec(noise)
        p_fake, _ = disc(fake.detach())
        (F.binary_cross_entropy(p_real, torch.full((bsz,), real))
         + F.binary_cross_entropy(p_fake, torch.full((bsz,), fake_lbl))).backward()
        opt_d.step()
        # Dec phase
        opt_eg.zero_grad()
        _, f_real = disc(x)
        recon, mu, lv = vae(x)
        p_fake2, _ = disc(vae.dec(noise))
        p_recon, f_recon = disc(recon)
        loss = (F.binary_cross_entropy(p_fake2, torch.full((bsz,), real))
                + F.binary_cross_entropy(p_recon, torch.full((bsz,), real))
                + 0.5 * F.mse_loss(f_recon, f_real.detach(), reduction="sum")
                + F.mse_loss(recon, x, reduction="sum"))
        loss.backward()
        opt_eg.step()
        # Enc phase
        opt_eg.zero_grad()
        recon, mu, lv = vae(x)
        kld = -0.5 * torch.sum(1 + lv - mu.pow(2) - lv.exp())
        (beta * kld + F.mse_loss(recon, x, reduction="sum")).backward()
        opt_eg.step()

    one_step()  # warmup
    t0 = time.perf_counter()
    for _ in range(steps):
        one_step()
    dt = time.perf_counter() - t0
    return batch_size * steps / dt


if __name__ == "__main__":
    import json

    rate = measure()
    print(json.dumps({"torch_cpu_images_per_sec": rate}))
