"""Device-fed input pipeline.

TPU-native replacement for the reference's torchvision ImageFolder +
DataLoader worker processes (reference: dataloader/dataset.py:14-52). The
reference pipelines per dataset (dataset.py:9-12):
- celebA/celebA_reduced: PIL decode → Resize((64,64)) → CenterCrop(64) (a
  no-op after an exact resize) → ToTensor → Normalize(0.5, 0.5), i.e.
  pixels scaled to [-1, 1] to match the decoder's Tanh (models/model.py:360).
- birds: Resize → ToTensor → ImageNet Normalize([.485,.456,.406],
  [.229,.224,.225]) (dataset.py:9-10,15-24); train loader only.
- mnist: Resize → ToTensor → Normalize(0.1307, 0.3081) over torchvision's
  auto-downloaded MNIST (dataset.py:26-35); here the idx files must already
  be on disk (no network egress) — ``MNISTSource`` reads the standard
  (optionally gzipped) idx format from the image root.

Design:
- ``ImageFolderSource`` scans class subdirectories exactly like torchvision
  ImageFolder and decodes/resizes with a thread pool (PIL releases the GIL
  during decode), optionally accelerated by the native C++ preprocessor in
  :mod:`disentangle_mlp_tpu.data.native` when built.
- ``SyntheticSource`` generates a deterministic fake dataset for machines
  without CelebA and for benchmarking the compute path.
- ``DataLoader`` batches, shuffles per epoch with a seeded RNG, prefetches
  ahead of the step, and places batches on device with an optional
  batch-axis ``NamedSharding`` so each TPU chip receives only its shard.
  On multi-host pods each process decodes only its ``1/process_count``
  slice of the global batch and the global device array is assembled with
  ``jax.make_array_from_process_local_data`` (no redundant decode).

Layout is NHWC float32; casting to the model compute dtype happens inside
the jitted step.
"""

from __future__ import annotations

import os
import threading
import queue
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import Any, Dict, Iterator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

IMG_EXTENSIONS = (".jpg", ".jpeg", ".png", ".ppm", ".bmp", ".webp")

# Per-dataset Normalize(mean, std) constants (reference dataset.py:9-12).
NORMALIZE = {
    "celebA": ((0.5, 0.5, 0.5), (0.5, 0.5, 0.5)),
    "celebA_reduced": ((0.5, 0.5, 0.5), (0.5, 0.5, 0.5)),
    "birds": ((0.485, 0.456, 0.406), (0.229, 0.224, 0.225)),
    "mnist": ((0.1307,), (0.3081,)),
}


def _decode_resize(path: str, size: int) -> np.ndarray:
    """Decode one image file → HWC uint8 at (size, size), bilinear."""
    from PIL import Image

    with Image.open(path) as im:
        im = im.convert("RGB").resize((size, size), Image.BILINEAR)
        return np.asarray(im, dtype=np.uint8)


def _decode(path: str) -> np.ndarray:
    """Decode one image file → HWC uint8 at native resolution (the native
    C++ path does the fused resize+normalize afterwards)."""
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"), dtype=np.uint8)


def normalize_to_unit_range(batch_u8: np.ndarray) -> np.ndarray:
    """uint8 HWC → float32 in [-1, 1] (Normalize(mean .5, std .5) after
    ToTensor, reference dataset.py:12,38-43)."""
    return batch_u8.astype(np.float32) * (2.0 / 255.0) - 1.0


def renormalize_pm1(batch_pm1: np.ndarray, mean, std) -> np.ndarray:
    """[-1,1] floats → Normalize(mean, std) space, as one affine per channel:
    (x01 − mean)/std with x01 = (x + 1)/2. Identity for mean = std = 0.5."""
    mean = np.asarray(mean, np.float32)
    std = np.asarray(std, np.float32)
    if np.allclose(mean, 0.5) and np.allclose(std, 0.5):
        return batch_pm1
    scale = 0.5 / std
    shift = (0.5 - mean) / std
    return batch_pm1 * scale + shift


# Decoded-image RAM cache size gate for ImageFolderSource(cache="auto").
# The budget is GLOBAL across live sources: --bo_parallel k builds k
# independent train loaders in one process, and k × ~2.4 GB of silent
# uint8 caches would exhaust the single-CPU host's RAM.
_DECODE_CACHE_LIMIT = int(os.environ.get(
    "DMT_DECODE_CACHE_BYTES", 4 * 1024 ** 3))
_decode_cache_live_bytes = 0
# reserve is check-then-act and the parallel-β search builds its k loaders
# from ThreadPoolExecutor threads CONCURRENTLY — without the lock two
# threads could both pass the budget check and over-claim
_decode_cache_lock = threading.Lock()


def _decode_cache_reserve(n_bytes: int, forced: bool) -> bool:
    """Claim ``n_bytes`` of the global decode-cache budget. Under "auto"
    the claim is refused once the budget is spoken for (the source then
    runs uncached); "on" always succeeds but warns past the budget. The
    claim is released by a weakref.finalize when the source is collected."""
    global _decode_cache_live_bytes
    with _decode_cache_lock:
        if _decode_cache_live_bytes + n_bytes > _DECODE_CACHE_LIMIT:
            if not forced:
                if _decode_cache_live_bytes:
                    print(f"[data] decode cache disabled: "
                          f"{_decode_cache_live_bytes / 2**20:.0f} MiB "
                          f"already live in this process (budget "
                          f"{_DECODE_CACHE_LIMIT / 2**20:.0f} MiB; raise "
                          f"DMT_DECODE_CACHE_BYTES or pass cache='on')")
                return False
            print(f"[data] WARNING: cache='on' exceeds the global "
                  f"decode-cache budget "
                  f"({(_decode_cache_live_bytes + n_bytes) / 2**20:.0f} "
                  f"MiB live > {_DECODE_CACHE_LIMIT / 2**20:.0f} MiB)")
        _decode_cache_live_bytes += n_bytes
    return True


def _decode_cache_release(n_bytes: int) -> None:
    global _decode_cache_live_bytes
    with _decode_cache_lock:
        _decode_cache_live_bytes -= n_bytes


class ImageFolderSource:
    """torchvision-ImageFolder-compatible directory scan: one subdirectory
    per class, images sorted for determinism.

    ``cache``: decoded-image RAM cache ("auto"/"on"/"off"). The flagship
    train step consumes ~5,200 img/s on a v5e chip while JPEG decode +
    resize delivers ~1,300 img/s even through the native C++ loader — a
    real-data run is INPUT-bound from epoch 2 onward without a cache. The
    resized pre-normalize image is uint8 (PIL's resize returns uint8 and
    the native resize is PIL-exact), so caching uint8 is lossless and
    cheap: all of CelebA-64 is 202,599 × 64×64×3 ≈ 2.4 GB of host RAM.
    Epoch 1 decodes and fills; epochs 2+ are a RAM gather + one affine.
    "auto" enables the cache when the full dataset fits under the
    remaining ``DMT_DECODE_CACHE_BYTES`` budget (default 4 GiB) — the
    budget is global across live sources in the process, so k concurrent
    parallel-β loaders share one allowance instead of multiplying it.

    Measured (2,000 CelebA-sized JPEGs → 64×64, 8 threads, this host):
    uncached 1,100-1,190 img/s every epoch; cached 1,082 img/s epoch 1
    then **~29,000 img/s** — 24× — from epoch 2."""

    def __init__(self, root: str, img_size: int = 64, num_workers: int = 8,
                 normalize=((0.5, 0.5, 0.5), (0.5, 0.5, 0.5)),
                 cache: str = "auto"):
        self.root = root
        self.img_size = img_size
        self.num_workers = max(1, num_workers)
        self.normalize = normalize
        self.samples: List[Tuple[str, int]] = []
        classes = sorted(
            d.name for d in Path(root).iterdir() if d.is_dir())
        self.class_to_idx = {c: i for i, c in enumerate(classes)}
        for c in classes:
            cdir = Path(root) / c
            for f in sorted(cdir.rglob("*")):
                if f.suffix.lower() in IMG_EXTENSIONS:
                    self.samples.append((str(f), self.class_to_idx[c]))
        if not self.samples:
            raise FileNotFoundError(f"no images under {root!r}")
        self._pool = ThreadPoolExecutor(max_workers=self.num_workers)
        from . import native
        self._native = native if native.available() else None

        if cache not in ("auto", "on", "off"):
            # a typo must not silently run every epoch at decode speed
            raise ValueError(f"cache must be auto/on/off, got {cache!r}")
        n_bytes = len(self.samples) * img_size * img_size * 3
        use_cache = cache != "off" and _decode_cache_reserve(
            n_bytes, forced=(cache == "on"))
        if use_cache:
            import weakref
            weakref.finalize(self, _decode_cache_release, n_bytes)
        self._cache = (np.zeros(
            (len(self.samples), img_size, img_size, 3), np.uint8)
            if use_cache else None)
        self._cached = (np.zeros(len(self.samples), bool)
                        if use_cache else None)

    def __len__(self) -> int:
        return len(self.samples)

    @staticmethod
    def _pm1_to_u8(batch_pm1: np.ndarray) -> np.ndarray:
        """Round a [-1,1] batch onto the uint8 grid (the single place the
        quantization formula lives). The reference's pipeline is Resize
        (PIL → uint8 image) → ToTensor, so its tensors are u8-quantized;
        the native resize keeps float precision — snap it for exact
        reference parity (and a lossless uint8 cache)."""
        return np.clip(
            np.rint((batch_pm1 + 1.0) * 127.5), 0, 255).astype(np.uint8)

    def _decode_u8(self, indices: np.ndarray) -> np.ndarray:
        """Decode + resize ``indices`` → resized uint8 NHWC (what the
        reference's PIL Resize produces; cached verbatim)."""
        paths = [self.samples[i][0] for i in indices]
        if (self._native is not None and self._native.has_jpeg()
                and all(p.lower().endswith((".jpg", ".jpeg"))
                        for p in paths)):
            # Fully native path: file read + libjpeg decode + antialiased
            # resize + normalize in C++ threads, no GIL in the hot loop.
            batch, ok = self._native.load_jpeg_batch(
                paths, self.img_size, num_threads=self.num_workers)
            if not ok.all():  # corrupt files: per-image PIL fallback
                for j in np.nonzero(~ok)[0]:
                    batch[j] = normalize_to_unit_range(
                        _decode_resize(paths[j], self.img_size))
            return self._pm1_to_u8(batch)
        if self._native is not None:
            # PIL decode (GIL-releasing) in threads; fused C++ bilinear
            # resize + [-1,1] normalize + batch assembly.
            raw = list(self._pool.map(_decode, paths))
            return self._pm1_to_u8(self._native.resize_normalize_batch(
                raw, self.img_size, num_threads=self.num_workers))
        imgs = list(self._pool.map(
            lambda p: _decode_resize(p, self.img_size), paths))
        return np.stack(imgs)

    def _decode_pm1(self, indices: np.ndarray) -> np.ndarray:
        """Decode + resize ``indices`` → [-1, 1] float32 NHWC on the u8
        grid (before any per-dataset renormalization)."""
        return normalize_to_unit_range(self._decode_u8(indices))

    def load_batch(self, indices: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        indices = np.asarray(indices)
        labels = np.asarray([self.samples[i][1] for i in indices], np.int32)
        mean, std = self.normalize
        if self._cache is None:
            return renormalize_pm1(self._decode_pm1(indices), mean, std), labels
        miss = indices[~self._cached[indices]]
        if miss.size:
            self._cache[miss] = self._decode_u8(miss)
            self._cached[miss] = True
        batch = normalize_to_unit_range(self._cache[indices])
        return renormalize_pm1(batch, mean, std), labels

    def load_batch_u8(self, indices: np.ndarray
                      ) -> Tuple[np.ndarray, np.ndarray]:
        """``load_batch`` minus the normalize: resized uint8 NHWC + labels.

        The fast-feed path (DataLoader device normalize): the u8 batch is
        4× smaller than the f32 one over the ~90 MB/s tunneled
        host→device link (measured round 4: 12.6 MB f32 moves in ~171 ms,
        3.1 MB u8 in ~70 ms per 256-image batch), and the two host-side
        normalize passes move onto the TPU where they are a fused
        elementwise epilogue. Values match ``load_batch`` to ≤1 ulp
        (XLA's fma contraction; see DataLoader._device_normalize)."""
        indices = np.asarray(indices)
        labels = np.asarray([self.samples[i][1] for i in indices], np.int32)
        if self._cache is None:
            return self._decode_u8(indices), labels
        miss = indices[~self._cached[indices]]
        if miss.size:
            self._cache[miss] = self._decode_u8(miss)
            self._cached[miss] = True
        return self._cache[indices], labels

    def start_cache_warmup(self, order: Optional[np.ndarray] = None,
                           chunk: int = 256):
        """Fill the decode cache in the background (VERDICT r3 #5).

        The first XLA compile of a full-size step blocks the host for
        4–7 minutes over the tunneled TPU while the CPU sits idle; at
        ~1,300 img/s of decode that window is worth ~4-500k images — all
        of CelebA-64 twice over. Decoding ``order`` (the epoch-1 access
        order) into the cache during the compile makes epoch 1 run at
        cache speed instead of decode speed.

        Work-shares with the prefetch producer: both mark ``_cached``, so
        whoever reaches an image first decodes it and the other gathers
        from RAM (a concurrent duplicate decode of one in-flight chunk is
        possible and harmless — writes are idempotent). Returns the
        warmer thread, or None when the source is uncached. Idempotent:
        a second call while a warmer lives is a no-op."""
        if self._cache is None:
            return None
        live = getattr(self, "_warm_thread", None)
        if live is not None and live.is_alive():
            return live
        idx = (np.arange(len(self.samples)) if order is None
               else np.asarray(order))

        def work():
            for s in range(0, idx.size, chunk):
                block = idx[s:s + chunk]
                miss = block[~self._cached[block]]
                if miss.size:
                    self._cache[miss] = self._decode_u8(miss)
                    self._cached[miss] = True

        t = threading.Thread(target=work, daemon=True, name="decode-warm")
        self._warm_thread = t
        t.start()
        return t


def _read_idx(path: str) -> np.ndarray:
    """Parse one (optionally gzipped) MNIST idx file → uint8 ndarray."""
    import gzip
    import struct

    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rb") as f:
        zero, dtype_code, ndim = struct.unpack(">HBB", f.read(4))
        if zero != 0 or dtype_code != 0x08:
            raise ValueError(f"not a uint8 idx file: {path!r}")
        shape = struct.unpack(f">{ndim}I", f.read(4 * ndim))
        data = np.frombuffer(f.read(), np.uint8)
    return data.reshape(shape)


def find_mnist_files(root: str, train: bool = True):
    """Locate the MNIST idx pair under ``root`` (flat, or torchvision's
    MNIST/raw layout), gzipped or not. Returns (images_path, labels_path)
    or None. The reference auto-downloads via torchvision
    (dataset.py:32) — no network egress here, so the files must exist."""
    stem = "train" if train else "t10k"
    dirs = [Path(root), Path(root) / "MNIST" / "raw", Path(root) / "raw"]
    for d in dirs:
        for suffix in ("", ".gz"):
            imgs = d / f"{stem}-images-idx3-ubyte{suffix}"
            lbls = d / f"{stem}-labels-idx1-ubyte{suffix}"
            if imgs.is_file() and lbls.is_file():
                return str(imgs), str(lbls)
    return None


class MNISTSource:
    """MNIST from on-disk idx files: decode → Resize(img_size, bilinear) →
    Normalize(0.1307, 0.3081) (reference dataset.py:11,26-35). Output is
    (B, img_size, img_size, 1) float32."""

    MEAN, STD = 0.1307, 0.3081
    # the DataLoader's device-normalize math composes to (u/255 − mean)/std
    # — exactly this source's host normalize — so the u8 fast feed applies
    normalize = ((MEAN,), (STD,))

    def __init__(self, root: str, img_size: int = 28, train: bool = True):
        found = find_mnist_files(root, train=train)
        if found is None:
            raise FileNotFoundError(f"no MNIST idx files under {root!r}")
        self.images = _read_idx(found[0])  # (N, 28, 28) uint8
        self.labels = _read_idx(found[1]).astype(np.int32)
        assert self.images.shape[0] == self.labels.shape[0]
        self.img_size = img_size

    def __len__(self) -> int:
        return self.images.shape[0]

    def load_batch(self, indices: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        from PIL import Image

        imgs = self.images[np.asarray(indices)]
        if self.img_size != imgs.shape[1]:
            imgs = np.stack([
                np.asarray(Image.fromarray(im).resize(
                    (self.img_size, self.img_size), Image.BILINEAR))
                for im in imgs])
        x = imgs.astype(np.float32) / 255.0
        x = (x - self.MEAN) / self.STD
        return x[..., None], self.labels[np.asarray(indices)]

    def load_batch_u8(self, indices: np.ndarray
                      ) -> Tuple[np.ndarray, np.ndarray]:
        """``load_batch`` minus the normalize: (B, img_size, img_size, 1)
        uint8 + labels — the DataLoader's u8 fast feed (4× fewer bytes
        over the tunnel; normalize runs on device, ≤1 ulp vs the host
        path). PIL's bilinear resize of a uint8 image returns uint8, so
        the shipped pixels are bit-identical to what load_batch
        normalizes."""
        from PIL import Image

        indices = np.asarray(indices)
        imgs = self.images[indices]
        if self.img_size != imgs.shape[1]:
            imgs = np.stack([
                np.asarray(Image.fromarray(im).resize(
                    (self.img_size, self.img_size), Image.BILINEAR))
                for im in imgs])
        return imgs[..., None], self.labels[indices]


class SyntheticSource:
    """Deterministic synthetic 'CelebA-like' images: smooth random blobs in
    [-1, 1]. Usable for tests and for benchmarking the training path on
    machines without the dataset."""

    def __init__(self, size: int = 4096, img_size: int = 64,
                 channels: int = 3, seed: int = 0,
                 basis_sigma: Optional[float] = None,
                 normalize: Tuple = ((0.5,), (0.5,))):
        self.size = size
        self.img_size = img_size
        self.channels = channels
        self.seed = seed
        # Target range for the emitted images, as a renormalize_pm1
        # affine over the tanh output. The default (0.5, 0.5) is the
        # identity → [-1, 1], which IS celebA's real post-transform range
        # (Normalize(.5,.5); the flagship synthetic stream stays
        # bit-exact) and the birds/celebA generators' Tanh canvas. mnist
        # passes (0, 1) → [0, 1], its generator's sigmoid canvas: with
        # [-1,1] targets half the mass was unreachable and the recon
        # loss floored ~0.9 (round-5 family trajectory study). The
        # reference pairs its family Normalize constants and output
        # nonlinearities inconsistently and never trained these models
        # (SURVEY C8/C9) — the synthetic fallback targets the reachable
        # range so trajectories measure learning, not an inherited floor.
        self.normalize = normalize
        # Low-frequency basis so images have image-like statistics.
        #
        # The blur is ESSENTIAL, not cosmetic (round-4 destabilization
        # study, ROUND4.md): with a per-pixel white-noise basis the 16
        # coefficients are nearly unrecoverable through a strided-conv
        # encoder (averaging kills white detail), so the VAE's reachable
        # recon gain is ~0, β·KLD wins, and Eec sits pinned at the
        # predict-the-mean floor — recon-FID then tracks GAN drift
        # (the round-3 252→102→275 instability). Gaussian-blurring the
        # basis (σ = 6 px at img 64, scaled with resolution) made Eec
        # decline monotonically below the floor in the same quarter-width
        # setup. basis_sigma=0 reproduces the legacy white basis (kept for
        # the destabilization study harnesses).
        if basis_sigma is None:
            basis_sigma = 6.0 * img_size / 64.0
        self.basis_sigma = float(basis_sigma)
        rng = np.random.default_rng(seed)
        b = rng.normal(size=(16, img_size, img_size, channels))
        if self.basis_sigma > 0.0:
            # circular Gaussian blur via FFT (numpy-only); transfer
            # function of a Gaussian with std σ is exp(-2π²σ²f²)
            f = np.fft.fftfreq(img_size)
            g = np.exp(-2.0 * (np.pi * self.basis_sigma * f) ** 2)
            spec = np.fft.fft2(b, axes=(1, 2))
            spec *= g[None, :, None, None] * g[None, None, :, None]
            b = np.fft.ifft2(spec, axes=(1, 2)).real
            # per-pixel renormalize so Var(z_p) = (1/16)·Σ_j B_jp² stays
            # ~1 (keeps the tanh saturation and predict-mean floor of the
            # white basis, so loss scales remain comparable)
            ss = np.sqrt((b ** 2).sum(axis=0, keepdims=True) / b.shape[0])
            b = b / np.maximum(ss, 1e-8)
        self._basis = b.astype(np.float32)
        # The materialized-dataset RAM cache claims the same GLOBAL budget
        # as the folder decode caches (DMT_DECODE_CACHE_BYTES, default
        # 4 GiB): k parallel-β loaders must share one allowance, not
        # multiply it (k × 4 GiB of silent f32 caches would exhaust the
        # single-CPU host — review r4 #7).
        nbytes = size * img_size * img_size * channels * 4
        self._use_cache = _decode_cache_reserve(nbytes, forced=False)
        if self._use_cache:
            import weakref
            weakref.finalize(self, _decode_cache_release, nbytes)

    def __len__(self) -> int:
        return self.size

    @staticmethod
    def _hash_normal(idx: np.ndarray, j: np.ndarray, seed: int) -> np.ndarray:
        """Deterministic per-(index, coeff) standard normals via integer
        hashing + Box–Muller — fully vectorized (a per-index
        ``default_rng`` was the old per-image bottleneck)."""
        def h(salt):
            v = (idx[:, None].astype(np.uint64) * np.uint64(2654435761)
                 + j[None, :].astype(np.uint64) * np.uint64(40503)
                 + np.uint64(seed * 7919 + salt))
            v ^= v >> np.uint64(33)
            v *= np.uint64(0xFF51AFD7ED558CCD)
            v ^= v >> np.uint64(33)
            return ((v & np.uint64(0xFFFFFFFF)).astype(np.float64) + 0.5) / 2**32
        u1, u2 = h(1), h(2)
        return (np.sqrt(-2.0 * np.log(u1))
                * np.cos(2.0 * np.pi * u2)).astype(np.float32)

    def _materialize(self, idx: np.ndarray) -> np.ndarray:
        coeff = self._hash_normal(idx, np.arange(16), self.seed) / 4.0
        pm1 = np.tanh(np.tensordot(coeff, self._basis, axes=1)).astype(np.float32)
        return renormalize_pm1(pm1, *self.normalize)

    def load_batch(self, indices: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        idx = np.asarray(indices, np.int64)
        if self._use_cache:
            if not hasattr(self, "_cache"):
                self._cache = self._materialize(np.arange(self.size))
            out = self._cache[idx]
        else:
            # over budget: re-materialize per batch (vectorized gemm+tanh;
            # the prefetch thread hides it behind the device step)
            out = self._materialize(idx)
        labels = (idx % 2).astype(np.int32)
        return out, labels


def process_local_slice(indices: np.ndarray, process_index: int,
                        process_count: int) -> np.ndarray:
    """The contiguous per-process slice of one global batch's indices.
    Contiguous blocks line up with a 1-D ``Mesh`` built from
    ``jax.devices()`` (process-major order), so
    ``make_array_from_process_local_data`` needs no resharding."""
    per = len(indices) // process_count
    return indices[process_index * per:(process_index + 1) * per]


# Compiled u8-normalize+split programs, shared across DataLoader instances
# (keyed by group size, normalization constants and sharding) — per-epoch
# FID loaders and benchmark windows must not re-trace per instance.
_NORM_JITS: Dict[Any, Any] = {}


class DataLoader:
    """Shuffling, batching, prefetching loader that yields device arrays.

    Equivalent of torch DataLoader(shuffle, num_workers) at
    dataset.py:48-50, but prefetches decoded batches onto the device (with
    an optional batch sharding) so the TPU never waits on host I/O."""

    def __init__(self, source, batch_size: int, shuffle: bool = False,
                 seed: int = 999, drop_last: bool = True,
                 sharding: Optional[jax.sharding.Sharding] = None,
                 prefetch: int = 2,
                 process_index: Optional[int] = None,
                 process_count: Optional[int] = None,
                 transfer_chunk: Optional[int] = None):
        self.source = source
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.sharding = sharding
        self.prefetch = max(1, prefetch)
        self._epoch = 0
        # Per-host slicing (pods): every process derives the SAME global
        # index permutation (seeded), then decodes only its contiguous
        # 1/process_count slice of each batch. Overridable for single-host
        # simulation in tests.
        self.process_index = (jax.process_index() if process_index is None
                              else process_index)
        self.process_count = (jax.process_count() if process_count is None
                              else process_count)
        # Simulated processes (tests/dryrun) slice regardless of sharding;
        # REAL multi-host slices only when the global array can actually be
        # assembled (sharding present) — otherwise each host must see the
        # full batch, or it would silently train on a partial batch as if
        # it were whole.
        self._explicit_process = (process_index is not None
                                  or process_count is not None)
        if self.process_count > 1 and batch_size % self.process_count:
            raise ValueError(
                f"batch_size {batch_size} must divide evenly across "
                f"{self.process_count} processes")
        # uint8 fast feed: how many batches ride one host→device copy.
        # The tunneled link has a fixed ~37 ms dispatch latency on top of
        # ~94 MB/s (round-4 probe), so shipping k batches per transfer
        # amortizes the latency k-fold; 4 × 256-image u8 batches ≈ 12.4 MB
        # ≈ 169 ms ≈ 6,000 img/s of feed ceiling vs 3,650 at k=1.
        self.transfer_chunk = max(1, int(
            os.environ.get("DMT_TRANSFER_CHUNK", "4")
            if transfer_chunk is None else transfer_chunk))

    def __len__(self) -> int:
        n = len(self.source)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    @property
    def dataset_size(self) -> int:
        return len(self.source)

    def _epoch_indices(self) -> np.ndarray:
        n = len(self.source)
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            rng.shuffle(idx)
        return idx

    def start_cache_warmup(self):
        """Warm the source's decode cache in the background, in exactly
        the order the NEXT epoch will read it — including this host's
        per-batch slice on pods, so a host never decodes rows it will not
        feed. Call while the first step compiles (train/loop.py does);
        no-op for sources without a cache (synthetic, mnist, cache='off').
        ``DMT_DECODE_WARMUP=0`` disables (for the A/B measurement)."""
        if os.environ.get("DMT_DECODE_WARMUP", "1") == "0":
            return None
        warm = getattr(self.source, "start_cache_warmup", None)
        if warm is None:
            return None
        idx = self._epoch_indices()
        nb = len(self)
        # mirror the producer's slicing decision exactly (a host must warm
        # precisely the rows it will feed, no more, no fewer)
        multihost = (self.process_count > 1 and jax.process_count() > 1
                     and self.sharding is not None)
        do_slice = self.process_count > 1 and (multihost
                                               or self._explicit_process)
        slices = []
        for i in range(nb):
            b = idx[i * self.batch_size:(i + 1) * self.batch_size]
            if do_slice:
                b = process_local_slice(b, self.process_index,
                                        self.process_count)
            slices.append(b)
        if not slices:
            return None
        return warm(np.concatenate(slices))

    def _device_norm_split(self, u8_dev: jax.Array, y_dev: jax.Array,
                           n: int):
        """(n, B, H, W, C) uint8 + (n, B) labels on device → tuple of n
        normalized float32 (B, H, W, C) batches and tuple of n (B,) label
        arrays, jitted (module-level cache keyed by group size,
        normalization constants and sharding, so fresh DataLoader
        instances — per-epoch FID loaders, benchmark windows — reuse the
        compiled program).

        Same math as the host path ``normalize_to_unit_range`` →
        ``renormalize_pm1``; XLA contracts each multiply+add into an fma,
        so values can differ from numpy's by ≤1 ulp (≈1.2e-7 — eight
        orders below the u8 grid spacing of 1/127.5; the golden
        torch-trajectory tests feed the f32 synthetic path and are
        untouched). The elementwise chain + split is one fused HBM pass
        on the TPU — microseconds against the ~100 ms each f32 batch
        used to spend on the tunnel (probe: 73.7 MB/s f32 vs 44.8 MB/s
        u8 per-batch effective = fixed ~37 ms dispatch latency + ~94 MB/s
        link). Labels ride the same stacked transfer and split here —
        per-batch label copies each re-paid the fixed dispatch latency."""
        mean, std = getattr(self.source, "normalize",
                            ((0.5, 0.5, 0.5), (0.5, 0.5, 0.5)))
        mean = np.asarray(mean, np.float32)
        std = np.asarray(std, np.float32)
        key = (n, mean.tobytes(), std.tobytes(), self.sharding)
        fn = _NORM_JITS.get(key)
        if fn is None:
            identity = bool(np.allclose(mean, 0.5)
                            and np.allclose(std, 0.5))
            scale = np.float32(0.5) / std
            shift = (np.float32(0.5) - mean) / std

            def f(u, yv):
                x = u.astype(jnp.float32) * np.float32(2.0 / 255.0)
                x = x - np.float32(1.0)
                if not identity:
                    x = x * scale + shift
                return (tuple(x[i] for i in range(n)),
                        tuple(yv[i] for i in range(n)))

            if self.sharding is None:
                kw = {}
            else:
                ysh = jax.sharding.NamedSharding(
                    self.sharding.mesh,
                    jax.sharding.PartitionSpec(*self.sharding.spec[:1]))
                kw = {"out_shardings": ((self.sharding,) * n, (ysh,) * n)}
            fn = _NORM_JITS[key] = jax.jit(f, **kw)
        return fn(u8_dev, y_dev)

    def __iter__(self) -> Iterator[Tuple[jax.Array, jax.Array]]:
        idx = self._epoch_indices()
        self._epoch += 1
        nb = len(self)
        batches = [idx[i * self.batch_size:(i + 1) * self.batch_size]
                   for i in range(nb)]

        # Two pipelined producer stages (round 4): decode → hostq →
        # transfer → q. Overlapping decode with the host→device copy
        # matters on the tunneled TPU, where shipping one 256-image batch
        # costs ~70-170 ms — serialized behind a ~140 ms decode it halved
        # the feed rate. Sources with a ``load_batch_u8`` fast path ship
        # uint8 (4× fewer bytes), ``transfer_chunk`` batches per copy
        # (amortizing the fixed dispatch latency), and normalize+split on
        # device.
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        hostq: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        multihost = (self.process_count > 1 and jax.process_count() > 1
                     and self.sharding is not None)
        use_u8 = (hasattr(self.source, "load_batch_u8")
                  and os.environ.get("DMT_DEVICE_NORMALIZE", "1") != "0")
        # group FULL batches transfer_chunk at a time; a partial tail
        # batch (drop_last=False) rides alone so groups reshape uniformly
        groups: List[List[np.ndarray]] = []
        chunk = self.transfer_chunk if use_u8 else 1
        for b in batches:
            if (groups and len(groups[-1]) < chunk
                    and len(groups[-1][-1]) == self.batch_size
                    and len(b) == self.batch_size):
                groups[-1].append(b)
            else:
                groups.append([b])

        def put_q(q_: "queue.Queue", item) -> bool:
            # bounded put that gives up once the consumer is gone, so an
            # abandoned iterator can never leave a thread blocked forever
            while not stop.is_set():
                try:
                    q_.put(item, timeout=0.5)
                    return True
                except queue.Full:
                    continue
            return False

        def put_on_device(arr: np.ndarray, lead: int = 0) -> jax.Array:
            # ``lead``: arr is a stack of ``lead`` batches (u8 groups) —
            # the stack axis is unsharded, each row keeps the batch spec.
            if multihost:
                # arr is this host's slice; assemble the global array from
                # per-process shards without any cross-host data movement.
                # Global batch = local slice × process count (NOT
                # self.batch_size, which is wrong for a partial tail batch
                # under drop_last=False).
                gbatch = arr.shape[bool(lead)] * self.process_count
                gshape = ((lead,) if lead else ()) \
                    + (gbatch,) + arr.shape[1 + bool(lead):]
                sh = self.sharding
                if arr.ndim == 1:  # labels: shard axis 0 on the same mesh
                    sh = jax.sharding.NamedSharding(
                        self.sharding.mesh, jax.sharding.PartitionSpec(
                            *self.sharding.spec[:1]))
                elif lead:
                    sh = jax.sharding.NamedSharding(
                        self.sharding.mesh, jax.sharding.PartitionSpec(
                            None, *self.sharding.spec))
                return jax.make_array_from_process_local_data(
                    sh, arr, gshape)
            if self.sharding is not None:
                sh = self.sharding
                if lead:
                    sh = jax.sharding.NamedSharding(
                        sh.mesh, jax.sharding.PartitionSpec(None, *sh.spec))
                return jax.device_put(arr, sh)
            return jnp.asarray(arr)

        def decode_producer():
            try:
                for group in groups:
                    if stop.is_set():
                        return
                    idxs = [process_local_slice(
                        b, self.process_index, self.process_count)
                        if self.process_count > 1 and (
                            multihost or self._explicit_process) else b
                        for b in group]
                    if use_u8:
                        # one gather for the whole group, shipped stacked
                        flat = np.concatenate(idxs)
                        x, y = self.source.load_batch_u8(flat)
                        n, per = len(group), len(idxs[0])
                        item = (x.reshape((n, per) + x.shape[1:]),
                                y.reshape((n, per)))
                    else:
                        item = self.source.load_batch(idxs[0])
                    if not put_q(hostq, item):
                        return
                put_q(hostq, None)
            except BaseException as e:  # surface in consumer
                put_q(hostq, e)

        def transfer_producer():
            try:
                while not stop.is_set():
                    try:  # bounded, like put_q: never outlive the consumer
                        item = hostq.get(timeout=0.5)
                    except queue.Empty:
                        continue
                    if item is None or isinstance(item, BaseException):
                        put_q(q, item)
                        return
                    x, y = item
                    if use_u8:
                        # two transfers per group (image stack + label
                        # stack) — one per batch would re-pay the fixed
                        # ~37 ms dispatch latency transfer_chunk exists
                        # to amortize
                        n = x.shape[0]
                        xd = put_on_device(x, lead=n)
                        yd = (put_on_device(y, lead=n) if multihost
                              or self.sharding is not None
                              else jnp.asarray(y))
                        xs, ys = self._device_norm_split(xd, yd, n)
                        for j in range(n):
                            if not put_q(q, (xs[j], ys[j])):
                                return
                    else:
                        xd = put_on_device(x)
                        yd = put_on_device(y) if multihost else jnp.asarray(y)
                        if not put_q(q, (xd, yd)):
                            return
            except BaseException as e:
                put_q(q, e)

        for nm, fn in (("dmt-decode", decode_producer),
                       ("dmt-transfer", transfer_producer)):
            threading.Thread(target=fn, name=nm, daemon=True).start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()


def uses_real_mnist(opt) -> bool:
    """True when :func:`get_data_loader` will route ``--dataset mnist`` to
    the real idx-file MNISTSource rather than the synthetic fallback —
    the same decision ``make`` takes below. Lets callers (families.py)
    validate loader-specific constraints (1-channel input) only when the
    real loader is actually in play."""
    if bool(getattr(opt, "synthetic_data", False)):
        return False
    root = opt.image_root_train
    return os.path.isdir(root) and find_mnist_files(root) is not None


def get_data_loader(opt, sharding: Optional[jax.sharding.Sharding] = None):
    """(train, val, test) loaders switched on opt.dataset — same contract as
    the reference's get_data_loader (dataset.py:14-52), with a synthetic
    branch when ``opt.synthetic_data`` is set or the image roots are absent.

    Per the reference, birds and mnist provide a train loader only
    (dataset.py:23-24,34-35 return None val/test); their per-dataset
    normalization constants are applied (dataset.py:9-11)."""

    def make(root: str, batch: int, shuffle: bool, split_seed: int,
             normalize=NORMALIZE["celebA"], source_cls=None,
             synth_normalize=((0.5,), (0.5,))):
        use_synth = bool(getattr(opt, "synthetic_data", False)) or not os.path.isdir(root)
        if not use_synth and source_cls is MNISTSource:
            use_synth = find_mnist_files(root) is None
        if use_synth:
            n = getattr(opt, "synthetic_train_size", 4096)
            if not shuffle:
                n = max(opt.batch_size_test * 4, 64)
            sig = float(getattr(opt, "synthetic_basis_sigma", -1.0))
            src = SyntheticSource(size=n, img_size=opt.img_size,
                                  channels=opt.input_channels,
                                  seed=opt.seed + split_seed,
                                  basis_sigma=None if sig < 0 else sig,
                                  normalize=synth_normalize)
        elif source_cls is MNISTSource:
            src = MNISTSource(root, img_size=opt.img_size)
        else:
            # decode cache on the TRAIN stream only: it is the split that
            # is re-read every epoch, and a per-split cache would multiply
            # the DMT_DECODE_CACHE_BYTES budget by three
            src = ImageFolderSource(
                root, img_size=opt.img_size, num_workers=opt.num_workers,
                normalize=normalize,
                cache=getattr(opt, "cache_decoded", "auto")
                if shuffle else "off")
        # the batch sharding (and per-host slicing) belongs to the TRAIN
        # stream only (val/test batch sizes need not divide the device
        # count, and every host evaluates the full batch)
        return DataLoader(src, batch, shuffle=shuffle, seed=opt.seed,
                          sharding=sharding if shuffle else None,
                          process_index=None if shuffle else 0,
                          process_count=None if shuffle else 1)

    if opt.dataset in ("celebA", "celebA_reduced"):
        train = make(opt.image_root_train, opt.batch_size_train, True, 0)
        val = make(opt.image_root_val, opt.batch_size_val, False, 1)
        test = make(opt.image_root_test, opt.batch_size_test, False, 2)
        return train, val, test
    if opt.dataset == "birds":
        train = make(opt.image_root_train, opt.batch_size_train, True, 0,
                     normalize=NORMALIZE["birds"])
        return train, None, None
    if opt.dataset == "mnist":
        # synth_normalize (0,1) → [0,1], the mnist generator's sigmoid
        # canvas (see SyntheticSource); real idx data keeps MNISTSource's
        # own reference-exact constants
        train = make(opt.image_root_train, opt.batch_size_train, True, 0,
                     source_cls=MNISTSource,
                     synth_normalize=((0.0,), (1.0,)))
        return train, None, None
    raise ValueError(f"unknown dataset {opt.dataset!r}")
