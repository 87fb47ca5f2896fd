"""Device-fed input pipeline.

TPU-native replacement for the reference's torchvision ImageFolder +
DataLoader worker processes (reference: dataloader/dataset.py:37-50). The
reference pipeline is: PIL decode → Resize((64,64)) → CenterCrop(64) (a
no-op after an exact resize) → ToTensor → Normalize(0.5, 0.5), i.e. pixels
scaled to [-1, 1] to match the decoder's Tanh (models/model.py:360).

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

Layout is NHWC float32 in [-1, 1]; casting to the model compute dtype
happens inside the jitted step.
"""

from __future__ import annotations

import os
import threading
import queue
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import Iterator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

IMG_EXTENSIONS = (".jpg", ".jpeg", ".png", ".ppm", ".bmp", ".webp")


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


class ImageFolderSource:
    """torchvision-ImageFolder-compatible directory scan: one subdirectory
    per class, images sorted for determinism."""

    def __init__(self, root: str, img_size: int = 64, num_workers: int = 8):
        self.root = root
        self.img_size = img_size
        self.num_workers = max(1, num_workers)
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

    def __len__(self) -> int:
        return len(self.samples)

    def load_batch(self, indices: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        paths = [self.samples[i][0] for i in indices]
        labels = np.asarray([self.samples[i][1] for i in indices], np.int32)
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
            return batch, labels
        if self._native is not None:
            # PIL decode (GIL-releasing) in threads; fused C++ bilinear
            # resize + [-1,1] normalize + batch assembly.
            raw = list(self._pool.map(_decode, paths))
            return self._native.resize_normalize_batch(
                raw, self.img_size, num_threads=self.num_workers), labels
        imgs = list(self._pool.map(
            lambda p: _decode_resize(p, self.img_size), paths))
        return normalize_to_unit_range(np.stack(imgs)), labels


class SyntheticSource:
    """Deterministic synthetic 'CelebA-like' images: smooth random blobs in
    [-1, 1]. Usable for tests and for benchmarking the training path on
    machines without the dataset."""

    def __init__(self, size: int = 4096, img_size: int = 64,
                 channels: int = 3, seed: int = 0):
        self.size = size
        self.img_size = img_size
        self.channels = channels
        self.seed = seed
        # Low-frequency basis so images have image-like statistics.
        rng = np.random.default_rng(seed)
        self._basis = rng.normal(
            size=(16, img_size, img_size, channels)).astype(np.float32)

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

    _CACHE_LIMIT_BYTES = 1 << 30  # cache datasets up to 1 GiB in RAM

    def _materialize(self, idx: np.ndarray) -> np.ndarray:
        coeff = self._hash_normal(idx, np.arange(16), self.seed) / 4.0
        return np.tanh(np.tensordot(coeff, self._basis, axes=1)).astype(np.float32)

    def load_batch(self, indices: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        idx = np.asarray(indices, np.int64)
        nbytes = self.size * self.img_size ** 2 * self.channels * 4
        if nbytes <= self._CACHE_LIMIT_BYTES:
            if not hasattr(self, "_cache"):
                self._cache = self._materialize(np.arange(self.size))
            out = self._cache[idx]
        else:
            out = self._materialize(idx)
        labels = (idx % 2).astype(np.int32)
        return out, labels


class DataLoader:
    """Shuffling, batching, prefetching loader that yields device arrays.

    Equivalent of torch DataLoader(shuffle, num_workers) at
    dataset.py:48-50, but prefetches decoded batches onto the device (with
    an optional batch sharding) so the TPU never waits on host I/O."""

    def __init__(self, source, batch_size: int, shuffle: bool = False,
                 seed: int = 999, drop_last: bool = True,
                 sharding: Optional[jax.sharding.Sharding] = None,
                 prefetch: int = 2):
        self.source = source
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.sharding = sharding
        self.prefetch = max(1, prefetch)
        self._epoch = 0

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

    def __iter__(self) -> Iterator[Tuple[jax.Array, jax.Array]]:
        idx = self._epoch_indices()
        self._epoch += 1
        nb = len(self)
        batches = [idx[i * self.batch_size:(i + 1) * self.batch_size]
                   for i in range(nb)]

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def put_on_device(arr: np.ndarray) -> jax.Array:
            if self.sharding is not None:
                return jax.device_put(arr, self.sharding)
            return jnp.asarray(arr)

        def producer():
            try:
                for b in batches:
                    if stop.is_set():
                        return
                    x, y = self.source.load_batch(b)
                    q.put((put_on_device(x), jnp.asarray(y)))
                q.put(None)
            except BaseException as e:  # surface in consumer
                q.put(e)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
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


def get_data_loader(opt, sharding: Optional[jax.sharding.Sharding] = None):
    """(train, val, test) loaders switched on opt.dataset — same contract as
    the reference's get_data_loader (dataset.py:14-52), with a synthetic
    branch when ``opt.synthetic_data`` is set or the image roots are absent."""

    def make(root: str, batch: int, shuffle: bool, split_seed: int):
        use_synth = bool(getattr(opt, "synthetic_data", False)) or not os.path.isdir(root)
        if use_synth:
            n = getattr(opt, "synthetic_train_size", 4096)
            if not shuffle:
                n = max(opt.batch_size_test * 4, 64)
            src = SyntheticSource(size=n, img_size=opt.img_size,
                                  channels=opt.input_channels,
                                  seed=opt.seed + split_seed)
        else:
            src = ImageFolderSource(root, img_size=opt.img_size,
                                    num_workers=opt.num_workers)
        # the batch sharding belongs to the TRAIN stream only (val/test
        # batch sizes need not divide the device count)
        return DataLoader(src, batch, shuffle=shuffle, seed=opt.seed,
                          sharding=sharding if shuffle else None)

    if opt.dataset in ("celebA", "celebA_reduced", "birds", "mnist"):
        train = make(opt.image_root_train, opt.batch_size_train, True, 0)
        val = make(opt.image_root_val, opt.batch_size_val, False, 1)
        test = make(opt.image_root_test, opt.batch_size_test, False, 2)
        return train, val, test
    raise ValueError(f"unknown dataset {opt.dataset!r}")
