"""Sample / reconstruction artifact dumpers.

Same four-function contract and filenames as the reference's
``helper_functions`` module (reference: utils/utils.py:6-32):

- ``generate_fid_samples(fn, epoch, n_samples, n_hidden, path)``:
  z ~ N(0,1) → fn(z) → one file per image ``sample_{i}_{epoch}.png``.
- ``generate_samples(...)``: one grid image ``sample_{epoch}.png``.
- ``gen_reconstructions(fn, dl, epoch, path, nrow, path_for_originals)``:
  first test batch → fn → grid ``recon_{epoch}.png`` (+ originals grid).
- ``gen_fid_reconstructions``: per-image recon files ``recon_{i}_{epoch}.png``.

``fn`` is any array→array callable (a jitted decode closure in training, a
plain lambda in tests — the reference's fake-backend pattern,
utils.py:35-57). Images are NHWC. Decoding happens on device in one batched
call; only the final uint8 conversion touches the host. Extension is .png
(fix for the reference's .pdf/glob mismatch — see image_io.py docstring).
"""

from __future__ import annotations

from typing import Callable, Iterable

import jax
import numpy as np

from ..utils.image_io import save_image, save_image_grid


def _sample_latents(rng_seed: int, n_samples: int, n_hidden: int) -> jax.Array:
    import jax.numpy as jnp
    return jax.random.normal(
        jax.random.key(rng_seed), (n_samples, n_hidden), jnp.float32)


def write_sample_files(u8_batch, epoch: int, results_path: str,
                       prefix: str = "sample") -> None:
    """One ``{prefix}_{i}_{epoch}.png`` per image from an ALREADY-quantized
    NHWC uint8 batch (eval.fid.normalized_u8 — per-image min-max, the
    save_image(normalize=True) math, done on device for device batches).
    Accepts a device array (pulled here: n·H·W·C bytes, 4× less tunnel
    traffic than the old float32 pull); safe to call from a background
    thread, which the train loops do (train/loop.py _maybe_fid_async)."""
    from PIL import Image

    u8_batch = np.asarray(jax.device_get(u8_batch))
    for i, arr in enumerate(u8_batch):
        if arr.ndim == 3 and arr.shape[-1] == 1:
            arr = arr[..., 0]
        Image.fromarray(arr).save(f"{results_path}/{prefix}_{i}_{epoch}.png")


def generate_fid_samples(fn: Callable, epoch: int, n_samples: int,
                         n_hidden: int, results_path: str,
                         rng_seed: int = 0, save: bool = True):
    """Decode n_samples random latents and save one PNG per image
    (utils.py:21-26). Returns the decoded batch so callers can also score
    FID in memory without the disk round-trip — DEVICE-resident when the
    decode ran on device (the on-device scoring path in eval/fid.py then
    never re-uploads the 1000×64×64×3 batch over the tunnel; the host pull
    here feeds only the PNG writes, quantized to uint8 on device first),
    plain numpy otherwise (lambda fns in tests). ``save=False``
    (--fid_save_samples False) skips the per-epoch PNG writes — the FID
    score is unchanged; only the on-disk sample files are dropped."""
    from .fid import normalized_u8

    z = _sample_latents(rng_seed, n_samples, n_hidden)
    dev = fn(z)
    if save:
        write_sample_files(normalized_u8(dev), epoch, results_path)
    return dev if isinstance(dev, jax.Array) else np.asarray(dev, np.float32)


def generate_samples(fn: Callable, epoch: int, n_samples: int, n_hidden: int,
                     results_path: str, nrow: int = 8,
                     rng_seed: int = 0) -> None:
    """Grid of decoded samples (utils.py:28-32)."""
    z = _sample_latents(rng_seed, n_samples, n_hidden)
    batch = np.asarray(jax.device_get(fn(z)), np.float32)
    save_image_grid(batch, f"{results_path}/sample_{epoch}.png", nrow=nrow)


def gen_reconstructions(fn: Callable, dl: Iterable, epoch: int,
                        results_path: str, nrow: int = 8,
                        path_for_originals: str = "") -> None:
    """Reconstruct the first test batch into a grid (utils.py:13-19)."""
    orig, _ = next(iter(dl))
    batch = np.asarray(jax.device_get(fn(orig)), np.float32)
    save_image_grid(batch, f"{results_path}/recon_{epoch}.png", nrow=nrow)
    if path_for_originals:
        save_image_grid(np.asarray(jax.device_get(orig), np.float32),
                        f"{path_for_originals}/original_{epoch}.png",
                        nrow=nrow)


def gen_fid_reconstructions(fn: Callable, dl: Iterable, epoch: int,
                            results_path: str) -> None:
    """Per-image reconstruction files (utils.py:6-11)."""
    orig, _ = next(iter(dl))
    batch = np.asarray(jax.device_get(fn(orig)), np.float32)
    for i in range(batch.shape[0]):
        save_image(batch[i], f"{results_path}/recon_{i}_{epoch}.png",
                   normalize=True)
