"""Image saving: single images and grids.

Replacement for torchvision.utils.save_image as used by the reference's
dump helpers (reference: utils/utils.py:6-32). Behaviour preserved:
``normalize=True`` rescales each saved tensor from its own [min, max] to
[0, 255]; grids are rows of ``nrow`` with 2-pixel padding.

One deliberate fix: the reference saved FID samples as ``.pdf``
(utils.py:11,26) which its own FID globber never picks up (fid.py:293 globs
*.jpg/*.png — SURVEY.md C15/C16); we default to ``.png``.
"""

from __future__ import annotations

import math
import numpy as np


def _to_uint8(img: np.ndarray, normalize: bool = True) -> np.ndarray:
    """HWC float → HWC uint8. With normalize, rescale from the tensor's own
    range (torchvision save_image(normalize=True) semantics)."""
    img = np.asarray(img, np.float32)
    if normalize:
        lo, hi = float(img.min()), float(img.max())
        img = (img - lo) / max(hi - lo, 1e-5)
    return np.clip(img * 255.0 + 0.5, 0, 255).astype(np.uint8)


def save_image(img, path: str, normalize: bool = True) -> None:
    """Save one HWC image (any float range)."""
    from PIL import Image

    arr = _to_uint8(np.asarray(img), normalize)
    if arr.ndim == 3 and arr.shape[-1] == 1:
        arr = arr[..., 0]
    Image.fromarray(arr).save(path)


def make_grid(batch: np.ndarray, nrow: int = 8, padding: int = 2,
              normalize: bool = True) -> np.ndarray:
    """NHWC batch → one HWC grid image (torchvision make_grid layout)."""
    batch = np.asarray(batch, np.float32)
    n, h, w, c = batch.shape
    if normalize:
        lo, hi = float(batch.min()), float(batch.max())
        batch = (batch - lo) / max(hi - lo, 1e-5)
    ncol = min(nrow, n)
    nrows = math.ceil(n / ncol)
    grid = np.zeros(
        (nrows * (h + padding) + padding, ncol * (w + padding) + padding, c),
        np.float32)
    for i in range(n):
        r, col = divmod(i, ncol)
        y0 = padding + r * (h + padding)
        x0 = padding + col * (w + padding)
        grid[y0:y0 + h, x0:x0 + w] = batch[i]
    return grid


def save_image_grid(batch, path: str, nrow: int = 8,
                    normalize: bool = True) -> None:
    from PIL import Image

    grid = make_grid(np.asarray(batch), nrow=nrow, normalize=normalize)
    arr = np.clip(grid * 255.0 + 0.5, 0, 255).astype(np.uint8)
    if arr.shape[-1] == 1:
        arr = arr[..., 0]
    Image.fromarray(arr).save(path)
