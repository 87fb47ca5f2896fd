"""ctypes bindings for the native preprocessing library (native/preprocess.cpp).

Builds the shared library with g++ on first use (no pip; cached under
~/.cache/disentangle_mlp_tpu). All entry points degrade gracefully: when no
compiler is available, callers fall back to the numpy path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "preprocess.cpp")
_CACHE_DIR = os.path.expanduser("~/.cache/disentangle_mlp_tpu")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> Optional[str]:
    if not os.path.isfile(_SRC):
        return None
    os.makedirs(_CACHE_DIR, exist_ok=True)
    so_path = os.path.join(_CACHE_DIR, "libdmt_preprocess.so")
    if (os.path.isfile(so_path)
            and os.path.getmtime(so_path) >= os.path.getmtime(_SRC)):
        return so_path
    base = ["g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
            "-pthread"]
    # Prefer the fully native JPEG path when libjpeg dev files exist.
    candidates = [
        base + ["-DDMT_HAVE_JPEG", _SRC, "-ljpeg", "-o", so_path],
        base + [_SRC, "-o", so_path],
    ]
    for cmd in candidates:
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            return so_path
        except Exception:
            continue
    return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        path = _build()
        if path is None:
            return None
        lib = ctypes.CDLL(path)
        lib.dmt_resize_normalize_batch.argtypes = [
            ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int32,
        ]
        lib.dmt_resize_normalize_batch.restype = None
        lib.dmt_normalize_batch.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int32,
        ]
        lib.dmt_normalize_batch.restype = None
        lib.dmt_has_jpeg.restype = ctypes.c_int32
        if lib.dmt_has_jpeg():
            lib.dmt_load_jpeg_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int32,
                ctypes.c_int32, ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
            ]
            lib.dmt_load_jpeg_batch.restype = None
        _lib = lib
        return _lib


def has_jpeg() -> bool:
    lib = get_lib()
    return bool(lib is not None and lib.dmt_has_jpeg())


def load_jpeg_batch(paths: List[str], out_size: int,
                    num_threads: int = 0) -> tuple:
    """JPEG files → (N, out, out, 3) float32 in [-1, 1], fully in C++
    (decode + antialiased resize + normalize). Returns (batch, ok_mask);
    failed decodes have ok_mask[i] == 0 and undefined pixels."""
    lib = get_lib()
    assert lib is not None and lib.dmt_has_jpeg()
    n = len(paths)
    num_threads = num_threads or min(n, os.cpu_count() or 1)
    out = np.empty((n, out_size, out_size, 3), np.float32)
    ok = np.zeros(n, np.int32)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.dmt_load_jpeg_batch(
        c_paths, n, out_size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ok.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), num_threads)
    return out, ok.astype(bool)


def available() -> bool:
    return get_lib() is not None


def resize_normalize_batch(images: List[np.ndarray], out_size: int,
                           num_threads: int = 0) -> np.ndarray:
    """List of HWC uint8 RGB arrays (any sizes) → (N, out, out, 3) float32
    in [-1, 1], fused bilinear resize + normalize, multi-threaded in C++."""
    lib = get_lib()
    assert lib is not None, "native library unavailable"
    n = len(images)
    num_threads = num_threads or min(n, os.cpu_count() or 1)
    images = [np.ascontiguousarray(im) for im in images]
    out = np.empty((n, out_size, out_size, 3), np.float32)

    ptrs = (ctypes.c_void_p * n)(
        *[im.ctypes.data_as(ctypes.c_void_p).value for im in images])
    hs = (ctypes.c_int32 * n)(*[im.shape[0] for im in images])
    ws = (ctypes.c_int32 * n)(*[im.shape[1] for im in images])
    lib.dmt_resize_normalize_batch(
        ptrs, hs, ws, n, out_size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), num_threads)
    return out


def normalize_batch(batch_u8: np.ndarray, num_threads: int = 0) -> np.ndarray:
    """Contiguous uint8 array → float32 [-1, 1] (any shape)."""
    lib = get_lib()
    assert lib is not None, "native library unavailable"
    batch_u8 = np.ascontiguousarray(batch_u8)
    out = np.empty(batch_u8.shape, np.float32)
    num_threads = num_threads or (os.cpu_count() or 1)
    lib.dmt_normalize_batch(
        batch_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        batch_u8.size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), num_threads)
    return out
