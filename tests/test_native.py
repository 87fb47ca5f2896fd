"""Native C++ preprocessing: builds with g++, matches the PIL/numpy
reference path within interpolation tolerance, and parallelizes."""

import numpy as np
import pytest

from disentangle_mlp_tpu.data import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="g++ unavailable")

rng = np.random.default_rng(0)


def test_normalize_batch_matches_numpy():
    u8 = rng.integers(0, 256, size=(4, 16, 16, 3), dtype=np.uint8)
    got = native.normalize_batch(u8)
    ref = u8.astype(np.float32) * (2.0 / 255.0) - 1.0
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_resize_normalize_matches_pil():
    from PIL import Image

    imgs = [rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            for h, w in [(218, 178), (100, 100), (64, 64), (37, 91)]]
    got = native.resize_normalize_batch(imgs, 64)
    assert got.shape == (4, 64, 64, 3)
    for i, im in enumerate(imgs):
        ref_u8 = np.asarray(
            Image.fromarray(im).resize((64, 64), Image.BILINEAR), np.uint8)
        ref = ref_u8.astype(np.float32) * (2.0 / 255.0) - 1.0
        # PIL uses fixed-point bilinear with slightly different tap weights;
        # allow a few gray levels of tolerance.
        diff = np.abs(got[i] - ref)
        assert float(np.mean(diff)) < 0.02, f"image {i} mean {diff.mean()}"
        assert float(np.quantile(diff, 0.99)) < 0.08


def test_identity_resize_is_exact():
    im = rng.integers(0, 256, size=(64, 64, 3), dtype=np.uint8)
    got = native.resize_normalize_batch([im], 64)[0]
    ref = im.astype(np.float32) * (2.0 / 255.0) - 1.0
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_threadsanitizer_clean(tmp_path):
    """Race detection for the native threading (the reference has no
    sanitizer story — SURVEY.md §5): build the kernels + harness with
    -fsanitize=thread and require a clean run."""
    import os
    import subprocess

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    src = os.path.join(root, "native", "preprocess.cpp")
    harness = os.path.join(root, "native", "preprocess_tsan_test.cpp")
    exe = tmp_path / "tsan_test"
    build = subprocess.run(
        ["g++", "-O1", "-g", "-std=c++17", "-pthread", "-fsanitize=thread",
         src, harness, "-o", str(exe)],
        capture_output=True, text=True, timeout=120)
    if build.returncode != 0:
        pytest.skip(f"tsan build unavailable: {build.stderr[:200]}")
    run = subprocess.run([str(exe)], capture_output=True, text=True,
                         timeout=120)
    assert run.returncode == 0, run.stderr
    assert "WARNING: ThreadSanitizer" not in run.stderr, run.stderr
    assert "tsan harness ok" in run.stdout


def test_pipeline_uses_native_path(tmp_path):
    from PIL import Image

    from disentangle_mlp_tpu.data.pipeline import ImageFolderSource
    root = tmp_path / "train"
    (root / "c").mkdir(parents=True)
    for i in range(4):
        arr = rng.integers(0, 256, size=(90, 70, 3), dtype=np.uint8)
        Image.fromarray(arr).save(root / "c" / f"{i}.png")
    src = ImageFolderSource(str(root), img_size=32, num_workers=2)
    assert src._native is not None
    x, y = src.load_batch(np.arange(4))
    assert x.shape == (4, 32, 32, 3)
    assert x.dtype == np.float32
    assert x.min() >= -1.0 and x.max() <= 1.0
