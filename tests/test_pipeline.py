import numpy as np
import pytest

from disentangle_mlp_tpu.config import Config
from disentangle_mlp_tpu.data.pipeline import (
    DataLoader, SyntheticSource, get_data_loader, normalize_to_unit_range)


def test_normalize_range():
    u8 = np.array([[[0, 128, 255]]], np.uint8)
    f = normalize_to_unit_range(u8)
    assert f.min() >= -1.0 and f.max() <= 1.0
    np.testing.assert_allclose(f[0, 0, 0], -1.0)
    np.testing.assert_allclose(f[0, 0, 2], 1.0)


def test_synthetic_source_deterministic():
    s1 = SyntheticSource(size=8, img_size=16, seed=3)
    s2 = SyntheticSource(size=8, img_size=16, seed=3)
    x1, y1 = s1.load_batch(np.arange(4))
    x2, y2 = s2.load_batch(np.arange(4))
    np.testing.assert_array_equal(x1, x2)
    assert x1.shape == (4, 16, 16, 3)
    assert x1.min() >= -1.0 and x1.max() <= 1.0


def test_synthetic_basis_is_low_frequency():
    """The default basis must be genuinely low-frequency (round-4 root
    cause: a white basis makes the recon target unlearnable through a
    strided-conv encoder and training posterior-collapses — ROUND4.md).
    Smoothness metric: mean |∂x/∂h| of the images, LF ≪ white."""
    lf = SyntheticSource(size=64, img_size=64, seed=0)
    white = SyntheticSource(size=64, img_size=64, seed=0, basis_sigma=0.0)
    assert lf.basis_sigma == 6.0 and white.basis_sigma == 0.0
    x_lf = lf.load_batch(np.arange(64))[0]
    x_w = white.load_batch(np.arange(64))[0]
    grad_lf = np.abs(np.diff(x_lf, axis=1)).mean()
    grad_w = np.abs(np.diff(x_w, axis=1)).mean()
    assert grad_lf < 0.2 * grad_w, (grad_lf, grad_w)
    # per-pixel renormalization keeps the predict-mean floor (≈ loss
    # scale) comparable to the white basis: within 5%
    def floor(x):
        f = x.reshape(len(x), -1).astype(np.float64)
        return ((f - f.mean(0)) ** 2).sum(1).mean()
    assert abs(floor(x_lf) / floor(x_w) - 1.0) < 0.05
    # resolution scaling: σ defaults to 6·(img/64)
    assert SyntheticSource(size=4, img_size=16, seed=0).basis_sigma == 1.5


def test_synthetic_basis_sigma_flag_plumbs_through(tmp_path):
    cfg = Config(name="t", synthetic_data=True, synthetic_train_size=64,
                 batch_size_train=16, img_size=16,
                 synthetic_basis_sigma=0.0,
                 save_path=str(tmp_path / "%"),
                 log_path=str(tmp_path / "%/log")).finalize()
    train, _, _ = get_data_loader(cfg)
    assert train.source.basis_sigma == 0.0
    cfg2 = Config(name="t2", synthetic_data=True, synthetic_train_size=64,
                  batch_size_train=16, img_size=16,
                  save_path=str(tmp_path / "2" / "%"),
                  log_path=str(tmp_path / "2" / "%/log")).finalize()
    train2, _, _ = get_data_loader(cfg2)
    assert train2.source.basis_sigma == 1.5  # 6·(16/64)


def test_loader_shuffle_and_epochs():
    src = SyntheticSource(size=32, img_size=8, seed=0)
    dl = DataLoader(src, batch_size=8, shuffle=True, seed=1)
    assert len(dl) == 4
    e1 = [np.asarray(x) for x, _ in dl]
    e2 = [np.asarray(x) for x, _ in dl]
    # different epoch → different order
    assert not all(np.array_equal(a, b) for a, b in zip(e1, e2))
    assert all(b.shape == (8, 8, 8, 3) for b in e1)


def test_get_data_loader_contract(tmp_path):
    cfg = Config(name="t", synthetic_data=True, synthetic_train_size=64,
                 batch_size_train=16, batch_size_val=16, batch_size_test=5,
                 img_size=16,
                 save_path=str(tmp_path / "%"),
                 log_path=str(tmp_path / "%/log")).finalize()
    train, val, test = get_data_loader(cfg)
    x, y = next(iter(train))
    assert x.shape == (16, 16, 16, 3)
    xt, _ = next(iter(test))
    assert xt.shape[0] == 5


def test_image_folder_source(tmp_path):
    from PIL import Image
    root = tmp_path / "train"
    for cls in ["a", "b"]:
        (root / cls).mkdir(parents=True)
        for i in range(3):
            arr = np.random.default_rng(i).integers(
                0, 255, (80, 70, 3), dtype=np.uint8)
            Image.fromarray(arr.astype(np.uint8)).save(
                root / cls / f"{i}.png")
    from disentangle_mlp_tpu.data.pipeline import ImageFolderSource
    src = ImageFolderSource(str(root), img_size=32, num_workers=2)
    assert len(src) == 6
    x, y = src.load_batch(np.arange(6))
    assert x.shape == (6, 32, 32, 3)
    assert set(y.tolist()) == {0, 1}
    assert x.min() >= -1.0 and x.max() <= 1.0


def test_renormalize_birds_matches_torch_formula():
    from disentangle_mlp_tpu.data.pipeline import NORMALIZE, renormalize_pm1
    rng = np.random.default_rng(0)
    u8 = rng.integers(0, 256, (4, 8, 8, 3), dtype=np.uint8)
    pm1 = normalize_to_unit_range(u8)
    got = renormalize_pm1(pm1, *NORMALIZE["birds"])
    x01 = u8.astype(np.float32) / 255.0
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    np.testing.assert_allclose(got, (x01 - mean) / std, atol=1e-5)
    # celebA constants are the identity
    np.testing.assert_array_equal(
        renormalize_pm1(pm1, *NORMALIZE["celebA"]), pm1)


def _write_mnist_idx(root, n=16, gz=False):
    import gzip
    import struct
    root.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(5)
    imgs = rng.integers(0, 256, (n, 28, 28), dtype=np.uint8)
    lbls = rng.integers(0, 10, (n,), dtype=np.uint8)
    op = gzip.open if gz else open
    sfx = ".gz" if gz else ""
    with op(root / f"train-images-idx3-ubyte{sfx}", "wb") as f:
        f.write(struct.pack(">HBB3I", 0, 8, 3, n, 28, 28))
        f.write(imgs.tobytes())
    with op(root / f"train-labels-idx1-ubyte{sfx}", "wb") as f:
        f.write(struct.pack(">HBBI", 0, 8, 1, n))
        f.write(lbls.tobytes())
    return imgs, lbls


def test_mnist_source_idx(tmp_path):
    from disentangle_mlp_tpu.data.pipeline import MNISTSource
    imgs, lbls = _write_mnist_idx(tmp_path / "mnist")
    src = MNISTSource(str(tmp_path / "mnist"), img_size=28)
    assert len(src) == 16
    x, y = src.load_batch(np.arange(4))
    assert x.shape == (4, 28, 28, 1)
    np.testing.assert_array_equal(y, lbls[:4].astype(np.int32))
    # Normalize(0.1307, 0.3081) after ToTensor (reference dataset.py:11)
    want = (imgs[:4].astype(np.float32) / 255.0 - 0.1307) / 0.3081
    np.testing.assert_allclose(x[..., 0], want, atol=1e-5)
    # resize path + gzip variant (torchvision raw layout)
    _write_mnist_idx(tmp_path / "g" / "MNIST" / "raw", gz=True)
    src2 = MNISTSource(str(tmp_path / "g"), img_size=32)
    x2, _ = src2.load_batch(np.arange(2))
    assert x2.shape == (2, 32, 32, 1)


def test_get_data_loader_birds_mnist_contract(tmp_path):
    # reference returns (train, None, None) for birds/mnist
    # (dataset.py:23-24,34-35)
    for ds, ch in [("birds", 3), ("mnist", 1)]:
        cfg = Config(name="t", dataset=ds, synthetic_data=True,
                     synthetic_train_size=32, batch_size_train=8,
                     img_size=16, input_channels=ch,
                     save_path=str(tmp_path / ds / "%"),
                     log_path=str(tmp_path / ds / "%/log")).finalize()
        train, val, test = get_data_loader(cfg)
        assert val is None and test is None
        x, _ = next(iter(train))
        assert x.shape == (8, 16, 16, ch)


def test_mnist_loader_real_idx_files(tmp_path):
    _write_mnist_idx(tmp_path / "mnist_root")
    cfg = Config(name="t", dataset="mnist", batch_size_train=8, img_size=28,
                 input_channels=1,
                 image_root_train=str(tmp_path / "mnist_root"),
                 save_path=str(tmp_path / "%"),
                 log_path=str(tmp_path / "%/log")).finalize()
    train, _, _ = get_data_loader(cfg)
    x, y = next(iter(train))
    assert x.shape == (8, 28, 28, 1)
    assert np.isfinite(np.asarray(x)).all()


def test_hostshard_selftest():
    from disentangle_mlp_tpu.data.selftest import hostshard_selftest
    hostshard_selftest()


def test_process_local_slice():
    from disentangle_mlp_tpu.data.pipeline import process_local_slice
    idx = np.arange(12)
    parts = [process_local_slice(idx, h, 4) for h in range(4)]
    np.testing.assert_array_equal(np.concatenate(parts), idx)
    assert all(len(p) == 3 for p in parts)


def test_real_multihost_without_sharding_keeps_full_batch(monkeypatch):
    """Regression (round-2 review): when the per-host global-array assembly
    is unavailable (sharding=None), a REAL multi-process loader must not
    silently slice — each host sees the full batch."""
    import disentangle_mlp_tpu.data.pipeline as pl

    monkeypatch.setattr(pl.jax, "process_count", lambda: 2)
    monkeypatch.setattr(pl.jax, "process_index", lambda: 0)
    src = pl.SyntheticSource(size=16, img_size=8, seed=3)
    loader = pl.DataLoader(src, 8, shuffle=True, seed=5)
    assert loader.process_count == 2 and not loader._explicit_process
    x, y = next(iter(loader))
    assert x.shape[0] == 8  # full batch, not the half-slice

    # explicit simulated processes (tests/dryrun) still slice
    sliced = pl.DataLoader(src, 8, shuffle=True, seed=5,
                           process_index=0, process_count=2)
    xs, _ = next(iter(sliced))
    assert xs.shape[0] == 4


def _png_folder(tmp_path, n_per_class=3):
    from PIL import Image
    root = tmp_path / "train"
    for cls in ["a", "b"]:
        (root / cls).mkdir(parents=True)
        for i in range(n_per_class):
            arr = np.random.default_rng(10 * (cls == "b") + i).integers(
                0, 255, (80, 70, 3), dtype=np.uint8)
            Image.fromarray(arr).save(root / cls / f"{i}.png")
    return str(root)


def test_image_folder_decode_cache(tmp_path, monkeypatch):
    """Epochs 2+ must come from the uint8 RAM cache (no re-decode) and be
    value-identical to the uncached path — the decode rate (~1.3k img/s)
    otherwise bottlenecks the ~5.2k img/s train step on real data."""
    from disentangle_mlp_tpu.data import pipeline as pl

    root = _png_folder(tmp_path)
    off = pl.ImageFolderSource(root, img_size=32, num_workers=2, cache="off")
    assert off._cache is None
    x_off, y_off = off.load_batch(np.arange(6))

    on = pl.ImageFolderSource(root, img_size=32, num_workers=2, cache="on")
    calls = []
    real = on._decode_u8
    on._decode_u8 = lambda idx: (calls.append(np.asarray(idx).tolist()),
                                 real(idx))[1]
    x1, y1 = on.load_batch(np.arange(6))
    x2, _ = on.load_batch(np.arange(6))
    x3, _ = on.load_batch(np.array([4, 1]))
    assert calls == [[0, 1, 2, 3, 4, 5]], "second/third epoch must not decode"
    np.testing.assert_array_equal(x1, x2)
    np.testing.assert_array_equal(x3, x1[[4, 1]])
    # cache round-trips the PIL uint8 output exactly
    np.testing.assert_array_equal(x1, x_off)
    np.testing.assert_array_equal(y1, y_off)

    # partial-miss fill: a cold cache touched with a subset decodes only it
    on2 = pl.ImageFolderSource(root, img_size=32, num_workers=2, cache="on")
    on2.load_batch(np.array([2, 5]))
    assert on2._cached.sum() == 2
    xa, _ = on2.load_batch(np.arange(6))
    np.testing.assert_array_equal(xa, x_off[np.arange(6)])

    # "auto" respects the size gate
    monkeypatch.setattr(pl, "_DECODE_CACHE_LIMIT", 10)
    assert pl.ImageFolderSource(root, img_size=32, cache="auto")._cache is None
    monkeypatch.setattr(pl, "_DECODE_CACHE_LIMIT", 10 ** 9)
    assert pl.ImageFolderSource(root, img_size=32, cache="auto")._cache is not None


def test_cache_flag_validated_and_train_only(tmp_path):
    from disentangle_mlp_tpu.data import pipeline as pl

    root = _png_folder(tmp_path)
    with pytest.raises(ValueError, match="auto/on/off"):
        pl.ImageFolderSource(root, img_size=32, cache="On")

    # only the train stream caches (one DMT_DECODE_CACHE_BYTES budget,
    # and val/test are read rarely)
    cfg = Config(name="t", cache_decoded="on", img_size=32,
                 batch_size_train=4, batch_size_val=4, batch_size_test=2,
                 image_root_train=root, image_root_val=root,
                 image_root_test=root,
                 save_path=str(tmp_path / "%"),
                 log_path=str(tmp_path / "%/log")).finalize()
    train, val, test = get_data_loader(cfg)
    assert train.source._cache is not None
    assert val.source._cache is None
    assert test.source._cache is None


def test_decode_cache_budget_is_global(tmp_path, monkeypatch):
    """Advisor r2: k concurrent loaders (parallel-β) share ONE decode-cache
    budget — the second 'auto' source past the budget runs uncached instead
    of silently doubling host RAM."""
    from PIL import Image

    from disentangle_mlp_tpu.data import pipeline as P

    root = tmp_path / "imgs" / "cls"
    root.mkdir(parents=True)
    for i in range(4):
        Image.fromarray(
            np.full((8, 8, 3), 40 * i, np.uint8)).save(root / f"{i}.jpg")

    import gc

    gc.collect()  # release claims of dead sources from earlier tests
    per_source = 4 * 8 * 8 * 3
    baseline_live = P._decode_cache_live_bytes
    # budget = whatever is already claimed in-process + room for ONE source
    monkeypatch.setattr(P, "_DECODE_CACHE_LIMIT",
                        baseline_live + int(per_source * 1.5))

    a = P.ImageFolderSource(str(root.parent), img_size=8, cache="auto")
    b = P.ImageFolderSource(str(root.parent), img_size=8, cache="auto")
    assert a._cache is not None, "first source fits the budget"
    assert b._cache is None, "second source must not exceed the budget"
    assert P._decode_cache_live_bytes == baseline_live + per_source

    # cache='on' is honoured past the budget (with a warning), and
    # releasing sources returns their claim
    c = P.ImageFolderSource(str(root.parent), img_size=8, cache="on")
    assert c._cache is not None
    del a, b, c
    import gc

    gc.collect()
    assert P._decode_cache_live_bytes == baseline_live


def test_mnist_synthetic_allows_default_channels(tmp_path):
    """Advisor r2: synthetic-data mnist runs honour --input_channels (the
    SyntheticSource yields whatever is asked); the 1-channel requirement
    applies only when the real idx loader is in play."""
    import jax

    from disentangle_mlp_tpu.train.families import create_family_experiment

    cfg = Config(name="mn3", dataset="mnist", img_size=28, input_channels=3,
                 n_hidden=8, batch_size_train=4, synthetic_data=True,
                 synthetic_train_size=8, dtype="float32",
                 save_path=str(tmp_path / "%"),
                 log_path=str(tmp_path / "%/log")).finalize()
    exp = create_family_experiment(cfg, jax.random.key(0))
    x = np.zeros((4, 28, 28, 3), np.float32)
    eg, d, m = exp.train_step(exp.eg_state, exp.d_state, x, jax.random.key(1))
    assert np.isfinite(float(m["loss"]))


def test_cache_warmup_fills_epoch_order(tmp_path):
    """start_cache_warmup (round 4): the background warmer decodes the
    NEXT epoch's access order into the cache (so the 4-7 min first-compile
    window pre-pays epoch 1's decode), values identical to cold loads,
    and the producer never re-decodes what the warmer already cached."""
    from disentangle_mlp_tpu.data import pipeline as pl

    root = _png_folder(tmp_path)
    src = pl.ImageFolderSource(root, img_size=32, num_workers=2, cache="on")
    loader = pl.DataLoader(src, batch_size=2, shuffle=True, seed=3,
                           process_index=0, process_count=1)
    t = loader.start_cache_warmup()
    assert t is not None
    t.join(60)
    assert not t.is_alive()
    assert src._cached.all()

    # idempotent: a second call with a finished warmer restarts harmlessly
    assert src.start_cache_warmup() is not None

    # cached epoch batches equal a cacheless loader's bit-for-bit
    ref_src = pl.ImageFolderSource(root, img_size=32, num_workers=2,
                                   cache="off")
    ref = pl.DataLoader(ref_src, batch_size=2, shuffle=True, seed=3,
                        process_index=0, process_count=1)
    calls = []
    real = src._decode_u8
    src._decode_u8 = lambda idx: (calls.append(list(np.asarray(idx))),
                                  real(idx))[1]
    for (x, y), (xr, yr) in zip(loader, ref):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(xr))
        np.testing.assert_array_equal(np.asarray(y), np.asarray(yr))
    assert calls == [], "warmed epoch must not decode"


def test_cache_warmup_per_host_slice(tmp_path):
    """On a (simulated) pod, each host warms exactly the rows its producer
    will feed — the per-batch process_local_slice, not the full epoch."""
    from disentangle_mlp_tpu.data import pipeline as pl

    root = _png_folder(tmp_path)
    src = pl.ImageFolderSource(root, img_size=32, num_workers=2, cache="on")
    loader = pl.DataLoader(src, batch_size=4, shuffle=True, seed=9,
                           process_index=1, process_count=2)
    t = loader.start_cache_warmup()
    t.join(60)
    idx = loader._epoch_indices()
    expect = np.zeros(len(src), bool)
    for i in range(len(loader)):
        b = idx[i * 4:(i + 1) * 4]
        expect[pl.process_local_slice(b, 1, 2)] = True
    np.testing.assert_array_equal(src._cached, expect)


def test_cache_warmup_noops(tmp_path, monkeypatch):
    """No cache, or DMT_DECODE_WARMUP=0, → no warmer thread."""
    from disentangle_mlp_tpu.data import pipeline as pl

    root = _png_folder(tmp_path)
    off = pl.ImageFolderSource(root, img_size=32, cache="off")
    assert pl.DataLoader(off, 2, process_index=0,
                         process_count=1).start_cache_warmup() is None
    synth = pl.SyntheticSource(size=8, img_size=8)
    assert pl.DataLoader(synth, 2, process_index=0,
                         process_count=1).start_cache_warmup() is None
    on = pl.ImageFolderSource(root, img_size=32, cache="on")
    monkeypatch.setenv("DMT_DECODE_WARMUP", "0")
    assert pl.DataLoader(on, 2, process_index=0,
                         process_count=1).start_cache_warmup() is None


def test_u8_device_feed_matches_host_path(tmp_path, monkeypatch):
    """The uint8 fast feed (ship u8, normalize on device — round 4: the
    f32 batch was the tunnel bottleneck at ~1,500 img/s ceiling) must
    yield the same batches as the legacy host-normalize path to ≤1 ulp
    (XLA fma contraction), for both the identity (celebA) and the affine
    (birds) normalization."""
    from disentangle_mlp_tpu.data import pipeline as pl

    root = _png_folder(tmp_path)
    for norm in (((0.5,) * 3, (0.5,) * 3),
                 ((0.485, 0.456, 0.406), (0.229, 0.224, 0.225))):
        src = pl.ImageFolderSource(root, img_size=32, num_workers=2,
                                   normalize=norm, cache="on")
        # pin the fast path on (an inherited DMT_DEVICE_NORMALIZE=0 would
        # silently compare the slow path to itself) and prove it engaged:
        # the u8 feed must never call the host-normalize load_batch
        monkeypatch.setenv("DMT_DEVICE_NORMALIZE", "1")
        monkeypatch.setattr(
            src, "load_batch",
            lambda idx: pytest.fail("u8 fast path did not engage"))
        fast = [(np.asarray(x), np.asarray(y))
                for x, y in pl.DataLoader(src, 4, shuffle=True, seed=11)]
        monkeypatch.undo()
        monkeypatch.setenv("DMT_DEVICE_NORMALIZE", "0")
        slow_dl = pl.DataLoader(src, 4, shuffle=True, seed=11)
        slow = [(np.asarray(x), np.asarray(y)) for x, y in slow_dl]
        monkeypatch.delenv("DMT_DEVICE_NORMALIZE")
        assert len(fast) == len(slow) > 0
        for (xf, yf), (xs, ys) in zip(fast, slow):
            assert xf.dtype == np.float32
            np.testing.assert_allclose(xf, xs, atol=3e-7, rtol=0)
            np.testing.assert_array_equal(yf, ys)


def test_u8_feed_engages_only_for_capable_sources():
    """The synthetic source has no load_batch_u8 (it generates float
    in-memory — there is no u8 original) — the loader must fall back to
    the f32 host path, not crash."""
    src = SyntheticSource(size=8, img_size=16, seed=3)
    dl = DataLoader(src, 4, shuffle=False)
    batches = [(np.asarray(x), np.asarray(y)) for x, y in dl]
    assert len(batches) == 2
    assert batches[0][0].dtype == np.float32


def test_mnist_u8_device_feed_matches_host_path(tmp_path, monkeypatch):
    """MNIST's u8 fast feed (round 4): shipped uint8 idx pixels +
    device-side (u/255 − 0.1307)/0.3081 must match the host-normalize
    path to ≤1 ulp — including through the bilinear resize (PIL returns
    uint8, so the shipped pixels are exactly what the host path
    normalizes)."""
    from disentangle_mlp_tpu.data import pipeline as pl

    _write_mnist_idx(tmp_path / "mnist")
    for size in (28, 32):  # native and resized
        src = pl.MNISTSource(str(tmp_path / "mnist"), img_size=size)
        monkeypatch.setenv("DMT_DEVICE_NORMALIZE", "1")
        monkeypatch.setattr(
            src, "load_batch",
            lambda idx: pytest.fail("u8 fast path did not engage"))
        fast = [(np.asarray(x), np.asarray(y))
                for x, y in pl.DataLoader(src, 4, shuffle=True, seed=5)]
        monkeypatch.undo()
        monkeypatch.setenv("DMT_DEVICE_NORMALIZE", "0")
        slow = [(np.asarray(x), np.asarray(y))
                for x, y in pl.DataLoader(src, 4, shuffle=True, seed=5)]
        monkeypatch.delenv("DMT_DEVICE_NORMALIZE")
        assert len(fast) == len(slow) > 0
        for (xf, yf), (xs, ys) in zip(fast, slow):
            assert xf.dtype == np.float32 and xf.shape[-1] == 1
            np.testing.assert_allclose(xf, xs, atol=3e-6, rtol=0)
            np.testing.assert_array_equal(yf, ys)


def test_loader_exception_surfaces_through_both_stages(tmp_path):
    """A decode error in the first producer stage must propagate through
    the transfer stage to the consumer."""
    from disentangle_mlp_tpu.data import pipeline as pl

    root = _png_folder(tmp_path)
    src = pl.ImageFolderSource(root, img_size=32, num_workers=2,
                               cache="off")

    def boom(indices):
        raise RuntimeError("decode exploded")

    src.load_batch_u8 = boom
    with pytest.raises(RuntimeError, match="decode exploded"):
        list(pl.DataLoader(src, 4, shuffle=False))


def test_abandoned_iterator_releases_producer_threads(tmp_path):
    """Breaking out of an epoch mid-way (e.g. max_images in FID stats)
    must not leave decode/transfer threads blocked forever."""
    import threading
    import time

    from disentangle_mlp_tpu.data import pipeline as pl

    root = _png_folder(tmp_path)
    src = pl.ImageFolderSource(root, img_size=32, num_workers=2,
                               cache="on")

    def producers():
        return [t for t in threading.enumerate()
                if t.name in ("dmt-decode", "dmt-transfer")]

    it = iter(pl.DataLoader(src, 2, shuffle=False, prefetch=1))
    next(it)
    it.close()  # fires the generator's finally -> stop.set()
    deadline = time.time() + 10
    while producers() and time.time() < deadline:
        time.sleep(0.1)
    assert not producers()


def test_u8_transfer_chunking_preserves_batches(tmp_path):
    """Grouped u8 transfers (DMT_TRANSFER_CHUNK) must yield exactly the
    same per-batch streams as chunk=1, across a non-dividing batch count,
    a partial tail batch (drop_last=False), and simulated per-process
    slicing."""
    from disentangle_mlp_tpu.data import pipeline as pl

    root = _png_folder(tmp_path, n_per_class=5)  # 10 images
    src = pl.ImageFolderSource(root, img_size=32, num_workers=2,
                               cache="on")

    def epoch(chunk, **kw):
        dl = pl.DataLoader(src, 4, shuffle=True, seed=5,
                           transfer_chunk=chunk, **kw)
        return [(np.asarray(x), np.asarray(y)) for x, y in dl]

    base = epoch(1, drop_last=False)
    assert len(base) == 3 and base[-1][0].shape[0] == 2  # partial tail
    for c in (2, 3, 8):
        got = epoch(c, drop_last=False)
        assert len(got) == len(base)
        for (xb, yb), (xg, yg) in zip(base, got):
            np.testing.assert_array_equal(xg, xb)
            np.testing.assert_array_equal(yg, yb)

    # simulated pod slicing: each process sees its half of every batch
    half = epoch(4, process_index=1, process_count=2)
    full = epoch(1, process_index=1, process_count=2)
    assert len(half) == len(full) == 2  # drop_last
    for (xh, yh), (xf, yf) in zip(half, full):
        assert xh.shape[0] == 2
        np.testing.assert_array_equal(xh, xf)
        np.testing.assert_array_equal(yh, yf)
