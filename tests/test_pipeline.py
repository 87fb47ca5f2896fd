import numpy as np

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
