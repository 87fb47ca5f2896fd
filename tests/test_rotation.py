import os
from pathlib import Path

from disentangle_mlp_tpu.utils.checkpoint import rotate_checkpoints


def test_rotation_keeps_newest(tmp_path):
    for i in [1, 2, 3, 10, 11]:
        (tmp_path / f"model_{i}").write_bytes(b"x")
    (tmp_path / "other_file").write_bytes(b"y")
    rotate_checkpoints(str(tmp_path), keep=2)
    remaining = sorted(p.name for p in tmp_path.iterdir())
    assert remaining == ["model_10", "model_11", "other_file"]


def test_rotation_keep_zero_keeps_all(tmp_path):
    for i in range(4):
        (tmp_path / f"model_{i}").write_bytes(b"x")
    rotate_checkpoints(str(tmp_path), keep=0)
    assert len(list(tmp_path.iterdir())) == 4
