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


def test_async_save_rotates_after_landing(tmp_path):
    """Round 4 (caught by the e2e folder run): rotating from the caller
    right after AsyncCheckpointer.save() returns runs BEFORE the async
    write exists on disk, so keep_checkpoints=N left N+1 files. The
    checkpointer must rotate inside the worker, after the save lands."""
    import numpy as np

    from disentangle_mlp_tpu.utils.checkpoint import AsyncCheckpointer

    class FakeState:
        # minimal state flax serialization can round-trip
        def __init__(self):
            self.x = np.zeros(3, np.float32)

    ckpt = AsyncCheckpointer()
    for epoch in (1, 2, 3, 4):
        ckpt.save(str(tmp_path / f"model_{epoch}"), epoch,
                  {"w": np.full(3, epoch, np.float32)}, rotate_keep=2)
    ckpt.wait()
    remaining = sorted(p.name for p in tmp_path.iterdir())
    assert remaining == ["model_3", "model_4"]
