"""Host-side tests for the round-5 evidence harnesses — each pins a bug
or contract that was caught live on the TPU this round (no devices, no
jax; milliseconds)."""

import json
import os
import sys
import time

import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

from benchmarks import family_traj  # noqa: E402


def _write_log(path, losses, recons):
    payload = {"meta_data": {}, "output": [
        {"Epoch": i, "Avg Loss": l, "Avg Recon Loss": r, "FID": "N/A"}
        for i, (l, r) in enumerate(zip(losses, recons))]}
    with open(path, "w") as f:
        json.dump(payload, f)


def test_family_read_losses_concatenates_chronologically(tmp_path):
    """Each cli.train process writes its own timestamped log, so a
    resumed trajectory spans two files. Gating on only the newest file
    scored the 2-epoch resumed tail as the whole curve (live r5 bug:
    birds 'ratio=0.739' from a [2343, 1732] tail). Order must follow
    mtime, not filename."""
    log_dir = tmp_path / "log"
    log_dir.mkdir()
    # intentionally name the OLDER file lexically later
    _write_log(log_dir / "log_z_first.json", [100.0, 80.0], [90.0, 70.0])
    t = time.time()
    os.utime(log_dir / "log_z_first.json", (t - 100, t - 100))
    _write_log(log_dir / "log_a_resume.json", [60.0], [50.0])
    curves = family_traj.read_losses(str(tmp_path))
    assert curves["total"] == [100.0, 80.0, 60.0]
    assert curves["recon"] == [90.0, 70.0, 50.0]


def test_e2e_rejects_malformed_arm(monkeypatch):
    """Arm specs are validated before any stats/TPU work starts."""
    monkeypatch.setattr(os, "getloadavg", lambda: (0.0, 0.0, 0.0))
    from benchmarks import e2e_folder
    with pytest.raises(SystemExit, match="bad --arm"):
        e2e_folder.main(["--arm", "only_two:parts"])


def test_gen_jpeg_tree_lf_is_deterministic_and_hole_filling(tmp_path):
    """Index-seeded content: the same index yields byte-identical JPEGs
    regardless of generation order/resume history — this is what made
    the r5 block8 control arm replay the r4b curves bit-identically."""
    from benchmarks import gen_jpeg_tree

    a, b = tmp_path / "a", tmp_path / "b"
    gen_jpeg_tree.main(["--out", str(a), "--n", "3", "--basis", "lf"])
    # generate b's index 1 first (as if resuming with holes), then fill
    gen_jpeg_tree.main(["--out", str(b), "--n", "2", "--basis", "lf"])
    gen_jpeg_tree.main(["--out", str(b), "--n", "3", "--basis", "lf"])
    for i in range(3):
        fa = (a / "c0" / f"{i:06d}.jpg").read_bytes()
        fb = (b / "c0" / f"{i:06d}.jpg").read_bytes()
        assert fa == fb, f"index {i} differs"


def test_gen_jpeg_tree_lf_spectrum_is_low_frequency(tmp_path):
    """The lf tree exists because the block8 tree destabilizes training
    (E2E_FOLDER_r5): after a downsample to 64, lf content must be
    markedly smoother than block8 content (adjacent-pixel correlation)."""
    from PIL import Image

    from benchmarks import gen_jpeg_tree

    lf, blk = tmp_path / "lf", tmp_path / "blk"
    gen_jpeg_tree.main(["--out", str(lf), "--n", "2", "--basis", "lf"])
    gen_jpeg_tree.main(["--out", str(blk), "--n", "2", "--basis", "block8"])

    def corr(root):
        cs = []
        for i in range(2):
            im = Image.open(root / "c0" / f"{i:06d}.jpg").resize((64, 64))
            x = np.asarray(im, np.float32).mean(-1)
            x -= x.mean()
            cs.append((x[:, 1:] * x[:, :-1]).mean()
                      / max((x * x).mean(), 1e-6))
        return float(np.mean(cs))

    assert corr(lf) > corr(blk) + 0.1


def test_batch_sweep_flops_anchor_scales_linearly():
    from benchmarks.batch_sweep import OBSERVED_B256_FLOPS
    assert OBSERVED_B256_FLOPS == pytest.approx(4.96e12)
