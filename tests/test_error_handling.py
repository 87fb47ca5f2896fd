"""Failure-path contracts (VERDICT round 1): a missing FID asset degrades
to 'N/A'; a programming error in the FID stack raises; a failed async
checkpoint write surfaces at the next save/wait; the throughput meter
excludes paused (FID/checkpoint) wall time."""

import time

import jax.numpy as jnp
import numpy as np
import pytest

from disentangle_mlp_tpu.config import Config
from disentangle_mlp_tpu.train.loop import Throughput, _maybe_fid


def _cfg(tmp_path, **kw):
    return Config(name="t", n_samples=4, n_hidden=8, seed=0,
                  save_path=str(tmp_path / "%"),
                  log_path=str(tmp_path / "%/log"), **kw).finalize()


def _decode(z):
    # image-like decode fake (the reference's lambda-backend test pattern)
    return jnp.zeros((z.shape[0], 8, 8, 3), jnp.float32)


def test_maybe_fid_missing_stats_degrades(tmp_path):
    cfg = _cfg(tmp_path, fid_path_pretrained=str(tmp_path / "missing.npz"))
    out = _maybe_fid(cfg, _decode, 0, cfg.fid_path_samples)
    assert out == "N/A"


def test_maybe_fid_disabled(tmp_path):
    cfg = _cfg(tmp_path, calc_fid=False)
    assert _maybe_fid(cfg, _decode, 0, cfg.fid_path_samples) == "N/A"


def test_maybe_fid_programming_error_raises(tmp_path, monkeypatch):
    import disentangle_mlp_tpu.eval.fid as fid_mod

    def boom(samples, path, **kw):
        raise ValueError("deliberate bug in the FID stack")

    monkeypatch.setattr(fid_mod, "get_fid_from_samples", boom)
    cfg = _cfg(tmp_path, fid_path_pretrained=str(tmp_path / "missing.npz"))
    with pytest.raises(ValueError, match="deliberate bug"):
        _maybe_fid(cfg, _decode, 0, cfg.fid_path_samples)


def test_async_checkpointer_surfaces_write_failure(tmp_path):
    from disentangle_mlp_tpu.utils.checkpoint import AsyncCheckpointer

    ckpt = AsyncCheckpointer()
    blocker = tmp_path / "not_a_dir"
    blocker.write_text("file where a directory must go")
    state = {"model": {"w": jnp.ones((2,))}}
    ckpt.save(str(blocker / "model_1"), 1, state)  # write will fail
    with pytest.raises(OSError):
        ckpt.wait()
    # the error is consumed: the checkpointer remains usable
    ckpt.save(str(tmp_path / "model_2"), 2, state)
    ckpt.wait()
    assert (tmp_path / "model_2").is_file()


def test_throughput_excludes_paused_time():
    meter = Throughput(warmup=1)
    meter.add(10)           # warmup batch: starts the clock
    time.sleep(0.05)
    meter.add(100)
    meter.pause()
    time.sleep(0.2)         # "FID scoring" — must not count
    meter.resume()
    time.sleep(0.05)
    meter.add(100)
    rate = meter.rate()
    # 200 images over ~0.1s of counted time → ~2000/s; with the paused 0.2s
    # wrongly included it would be ~650/s.
    assert rate > 1200, rate
    # rate() while paused uses the pause timestamp
    meter.pause()
    r1 = meter.rate()
    time.sleep(0.05)
    np.testing.assert_allclose(meter.rate(), r1, rtol=0.05)
    meter.resume()


def test_maybe_fid_bad_stats_keys_degrades(tmp_path):
    """A stats .npz without mu/sigma is an ASSET problem: FID must degrade
    to 'N/A', not kill the run."""
    import numpy as np

    bad = tmp_path / "bad_stats.npz"
    np.savez(bad, mean=np.zeros(4), cov=np.eye(4))
    cfg = _cfg(tmp_path, fid_path_pretrained=str(bad))
    out = _maybe_fid(cfg, _decode, 0, cfg.fid_path_samples)
    assert out == "N/A"
