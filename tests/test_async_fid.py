"""Async per-epoch FID (round 4): the host-side Fréchet math and sample-PNG
encodes run on a background worker and the epoch's log record is emitted one
epoch late — values, record key order, and epoch order must be IDENTICAL to
inline scoring (DMT_ASYNC_FID=0), which these tests pin by running the same
tiny config both ways. The reference scores FID inline between epochs
(new_betavaegan.py:230-235); at full size the host eigen math rivals an
epoch's train wall on the 1-CPU TPU host (E2E_FOLDER_r4.json), so the
overlap roughly halves steady-state epoch time."""

import json
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

import disentangle_mlp_tpu.train.loop as loop_mod
from disentangle_mlp_tpu.config import Config
from disentangle_mlp_tpu.train.loop import (_EpochEmitter, _instant_na,
                                            _maybe_fid_async, run_vae)


def _cfg(tmp_path, name, **kw):
    base = dict(
        name=name, epochs=2, batch_size_train=8, batch_size_val=8,
        batch_size_test=4, n_samples=8, n_hidden=8, img_size=32,
        n_z=[8, 4, 4], representation_size=4, head_width=32,
        decoder_channels=[8, 8, 8], disc_channels=[4, 8, 8, 8],
        disc_feature_dim=32, dtype="float32", calc_fid=True,
        synthetic_data=True, synthetic_train_size=16, num_workers=2,
        save_path=str(tmp_path / "%"), log_path=str(tmp_path / "%/log"))
    base.update(kw)
    return Config(**base).finalize()


def _stats_npz(tmp_path):
    """Tiny-but-valid reference stats: diagonal PSD sigma. n_samples=8 <
    2048 keeps the in-loop score on the cheap sample-subspace path."""
    from disentangle_mlp_tpu.eval.inception import FEATURE_DIM

    path = tmp_path / "stats.npz"
    rng = np.random.default_rng(0)
    np.savez(path, mu=rng.normal(size=FEATURE_DIM),
             sigma=np.diag(rng.uniform(0.5, 1.5, size=FEATURE_DIM)))
    return str(path)


def _read_log(cfg):
    files = sorted(Path(cfg.log_path).glob("log_*.json"))
    return json.loads(files[-1].read_text())


def test_async_run_matches_inline(tmp_path, monkeypatch):
    """The full loop, both modes: identical FID values, identical record
    keys/order, epochs ascending, sample PNGs on disk in both."""
    stats = _stats_npz(tmp_path)

    monkeypatch.setattr(loop_mod, "_FID_ASYNC", False)
    cfg_sync = _cfg(tmp_path, "sync", fid_path_pretrained=stats)
    out_sync = run_vae(cfg_sync)

    monkeypatch.setattr(loop_mod, "_FID_ASYNC", True)
    cfg_async = _cfg(tmp_path, "async", fid_path_pretrained=stats)
    out_async = run_vae(cfg_async)

    log_s, log_a = _read_log(cfg_sync), _read_log(cfg_async)
    assert [r["Epoch"] for r in log_a["output"]] == [0, 1]
    for rs, ra in zip(log_s["output"], log_a["output"]):
        assert list(rs) == list(ra)  # key order (schema parity)
        assert isinstance(ra["FID"], float)
        # same seeds + same math (the async split calls the same extraction
        # and Fréchet functions) → identical scores
        np.testing.assert_allclose(ra["FID"], rs["FID"], rtol=1e-12)
    assert out_async["FID"] == log_a["output"][-1]["FID"]
    np.testing.assert_allclose(out_async["FID"], out_sync["FID"],
                               rtol=1e-12)
    for cfg in (cfg_sync, cfg_async):
        files = sorted(Path(cfg.fid_path_samples).glob("sample_*_1.png"))
        assert len(files) == cfg.n_samples


def test_async_missing_stats_degrades_na(tmp_path, monkeypatch):
    monkeypatch.setattr(loop_mod, "_FID_ASYNC", True)
    cfg = _cfg(tmp_path, "na",
               fid_path_pretrained=str(tmp_path / "missing.npz"))
    resolve = _maybe_fid_async(
        cfg, lambda z: jnp.zeros((z.shape[0], 8, 8, 3), jnp.float32),
        0, cfg.fid_path_samples)
    assert getattr(resolve, "instant", False)
    assert resolve() == "N/A"


def test_async_programming_error_raises_at_resolve(tmp_path, monkeypatch):
    """A bug in the deferred half must re-raise (from resolve()), not hide
    behind 'N/A' — the async twin of
    test_error_handling.test_maybe_fid_programming_error_raises."""
    import disentangle_mlp_tpu.eval.fid as fid_mod

    def boom(acts, m2, s2, sqrt_sigma2=None):
        raise ValueError("deliberate bug in the FID stack")

    monkeypatch.setattr(fid_mod, "frechet_from_acts", boom)
    stats = _stats_npz(tmp_path)
    cfg = _cfg(tmp_path, "boom", fid_path_pretrained=stats)
    resolve = _maybe_fid_async(
        cfg, lambda z: jnp.zeros((z.shape[0], 8, 8, 3), jnp.float32),
        0, cfg.fid_path_samples)
    with pytest.raises(ValueError, match="deliberate bug"):
        resolve()


class _FakeLogger:
    def __init__(self):
        self.records = []

    def log(self, rec):
        self.records.append(rec)


def _item(epoch, fid, instant=False):
    resolve = (lambda: fid)
    if instant:
        resolve.instant = True
    return dict(
        resolve=resolve,
        record_fn=lambda f, e=epoch: {"Epoch": e, "FID": f},
        line=f"====> Epoch: {epoch} FID: {{fid}}")


def test_emitter_defers_one_epoch(capsys):
    lg = _FakeLogger()
    em = _EpochEmitter(lg, deferred=True)
    em.emit(**_item(0, 1.0))
    assert lg.records == []  # pending
    em.emit(**_item(1, 2.0))
    assert [r["Epoch"] for r in lg.records] == [0]
    assert "====> Epoch: 0 FID: 1.0" in capsys.readouterr().out
    last = em.finish()
    assert [r["Epoch"] for r in lg.records] == [0, 1]
    assert last == {"FID": 2.0}
    assert em.finish() == last  # idempotent


def test_emitter_instant_orders_after_pending():
    """An instant 'N/A' epoch arriving while a deferred one is pending must
    not overtake it in the log (the stats asset can appear/vanish
    mid-run)."""
    lg = _FakeLogger()
    em = _EpochEmitter(lg, deferred=True)
    em.emit(**_item(0, "N/A", instant=True))  # no pending → inline
    assert [r["Epoch"] for r in lg.records] == [0]
    em.emit(**_item(1, 3.0))                  # deferred
    em.emit(**_item(2, "N/A", instant=True))  # pending exists → queue
    assert [r["Epoch"] for r in lg.records] == [0, 1]
    em.finish()
    assert [r["Epoch"] for r in lg.records] == [0, 1, 2]


def test_emitter_inline_mode():
    lg = _FakeLogger()
    em = _EpochEmitter(lg, deferred=False)
    em.emit(**_item(0, 5.0))
    assert [r["Epoch"] for r in lg.records] == [0]
    assert em.finish() == {"FID": 5.0}


def test_normalized_u8_device_matches_host():
    """The on-device per-image min-max + uint8 quantize (what the PNG
    sample files are now written from) agrees with the host
    image_io._to_uint8 path to ≤1 uint8 step."""
    from disentangle_mlp_tpu.eval.fid import normalized_u8

    rng = np.random.default_rng(1)
    batch = rng.uniform(-1.2, 1.1, size=(4, 16, 16, 3)).astype(np.float32)
    host = normalized_u8(batch)
    dev = np.asarray(normalized_u8(jnp.asarray(batch)))
    assert host.dtype == dev.dtype == np.uint8
    assert np.max(np.abs(host.astype(int) - dev.astype(int))) <= 1


@pytest.mark.parametrize("fid_async", [True, False])
def test_fid_save_samples_off_skips_files_not_score(tmp_path, monkeypatch,
                                                    fid_async):
    """--fid_save_samples False drops ONLY the per-epoch sample PNGs — the
    FID values must be identical to the default — in both scoring modes."""
    stats = _stats_npz(tmp_path)

    monkeypatch.setattr(loop_mod, "_FID_ASYNC", fid_async)
    cfg_on = _cfg(tmp_path, f"png_on_{fid_async}",
                  fid_path_pretrained=stats)
    run_vae(cfg_on)
    cfg_off = _cfg(tmp_path, f"png_off_{fid_async}",
                   fid_path_pretrained=stats, fid_save_samples=False)
    run_vae(cfg_off)

    on_pngs = list(Path(cfg_on.fid_path_samples).glob("sample_*.png"))
    off_pngs = list(Path(cfg_off.fid_path_samples).glob("sample_*.png"))
    assert len(on_pngs) == cfg_on.n_samples * cfg_on.epochs
    assert off_pngs == []

    fids_on = [r["FID"] for r in _read_log(cfg_on)["output"]]
    fids_off = [r["FID"] for r in _read_log(cfg_off)["output"]]
    assert fids_on == fids_off
