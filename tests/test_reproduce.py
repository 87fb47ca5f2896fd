"""End-to-end plumbing test for the FID reproduction harness: the full
stats → calibration → train(FID-in-the-loop) → report path on synthetic
data with self-built statistics (VERDICT round 1 item 3 — without assets,
the pipeline itself must be proven)."""

import json

from disentangle_mlp_tpu.config import Config
from disentangle_mlp_tpu.eval.reproduce import run_reproduction


def test_reproduction_pipeline_synthetic(tmp_path):
    cfg = Config(
        name="repro_t", beta=25.0, epochs=1, synthetic_data=True,
        synthetic_train_size=32, batch_size_train=16, batch_size_val=16,
        batch_size_test=4, n_samples=8, n_hidden=8, img_size=32,
        n_z=[8, 4, 4], representation_size=4, head_width=32,
        decoder_channels=[8, 8, 8], disc_channels=[4, 8, 8, 8],
        disc_feature_dim=32, dtype="float32", calc_fid=True,
        save_path=str(tmp_path / "%"),
        log_path=str(tmp_path / "%/log")).finalize()
    stats = str(tmp_path / "stats.npz")
    report_path = str(tmp_path / "report.json")

    report = run_reproduction(cfg, stats, stats_images=32, calib_images=32,
                              report_out=report_path)

    # stats were built and consumed
    assert report["stats_path"] == stats
    assert (tmp_path / "stats.npz").is_file()
    # calibration ran on real(-loader) images and produced a finite number
    assert isinstance(report["calibration_fid"], float)
    assert report["calibration_fid"] >= 0.0
    # training scored FID against the fresh stats (not 'N/A': stats exist)
    assert isinstance(report["final_fid"], float), report["final_fid"]
    assert report["final_fid"] >= 0.0
    # verdict fields present; random-weight Inception can never claim parity
    assert report["inception_pretrained"] is False
    assert report["within_tolerance"] is False
    assert report["target_fid"] == 128.34
    # generator provenance: records the fixed LF basis (6·32/64 = 3.0)
    assert report["synthetic_basis_sigma"] == 3.0
    # the report is valid JSON on disk
    with open(report_path) as f:
        assert json.load(f)["stats_images"] == 32


def test_reproduction_skip_train(tmp_path):
    cfg = Config(
        name="repro_s", synthetic_data=True, synthetic_train_size=16,
        batch_size_train=8, batch_size_val=8, batch_size_test=4,
        img_size=32, save_path=str(tmp_path / "%"),
        log_path=str(tmp_path / "%/log")).finalize()
    stats = str(tmp_path / "stats.npz")
    report = run_reproduction(cfg, stats, stats_images=16, calib_images=16,
                              skip_train=True)
    assert "final_fid" not in report
    assert (tmp_path / "stats.npz").is_file()


def test_reproduction_calibration_falls_back_on_empty_split(tmp_path):
    """val split smaller than its batch size (drop_last → zero batches)
    must not crash the calibration — it falls back to a non-empty loader."""
    cfg = Config(
        name="repro_e", synthetic_data=True, synthetic_train_size=16,
        batch_size_train=8, batch_size_val=512, batch_size_test=512,
        img_size=32, save_path=str(tmp_path / "%"),
        log_path=str(tmp_path / "%/log")).finalize()
    report = run_reproduction(cfg, str(tmp_path / "s.npz"),
                              stats_images=16, calib_images=16,
                              skip_train=True)
    assert isinstance(report["calibration_fid"], float)


def test_assets_check_reports_ready_missing(tmp_path, capsys):
    """--assets_check (VERDICT r2 #10): one command prints a JSON
    ready/missing report for the two reproduction assets without running
    anything or creating run directories."""
    import json

    from disentangle_mlp_tpu.cli.reproduce import main

    main(["--name", "ac", "--assets_check",
          "--save_path", str(tmp_path / "%"),
          "--log_path", str(tmp_path / "%/log")])
    out = json.loads(capsys.readouterr().out)
    assert {"inception_weights", "celeba_images", "ready"} <= set(out)
    assert out["inception_weights"]["sha256_prefix"] == "6726825d"
    assert set(out["celeba_images"]) == {"train", "val", "test"}
    # no run tree side effects in check mode
    assert not (tmp_path / "ac").exists()


def test_assets_check_detects_present_assets(tmp_path, capsys, monkeypatch):
    """With a CelebA-shaped image tree present, the report flips to ready
    (weights still gated on the real file)."""
    import json

    import numpy as np
    from PIL import Image

    from disentangle_mlp_tpu.cli.reproduce import main

    for split in ("train", "val", "test"):
        d = tmp_path / "celebA" / split / "all"
        d.mkdir(parents=True)
        Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(d / "0.jpg")
    main(["--name", "ac2", "--assets_check",
          "--image_root_train", str(tmp_path / "celebA" / "train"),
          "--image_root_val", str(tmp_path / "celebA" / "val"),
          "--image_root_test", str(tmp_path / "celebA" / "test"),
          "--save_path", str(tmp_path / "%"),
          "--log_path", str(tmp_path / "%/log")])
    out = json.loads(capsys.readouterr().out)
    assert all(v["ready"] and v["n_images"] == 1
               for v in out["celeba_images"].values())

def test_curve_shape_gates_fid_and_eec(tmp_path):
    """_curve_shape reads the newest per-epoch log and emits both the FID
    curve gate and the width-robust Eec-loss gate (ROUND4.md: the healthy
    signature is a steady Eec decline; flat-at-floor Eec = posterior
    collapse regardless of what the proxy FID does)."""
    from disentangle_mlp_tpu.eval.reproduce import _curve_shape

    log_dir = tmp_path / "log"
    log_dir.mkdir()
    # reference-shaped run: FID 223→128 (0.57×), Eec 1138→776 (0.68×)
    records = [
        {"Epoch": 0, "Avg Eec Loss": 1138.0, "Avg Dnc Loss": 1138.0,
         "Avg Dis Loss": 0.003, "FID": 223.4},
        {"Epoch": 1, "Avg Eec Loss": 950.0, "Avg Dnc Loss": 950.0,
         "Avg Dis Loss": 0.003, "FID": 180.0},
        {"Epoch": 2, "Avg Eec Loss": 776.0, "Avg Dnc Loss": 776.0,
         "Avg Dis Loss": 0.003, "FID": 128.3},
    ]
    (log_dir / "log_08_18_2026_00_00_00.json").write_text(
        json.dumps({"output": records}))

    out = _curve_shape(str(log_dir))
    assert out["fid_curve"] == [223.4, 180.0, 128.3]
    assert out["curve_ok"] is True
    assert out["eec_curve"] == [1138.0, 950.0, 776.0]
    assert abs(out["eec_ratio"] - 776.0 / 1138.0) < 1e-9
    assert out["eec_ok"] is True

    # collapsed run: Eec flat at the predict-mean floor → eec_ok False
    flat = [dict(r, **{"Avg Eec Loss": v, "FID": f}) for r, v, f in
            zip(records, [5064.0, 4800.0, 4791.0], [252.0, 102.0, 275.5])]
    (log_dir / "log_08_18_2026_00_00_01.json").write_text(
        json.dumps({"output": flat}))
    import os
    # force a strictly later mtime: "newest wins" must not depend on the
    # filesystem's timestamp resolution for files written back to back
    st = (log_dir / "log_08_18_2026_00_00_00.json").stat()
    os.utime(log_dir / "log_08_18_2026_00_00_01.json",
             (st.st_atime, st.st_mtime + 10))
    out = _curve_shape(str(log_dir))
    assert out["eec_ok"] is False
    assert out["curve_ok"] is False


def test_rescore_merges_gates_into_existing_report(tmp_path, capsys):
    """`dmt-reproduce --rescore_log DIR --report_out F` re-gates a finished
    run: curve fields are recomputed from the log and merged into the
    existing report in place, without touching training or devices."""
    from disentangle_mlp_tpu.cli.reproduce import main

    log_dir = tmp_path / "log"
    log_dir.mkdir()
    records = [
        {"Epoch": 0, "Avg Eec Loss": 4951.0, "FID": 40.7},
        {"Epoch": 1, "Avg Eec Loss": 868.5, "FID": 2.7},
    ]
    (log_dir / "log_08_18_2026_00_00_00.json").write_text(
        json.dumps({"output": records}))
    report = tmp_path / "REPRO.json"
    report.write_text(json.dumps({"target_fid": 128.34, "stats_images": 2048}))

    main(["--name", "rescore1", "--rescore_log", str(log_dir),
          "--report_out", str(report),
          "--save_path", str(tmp_path / "%"),
          "--log_path", str(tmp_path / "%/log")])
    printed = json.loads(capsys.readouterr().out)
    merged = json.loads(report.read_text())
    for out in (printed, merged):
        assert out["target_fid"] == 128.34          # pre-existing keys kept
        assert out["eec_ok"] is True and out["curve_ok"] is True
        assert out["eec_curve"] == [4951.0, 868.5]
    # --report_out naming a missing file creates a fresh report with just
    # the recomputed gates (CLI help: "created if missing")
    missing = tmp_path / "nonexistent.json"
    main(["--name", "rescore2", "--rescore_log", str(log_dir),
          "--report_out", str(missing),
          "--save_path", str(tmp_path / "%"),
          "--log_path", str(tmp_path / "%/log")])
    assert json.loads(capsys.readouterr().out)["eec_ok"] is True
    assert missing.exists()  # fresh report written with just the gates


def test_rescore_errors_on_missing_or_ungateable_log(tmp_path):
    """A mistyped --rescore_log path or a log with nothing scorable must
    fail loudly, not exit 0 with an unchanged report."""
    import pytest

    from disentangle_mlp_tpu.eval.reproduce import rescore

    with pytest.raises(FileNotFoundError):
        rescore(str(tmp_path / "no_such_dir"))

    log_dir = tmp_path / "log"
    log_dir.mkdir()
    # one epoch, FID N/A: neither a 2-point FID curve nor a 2-point Eec
    # curve exists, so no gate can be recomputed
    (log_dir / "log_08_18_2026_00_00_00.json").write_text(
        json.dumps({"output": [
            {"Epoch": 0, "Avg Eec Loss": 100.0, "FID": "N/A"}]}))
    with pytest.raises(ValueError):
        rescore(str(log_dir))


def test_rescore_drops_stale_gates(tmp_path):
    """Re-gating against a --calc_fid False run removes the previous FID
    gate fields instead of leaving a stale curve_ok beside no curve."""
    from disentangle_mlp_tpu.eval.reproduce import rescore

    log_dir = tmp_path / "log"
    log_dir.mkdir()
    (log_dir / "log_08_18_2026_00_00_00.json").write_text(
        json.dumps({"output": [
            {"Epoch": 0, "Avg Eec Loss": 1138.0, "FID": "N/A"},
            {"Epoch": 1, "Avg Eec Loss": 776.0, "FID": "N/A"}]}))
    report = tmp_path / "REPRO.json"
    report.write_text(json.dumps({
        "target_fid": 128.34, "fid_curve": [223.4, 128.3],
        "curve_ok": True, "curve_ratio": 0.57, "fid_min": 128.3,
        "fid_min_epoch": 1, "curve_min_ok": True}))

    merged = rescore(str(log_dir), str(report))
    assert merged["target_fid"] == 128.34        # non-gate keys kept
    assert merged["eec_ok"] is True
    for stale in ("fid_curve", "curve_ok", "curve_ratio", "fid_min",
                  "fid_min_epoch", "curve_min_ok"):
        assert stale not in merged, stale
    assert json.loads(report.read_text()) == merged
