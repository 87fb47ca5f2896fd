"""Host-side unit tests for bench.py's round-5 structure (VERDICT r4 #1,
#5, #7): the wall-clock budget that drops variants instead of output, the
warm-cache probe skip, the host-idleness stamping, and the incremental
record emission. No TPU, no jax — everything here must run in
milliseconds so the driver-facing logic is verifiable on every commit."""

import json
import sys

import pytest

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402
from benchmarks import hostcheck  # noqa: E402


def test_budget_allows_under_and_drops_over():
    b = bench.Budget(total_s=10 ** 9)
    assert b.allow("intent", 360.0)
    assert b.dropped == []
    b2 = bench.Budget(total_s=-1.0)  # already exhausted
    assert not b2.allow("vae", 360.0)
    assert not b2.allow("gan", 360.0)
    assert b2.dropped == ["vae", "gan"]


def test_cache_is_warm(tmp_path, monkeypatch):
    cache = tmp_path / "xla_cache"
    monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", str(cache))
    assert not bench.cache_is_warm()  # missing dir
    cache.mkdir()
    assert not bench.cache_is_warm()  # empty dir
    (cache / "entry").write_bytes(b"x")
    assert bench.cache_is_warm()


def test_probe_skipped_on_warm_cache(tmp_path, monkeypatch):
    """A warm cache must short-circuit tpu_reachable without spawning any
    subprocess (the probe process costs ~30-130 s of the driver window)."""
    cache = tmp_path / "xla_cache"
    cache.mkdir()
    (cache / "entry").write_bytes(b"x")
    monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", str(cache))
    monkeypatch.delenv("DMT_BENCH_PROBE", raising=False)
    import subprocess

    def boom(*a, **k):  # pragma: no cover - failure path
        raise AssertionError("probe subprocess spawned despite warm cache")

    monkeypatch.setattr(subprocess, "Popen", boom)
    assert bench.tpu_reachable()
    # DMT_BENCH_PROBE=0 skips unconditionally, even with a cold cache
    (cache / "entry").unlink()
    monkeypatch.setenv("DMT_BENCH_PROBE", "0")
    assert bench.tpu_reachable()


def test_host_idle_check_stamps_and_refuses(monkeypatch):
    import os

    monkeypatch.setattr(os, "getloadavg", lambda: (0.1, 0.2, 0.3))
    check = hostcheck.host_idle_check(limit=0.75)
    assert not check["contaminated"]
    assert check["start"]["load_1m"] == 0.1
    hostcheck.finish(check)
    assert "load_1m" in check["end"]

    monkeypatch.setattr(os, "getloadavg", lambda: (2.0, 1.0, 0.5))
    check = hostcheck.host_idle_check(limit=0.75)
    assert check["contaminated"]  # stamped, not raised
    with pytest.raises(RuntimeError, match="host not idle"):
        hostcheck.host_idle_check(limit=0.75, refuse=True)


def _fake_runs(rates_by_key):
    return {k: {"rates": list(v)} for k, v in rates_by_key.items()}


def test_emit_headline_only_is_complete(capsys):
    """The stage-A record (observed alone) must already be a full,
    parseable headline — this is the line that survives a driver
    timeout."""
    runs = _fake_runs({"observed": [5000.0, 5200.0, 5100.0]})
    meta = {"budget_s": 1500.0, "interleaved_windows": 0,
            "variants_dropped": [], "contaminated": False}
    bench._emit(runs, base=3.34, probe_out=[{"tflops": 110.0, "gbps": 170.0}],
                meta=meta)
    rec = json.loads(capsys.readouterr().out.strip())
    assert rec["value"] == 5200.0
    assert rec["value_median"] == 5100.0
    assert rec["unit"] == "images/sec/chip"
    assert rec["vs_baseline"] == round(5200.0 / 3.34, 2)
    assert rec["envelope_tflops_best"] == 110.0
    assert rec["envelope_gbps_median"] == 170.0
    assert "intent_mode_value" not in rec  # not measured yet
    assert rec["variants_dropped"] == []


def test_emit_extends_with_variants(capsys):
    runs = _fake_runs({
        "observed": [5000.0], "intent": [6000.0, 6100.0],
        "observed_opt_bf16": [5400.0], "intent_opt_bf16": [6300.0],
        "vae": [21000.0], "gan": [10800.0]})
    meta = {"budget_s": 1500.0, "interleaved_windows": 3,
            "variants_dropped": ["gan_dropped_example"],
            "contaminated": True}
    bench._emit(runs, base=3.34, probe_out=[], meta=meta)
    rec = json.loads(capsys.readouterr().out.strip())
    assert rec["intent_mode_value"] == 6100.0
    assert rec["intent_mode_median"] == 6050.0
    assert rec["opt_bf16_value"] == 5400.0
    assert rec["intent_opt_bf16_value"] == 6300.0
    assert rec["vae_value"] == 21000.0
    assert rec["gan_median"] == 10800.0
    assert rec["interleaved_windows"] == 3
    assert rec["contaminated"] is True
    # every emitted line is one JSON object — the driver parses the tail
    assert "\n" not in json.dumps(rec)
