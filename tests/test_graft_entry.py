"""Driver-gate tests: dryrun_multichip must work both in-process (enough
devices already visible) and via its self-bootstrap subprocess path (cold
1-device host — the configuration the driver runs, VERDICT round 1 item 1)."""

import os
import subprocess
import sys

import jax
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def test_dryrun_multichip_in_process(monkeypatch):
    import __graft_entry__ as g

    # the 2-process pod path is covered directly by tests/test_multiprocess.py
    monkeypatch.setenv("DMT_DRYRUN_POD", "0")
    assert len(jax.devices()) >= 8  # conftest forces 8 virtual CPU devices
    g.dryrun_multichip(8)


def test_dryrun_multichip_bootstraps_from_one_device():
    """Simulate the driver's cold call on a 1-device host: a fresh process
    with NO virtual-device flag must self-bootstrap into a forced-CPU
    subprocess and pass."""
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "DMT_DRYRUN_CHILD")}
    env["JAX_PLATFORMS"] = "cpu"  # 1 CPU device in the parent
    env["DMT_DRYRUN_POD"] = "0"  # pod path covered by test_multiprocess.py
    # the axon plugin IGNORES the JAX_PLATFORMS env var (CLAUDE.md): force
    # the CPU platform via jax.config too, or this child attaches to the
    # real chip and hangs whenever the tunnel is down
    code = ("import jax; jax.config.update('jax_platforms', 'cpu'); "
            "import __graft_entry__ as g; "
            "assert len(jax.devices()) == 1, jax.devices(); "
            "g.dryrun_multichip(4)")
    r = subprocess.run([sys.executable, "-c", code], env=env, cwd=REPO,
                       capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, f"stdout={r.stdout}\nstderr={r.stderr}"
    assert "dryrun_multichip(4): ok" in r.stdout
