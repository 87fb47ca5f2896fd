"""REAL multi-host pod path: two OS processes (2 virtual CPU devices each)
form one 4-device global mesh over the jax.distributed runtime — the same
code path a v5e pod takes over DCN (SURVEY §2.2). Covers the explicit env
contract of maybe_initialize_distributed, cross-process gloo collectives,
the per-host-sliced DataLoader (each process decodes only 1/process_count
of the global batch), and one sharded β-VAE-GAN train step whose SPMD
outputs must agree across processes bit-for-bit."""

import json
import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "mp_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_pod_path():
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)  # worker sets its own device count
        env.update(
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
            PYTHONPATH=REPO,
        )
        procs.append(subprocess.Popen(
            [sys.executable, WORKER], env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))

    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(json.loads(out.strip().splitlines()[-1]))

    by_proc = {o["proc"]: o for o in outs}
    assert set(by_proc) == {0, 1}
    # SPMD: global-batch sum, step metric, and updated params must agree
    # across processes exactly
    for key in ("batch_sum", "recon", "param_l1"):
        assert by_proc[0][key] == by_proc[1][key], (key, by_proc)
