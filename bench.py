"""Headline benchmark: β-VAE-GAN training images/sec/chip on TPU.

Prints one JSON record per line, each line a COMPLETE, parseable record
that extends the previous one — the LAST line is the full result. The
headline (freeze_mode='observed', f32 optimizer) is printed the moment
its own timed windows finish; every further variant extends and reprints
the record. A wall-clock budget (DMT_BENCH_BUDGET seconds, default 1500)
drops not-yet-measured variants rather than output, so a cold compile
cache or a slow tunnel window can no longer cost the round its official
number (round 4's driver bench: rc=124, zero output — VERDICT r4 #1).

Fields:
- metric/value/unit/vs_baseline: steady-state throughput of the full-size
  flagship 3-phase β-VAE-GAN train step (batch 256, bfloat16 — the
  reference's published configuration, SURVEY.md §6) under exact
  reference semantics (freeze_mode='observed'), vs the PyTorch-CPU
  baseline of the identical per-batch work (BENCH_BASELINE.json).
- value_median: median across that variant's timed windows — the
  drift-robust companion to the best-window headline.
- intent_mode_* / *_opt_bf16_*: true-torch-freeze semantics and/or Adam
  moments stored bf16 (the production-fast configurations; see
  train/common.py). vae_value/gan_value: the other two first-class
  experiments (reference new_vae.py / new_gan.py), same batch/dtype.
- envelope_tflops_* / envelope_gbps_*: a bare chained bf16 4096³ matmul
  probe and a 256 MB HBM stream probe timed INSIDE the same windows as
  the step rates (VERDICT r4 #5) — the chip's delivered envelope for the
  very windows the step numbers come from, on a part measured to drift
  ±10-100% across processes/time (benchmarks/README_PERF.md).
- host_load / contaminated: os.getloadavg() stamps (benchmarks/hostcheck);
  on this 1-CPU host a concurrent heavy process invalidates measurements
  (ROUND4.md), so the record carries the evidence.
- interleaved_windows / variants_dropped / budget_s / elapsed_s:
  measurement-provenance bookkeeping. Cross-variant comparisons should
  use the interleaved windows (all variants timed round-robin in the same
  process — the only drift-valid A/B on this chip); the headline 'best'
  additionally sees each variant's solo windows.

Warmup/compile steps are excluded from every timed window; the
persistent compilation cache (utils/runtime.py) makes reruns fast.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
BASELINE_CACHE = os.path.join(REPO, "BENCH_BASELINE.json")

BATCH = 256
TIMED_STEPS = 20
WINDOWS = 3
BUDGET_S = float(os.environ.get("DMT_BENCH_BUDGET", "1500"))
# conservative per-variant allowance: a cold-cache compile of one more
# flagship variant over the tunnel (warm-cache builds run ~1 min)
VARIANT_COST_S = float(os.environ.get("DMT_BENCH_VARIANT_COST", "360"))

T0 = time.perf_counter()


def _elapsed() -> float:
    return time.perf_counter() - T0


def _note(msg: str) -> None:
    """Progress marker on stderr: the driver records the output tail, so
    even a timed-out run now says what it was doing when it died."""
    print(f"bench.py[{_elapsed():.0f}s]: {msg}", file=sys.stderr, flush=True)


def _cache_dir() -> str:
    return os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.expanduser("~/.cache/disentangle_mlp_tpu/xla_cache"))


def cache_is_warm() -> bool:
    try:
        return any(os.scandir(_cache_dir()))
    except OSError:
        return False


def baseline_images_per_sec() -> float:
    if os.path.isfile(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            return float(json.load(f)["torch_cpu_images_per_sec"])
    from benchmarks.torch_baseline import measure
    rate = measure(batch_size=64, steps=3)
    with open(BASELINE_CACHE, "w") as f:
        json.dump({"torch_cpu_images_per_sec": rate,
                   "note": "3-phase beta-VAE-GAN step, batch 64, torch CPU"},
                  f, indent=2)
    return rate


def tpu_reachable(timeout_s: int = 300, attempts: int = 2) -> bool:
    """Bounded reachability probe in a subprocess. The axon tunnel has
    been observed DOWN for hours (round 4): in-process backend init then
    hangs ~35 min before raising UNAVAILABLE. A trivial device op needs
    no real compile, so the probe converts that hang into a fast, clean
    exit 3. Worst case with the retry: ~2×(300+60) s = 12 min — still
    under the in-process hang, and reached only when the tunnel is
    genuinely unresponsive twice in a row.

    Skipped when the compilation cache is warm (VERDICT r4 #1): a warm
    cache means the main process reaches its first device op in seconds,
    so the in-process init doubles as the probe — with stderr progress
    notes attributing any hang — and the ~30-130 s probe-process cost is
    saved from the driver's window. DMT_BENCH_PROBE=1 forces the probe,
    =0 skips it unconditionally.
    """
    import subprocess
    forced = os.environ.get("DMT_BENCH_PROBE")
    if forced == "0":
        return True
    if forced != "1" and cache_is_warm():
        _note("compile cache warm — skipping the reachability probe")
        return True
    code = "import jax, jax.numpy as jnp; print(float(jnp.ones((8, 8)).sum()))"
    for attempt in range(attempts):
        _note(f"reachability probe attempt {attempt + 1}/{attempts}")
        proc = subprocess.Popen([sys.executable, "-c", code],
                                stdout=subprocess.DEVNULL,
                                stderr=subprocess.DEVNULL)
        try:
            if proc.wait(timeout=timeout_s) == 0:
                return True
        except subprocess.TimeoutExpired:
            # SIGTERM, never SIGKILL: a kill -9'd TPU process leaves a
            # dead chip claim that wedges the tunnel for many minutes
            # (CLAUDE.md)
            proc.terminate()
            try:
                proc.wait(timeout=60)
            except subprocess.TimeoutExpired:
                # Still alive after SIGTERM+60 s: NEVER launch a second
                # probe while the first holds (or is queued on) the chip
                # claim — a concurrent probe would queue behind it and
                # burn its own timeout too (ADVICE r4). Declare down.
                _note("probe ignored SIGTERM — not retrying concurrently")
                return False
    return False


class Budget:
    """Wall-clock budget: drop variants, never output (VERDICT r4 #1)."""

    def __init__(self, total_s: float = BUDGET_S):
        self.total_s = total_s
        self.dropped: list = []

    def remaining(self) -> float:
        return self.total_s - _elapsed()

    def allow(self, name: str, cost_s: float) -> bool:
        if self.remaining() >= cost_s:
            return True
        self.dropped.append(name)
        _note(f"budget: dropping '{name}' "
              f"({self.remaining():.0f}s left < {cost_s:.0f}s allowance)")
        return False


def _build_envelope_probes():
    """Jitted envelope probes timed inside the measurement windows:
    chained bf16 4096³ matmuls (sequential data dependence — no overlap
    illusions) and a 256 MB f32 read+write stream. README_PERF: 112 vs
    50 TF/s on this probe minutes apart is why per-window evidence is
    required for any envelope claim."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    n, iters = 4096, 32
    a = jax.random.normal(jax.random.key(1), (n, n)).astype(jnp.bfloat16)
    b = jax.random.normal(jax.random.key(2), (n, n)).astype(jnp.bfloat16)

    @jax.jit
    def chain(x, y):
        x, _ = lax.scan(
            lambda c, _: (jnp.dot(c, y,
                                  preferred_element_type=jnp.bfloat16), None),
            x, None, length=iters)
        return x

    buf = jnp.zeros((64 * 2 ** 20,), jnp.float32)  # 256 MB
    stream_iters = 4

    @jax.jit
    def stream(x):
        x, _ = lax.scan(lambda c, _: (c + 1.0, None), x, None,
                        length=stream_iters)
        return x

    def run() -> dict:
        t0 = time.perf_counter()
        out = chain(a, b)
        float(out[0, 0])  # scalar fetch: the only reliable axon barrier
        tflops = 2 * n ** 3 * iters / (time.perf_counter() - t0) / 1e12
        t0 = time.perf_counter()
        out = stream(buf)
        float(out[0])
        gbps = (2 * buf.nbytes * stream_iters
                / (time.perf_counter() - t0) / 1e9)
        return {"tflops": tflops, "gbps": gbps}

    run()  # warm both compiles outside any timed window
    return run


def _build_variant(key: str, batches, batch: int = BATCH):
    """(multi_step, states, sync_key) for one measured variant, full
    production width, donated scan carry (train/scan.py — the production
    driver's configuration). ``batch`` parameterizes the batch size for
    the capability sweep (benchmarks/batch_sweep.py); bench itself always
    measures the reference's published batch 256."""
    import jax

    from disentangle_mlp_tpu.config import Config
    from disentangle_mlp_tpu.train.gan import create_gan_experiment
    from disentangle_mlp_tpu.train.scan import make_multi_step
    from disentangle_mlp_tpu.train.vae import create_vae_experiment
    from disentangle_mlp_tpu.train.vaegan import create_vaegan_experiment

    flagship = {"observed": ("observed", "float32"),
                "intent": ("intent", "float32"),
                "observed_opt_bf16": ("observed", "bfloat16"),
                "intent_opt_bf16": ("intent", "bfloat16")}
    if key in flagship:
        mode, opt_dtype = flagship[key]
        cfg = Config(name=f"bench_{key}", beta=25.0,
                     batch_size_train=batch, dtype="bfloat16", lr=3e-4,
                     freeze_mode=mode, optimizer_dtype=opt_dtype)
        exp = create_vaegan_experiment(cfg, jax.random.key(0))
        run = {"multi": make_multi_step(exp.step_fn, n_states=2,
                                        donate=True),
               "states": [exp.eg_state, exp.d_state],
               "sync": "recon_enc", "rates": []}
    elif key == "vae":
        cfg = Config(name="bench_vae", batch_size_train=batch,
                     dtype="bfloat16", lr=3e-4)
        exp = create_vae_experiment(cfg, jax.random.key(0))
        run = {"multi": make_multi_step(exp.step_fn, n_states=1,
                                        donate=True),
               "states": [exp.state], "sync": "loss", "rates": []}
    elif key == "gan":
        cfg = Config(name="bench_gan", batch_size_train=batch,
                     dtype="bfloat16", lr=3e-4)
        exp = create_gan_experiment(cfg, jax.random.key(0))
        run = {"multi": make_multi_step(exp.step_fn, n_states=2,
                                        donate=True),
               "states": [exp.g_state, exp.d_state], "sync": "errG",
               "rates": []}
    else:  # pragma: no cover - programming error
        raise KeyError(key)

    # warmup / compile. NOTE: on the axon platform block_until_ready()
    # can return before execution finishes — a scalar fetch is the only
    # reliable barrier, so sync by reading a metric.
    *run["states"], m = run["multi"](*run["states"], batches,
                                     jax.random.key(0))
    float(m[run["sync"]][-1])
    return run


def _time_window(runs: dict, seed: int, probes=None, probe_out=None) -> None:
    """One timed window: every variant in ``runs`` round-robin, then the
    envelope probes (when given) — so envelope evidence shares the window
    with the rates it contextualizes."""
    import jax
    for r in runs.values():
        t0 = time.perf_counter()
        *r["states"], m = r["multi"](*r["states"], r["batches"],
                                     jax.random.key(seed))
        value = float(m[r["sync"]][-1])
        dt = time.perf_counter() - t0
        assert value == value, "training metric went NaN during bench"
        r["rates"].append(r.get("batch", BATCH) * r.get("steps", TIMED_STEPS) / dt)
    if probes is not None:
        probe_out.append(probes())


# record-key prefixes per variant ("" = the headline observed mode)
_KEYMAP = {"observed": "", "intent": "intent_mode_",
           "observed_opt_bf16": "opt_bf16_",
           "intent_opt_bf16": "intent_opt_bf16_", "vae": "vae_",
           "gan": "gan_"}


def _emit(runs: dict, base: float, probe_out: list, meta: dict) -> None:
    """Print the cumulative record as one complete JSON line (flushed —
    the driver may SIGTERM at any moment and keeps the output tail)."""
    rec = {
        "metric": "beta-VAE-GAN train throughput (batch 256, bf16, 1 chip)",
        "value": round(max(runs["observed"]["rates"]), 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(max(runs["observed"]["rates"]) / base, 2),
        "value_median":
            round(statistics.median(runs["observed"]["rates"]), 2),
    }
    for key, r in runs.items():
        prefix = _KEYMAP[key]
        if not prefix or not r["rates"]:
            continue
        rec[prefix + "value"] = round(max(r["rates"]), 2)
        rec[prefix + "median"] = round(statistics.median(r["rates"]), 2)
    if probe_out:
        for k, label in (("tflops", "envelope_tflops"),
                         ("gbps", "envelope_gbps")):
            vals = [p[k] for p in probe_out]
            rec[label + "_best"] = round(max(vals), 1)
            rec[label + "_median"] = round(statistics.median(vals), 1)
    rec.update(meta)
    rec["elapsed_s"] = round(_elapsed(), 1)
    print(json.dumps(rec), flush=True)


def main() -> None:
    from benchmarks.hostcheck import finish, host_idle_check

    # stamp-only (never refuse): the driver's round-end record must exist
    # even if the host was busy — `contaminated` carries the judgment
    idle = host_idle_check(refuse=False)
    warm = cache_is_warm()
    if not tpu_reachable():
        print("bench.py: TPU unreachable (axon tunnel down; probe timed "
              "out or backend init failed) — no measurement taken",
              file=sys.stderr)
        sys.exit(3)
    base = baseline_images_per_sec()

    from disentangle_mlp_tpu.utils.runtime import enable_compilation_cache
    enable_compilation_cache()
    _note("initializing TPU backend (a down tunnel hangs HERE ~35 min "
          "before UNAVAILABLE — if this is the tail's last line, that is "
          "what happened)")
    import jax
    import jax.numpy as jnp

    budget = Budget()
    meta = {"host_load": idle, "contaminated": idle["contaminated"],
            "budget_s": budget.total_s, "cache_warm_at_start": warm,
            "interleaved_windows": 0,
            "variants_dropped": budget.dropped}

    # distinct device-resident batches; the scan driver runs TIMED_STEPS
    # steps in ONE dispatch (host RPC latency over the TPU tunnel would
    # otherwise pollute the measurement)
    batches = jax.random.uniform(
        jax.random.key(100), (TIMED_STEPS, BATCH, 64, 64, 3),
        jnp.float32, -1.0, 1.0)
    float(batches[0, 0, 0, 0, 0])
    _note("device contact OK — warming envelope probes")
    probes = _build_envelope_probes()
    probe_out: list = []

    # Stage A — the headline, alone, emitted the moment it is measured.
    _note("building headline variant 'observed' (compile happens here)")
    runs = {"observed": _build_variant("observed", batches)}
    runs["observed"]["batches"] = batches
    for w in range(WINDOWS):
        _time_window(runs, seed=w + 1, probes=probes, probe_out=probe_out)
    finish(idle)  # end-of-stage load stamp (idle IS meta["host_load"])
    _emit(runs, base, probe_out, meta)

    # Stage B — extend with each further variant under the budget, one
    # quick solo window each so partial progress is already in the record.
    for key in ("intent", "observed_opt_bf16", "intent_opt_bf16",
                "vae", "gan"):
        if not budget.allow(key, VARIANT_COST_S):
            continue
        _note(f"building variant '{key}'")
        runs[key] = _build_variant(key, batches)
        runs[key]["batches"] = batches
        _time_window({key: runs[key]}, seed=101)
        finish(idle)
        _emit(runs, base, probe_out, meta)

    # Stage C — interleaved windows across everything measured: the only
    # drift-valid cross-variant comparison on this chip (README_PERF).
    for w in range(WINDOWS):
        if budget.remaining() < 60:
            _note("budget: skipping remaining interleaved windows")
            break
        _time_window(runs, seed=200 + w, probes=probes,
                     probe_out=probe_out)
        meta["interleaved_windows"] += 1
    finish(idle)
    _emit(runs, base, probe_out, meta)


if __name__ == "__main__":
    sys.exit(main())
