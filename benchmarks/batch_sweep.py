"""Batch-size capability study of the flagship step (VERDICT r4 #6).

Sweeps the full-size 3-phase β-VAE-GAN train step over batch
128/256/512/1024 in BOTH freeze modes (observed = reference-exact
headline semantics, intent = production-fast). Within each batch size
the two modes' windows are fully interleaved in one process — the only
drift-valid A/B on this chip (benchmarks/README_PERF.md). Batch sizes
run SEQUENTIALLY with their states freed in between: two resident
full-size variants plus batch-1024 activation workspace fit HBM; eight
at once would not. Cross-size comparisons therefore lean on the
in-window envelope probes (bench.py's chained bf16 matmul + HBM stream)
recorded per size as drift context.

Batch 256 stays the parity headline (the reference's published
configuration — Report Table 3 chose 256 to cut DataParallel transfer
frequency, SURVEY.md §2.2); this artifact settles whether the chip has
unclaimed MFU at larger batch.

Achieved-TFLOP attribution (observed mode): the step's FLOPs are conv-
dominated and exactly linear in batch, so flops(b) = 4.96 TFLOP × b/256
— the XLA ``cost_analysis`` number banked for the b256 observed step
(OP_PROFILE_r4.json). Per-config cost_analysis compiles were measured
at ~5 min each cold over the tunnel (8 extra compiles) and dropped for
the analytic scaling. NOTE the 4.96 counts the dilated-ConvT zero-MACs
(~4× on those ops), so ``tflops_naive`` overstates useful FLOPs exactly
as README_PERF describes — comparable across batch sizes, not a
datasheet-MFU claim; intent-mode rows carry no TFLOP column (the frozen
sub-network's skipped backwards make its FLOP count mode-specific). An
OOM at a size is recorded as an outcome, not a crash.

    python -m benchmarks.batch_sweep --out BATCH_SWEEP_r5.json
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

# XLA cost_analysis FLOPs of the observed-mode single step at batch 256
# (OP_PROFILE_r4.json; naive — counts dilated-ConvT zero-MACs)
OBSERVED_B256_FLOPS = 4.96e12


def _measure_size(b: int, modes, ns, probes, bench) -> tuple:
    """Build both modes at batch ``b``, run interleaved windows, free
    everything. Returns (per-mode result rows, per-window probe dicts)."""
    import jax
    import jax.numpy as jnp

    data = jax.random.uniform(
        jax.random.key(100 + b), (ns.steps, b, 64, 64, 3),
        jnp.float32, -1.0, 1.0)
    float(data[0, 0, 0, 0, 0])

    runs, flops = {}, {}
    for mode in modes:
        key = f"{mode}_b{b}"
        print(f"[batch_sweep] building {key}", flush=True)
        t0 = time.perf_counter()
        r = bench._build_variant(mode, data, batch=b)
        r["batch"], r["steps"], r["batches"] = b, ns.steps, data
        runs[key] = r
        print(f"[batch_sweep] {key} ready in "
              f"{time.perf_counter() - t0:.0f}s", flush=True)
        if mode == "observed":
            # analytic: conv-dominated step, FLOPs linear in batch,
            # anchored on OP_PROFILE_r4's cost_analysis at b256 (per-
            # config cost_analysis compiles ran ~5 min each cold over
            # the tunnel and were dropped — module docstring)
            flops[key] = OBSERVED_B256_FLOPS * b / 256.0

    probe_rows = []
    for w in range(ns.windows):
        bench._time_window(runs, seed=300 + w, probes=probes,
                           probe_out=probe_rows)
        print(f"[batch_sweep] b={b} window {w + 1}/{ns.windows} done",
              flush=True)

    rows = []
    for key, r in runs.items():
        best = max(r["rates"])
        step_s_best = r["batch"] / best
        rows.append({
            "mode": key.rsplit("_b", 1)[0], "batch": r["batch"],
            "img_per_s_best": round(best, 1),
            "img_per_s_median": round(statistics.median(r["rates"]), 1),
            "step_ms_best": round(step_s_best * 1e3, 2),
            "tflops_naive_best":
                round(flops[key] / step_s_best / 1e12, 1)
                if flops.get(key) else None,
        })
    return rows, probe_rows


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="128,256,512,1024")
    ap.add_argument("--modes", default="observed,intent")
    ap.add_argument("--windows", type=int, default=3)
    ap.add_argument("--steps", type=int, default=20,
                    help="train steps per timed dispatch (scan driver)")
    ap.add_argument("--out", default="BATCH_SWEEP_r5.json")
    ap.add_argument("--allow_busy_host", action="store_true")
    ns = ap.parse_args(argv)

    from benchmarks.hostcheck import finish, host_idle_check
    idle = host_idle_check(refuse=not ns.allow_busy_host)

    from disentangle_mlp_tpu.utils.runtime import enable_compilation_cache
    enable_compilation_cache()
    import bench  # reuse the variant builder + window machinery

    modes = ns.modes.split(",")
    probes = bench._build_envelope_probes()

    results, envelopes = [], {}
    for b in (int(x) for x in ns.batches.split(",")):
        try:
            rows, probe_rows = _measure_size(b, modes, ns, probes, bench)
        except Exception as e:  # XlaRuntimeError OOM etc.
            msg = str(e)
            if "RESOURCE_EXHAUSTED" in msg or "Out of memory" in msg.lower():
                print(f"[batch_sweep] batch {b}: OOM — recorded", flush=True)
                results.append({"batch": b, "oom": True,
                                "error": msg.splitlines()[0][:200]})
                continue
            raise
        results.extend(rows)
        envelopes[str(b)] = {
            "tflops": [round(p["tflops"], 1) for p in probe_rows],
            "gbps": [round(p["gbps"], 1) for p in probe_rows]}

    report = {
        "timed_steps": ns.steps, "windows": ns.windows,
        "envelope_by_batch": envelopes,
        "host_load": finish(idle), "contaminated": idle["contaminated"],
        "results": sorted(
            results, key=lambda r: (r.get("mode", ""), r["batch"])),
        "note": "full-size flagship step, bf16 compute, donated scan "
                "carry; modes interleaved within each batch size, sizes "
                "sequential (HBM); batch 256 remains the parity headline "
                "(Report Table 3)",
    }
    with open(ns.out, "w") as f:
        json.dump(report, f, indent=2, default=float)
    print(json.dumps(report["results"]))
    print(f"report → {ns.out}")


if __name__ == "__main__":
    main()
