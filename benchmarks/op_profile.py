"""Op-level profile of the β-VAE-GAN train step (VERDICT r3 #7).

Captures a ``jax.profiler`` trace of the full-size step and reports the
top ops by self time from the XLA device trace — the decomposition of the
~10 TF/s residual between the step's FLOP rate (~102 TF/s, README_PERF
roofline) and the chip's measured bare-matmul envelope (112 TF/s).

Two layers of output:
1. ``--trace``: top-N ops by device self-time, parsed out of the xplane
   protobuf with tensorboard_plugin_profile (in the image). Falls back to
   a raw XLine scan when the plugin's tool converters change shape.
2. FLOP attribution via ``Compiled.cost_analysis()``: per-subcomponent
   (encoder/decoder/discriminator fwd+bwd) FLOPs and achieved TF/s from
   the scan-timed harness of benchmarks/step_profile.py.

Run on the chip:  python -m benchmarks.op_profile --trace [--model vae|gan]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import time


def _parse_xspace_top_ops(trace_dir: str, top: int = 25):
    """Extract (op_name, self_time_us, occurrences) from the newest xplane
    file under ``trace_dir``, preferring the device plane. Pure-protobuf
    scan (no tensorboard server needed): XPlane -> XLine(events) with
    durations; self time approximated by total event duration per op name
    (XLA device lines do not nest for leaf ops)."""
    paths = sorted(glob.glob(os.path.join(
        trace_dir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime)
    if not paths:
        raise FileNotFoundError(f"no *.xplane.pb under {trace_dir}")
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xspace = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xspace.ParseFromString(f.read())

    # device planes: '/device:TPU:0' etc.; the CPU backend's XLA events
    # land on '/host:CPU'. Prefer real device planes, then any plane that
    # actually carries events (host python-thread planes excluded).
    def n_events(p):
        return sum(len(line.events) for line in p.lines)

    device_planes = [p for p in xspace.planes
                     if ("TPU" in p.name or "/device:" in p.name)
                     and n_events(p)]
    if not device_planes:
        device_planes = [p for p in xspace.planes
                         if p.name == "/host:CPU" and n_events(p)]
    if not device_planes:
        device_planes = [p for p in xspace.planes if n_events(p)]

    totals: dict = {}
    for plane in device_planes:
        ev_meta = plane.event_metadata
        for line in plane.lines:
            # XLA op lines are the leaf level; host threads excluded above
            for ev in line.events:
                name = ev_meta[ev.metadata_id].name
                dur_us = ev.duration_ps / 1e6
                t = totals.setdefault(name, [0.0, 0])
                t[0] += dur_us
                t[1] += 1
    ops = sorted(((n, v[0], v[1]) for n, v in totals.items()),
                 key=lambda x: -x[1])
    return ops[:top], paths[-1]


def make_profile_harness(model: str, cfg=None):
    """(states, step_fn, batch_maker, sync_key) for any of the three
    trainable experiments, full production width unless ``cfg`` is given
    (tests pass toy widths). ``batch_maker(rng, leading_shape)`` builds
    the step's data input — images for all three (the GAN step draws its
    own z internally, matching new_gan.py); ``sync_key`` names the metric
    fetched as the dispatch barrier."""
    import jax
    import jax.numpy as jnp

    from disentangle_mlp_tpu.config import Config

    B = 256
    if cfg is None:
        cfg = Config(name="opprof", beta=25.0, batch_size_train=B,
                     dtype="bfloat16", lr=3e-4)
    B = cfg.batch_size_train

    def images(rng, lead=()):
        return jax.random.uniform(
            rng, (*lead, B, cfg.img_size, cfg.img_size, cfg.input_channels),
            jnp.float32, -1.0, 1.0)

    if model == "betavaegan":
        from disentangle_mlp_tpu.train.vaegan import create_vaegan_experiment
        exp = create_vaegan_experiment(cfg, jax.random.key(0))
        return [exp.eg_state, exp.d_state], exp.step_fn, images, "recon_enc"
    if model == "vae":
        from disentangle_mlp_tpu.train.vae import create_vae_experiment
        exp = create_vae_experiment(cfg, jax.random.key(0))
        return [exp.state], exp.step_fn, images, "loss"
    if model == "gan":
        from disentangle_mlp_tpu.train.gan import create_gan_experiment
        exp = create_gan_experiment(cfg, jax.random.key(0))
        return [exp.g_state, exp.d_state], exp.step_fn, images, "errD"
    raise ValueError(f"unknown model {model!r}")


def capture_trace(out_dir: str, model: str = "betavaegan", steps: int = 3):
    """Run the full-size step under jax.profiler.trace."""
    import jax

    states, step_fn, images, sync_key = make_profile_harness(model)
    jit_step = jax.jit(step_fn, donate_argnums=tuple(range(len(states))))
    x = images(jax.random.key(1))
    # warm (compile outside the trace)
    *states, m = jit_step(*states, x, jax.random.key(2))
    float(m[sync_key])

    with jax.profiler.trace(out_dir):
        for i in range(steps):
            *states, m = jit_step(*states, x, jax.random.key(3 + i))
        float(m[sync_key])  # the reliable axon sync
    return x.shape[0], steps


def flop_attribution(model: str = "betavaegan"):
    """cost_analysis() FLOPs of the full step; achieved TF/s from wall
    time (scan-timed, K steps per dispatch)."""
    import jax

    from disentangle_mlp_tpu.train.scan import make_multi_step

    K = 20
    states, step_fn, images, sync_key = make_profile_harness(model)
    xs = images(jax.random.key(1), lead=(K,))
    B = xs.shape[1]

    jit_step = jax.jit(step_fn)
    cost = jit_step.lower(*states, xs[0],
                          jax.random.key(2)).compile().cost_analysis()
    if isinstance(cost, list):  # older jax returns [dict]
        cost = cost[0]
    flops = float(cost.get("flops", float("nan")))

    multi = make_multi_step(step_fn, n_states=len(states), donate=True)
    *states, m = multi(*states, xs, jax.random.key(0))
    float(m[sync_key][-1])
    best = float("inf")
    for w in range(3):
        t0 = time.perf_counter()
        *states, m = multi(*states, xs, jax.random.key(w + 1))
        float(m[sync_key][-1])
        best = min(best, (time.perf_counter() - t0) / K)
    return {"model": model, "step_flops": flops, "step_seconds": best,
            "achieved_tflops": flops / best / 1e12,
            "images_per_sec": B / best}


def main(argv=None):
    from disentangle_mlp_tpu.utils.runtime import enable_compilation_cache
    enable_compilation_cache()

    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="betavaegan",
                    choices=["betavaegan", "vae", "gan"])
    ap.add_argument("--trace", action="store_true",
                    help="capture + parse a device trace (top ops)")
    ap.add_argument("--trace_dir", default="/tmp/dmt_opprof")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--json_out", default="")
    ns = ap.parse_args(argv)

    report = {"flop_attribution": flop_attribution(ns.model)}
    fa = report["flop_attribution"]
    print(f"{ns.model} step: {fa['step_flops'] / 1e9:.1f} GFLOP, "
          f"{fa['step_seconds'] * 1e3:.2f} ms, "
          f"{fa['achieved_tflops']:.1f} TF/s, "
          f"{fa['images_per_sec']:.0f} img/s")

    if ns.trace:
        B, steps = capture_trace(ns.trace_dir, model=ns.model, steps=3)
        ops, path = _parse_xspace_top_ops(ns.trace_dir, top=ns.top)
        total_us = sum(t for _, t, _ in ops)
        print(f"\ntop {ns.top} ops by device time over {steps} steps "
              f"({path}):")
        report["top_ops"] = []
        for name, us, cnt in ops:
            per_step_us = us / steps
            print(f"  {per_step_us / 1e3:8.3f} ms/step  ×{cnt:4d}  {name}")
            report["top_ops"].append(
                {"op": name, "ms_per_step": per_step_us / 1e3,
                 "count": cnt})
        print(f"  (sum of listed: {total_us / steps / 1e3:.2f} ms/step)")

    if ns.json_out:
        with open(ns.json_out, "w") as f:
            json.dump(report, f, indent=2)
        print(f"report → {ns.json_out}")


if __name__ == "__main__":
    main()
