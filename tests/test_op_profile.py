"""benchmarks/op_profile.py xplane parsing: device-plane selection and
per-op aggregation, locked against a synthetic XSpace proto (the real
capture needs the TPU; the parser must not regress while waiting on it)."""

import os


def _write_xspace(tmp_path, plane_specs):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    for name, events in plane_specs:
        plane = xs.planes.add(name=name)
        for i, (op, dur_ps, n) in enumerate(events, start=1):
            plane.event_metadata[i].id = i
            plane.event_metadata[i].name = op
        line = plane.lines.add(name="XLA Ops")
        meta_by_op = {plane.event_metadata[i].name: i
                      for i in plane.event_metadata}
        for op, dur_ps, n in events:
            for _ in range(n):
                ev = line.events.add()
                ev.metadata_id = meta_by_op[op]
                ev.duration_ps = dur_ps
    out = tmp_path / "plugins" / "profile" / "x"
    out.mkdir(parents=True)
    path = out / "vm.xplane.pb"
    path.write_bytes(xs.SerializeToString())
    return str(tmp_path)


def test_parse_prefers_device_plane_and_aggregates(tmp_path):
    from benchmarks.op_profile import _parse_xspace_top_ops

    trace_dir = _write_xspace(tmp_path, [
        ("/host:CPU", [("host_noise", 10**9, 50)]),
        ("/device:TPU:0", [("fusion.1", 2 * 10**6, 3),   # 2 µs ×3
                           ("convolution.7", 5 * 10**6, 2)]),  # 5 µs ×2
    ])
    ops, path = _parse_xspace_top_ops(trace_dir, top=10)
    assert path.endswith("vm.xplane.pb")
    names = [o[0] for o in ops]
    assert "host_noise" not in names  # device plane wins
    by_name = {n: (us, cnt) for n, us, cnt in ops}
    assert by_name["convolution.7"] == (10.0, 2)  # 2×5 µs aggregated
    assert by_name["fusion.1"] == (6.0, 3)
    assert names[0] == "convolution.7"  # sorted by total time


def test_profile_harness_covers_all_experiments():
    """make_profile_harness builds a runnable (states, step, data, sync)
    bundle for each trainable experiment (the chip capture drives these
    full-width; here the toy-width graph proves the plumbing)."""
    import jax
    import numpy as np

    from benchmarks.op_profile import make_profile_harness
    from disentangle_mlp_tpu.config import Config

    cfg = Config(name="t", n_hidden=16, batch_size_train=4,
                 dtype="float32", lr=1e-3, img_size=32,
                 n_z=[8, 4, 4], representation_size=4, head_width=32,
                 decoder_channels=[8, 8, 8], disc_channels=[4, 8, 8, 8],
                 disc_feature_dim=32)
    for model, n_states in (("betavaegan", 2), ("vae", 1), ("gan", 2)):
        states, step_fn, images, sync_key = make_profile_harness(model, cfg)
        assert len(states) == n_states
        x = images(jax.random.key(1))
        assert x.shape == (4, 32, 32, 3)
        *new_states, m = jax.jit(step_fn)(*states, x, jax.random.key(2))
        assert len(new_states) == n_states
        assert np.isfinite(float(m[sync_key])), (model, sync_key)


def test_parse_falls_back_to_host_cpu_plane(tmp_path):
    from benchmarks.op_profile import _parse_xspace_top_ops

    trace_dir = _write_xspace(tmp_path, [
        ("/host:CPU", [("ThunkExecutor::Execute", 10**6, 4)]),
        ("Task Environment", []),
    ])
    ops, _ = _parse_xspace_top_ops(trace_dir, top=5)
    assert ops and ops[0][0] == "ThunkExecutor::Execute"
