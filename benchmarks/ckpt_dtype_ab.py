"""A/B: --checkpoint_save_dtype bfloat16 vs float32 (VERDICT r3 #6).

The full-size β-VAE-GAN state is ~1.3 GB and the per-epoch device→host
checkpoint fetch has wedged the tunnel for 30+ minutes (README_PERF
round-3 note). Storing the Adam moments (2/3 of the state) in bf16 cuts
the fetch and the file by ~⅓. This harness measures, in ONE process with
interleaved windows (chip/tunnel drift — README_PERF methodology):

- device→host fetch + serialize + write wall time per mode,
- on-disk size per mode,
- restore parity: a bf16-saved checkpoint restores into the f32
  experiment and the next train step stays finite.

    python -m benchmarks.ckpt_dtype_ab --out CKPT_DTYPE_AB_r4.json
"""

from __future__ import annotations

import argparse
import json
import os
import tempfile
import time


def main(argv=None):
    from disentangle_mlp_tpu.utils.runtime import enable_compilation_cache
    enable_compilation_cache()

    ap = argparse.ArgumentParser()
    ap.add_argument("--windows", type=int, default=3)
    ap.add_argument("--out", default="CKPT_DTYPE_AB_r4.json")
    ns = ap.parse_args(argv)

    # host-idleness guard (VERDICT r4 #7): on this 1-CPU host a
    # concurrent heavy process invalidates interleaved A/Bs (ROUND4.md);
    # DMT_LOAD_LIMIT overrides the threshold if a stamped-but-contested
    # run is explicitly wanted.
    from benchmarks.hostcheck import host_idle_check
    idle = host_idle_check(refuse=True)

    import jax
    import jax.numpy as jnp

    from disentangle_mlp_tpu.config import Config
    from disentangle_mlp_tpu.train.vaegan import create_vaegan_experiment
    from disentangle_mlp_tpu.utils.checkpoint import (load_checkpoint,
                                                      save_checkpoint)

    B = 256
    cfg = Config(name="ckab", beta=25.0, batch_size_train=B,
                 dtype="bfloat16", lr=3e-4)
    exp = create_vaegan_experiment(cfg, jax.random.key(0))
    x = jax.random.uniform(jax.random.key(1), (B, 64, 64, 3),
                           jnp.float32, -1.0, 1.0)
    eg, d, m = exp.train_step(exp.eg_state, exp.d_state, x,
                              jax.random.key(2))
    float(m["recon_enc"])  # sync (axon: scalar fetch is the barrier)
    states = {"eg": eg, "d": d}

    tmp = tempfile.mkdtemp(prefix="ckab_")
    times = {"float32": [], "bfloat16": []}
    sizes = {}
    for w in range(ns.windows):
        for mode in ("float32", "bfloat16"):  # interleaved within window
            path = os.path.join(tmp, f"ck_{mode}_{w}")
            t0 = time.perf_counter()
            save_checkpoint(path, 1, states,
                            opt_state_dtype=(None if mode == "float32"
                                             else mode))
            times[mode].append(time.perf_counter() - t0)
            sizes[mode] = os.path.getsize(path)
            if w:  # keep one file per mode; drop repeats
                os.unlink(path)

    # restore parity: bf16-saved -> f32 experiment -> finite next step
    exp2 = create_vaegan_experiment(cfg, jax.random.key(9))
    epoch, restored = load_checkpoint(
        os.path.join(tmp, "ck_bfloat16_0"),
        {"eg": exp2.eg_state, "d": exp2.d_state})
    eg2, d2, m2 = exp2.train_step(restored["eg"], restored["d"], x,
                                  jax.random.key(3))
    resumed = float(m2["recon_enc"])

    report = {
        "host_load": idle,
        "state_bytes_f32": sizes["float32"],
        "state_bytes_bf16": sizes["bfloat16"],
        "size_ratio": sizes["bfloat16"] / sizes["float32"],
        "save_s_f32": [round(t, 3) for t in times["float32"]],
        "save_s_bf16": [round(t, 3) for t in times["bfloat16"]],
        "save_s_f32_best": min(times["float32"]),
        "save_s_bf16_best": min(times["bfloat16"]),
        "fetch_speedup": min(times["float32"]) / min(times["bfloat16"]),
        "resume_recon_enc_finite": resumed == resumed,
        "note": "interleaved windows, one process; save = device fetch + "
                "msgpack serialize + atomic write",
    }
    with open(ns.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({k: report[k] for k in
                      ("state_bytes_f32", "state_bytes_bf16",
                       "save_s_f32_best", "save_s_bf16_best",
                       "fetch_speedup")}))
    print(f"report → {ns.out}")


if __name__ == "__main__":
    main()
