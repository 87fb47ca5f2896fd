"""Full-size β-VAE-GAN soak on the TPU: N steps through the production
scan driver, metrics sampled every 100 steps, finiteness asserted.

Usage:  python benchmarks/soak.py [freeze_mode] [steps] [out.json] [opt_dtype]

Round 1 soaked freeze_mode='observed' for 2000 steps (SOAK_r1.json);
round 2 adds the 'intent' (true torch-freeze) production mode, which
bench.py measures at ~6.1k img/s."""

from __future__ import annotations

import json
import sys
import time


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "intent"
    total_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    out_path = sys.argv[3] if len(sys.argv) > 3 else f"SOAK_{mode.upper()}.json"
    opt_dtype = sys.argv[4] if len(sys.argv) > 4 else "float32"

    from disentangle_mlp_tpu.utils.runtime import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from disentangle_mlp_tpu.config import Config
    from disentangle_mlp_tpu.train.scan import make_multi_step
    from disentangle_mlp_tpu.train.vaegan import create_vaegan_experiment

    batch, k = 256, 20
    cfg = Config(name=f"soak_{mode}", beta=25.0, batch_size_train=batch,
                 dtype="bfloat16", lr=3e-4, freeze_mode=mode,
                 optimizer_dtype=opt_dtype)
    exp = create_vaegan_experiment(cfg, jax.random.key(0))
    multi = make_multi_step(exp.step_fn, n_states=2, donate=True)
    batches = jax.random.uniform(
        jax.random.key(100), (k, batch, 64, 64, 3), jnp.float32, -1.0, 1.0)

    eg, d = exp.eg_state, exp.d_state
    records = []
    t0 = time.perf_counter()
    seen = 0
    for step in range(0, total_steps, k):
        eg, d, m = multi(eg, d, batches, jax.random.key(step))
        seen += k
        if seen % 100 == 0:
            rec = {name: float(v[-1]) for name, v in m.items()}
            # the value fetch is also the only reliable axon sync barrier
            for name, v in rec.items():
                assert v == v, f"{name} went NaN at step {seen}"
            rec["step"] = seen
            rec["img_per_sec"] = seen * batch / (time.perf_counter() - t0)
            records.append(rec)
            print(f"step {seen}: recon={rec['recon_enc']:.0f} "
                  f"D_x={rec['D_x']:.3f} kld={rec['kld']:.1f} "
                  f"({rec['img_per_sec']:.0f} img/s incl. compile)",
                  flush=True)

    with open(out_path, "w") as f:
        json.dump(records, f, indent=1)
    print(f"soak({mode}, {total_steps} steps): OK → {out_path}")


if __name__ == "__main__":
    main()
