"""A/B the FID pool3 extraction dtype on the real chip: float32 (the
round-3 production default) vs bfloat16 (the opt-in), on identical samples.

Reports (one JSON line):
- per-1000-image extraction wall time for each dtype (best of 3 interleaved
  windows — the tunneled chip's delivered rate drifts, README_PERF),
- the FID delta between dtypes on the same 1000-sample set scored against
  the same reference statistics.

With the pt_inception weights absent (this machine) the network is the
seeded random fallback — the FID scale is then arbitrary but the DELTA
between dtypes on the identical graph is still the quantity of interest
(VERDICT r2 weak #1). Re-run when real weights land for the final word.
"""

from __future__ import annotations

import json
import time


def main() -> None:
    from disentangle_mlp_tpu.utils.runtime import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from disentangle_mlp_tpu.eval.fid import (activation_statistics,
                                              frechet_distance,
                                              get_activations,
                                              inception_is_pretrained,
                                              per_image_normalize)

    n = 1000
    # synthetic "decoded samples" in [-1,1], device-resident like the
    # production per-epoch path
    samples = jax.random.uniform(jax.random.key(0), (n, 64, 64, 3),
                                 jnp.float32, -1.0, 1.0)
    ref = jax.random.uniform(jax.random.key(1), (n, 64, 64, 3),
                             jnp.float32, 0.0, 1.0)
    imgs = per_image_normalize(samples)

    m2, s2 = activation_statistics(get_activations(np.asarray(ref),
                                                   dtype="float32"))

    out = {"pretrained_weights": inception_is_pretrained(), "n": n}
    acts = {}
    times = {"float32": [], "bfloat16": []}
    for dt in times:  # warmup/compile
        acts[dt] = get_activations(imgs, dtype=dt)
    for _ in range(3):
        for dt in times:  # interleaved windows
            t0 = time.perf_counter()
            acts[dt] = get_activations(imgs, dtype=dt)
            times[dt].append(time.perf_counter() - t0)
    for dt, ts in times.items():
        out[f"extract_s_{dt}"] = round(min(ts), 3)
        m1, s1 = activation_statistics(acts[dt])
        out[f"fid_{dt}"] = round(frechet_distance(m1, s1, m2, s2), 4)
    out["fid_delta"] = round(abs(out["fid_bfloat16"] - out["fid_float32"]), 4)
    out["extract_slowdown_f32"] = round(
        out["extract_s_float32"] / out["extract_s_bfloat16"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
