"""Process-level runtime setup for TPU execution.

Compilation of the big jitted programs (3-phase train step, InceptionV3)
costs minutes over a tunneled TPU; the persistent compilation cache makes
every process after the first start in seconds. Called by every CLI
entrypoint and bench.py.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str = "") -> None:
    import jax

    cache_dir = path or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.expanduser("~/.cache/disentangle_mlp_tpu/xla_cache"))
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without these flags


def setup(profile_dir: str = "") -> None:
    enable_compilation_cache()
    if profile_dir:
        import jax
        os.makedirs(profile_dir, exist_ok=True)
        jax.profiler.start_trace(profile_dir)


def teardown(profile_dir: str = "") -> None:
    if profile_dir:
        import jax
        jax.profiler.stop_trace()
