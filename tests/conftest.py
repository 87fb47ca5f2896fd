"""Test env: force CPU with 8 virtual XLA devices so data-parallel sharding
is exercised without TPU hardware (SURVEY.md §4). Must run before jax import."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import pytest  # noqa: E402

# The axon TPU plugin ignores the JAX_PLATFORMS env var; force CPU here.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# ---------------------------------------------------------------------------
# Fast/slow test tiers (VERDICT r4 #8). The full suite takes ~20-30 min on
# this 1-CPU host; round-close windows need a cheap re-verify. The tests
# below dominated a full --durations run (r5, contended walls in
# parentheses); everything else forms the fast tier:
#
#     python -m pytest tests/ -m "not slow" -x -q     # fast tier, <5 min
#     python -m pytest tests/ -x -q                   # full suite, unchanged
#
# Central table (not per-file decorators) so the tier stays auditable
# against the measured durations in one place.
SLOW_FILES = {
    "test_multiprocess.py",      # 317+243+90 s: real multi-process pods
}
SLOW_TESTS = {
    "test_reproduction_calibration_falls_back_on_empty_split",  # 90 s
    "test_reproduction_pipeline_synthetic",                     # 25 s
    "test_dryrun_multichip_bootstraps_from_one_device",         # 81 s
    "test_async_run_matches_inline",                            # 66 s
    "test_fid_save_samples_off_skips_files_not_score",          # 2×18 s
    "test_vaegan_loss_curve_falls",                             # 62 s
    "test_grouped_bn_threads_through_models",                   # 44 s
    "test_fid_bf16_vs_f32_delta_is_bounded",                    # 37 s
    "test_pool3_matches_torch_on_production_resize_path",       # 20 s
    "test_get_fid_npz_and_dir",                                 # 32 s
    "test_birds_train_step_smoke",                              # 21 s
    "test_birds_generator_and_discriminator",                   # 21 s
    "test_vaegan_trajectory_matches_torch",                     # 2×~15 s
    "test_vaegan_trajectory_matches_torch_bn_groups2",          # 13 s
    "test_fid_detects_distribution_shift",                      # 13 s
    "test_concurrent_group_runs_end_to_end",                    # 12 s
    "test_parse_prefers_device_plane_and_aggregates",           # 12 s
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        base = item.name.split("[")[0]
        if item.fspath.basename in SLOW_FILES or base in SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
