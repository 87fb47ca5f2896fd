"""Parallel-β Bayesian optimization (SURVEY §2.2 / BASELINE.json config 5:
"one β per chip-group"): joint constant-liar proposals, concurrent
evaluation, and device-group pinning of per-group training runs — all on
the 8-virtual-CPU-device test mesh."""

import threading

import jax
import numpy as np
import pytest

from disentangle_mlp_tpu.bo.driver import (BetaSearch, make_group_objectives,
                                           make_training_objective)
from disentangle_mlp_tpu.config import Config
from disentangle_mlp_tpu.train.loop import _setup_parallel, run_vaegan


def _seeded_search(objective=lambda b: 0.0):
    return BetaSearch(objective=objective).seed()


def test_propose_batch_distinct_and_untried():
    search = _seeded_search()
    batch = search.propose_batch(4)
    assert len(batch) == 4
    assert len(set(batch)) == 4, "constant liar must diversify proposals"
    assert not set(batch) & set(search.betas)
    assert all(search.grid_lo <= b <= search.grid_hi for b in batch)
    # the first joint proposal equals the sequential proposal
    assert batch[0] == search.propose()


def test_run_parallel_is_concurrent_and_observes_all():
    # Barrier(k): each objective blocks until ALL k run at the same time —
    # a sequential executor would deadlock (caught by the timeout).
    k = 3
    barrier = threading.Barrier(k)

    def objective(beta: float) -> float:
        barrier.wait(timeout=30)
        return 200.0 - beta  # deterministic, minimized at high beta

    search = _seeded_search()
    n0 = len(search.betas)
    result = search.run_parallel(2, [objective] * k)
    assert len(search.betas) == n0 + 2 * k
    i = int(np.argmin(search.fids))
    assert result["best_fid"] == search.fids[i]
    assert result["best_beta"] == search.betas[i]


def test_group_objectives_partition_devices():
    groups = make_group_objectives(Config(name="t"), 4)
    devs = [tuple(obj.devices) for obj in groups]
    assert all(len(g) == 2 for g in devs)
    flat = [d for g in devs for d in g]
    assert len(set(flat)) == 8, "groups must be disjoint"
    with pytest.raises(ValueError):
        make_group_objectives(Config(name="t"), 9)


def _tiny_run_cfg(tmp_path, name, **kw):
    base = dict(
        name=name, epochs=1, batch_size_train=8, batch_size_val=8,
        batch_size_test=4, n_hidden=8, img_size=32, n_z=[8, 4, 4],
        representation_size=4, head_width=32, decoder_channels=[8, 8, 8],
        disc_channels=[4, 8, 8, 8], disc_feature_dim=32,
        dtype="float32", lr=1e-3, calc_fid=False, synthetic_data=True,
        synthetic_train_size=16, num_workers=2, beta=25.0,
        save_path=str(tmp_path / "%"), log_path=str(tmp_path / "%/log"),
    )
    base.update(kw)
    return Config(**base).finalize()


def test_setup_parallel_pins_explicit_group(tmp_path):
    cfg = _tiny_run_cfg(tmp_path, "pin")
    group = jax.devices()[4:]
    mesh, sharding = _setup_parallel(cfg, devices=group)
    assert mesh is not None
    assert list(mesh.devices.flat) == group
    assert set(sharding.mesh.devices.flat) == set(group)
    # an explicit 1-device group still gets a pinning mesh
    mesh1, _ = _setup_parallel(cfg, devices=jax.devices()[3:4])
    assert mesh1 is not None and mesh1.devices.size == 1


def test_concurrent_group_runs_end_to_end(tmp_path):
    """Two full run_vaegan trainings on disjoint 4-device groups, driven
    concurrently from two threads (exactly what run_parallel does via
    make_training_objective(devices=...))."""
    devs = jax.devices()
    results, errors = {}, []

    def worker(idx, group):
        try:
            cfg = _tiny_run_cfg(tmp_path, f"grp{idx}")
            results[idx] = run_vaegan(cfg, devices=group)
        except Exception as e:  # surfaces in the main thread's assert
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(i, devs[i * 4:(i + 1) * 4]))
               for i in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert not errors, errors
    assert set(results) == {0, 1}
    for r in results.values():
        assert np.isfinite(r["Avg Eec Loss"])
        assert np.isfinite(r["Avg Dis Loss"])


def test_training_objective_exposes_devices():
    group = jax.devices()[:2]
    obj = make_training_objective(Config(name="t"), devices=group)
    assert obj.devices == group


def test_beta_run_config_unique_dirs_after_finalize(tmp_path):
    """Regression (round-2 review): a FINALIZED base config (the CLI path)
    must still give every β — and every concurrent group — its own
    checkpoint/log/FID tree; previously all runs shared base_cfg's dirs."""
    from disentangle_mlp_tpu.bo.driver import beta_run_config

    base = Config(name="bo", save_path=str(tmp_path / "%"),
                  log_path=str(tmp_path / "%/log")).finalize(make_dirs=False)
    c25 = beta_run_config(base, 25.0, epochs=1)
    c75 = beta_run_config(base, 75.0, epochs=1)
    assert c25.save_path != c75.save_path != base.save_path
    assert c25.model_path != c75.model_path
    assert c25.log_path != c75.log_path
    assert c25.fid_path_recons != c75.fid_path_recons
    assert c25.epochs == 1 and c25.beta == 25.0

    # un-finalized base keeps plain %-templating
    raw = Config(name="bo", save_path=str(tmp_path / "raw" / "%"),
                 log_path=str(tmp_path / "raw" / "%/log"))
    r25 = beta_run_config(raw, 25.0)
    assert r25.save_path == str(tmp_path / "raw" / "bo_beta25")


def test_setup_parallel_rejects_nondividing_explicit_group(tmp_path):
    """Regression (round-2 review): an explicit group whose size doesn't
    divide the batch must raise, not silently unpin onto the default
    device."""
    cfg = _tiny_run_cfg(tmp_path, "nd", batch_size_train=6)
    with pytest.raises(ValueError, match="divide"):
        _setup_parallel(cfg, devices=jax.devices()[:4])


def test_propose_partial_batch_then_exhaustion():
    """Advisor r2 + r3: an exhausted grid must stop the search, not
    silently propose grid[0] duplicates — but when SOME untried points
    remain, propose_batch returns the partial batch (advisor r3: the last
    budgeted grid points must still be evaluated, not discarded)."""
    from disentangle_mlp_tpu.bo.driver import GridExhausted

    search = BetaSearch(objective=lambda b: 0.0, grid_lo=1.0, grid_hi=4.0,
                        grid_step=1.0)
    search.seed(((1.0, 10.0), (2.0, 11.0)))
    batch = search.propose_batch(3)  # only 2 untried points remain
    assert sorted(batch) == [3.0, 4.0]  # partial, distinct, all untried
    search.observe(3.0, 9.0)
    search.observe(4.0, 9.5)
    with pytest.raises(GridExhausted):
        search.propose()
    with pytest.raises(GridExhausted):
        search.propose_batch(2)  # nothing untried at all -> raise


def test_run_parallel_observes_survivors_before_raising():
    """Advisor r2: one failing group objective must not discard the
    finished FIDs of its round-mates — they are observed (and persisted)
    before the failure re-raises."""
    search = _seeded_search()
    n0 = len(search.betas)

    def ok(beta: float) -> float:
        return 100.0

    def boom(beta: float) -> float:
        raise RuntimeError("FID degraded to N/A")

    with pytest.raises(RuntimeError, match="FID degraded"):
        search.run_parallel(1, [ok, boom])
    assert len(search.betas) == n0 + 1, "the surviving FID was observed"
    assert search.fids[-1] == 100.0
