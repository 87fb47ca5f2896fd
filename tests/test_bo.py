"""GP/EI Bayesian-optimization tests (reference: final_bo.py:24-77).
Golden check: our GP posterior with the reference's kernel (ℓ=30, σ_f=50)
and its five hand-entered observations reproduces the reference script's
posterior-mean computation exactly."""

import numpy as np

from disentangle_mlp_tpu.bo.driver import (REFERENCE_OBSERVATIONS, BetaSearch)
from disentangle_mlp_tpu.bo.gp import (GaussianProcess, expected_improvement,
                                       rbf_kernel)


def _reference_posterior_mean(x_rest, x_locs, f_locs):
    """Direct transcription of the posterior-mean math (final_bo.py:44-57):
    mu = K(rest, locs) @ solve(K(locs, locs), f)."""
    k = lambda a, b: rbf_kernel(a, b, 30.0, 50.0)
    K_locs = k(x_locs, x_locs)
    K_rest_locs = k(x_rest, x_locs)
    return K_rest_locs @ np.linalg.solve(K_locs, f_locs)


def test_gp_matches_reference_posterior():
    x_locs = np.array([1, 50, 75, 100, 150], np.float64)
    f_locs = np.array([139.33, 147.92, 126.75, 137.98, 151.08])
    grid = np.delete(np.arange(1.0, 151.0), x_locs.astype(int) - 1)

    ref_mu = _reference_posterior_mean(grid, x_locs, f_locs)

    gp = GaussianProcess(ell=30.0, sigma_f=50.0).fit(x_locs, f_locs)
    # zero-mean GP like the reference: subtract the fitted mean shift
    gp2 = GaussianProcess(ell=30.0, sigma_f=50.0)
    gp2._y_mean = 0.0
    gp2.x_train = x_locs
    gp2.y_train = f_locs
    k = gp2.kernel(x_locs, x_locs)
    k[np.diag_indices_from(k)] += gp2.jitter
    gp2._chol = np.linalg.cholesky(k)
    gp2._alpha = np.linalg.solve(gp2._chol.T,
                                 np.linalg.solve(gp2._chol, f_locs))
    mu, _ = gp2.predict(grid)
    np.testing.assert_allclose(mu, ref_mu, rtol=1e-6, atol=1e-6)

    # the mean-centered GP interpolates the observations
    mu_t, sd_t = gp.predict(x_locs)
    np.testing.assert_allclose(mu_t, f_locs, atol=1e-4)
    assert np.all(sd_t < 1e-2)


def test_ei_prefers_low_mean_high_uncertainty():
    gp = GaussianProcess(ell=10.0, sigma_f=5.0).fit(
        np.array([0.0, 100.0]), np.array([10.0, 0.0]))
    grid = np.arange(0.0, 101.0)
    ei = expected_improvement(gp, grid)
    assert ei.shape == grid.shape
    assert np.all(ei >= 0.0)
    # EI at the already-observed best point is ~0; far from data it's larger
    assert ei[-1] < 1e-6
    assert ei[50] > ei[-1]


def test_beta_search_loop_converges_on_toy_objective():
    # toy FID landscape with minimum at beta=70
    calls = []

    def objective(beta):
        calls.append(beta)
        return 100.0 + 0.01 * (beta - 70.0) ** 2

    search = BetaSearch(objective=objective).seed()
    result = search.run(n_iterations=5)
    assert len(calls) == 5
    assert result["best_fid"] <= min(f for _, f in REFERENCE_OBSERVATIONS)
    assert 40.0 <= result["best_beta"] <= 100.0


def test_beta_search_never_repeats(tmp_path):
    def objective(beta):
        return float(beta)  # monotone: min at the low edge

    search = BetaSearch(objective=objective,
                        log_path=str(tmp_path / "bo.json")).seed()
    search.run(n_iterations=4)
    assert len(set(search.betas)) == len(search.betas)


def test_bo_report_written_when_search_dies_midway(tmp_path, monkeypatch):
    """Regression (review r4): a failed evaluation late in the search must
    not discard the report — completed train→FID cycles are hours of chip
    time. The CLI writes a partial report (cycles + best-so-far + error)
    and re-raises."""
    import json

    import pytest

    from disentangle_mlp_tpu.cli import bo as cli_bo

    def fake_make_objective(cfg, epochs):
        def objective(beta):
            if objective.n >= 2:
                raise RuntimeError("chip died")
            objective.n += 1
            return 100.0 + float(beta)
        objective.n = 0
        return objective

    monkeypatch.setattr(cli_bo, "make_training_objective",
                        fake_make_objective)
    report_path = tmp_path / "BO_RUN.json"
    with pytest.raises(RuntimeError, match="chip died"):
        cli_bo.main([
            "--name", "bo_partial", "--posterior_only", "False",
            "--bo_iterations", "5", "--bo_report", str(report_path),
            "--save_path", str(tmp_path / "%"),
            "--log_path", str(tmp_path / "%/log"),
        ])
    rep = json.loads(report_path.read_text())
    assert rep["partial"] is True
    assert "chip died" in rep["error"]
    assert len(rep["cycles"]) == 2  # the evaluations that DID complete
    assert rep["best_fid"] == min(c["fid"] for c in rep["cycles"])
    assert rep["best_beta"] in [c["beta"] for c in rep["cycles"]]
