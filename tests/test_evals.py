"""Evaluation-layer tests: predictions, metrics, stability, sensitivity,
plots, reports."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dnnpde_tpu.evals import (
    ConvergenceAnalysis,
    FastSensitivityAnalysis,
    PredictionGenerator,
    ResultsReport,
    SensitivityAnalyzer,
    StabilityCheck,
    TrainingPlot,
    error_stats,
    hsic_rbf,
    relative_l2_error,
    simulate_performance,
    spearman_rank_correlation,
)
from dnnpde_tpu.pde import BlackScholesBarenblatt
from dnnpde_tpu.train import Trainer


@pytest.fixture(scope="module")
def small_trainer():
    prob = BlackScholesBarenblatt(D=3)
    tr = Trainer(prob, M=8, N=4, layers=[4, 16, 16, 16, 16, 1], seed=0)
    tr.train(10, 1e-3, log_every=10, verbose=False)
    return tr


def test_prediction_generator_shapes(small_trainer):
    gen = PredictionGenerator(small_trainer, num_samples=3, seed=37)
    res = gen.generate_predictions()
    M, N, D = 8, 4, 3
    assert res.t_test.shape == (3 * M, N + 1, 1)
    assert res.X_pred.shape == (3 * M, N + 1, D)
    assert res.Y_pred.shape == (3 * M, N + 1, 1)
    assert res.W_test.shape == (M, N + 1, D)
    # deterministic per seed
    res2 = PredictionGenerator(small_trainer, num_samples=3, seed=37).generate_predictions()
    np.testing.assert_allclose(res.Y_pred, res2.Y_pred)


def test_error_stats_and_l2():
    pred = np.array([1.0, 2.0, 3.0])
    exact = np.array([1.0, 2.0, 5.0])
    stats = error_stats(pred, exact)
    assert stats["mean_error"] == pytest.approx(4 / 3)
    assert stats["rmse"] == pytest.approx(np.sqrt(4 / 3))
    assert relative_l2_error(pred, exact) == pytest.approx(2 / np.sqrt(30))


def test_convergence_analysis_decreasing():
    exact = np.ones(10)
    preds = [exact + 1 / (k + 1) for k in range(5)]
    errs = ConvergenceAnalysis(preds, exact).calculate_errors()
    for key in ("L1", "L2", "Linf"):
        assert (np.diff(errs[key]) < 0).all()


def test_stability_perturbation_monotone_tendency(small_trainer):
    check = StabilityCheck(
        small_trainer, perturbation_range=[0.0, 0.2, 0.8], num_points=16
    )
    errors = check.run_perturbation_analysis()
    assert len(errors) == 3
    assert errors[0] == pytest.approx(0.0, abs=1e-6)  # zero perturbation
    assert errors[-1] > errors[0]


def test_stability_spectral_radius(small_trainer):
    check = StabilityCheck(small_trainer, num_points=16)
    radii = check.evaluate_stability()
    assert radii.shape == (16,)
    assert (radii >= 0).all()
    pct = check.stable_percentage(radii)
    assert 0.0 <= pct <= 100.0
    # spectral radius of 1xD jacobian == gradient norm: cross-check one point
    X = np.zeros((1, 3), np.float32)
    _, Z = small_trainer.net_u(small_trainer.params, jnp.zeros((1, 1)), jnp.asarray(X))
    assert float(np.linalg.norm(np.asarray(Z))) == pytest.approx(
        float(check.spectral_radii(X)[0]), rel=1e-5
    )


def test_jacobian_surface_shape(small_trainer):
    surf = StabilityCheck(small_trainer).jacobian_surface(
        np.linspace(0, 1, 4), np.linspace(0.5, 1.5, 5)
    )
    assert surf.shape == (4, 5)
    assert np.isfinite(surf).all()


def test_hsic_detects_dependence():
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, 200)
    y_dep = x**2 + 0.01 * rng.standard_normal(200)
    y_indep = rng.standard_normal(200)
    assert hsic_rbf(x, y_dep) > 5 * hsic_rbf(x, y_indep)


def test_spearman_rank_correlation():
    x = np.arange(50, dtype=float)
    assert spearman_rank_correlation(x, x) == pytest.approx(1.0)
    assert spearman_rank_correlation(x, -x) == pytest.approx(-1.0)


def test_sensitivity_analyzer_ranks_lr_highest():
    """The synthetic performance model is dominated by initial_lr
    (coefficient −20 vs −10 vs 2 vs 1): HSIC must rank it in the top two."""
    rng = np.random.default_rng(1)
    results = []
    for _ in range(200):
        hp = {
            "initial_lr": 10 ** rng.uniform(-6, -2),
            "fine_tuning_lr": 10 ** rng.uniform(-7, -3),
            "initial_n_iter": float(rng.integers(5000, 30000)),
            "fine_tuning_n_iter": float(rng.integers(1000, 6000)),
        }
        perf = float(
            simulate_performance({k: np.asarray(v) for k, v in hp.items()}, rng)
        )
        results.append({"hyperparams": hp, "performance": perf})
    scores, _, _ = SensitivityAnalyzer().analyze(results)
    ranked = sorted(scores, key=scores.get, reverse=True)
    assert "initial_lr" in ranked[:2]


def test_fast_sensitivity_runs():
    out = FastSensitivityAnalysis(num_samples=200, seed=0).run()
    assert set(out) == {"hsic", "rank_correlation", "permutation_importance"}
    for d in out.values():
        assert set(d) == {
            "initial_lr",
            "fine_tuning_lr",
            "initial_n_iter",
            "fine_tuning_n_iter",
        }


def test_plots_write_pngs(tmp_path, small_trainer):
    tp = TrainingPlot(str(tmp_path))
    graph = np.array([[0, 100, 200], [10.0, 5.0, 2.0]])
    p1 = tp.plot_training_loss(graph, "FC", "Sine", "Adam")
    gen = PredictionGenerator(small_trainer, num_samples=2)
    res = gen.generate_predictions()
    p2 = tp.plot_prediction(res.t_test, res.Y_pred, "FC", "Sine", "Adam")
    exact = np.ones_like(res.Y_pred[:, :, 0])
    p3 = tp.plot_exact_vs_learned(res.t_test, res.Y_pred, exact, "FC", "Sine", "Adam")
    p4 = tp.plot_y0_evolution([0, 100], [1.0, 1.1], exact_y0=1.05)
    p5 = tp.plot_stability([0.0, 0.1], {"FC-Sine": [0.0, 0.05]}, "Adam")
    p6 = tp.plot_spectral_radius({"FC-Sine": np.array([0.5, 0.8, 1.2])}, "Adam")
    p7 = tp.plot_error_heatmap(np.random.rand(2, 3), ["a", "b"], ["x", "y", "z"])
    p8 = tp.plot_convergence({"L2": np.array([1.0, 0.5, 0.2])})
    S = np.linspace(0.5, 1.5, 4)
    V = np.linspace(0.05, 0.5, 3)
    grid = np.random.rand(4, 3)
    p9 = tp.plot_heston_surfaces(S, V, grid, grid, grid)
    import os

    for p in (p1, p2, p3, p4, p5, p6, p7, p8, p9):
        assert os.path.exists(p) and os.path.getsize(p) > 0


def test_results_report_csv(tmp_path):
    from dnnpde_tpu.evals import RESULT_COLUMNS

    rep = ResultsReport(columns=RESULT_COLUMNS)
    rep.add_row(**{"Batch Size": 100, "Dimensions": 10, "RMSE": 0.1})
    path = rep.to_csv(str(tmp_path / "results.csv"))
    import pandas as pd

    df = pd.read_csv(path)
    assert df.loc[0, "Batch Size"] == 100
    assert "Mean Spectral Radius" in df.columns


def test_spherical_surface_plot(tmp_path):
    tp = TrainingPlot(str(tmp_path))
    path = tp.plot_spherical_surface(
        {"FC-Sine": np.random.default_rng(0).uniform(0.2, 1.4, 50)}, "Adam"
    )
    import os

    assert os.path.getsize(path) > 0


def test_profile_trace_smoke(tmp_path):
    from dnnpde_tpu.train import profile_trace
    import jax.numpy as jnp

    with profile_trace(str(tmp_path)):
        jax.jit(lambda x: x * 2)(jnp.ones(8)).block_until_ready()
    # trace files written
    import os

    found = any(f for _, _, fs in os.walk(tmp_path) for f in fs)
    assert found


def test_learned_price_surface(small_trainer):
    from dnnpde_tpu.evals import learned_price_surface

    grid = learned_price_surface(
        small_trainer, np.linspace(0.5, 1.5, 5), np.linspace(0.0, 1.0, 4)
    )
    assert grid.shape == (4, 5)
    assert np.isfinite(grid).all()


def test_smoothed_jacobian_surface_shape_and_finiteness():
    """Gaussian-smooth + cubic-upsample pipeline (reference
    1d_BSPDE_case.py:953-969) returns a finite upsampled grid."""
    from dnnpde_tpu.evals import StabilityCheck
    from dnnpde_tpu.pde import CallOption1D
    from dnnpde_tpu.train import Trainer

    tr = Trainer(CallOption1D(D=1), M=8, N=3, layers=[2, 16, 16, 1], seed=0)
    tr.train(2, 1e-3, log_every=2, verbose=False)
    stab = StabilityCheck(tr, perturbation_range=[0.0])
    t_up, s_up, Z = stab.smoothed_jacobian_surface(
        np.linspace(0, 1, 6), np.linspace(0.5, 1.5, 6), upsample=40
    )
    assert Z.shape == (40, 40)
    assert np.isfinite(Z).all()
    assert t_up.shape == (40,) and s_up.shape == (40,)


def test_quality_row_flags():
    """Shared executor run-quality columns (VERDICT r2 #2): ok / off_oracle /
    degenerate — a bad row can never be silently averaged again."""
    from dnnpde_tpu.evals import quality_row

    ok = quality_row(1.0, 1.01)
    assert ok["Quality Flag"] == "ok" and ok["Relative Error"] < 0.02
    bad = quality_row(0.079, 0.0488)  # the round-1 ReLU D=100 basket row
    assert bad["Quality Flag"] == "off_oracle"
    dg = quality_row(0.0, 0.198, degenerate=True)
    assert dg["Quality Flag"] == "degenerate"
    assert quality_row(float("nan"), 1.0)["Quality Flag"] == "degenerate"
    # threshold is configurable
    assert quality_row(1.0, 1.05, rel_threshold=0.1)["Quality Flag"] == "ok"
