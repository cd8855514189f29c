"""Executor smoke tests: tiny configs end-to-end, artifact existence."""

import os

import numpy as np
import pandas as pd
import pytest

from dnnpde_tpu.experiments import (
    CorrExecutor,
    HestonExecutor,
    HJBExecutor,
    SensitivityExecutor,
    SweepConfig,
    TestCaseExecutor,
    TrainingExecutor,
)
from dnnpde_tpu.pde import CallOption1D

TINY = dict(
    Ms=(8,), Ds=(3,), N=4,
    lr_pairs=((1e-3, 1e-4),), iter_pairs=((6, 2),),
    optimizers=("Adam",), modes=("FC",), activations=("Sine",),
    hidden=(16, 16, 16, 16),
)


@pytest.mark.slow  # heaviest executor integrations; hjb/testcase/sensitivity stay in the fast tier
def test_training_executor(tmp_path):
    rep = TrainingExecutor(SweepConfig(**TINY), str(tmp_path)).execute()
    df = pd.read_csv(tmp_path / "results.csv")
    assert len(df) == 1
    for col in ("RMSE", "Min Loss", "Exact Price", "Learned Price",
                "Mean Spectral Radius", "Total Run Time"):
        assert np.isfinite(df.loc[0, col]), col
    # quality columns present on EVERY executor row (VERDICT r2 #2): an
    # undertrained 6-iteration run must be flagged, not silently recorded
    assert np.isfinite(df.loc[0, "Relative Error"])
    assert df.loc[0, "Quality Flag"] in ("ok", "off_oracle", "degenerate")
    assert any(f.endswith(".png") for f in os.listdir(tmp_path))


def test_training_executor_ema_protocol(tmp_path):
    """SweepConfig(ema_decay=...) evaluates predictions from the EMA shadow
    (the round-2-measured protocol improvement, now first-class in sweeps)."""
    cfg = SweepConfig(**{**TINY, "ema_decay": 0.9})
    TrainingExecutor(cfg, str(tmp_path)).execute()
    df = pd.read_csv(tmp_path / "results.csv")
    assert len(df) == 1 and np.isfinite(df.loc[0, "Learned Price"])


@pytest.mark.slow
def test_corr_executor(tmp_path):
    rep = CorrExecutor(
        SweepConfig(**TINY), str(tmp_path),
        correlation_types=("no_correlation", "random_correlation"),
    ).execute()
    df = pd.read_csv(tmp_path / "results_corr.csv")
    assert len(df) == 2
    assert set(df["Correlation"]) == {"no_correlation", "random_correlation"}
    assert np.isfinite(df["MC Standard Error"]).all()
    assert os.path.exists(tmp_path / "CorrErrorHeatmap.png")


def test_testcase_executor(tmp_path):
    rep = TestCaseExecutor(SweepConfig(**TINY), str(tmp_path)).execute()
    df = pd.read_csv(tmp_path / "results_testcase.csv")
    assert len(df) == 1
    assert np.isfinite(df.loc[0, "rmse"])
    assert df.loc[0, "exact_y0"] > 0


def test_hjb_executor(tmp_path):
    cfg = SweepConfig(**{**TINY, "Ds": (5,)})
    rep = HJBExecutor(cfg, str(tmp_path)).execute()
    df = pd.read_csv(tmp_path / "results_hjb.csv")
    assert len(df) == 1
    assert np.isfinite(df.loc[0, "relative_error"])
    assert df.loc[0, "exact_u0"] > 0  # MC oracle of log(1/2 + |X|^2/2) at X~N


@pytest.mark.slow
def test_heston_executor(tmp_path):
    rep = HestonExecutor(
        Ms=(4,), N=4, n_iter=(6, 2), save_path=str(tmp_path), mode="FC",
    ).execute()
    df = pd.read_csv(tmp_path / "results_heston.csv")
    assert len(df) == 1
    assert df.loc[0, "exact_y0"] == pytest.approx(0.1984, abs=2e-3)
    assert np.isfinite(df.loc[0, "final_l2_error"])
    assert "degenerate" in df.columns
    # triple-oracle cross-check table is written alongside the sweep
    cc = pd.read_csv(tmp_path / "heston_oracle_cross_check.csv")
    assert cc.loc[0, "closed_form"] == pytest.approx(0.1984, abs=2e-3)
    for col in ("mc_milstein_reflection", "mc_euler_truncation_ii"):
        assert cc.loc[0, col] == pytest.approx(
            cc.loc[0, "closed_form"], abs=4 * cc.loc[0, "mc_ii_se"] + 5e-3
        )


@pytest.mark.slow
def test_heston_executor_flags_clamp_pinned_run(tmp_path, monkeypatch):
    """A run whose Y0 never leaves the output clamp (the dead-net collapse
    observed at M=2 with clamp_u=0) must be flagged degenerate."""
    ex = HestonExecutor(Ms=(2,), N=4, n_iter=(4, 2), save_path=str(tmp_path))

    import dnnpde_tpu.experiments.executors as exmod

    orig = exmod._train_two_phase

    def fake_two_phase(trainer, lrs, n_iter, opt):
        r1, r2 = orig(trainer, lrs, n_iter, opt)
        trainer.y0_log = [0.0] * len(trainer.y0_log)  # pinned at the clamp
        return r1, r2

    monkeypatch.setattr(exmod, "_train_two_phase", fake_two_phase)
    ex.execute()
    df = pd.read_csv(tmp_path / "results_heston.csv")
    assert bool(df.loc[0, "degenerate"]) is True


def test_sensitivity_executor():
    scores = SensitivityExecutor(
        CallOption1D(D=1), M=4, N=3, iter_scale=2e-4,  # ~2-5 real iters
    ).execute(num_real_samples=2, num_simulated_samples=100)
    assert set(scores) == {
        "initial_lr", "fine_tuning_lr", "initial_n_iter", "fine_tuning_n_iter",
    }
    assert all(np.isfinite(v) for v in scores.values())


def test_heston_surface_executor(tmp_path):
    """Tiny end-to-end run of the round-4 surface driver: smile + greeks
    rows with quality flags, smile PNG + learned-surface PNG written.
    (The measured full-size protocol lives in scripts/studies_r4.py /
    results_r4/bigcfg_local_bs.log — 0.13-0.16 volpts.)"""
    from dnnpde_tpu.experiments import HestonSurfaceExecutor, SurfaceConfig

    cfg = SurfaceConfig(
        M=8, N=4, width=16, depth=2, budget=8, x0_scale=0.3,
        x0_scale_v=0.6,  # per-coordinate v-widening path (VERDICT r4 #5)
        strikes=(0.9, 1.0, 1.1), smile_t_evals=(0.0, 0.5),
        t_evals=(0.0, 0.5), s_grid=(0.7, 1.4, 15), seed=0,
    )
    rep = HestonSurfaceExecutor(cfg, str(tmp_path)).execute()
    df = pd.read_csv(tmp_path / "results_heston_surface.csv")
    smile = df[df["kind"] == "iv_smile"]
    greeks = df[df["kind"] == "greeks"]
    surf2d = df[df["kind"] == "surface2d"]
    assert len(smile) == 2 and len(greeks) == 2  # term structure: t=0, 0.5
    assert set(smile["t"]) == {0.0, 0.5}
    assert np.isfinite(smile["mean_abs_iv_err_volpts"]).all()
    assert set(greeks["t"]) == {0.0, 0.5}
    assert np.isfinite(greeks["price_rel_l2"]).all()
    assert len(surf2d) == 2  # full (S, v) grade per grading time
    assert np.isfinite(surf2d["price2d_rel_l2"]).all()
    assert np.isfinite(surf2d["vega_rel_l2"]).all()
    assert "ok" in df.columns
    assert os.path.exists(tmp_path / "HestonSurface_iv_smile.png")
    assert os.path.exists(tmp_path / "HestonSurfaceLearned_surfaces.png")


def test_heston_surface_executor_discrete_oracle(tmp_path):
    """discrete_oracle_paths > 0 adds the vs-discrete smile columns."""
    from dnnpde_tpu.experiments import HestonSurfaceExecutor, SurfaceConfig

    cfg = SurfaceConfig(
        M=8, N=3, width=16, depth=2, budget=4, x0_scale=0.3,
        strikes=(0.95, 1.05), t_evals=(0.5,), s_grid=(0.8, 1.3, 11),
        discrete_oracle_paths=256,
    )
    rep = HestonSurfaceExecutor(cfg, str(tmp_path)).execute()
    df = pd.read_csv(tmp_path / "results_heston_surface.csv")
    smile = df[df["kind"] == "iv_smile"].iloc[0]
    assert np.isfinite(smile["mean_abs_iv_err_vs_discrete_volpts"])
