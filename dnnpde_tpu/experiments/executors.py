"""Experiment drivers (L6): grid sweeps producing CSV + PNG artifacts.

Parity with the reference's ``*Executor`` classes (SURVEY.md §2.5):
- :class:`TrainingExecutor` ↔ ``TrainingExecutor.execute`` nested grid loop
  over M×D×lr×iters×optimizer×mode×activation with exact-price comparison and
  stability checks (``with_corr_high_dimension_pde.py:1103-1252``,
  ``high_dimension_test.py:1095-1249``, ``background_running.py:1176-1320``).
- :class:`CorrExecutor` ↔ correlation-type sweep with MC-price and analytical
  basket comparisons + error heatmap (``with_corr_high_dimension_pde.py:1257-1572``).
- :class:`TestCaseExecutor` ↔ BSB test case with closed-form u_exact +
  perturbation stability (``with_corr_high_dimension_pde.py:1574-1710``).
- :class:`HJBExecutor` ↔ HJB M×D sweep against the MC oracle
  (``hjb_implement.py:1042-1119``).
- :class:`HestonExecutor` ↔ Heston batch-size sweep, L2(Y0) vs closed form
  (``heston_dnnpde.py:1123-1277``).
- :class:`SensitivityExecutor` ↔ real training samples + synthetic
  augmentation → HSIC analysis (``sensitivity_analysis_trun.py:1100-1217``).

Unlike the reference (constants buried in ``__main__`` blocks, output paths
hard-coded to the author's OneDrive), every executor takes an explicit config
dataclass and an output directory.
"""

from __future__ import annotations

import dataclasses
import itertools
import time
from typing import Optional, Sequence

import jax
import numpy as np

from dnnpde_tpu.evals import (
    PredictionGenerator,
    ResultsReport,
    StabilityCheck,
    TrainingPlot,
    error_stats,
    quality_row,
    SensitivityAnalyzer,
    sample_hyperparameters,
    simulate_performance,
)
from dnnpde_tpu.evals.reports import RESULT_COLUMNS
from dnnpde_tpu.numerics import (
    basket_analytical_approx,
    basket_call_mc,
    basket_price_paths_mc,
    heston_call_price,
    HestonParams,
    hjb_exact_mc,
)
from dnnpde_tpu.pde import (
    BasketCallOption,
    BSPDETestCase,
    HamiltonJacobiBellman,
    HestonPDE,
)
from dnnpde_tpu.train import Trainer, default_layers


@dataclasses.dataclass
class SweepConfig:
    """Grid axes (reference ``__main__`` constants,
    ``with_corr_high_dimension_pde.py:1714-1755``)."""

    Ms: Sequence[int] = (100,)
    Ds: Sequence[int] = (100,)
    N: int = 50
    lr_pairs: Sequence[tuple[float, float]] = ((1e-3, 1e-5),)
    iter_pairs: Sequence[tuple[int, int]] = ((2000, 500),)
    # Optional multi-phase override: [(iters, lr), ...] replaces the
    # two-phase lr_pairs × iter_pairs grid (e.g. the measured-best
    # [(10000, 1e-3), (5000, 1e-4), (5000, 1e-5)] anneal from the round-2
    # studies). When set, lr_pairs/iter_pairs are reported as the first/last
    # phase for CSV-column compatibility.
    phases: Optional[Sequence[tuple[int, float]]] = None
    optimizers: Sequence[str] = ("Adam",)
    modes: Sequence[str] = ("Naisnet",)
    activations: Sequence[str] = ("Sine", "ReLU")
    hidden: Sequence[int] = (256, 256, 256, 256)
    seed: int = 42
    # Polyak/EMA evaluation (beyond-reference; the round-2-measured protocol
    # improvement) — when set, learned prices are read from the EMA shadow.
    ema_decay: Optional[float] = None
    # Quality-flag threshold: rows with |learned/oracle − 1| above this are
    # flagged "off_oracle" so they can't be silently averaged (VERDICT r2 #2).
    quality_rel_threshold: float = 0.02


def _train_two_phase(trainer, lr_pair, iter_pair, optimizer, phases=None):
    """Two-phase protocol (reference ``TrainingPhases``), or an arbitrary
    [(iters, lr), ...] anneal when ``phases`` is given. Returns the first
    and last phase results (the executors read .graph / .min_loss)."""
    if phases:
        results = [
            trainer.train(n, lr, optimizer, verbose=False) for n, lr in phases
        ]
        # fold every phase's min into the last result so the executors'
        # min(r1.min_loss, r2.min_loss) covers the whole anneal
        results[-1].min_loss = min(r.min_loss for r in results)
        return results[0], results[-1]
    r1 = trainer.train(iter_pair[0], lr_pair[0], optimizer, verbose=False)
    r2 = trainer.train(iter_pair[1], lr_pair[1], optimizer, verbose=False)
    return r1, r2


class TrainingExecutor:
    """Basket-call grid sweep → results.csv + plots."""

    def __init__(self, config: SweepConfig, save_path: str, problem_cls=BasketCallOption):
        self.config = config
        self.save_path = save_path
        self.problem_cls = problem_cls
        self.report = ResultsReport(columns=RESULT_COLUMNS)
        self.plot = TrainingPlot(save_path)

    def execute(self) -> "ResultsReport":
        c = self.config
        for M, D, lr, iters, opt, mode, act in itertools.product(
            c.Ms, c.Ds, c.lr_pairs, c.iter_pairs, c.optimizers, c.modes, c.activations
        ):
            tic = time.time()
            problem = self.problem_cls(D=D)
            trainer = Trainer(
                problem, M=M, N=c.N,
                layers=[D + 1, *c.hidden, 1], mode=mode, activation=act, seed=c.seed,
                ema_decay=c.ema_decay,
            )
            r1, r2 = _train_two_phase(trainer, lr, iters, opt, phases=c.phases)
            preds = PredictionGenerator(
                trainer, num_samples=4, use_ema=c.ema_decay is not None
            ).generate_predictions()

            # keep the oracle's MC standard error next to the price so a
            # reader can tell "off_oracle by 2.3%" from "oracle known to
            # ±0.4%" (the D=10 row — results_r3/basket_d10_diag.log)
            exact_price, exact_se = basket_call_mc(
                jax.random.PRNGKey(c.seed), np.ones(D), problem.strike,
                problem.T, problem.r, problem.sigma_bar, num_paths=200_000,
            )
            learned_price = float(preds.Y_pred[:, 0, 0].mean())
            stats = error_stats(preds.Y_pred[:, 0, 0], float(exact_price))
            radii = StabilityCheck(trainer, num_points=32).evaluate_stability()
            y0s = np.asarray(trainer.y0_log)
            quality = quality_row(
                learned_price, float(exact_price),
                rel_threshold=c.quality_rel_threshold,
                degenerate=bool(y0s.size) and bool(np.all(y0s == y0s[0])),
            )

            # r2.graph is cumulative across both phases (Trainer history);
            # label carries every swept axis so artifacts never collide
            label = (f"{opt}_D{D}_M{M}_lr{lr[0]:g}-{lr[1]:g}"
                     f"_it{iters[0]}-{iters[1]}")
            self.plot.plot_training_loss(r2.graph, mode, act, label)
            self.plot.plot_prediction(preds.t_test, preds.Y_pred, mode, act, label)
            self.report.add_row(**{
                "Batch Size": M, "Dimensions": D,
                "Initial LR": lr[0], "Fine Tuning LR": lr[1],
                "Initial Iters": iters[0], "Fine Tuning Iters": iters[1],
                "Optimizer": opt, "Mode": mode, "Activation": act,
                "Correlation": "no_correlation",
                **{"Mean Error": stats["mean_error"],
                   "Std Error": stats["std_error"], "RMSE": stats["rmse"]},
                "Min Loss": min(r1.min_loss, r2.min_loss),
                "Exact Price": float(exact_price),
                "Oracle SE": float(exact_se),
                "Learned Price": learned_price,
                **quality,
                "Mean Spectral Radius": float(np.mean(radii)),
                "Total Run Time": time.time() - tic,
            })
        self.report.to_csv(f"{self.save_path}/results.csv")
        return self.report


class CorrExecutor:
    """Correlated-basket sweep: NN vs MC vs analytical approximation
    (reference ``CorrExecutor``, ``with_corr_high_dimension_pde.py:1257-1572``)."""

    def __init__(
        self,
        config: SweepConfig,
        save_path: str,
        correlation_types: Sequence[str] = (
            "no_correlation", "random_correlation", "restricted_random_correlation",
        ),
    ):
        self.config = config
        self.save_path = save_path
        self.correlation_types = correlation_types
        self.report = ResultsReport(columns=RESULT_COLUMNS)
        self.plot = TrainingPlot(save_path)

    def execute(self) -> "ResultsReport":
        c = self.config
        heat = np.zeros((len(self.correlation_types), len(c.Ds)))
        for (ci, corr_type), (di, D) in itertools.product(
            enumerate(self.correlation_types), enumerate(c.Ds)
        ):
            for M, lr, iters, opt, mode, act in itertools.product(
                c.Ms, c.lr_pairs, c.iter_pairs, c.optimizers, c.modes, c.activations
            ):
                tic = time.time()
                problem = BasketCallOption(D=D)
                trainer = Trainer(
                    problem, M=M, N=c.N, layers=[D + 1, *c.hidden, 1],
                    mode=mode, activation=act, seed=c.seed,
                    correlation_type=corr_type, correlation_seed=c.seed,
                )
                r1, r2 = _train_two_phase(trainer, lr, iters, opt, phases=c.phases)
                preds = PredictionGenerator(trainer, num_samples=4).generate_predictions()

                chol = trainer.chol
                mc_price, mc_se = basket_call_mc(
                    jax.random.PRNGKey(c.seed), np.ones(D), problem.strike,
                    problem.T, problem.r, problem.sigma_bar,
                    chol=chol, num_paths=200_000,
                )
                analytical = float(basket_analytical_approx(
                    np.ones(D), problem.strike, problem.T, problem.r,
                    problem.sigma_bar, D,
                ))
                learned = float(preds.Y_pred[:, 0, 0].mean())
                stats = error_stats(preds.Y_pred[:, 0, 0], float(mc_price))
                heat[ci, di] = abs(learned - float(mc_price))
                y0s = np.asarray(trainer.y0_log)
                quality = quality_row(
                    learned, float(mc_price),
                    rel_threshold=c.quality_rel_threshold,
                    degenerate=bool(y0s.size) and bool(np.all(y0s == y0s[0])),
                )

                # NN-vs-MC intermediate price paths (reference
                # ``generate_monte_carlo_paths`` overlay plots,
                # ``with_corr_high_dimension_pde.py:1327-1351``)
                t_mc, mc_path = basket_price_paths_mc(
                    jax.random.PRNGKey(c.seed + 1), np.ones(D), problem.strike,
                    problem.T, problem.r, problem.sigma_bar, N=c.N, chol=chol,
                )
                self.plot.plot_exact_vs_learned(
                    preds.t_test[:4], preds.Y_pred[:4],
                    np.broadcast_to(np.asarray(mc_path), (4, c.N + 1)),
                    mode, act, f"{opt}_{corr_type}_D{D}",
                )

                self.report.add_row(**{
                    "Batch Size": M, "Dimensions": D,
                    "Initial LR": lr[0], "Fine Tuning LR": lr[1],
                    "Initial Iters": iters[0], "Fine Tuning Iters": iters[1],
                    "Optimizer": opt, "Mode": mode, "Activation": act,
                    "Correlation": corr_type,
                    "Mean Error": stats["mean_error"],
                    "Std Error": stats["std_error"], "RMSE": stats["rmse"],
                    "Min Loss": min(r1.min_loss, r2.min_loss),
                    "Exact Price": float(mc_price), "Learned Price": learned,
                    **quality,
                    "Analytical Price": analytical,
                    "MC Standard Error": float(mc_se),
                    "Total Run Time": time.time() - tic,
                })
        self.plot.plot_error_heatmap(
            heat, list(self.correlation_types), [str(d) for d in c.Ds],
            name="CorrErrorHeatmap",
        )
        self.report.to_csv(f"{self.save_path}/results_corr.csv")
        return self.report


class TestCaseExecutor:
    """BSB test case vs closed-form u_exact + perturbation stability
    (reference ``TestCaseExecutor``, ``with_corr_high_dimension_pde.py:1574-1710``)."""

    __test__ = False  # not a pytest class despite the name

    def __init__(self, config: SweepConfig, save_path: str):
        self.config = config
        self.save_path = save_path
        self.plot = TrainingPlot(save_path)
        self.report = ResultsReport()

    def execute(self) -> "ResultsReport":
        c = self.config
        for M, D, lr, iters, opt, mode, act in itertools.product(
            c.Ms, c.Ds, c.lr_pairs, c.iter_pairs, c.optimizers, c.modes, c.activations
        ):
            tic = time.time()
            problem = BSPDETestCase(D=D)
            trainer = Trainer(
                problem, M=M, N=c.N, layers=[D + 1, *c.hidden, 1],
                mode=mode, activation=act, seed=c.seed,
            )
            r1, r2 = _train_two_phase(trainer, lr, iters, opt, phases=c.phases)
            preds = PredictionGenerator(trainer, num_samples=4).generate_predictions()
            # corrected (3r+sigma^2) closed form (see BSPDETestCase docstring)
            Y_exact = np.asarray(problem.exact_solution(
                preds.t_test, preds.X_pred,
            ))
            stats = error_stats(preds.Y_pred, Y_exact)
            stab = StabilityCheck(trainer, perturbation_range=[0.0, 0.1, 0.3])
            rel_errors = stab.run_perturbation_analysis()
            self.plot.plot_exact_vs_learned(
                preds.t_test, preds.Y_pred, Y_exact[:, :, 0], mode, act, opt
            )
            # smoothed + cubic-upsampled Jacobian surface (reference
            # plot_jacobian_3d presentation, 1d_BSPDE_case.py:953-969)
            t_grid = np.linspace(0.0, problem.T, 12)
            s_grid = np.linspace(0.5, 1.5, 12)
            t_up, s_up, Z_up = stab.smoothed_jacobian_surface(t_grid, s_grid)
            self.plot.plot_jacobian_surface(
                t_up, s_up, Z_up, name=f"Jacobian_{mode}_{act}_{opt}"
            )
            learned_y0 = float(preds.Y_pred[:, 0, 0].mean())
            self.report.add_row(
                M=M, D=D, mode=mode, activation=act, optimizer=opt,
                **stats,
                perturbation_errors=rel_errors,
                exact_y0=float(Y_exact[0, 0, 0]),
                learned_y0=learned_y0,
                **quality_row(learned_y0, float(Y_exact[0, 0, 0]),
                              rel_threshold=c.quality_rel_threshold),
                run_time=time.time() - tic,
            )
        self.report.to_csv(f"{self.save_path}/results_testcase.csv")
        return self.report


class HJBExecutor:
    """HJB sweep vs the MC oracle (reference ``HJBExecutor``,
    ``hjb_implement.py:1042-1119``: M=16, D∈{10,50,100}, Naisnet-ReLU)."""

    def __init__(self, config: SweepConfig, save_path: str):
        self.config = config
        self.save_path = save_path
        self.report = ResultsReport()
        self.plot = TrainingPlot(save_path)

    def execute(self) -> "ResultsReport":
        c = self.config
        for M, D, lr, iters, opt, mode, act in itertools.product(
            c.Ms, c.Ds, c.lr_pairs, c.iter_pairs, c.optimizers, c.modes, c.activations
        ):
            tic = time.time()
            problem = HamiltonJacobiBellman(D=D)
            trainer = Trainer(
                problem, M=M, N=c.N, layers=[D + 1, *c.hidden, 1],
                mode=mode, activation=act, seed=c.seed,
            )
            r1, r2 = _train_two_phase(trainer, lr, iters, opt, phases=c.phases)
            u_exact = float(hjb_exact_mc(
                jax.random.PRNGKey(c.seed), 0.0, np.zeros(D), T=problem.T,
            ))
            learned = trainer.y0_log[-1]
            rel_err = abs(learned - u_exact) / abs(u_exact)
            self.report.add_row(
                M=M, D=D, mode=mode, activation=act, optimizer=opt,
                exact_u0=u_exact, learned_u0=learned, relative_error=rel_err,
                **quality_row(learned, u_exact,
                              rel_threshold=c.quality_rel_threshold),
                min_loss=min(r1.min_loss, r2.min_loss),
                run_time=time.time() - tic,
            )
            # relative-error evolution (reference HJB rel-error plots,
            # ``hjb_implement.py:1100-1119``)
            rel_curve = np.abs(np.asarray(trainer.y0_log) - u_exact) / abs(u_exact)
            self.plot.plot_convergence(
                {"relative error": rel_curve}, name=f"HJBRelError_D{D}_M{M}"
            )
        self.report.to_csv(f"{self.save_path}/results_hjb.csv")
        return self.report


class HestonExecutor:
    """Heston batch-size sweep: L2(Y0) vs the closed form (reference
    ``HestonExecutor``, ``heston_dnnpde.py:1123-1277``: Ms=[2,10,50,128,500])."""

    def __init__(
        self,
        Ms: Sequence[int] = (2, 10, 50, 128, 500),
        N: int = 50,
        n_iter: tuple[int, int] = (2000, 500),
        lrs: tuple[float, float] = (1e-3, 1e-5),
        mode: str = "FC",
        activation: str = "Sine",
        save_path: str = ".",
        seed: int = 42,
        heston: Optional[HestonPDE] = None,
    ):
        self.Ms = Ms
        self.N = N
        self.n_iter = n_iter
        self.lrs = lrs
        self.mode = mode
        self.activation = activation
        self.save_path = save_path
        self.seed = seed
        self.problem = heston or HestonPDE()
        self.report = ResultsReport()
        self.plot = TrainingPlot(save_path)

    def oracle_cross_check(self, num_paths: int = 100_000,
                           num_steps: int = 500) -> dict[str, float]:
        """Price Y0 = u(0, S0, v0) with THREE independent oracles: the
        closed form, the reflection-Milstein MC (scheme I), and the
        truncation MC (scheme II, reference heston_closed_form_ii.py:6-114).
        The reference cross-checks these by hand across three scripts."""
        import jax

        from dnnpde_tpu.numerics import heston_mc_price, heston_mc_price_ii

        p = self.problem
        hp = HestonParams(K=p.strike, r=p.r, T=p.T, kappa=p.kappa,
                          theta=p.theta, sigma=p.sigma_v, rho=p.rho, v0=p.v0)
        closed = float(heston_call_price(p.S0, p.v0, hp))
        k1, k2 = jax.random.split(jax.random.PRNGKey(self.seed))
        mc1, se1 = heston_mc_price(k1, p.S0, hp, num_paths, num_steps)
        mc2, se2 = heston_mc_price_ii(k2, p.S0, hp, num_paths, num_steps)
        return {
            "closed_form": closed,
            "mc_milstein_reflection": float(mc1), "mc_i_se": float(se1),
            "mc_euler_truncation_ii": float(mc2), "mc_ii_se": float(se2),
        }

    def execute(self) -> "ResultsReport":
        p = self.problem
        oracles = self.oracle_cross_check()
        exact = oracles["closed_form"]
        oracle_report = ResultsReport()
        oracle_report.add_row(**oracles)
        oracle_report.to_csv(f"{self.save_path}/heston_oracle_cross_check.csv")
        for M in self.Ms:
            tic = time.time()
            trainer = Trainer(
                p, M=M, N=self.N, layers=default_layers(p.dim),
                mode=self.mode, activation=self.activation, seed=self.seed,
            )
            r1, r2 = _train_two_phase(
                trainer, self.lrs, self.n_iter, "Adam"
            )
            y0s = np.asarray(trainer.y0_log)
            l2_errors = np.abs(y0s - exact)
            self.plot.plot_y0_evolution(
                trainer.iteration, y0s, exact_y0=exact, name=f"HestonY0_M{M}"
            )
            # Degenerate-run detection: with clamp_u = 0 and a tiny batch the
            # net can start (and stay) in the clamp's zero-gradient region —
            # Y0 pinned at exactly the clamp for the whole run (observed at
            # M=2). Such a row must not be averaged into conclusions.
            clamp = p.clamp_u if p.clamp_u is not None else np.nan
            pinned = bool(y0s.size) and bool(np.all(y0s == y0s[0]))
            at_clamp = bool(y0s.size) and float(y0s[-1]) == clamp
            degenerate = pinned or (at_clamp and float(l2_errors[-1]) > 0.1 * abs(exact))
            self.report.add_row(
                M=M, exact_y0=exact, learned_y0=float(y0s[-1]),
                final_l2_error=float(l2_errors[-1]),
                min_loss=min(r1.min_loss, r2.min_loss),
                run_time=time.time() - tic,
                degenerate=degenerate,
                **quality_row(float(y0s[-1]), exact, degenerate=degenerate),
            )
            self._plot_learned_surfaces(trainer, M)
        self.report.to_csv(f"{self.save_path}/results_heston.csv")
        return self.report

    def _plot_learned_surfaces(self, trainer, M: int) -> None:
        """Learned price/delta/gamma surfaces over (S, v) at t=0 from the net
        (reference plots closed-form surfaces at ``heston_dnnpde.py:1050-1120``
        and greeks via ``calculate_greeks``)."""
        from dnnpde_tpu.evals import compute_greeks

        S_vals = np.linspace(0.5, 1.5, 12)
        v_vals = np.linspace(0.05, 0.5, 8)
        Sg, Vg = np.meshgrid(S_vals, v_vals, indexing="ij")
        X = np.stack([Sg.ravel(), Vg.ravel()], axis=-1)
        t = np.zeros((X.shape[0], 1))
        u, delta, gamma_diag = compute_greeks(trainer, t, X)
        price = u[:, 0].reshape(len(S_vals), len(v_vals))
        dlt = delta[:, 0].reshape(len(S_vals), len(v_vals))
        gma = gamma_diag[:, 0].reshape(len(S_vals), len(v_vals))
        self.plot.plot_heston_surfaces(
            S_vals, v_vals, price, dlt, gma, name=f"HestonLearned_M{M}"
        )


@dataclasses.dataclass
class SurfaceConfig:
    """Config for :class:`HestonSurfaceExecutor` — defaults are the measured
    round-4 winning recipe (results_r4/bigcfg_local_bs.log: IV smile mean
    |err| 0.13–0.16 volpts across 3 seeds; greeks_combo.log: t=0 price/Δ/Γ
    rel-L2 0.13%/0.29%/2.2%)."""

    M: int = 1024
    N: int = 50
    width: int = 512
    depth: int = 4
    budget: int = 20000
    # lognormal X0 jitter scale — the surface-training region (sim.lognormal_x0)
    x0_scale: float = 0.3
    # v-coordinate jitter scale override (None → x0_scale). The vega
    # direction is only as trained as it is sampled: at 0.3 the round-4
    # vega rel-L2 sat at 8.5–12.4% (VERDICT r4 weak #3); widening only v
    # attacks it without moving the smile protocol.
    x0_scale_v: Optional[float] = None
    # backward-induction per-step objective (the surface-mode winner)
    objective: str = "local"
    # HestonPDE output head: "bs" control-variate (default) or "plain"
    output_mode: str = "bs"
    ema_decay: float = 0.999
    strikes: Sequence[float] = tuple(np.linspace(0.75, 1.3, 23))
    # smile grading times: the t=0 smile is the served surface; adding
    # t>0 grades the TERM STRUCTURE — the same net read at time t against
    # the closed form at maturity T−t (one net, whole (t, K) surface)
    smile_t_evals: Sequence[float] = (0.0,)
    # greeks grading times: t=0 is the served surface, t=0.5 on-distribution
    t_evals: Sequence[float] = (0.0, 0.5)
    s_grid: tuple[float, float, int] = (0.6, 1.5, 91)
    # v grid for the 2-D (S, v) surface grade, in MULTIPLES of v0 — the
    # lognormal X0 sampler jitters both coordinates, so at x0_scale=0.3 the
    # ±2σ trained region is v0·e^{±0.6} ≈ [0.55, 1.82]·v0
    v_grid: tuple[float, float, int] = (0.6, 1.8, 7)
    seed: int = 0
    # >0: additionally score the smile against the exact discrete-N BSDE
    # oracle with this many paths per strike (separates time-discretization
    # bias from optimization error; 4M paths pins price SE ≤ 1.8e-4)
    discrete_oracle_paths: int = 0
    # quality gate: mean |IV error| vs the closed form, in vol points
    iv_gate_volpts: float = 1.0
    # quality gate on the surface2d rows: variance-vega ∂u/∂v rel-L2 on
    # the v=v0 slice (VERDICT r4 #5: vega is graded, so it must be gated)
    vega_gate_rel_l2: float = 0.05
    # Z-matching auxiliary-loss weight (SolverConfig.z_match_weight — the
    # round-5 vega training-signal fix). 0 = off. When on, the mask
    # isolates Heston's second Brownian (the v-only column of the
    # Cholesky factor), giving ∂u/∂v a direct regression target without
    # adding gradient noise to the converged S-greeks.
    z_match_weight: float = 0.0
    z_match_mask: tuple = (0.0, 1.0)


class HestonSurfaceExecutor:
    """Surface-solver driver: train u(0, ·, v0) over a REGION of initial
    states and grade the result as a surface — the IV smile vs the Heston
    closed form (optionally also vs the exact discrete-N BSDE oracle),
    the smile TERM STRUCTURE (``smile_t_evals``: the same net read at
    time t, inverted at maturity T−t), price/Δ/Γ surface rel-L2 at each
    grading time, and the full 2-D (S, v) price surface + variance-vega
    ∂u/∂v vs closed-form oracles (``_grade_surface2d``).

    Beyond-reference: the reference plots Heston price/Δ/Γ surfaces without
    ever scoring them (``heston_dnnpde.py:977-1120``), and its point solver
    only ever learns u at the single state (S0, v0). This executor packages
    the round-4 surface recipe — local (backward-induction) objective + BS
    control-variate head + lognormal X0 sampling + EMA read — measured at
    0.13–0.16 volpts mean |IV err| (results_r4/, ARCHITECTURE.md §6e).

    Artifacts: ``results_heston_surface.csv`` (one smile row + one greeks
    row per grading time, with quality flags), ``HestonSurface_iv_smile.png``
    and learned-surface PNGs under ``save_path``.
    """

    def __init__(self, config: Optional[SurfaceConfig] = None,
                 save_path: str = ".",
                 heston: Optional[HestonPDE] = None):
        self.cfg = config or SurfaceConfig()
        self.save_path = save_path
        if heston is not None:
            self.problem = heston
        elif self.cfg.output_mode == "plain":
            self.problem = HestonPDE(clamp_output=False)
        else:
            self.problem = HestonPDE(clamp_output=True,
                                     clamp_smoothing=self.cfg.output_mode)
        self.report = ResultsReport()
        self.plot = TrainingPlot(save_path)

    # -- oracles ----------------------------------------------------------
    def _closed_form_smile(self, strikes: np.ndarray,
                           t: float = 0.0) -> np.ndarray:
        p = self.problem
        return np.asarray([
            float(heston_call_price(1.0, p.v0, HestonParams(
                K=float(k), r=p.r, T=p.T - t, kappa=p.kappa, theta=p.theta,
                sigma=p.sigma_v, rho=p.rho, v0=p.v0)))
            for k in strikes
        ])

    def _discrete_smile(self, strikes: np.ndarray) -> np.ndarray:
        from dnnpde_tpu.numerics import discrete_bsde_surface

        p, cfg = self.problem, self.cfg
        S_eval = (1.0 / strikes).astype(np.float32)
        x0s = np.stack([S_eval, np.full_like(S_eval, p.v0)], axis=-1)
        vals = discrete_bsde_surface(
            p, N=cfg.N, x0s=x0s, n_paths=cfg.discrete_oracle_paths,
            batch=min(cfg.discrete_oracle_paths, 1_048_576),
            seed=cfg.seed + 11)
        return strikes * np.asarray([v.value for v in vals])

    def _model_smile(self, trainer, strikes: np.ndarray,
                     t: float = 0.0) -> np.ndarray:
        """price(t, S=1, K) = K · u(t, 1/K, v0) by payoff homogeneity
        (EMA read) — one strike-1 net prices the whole (t, K) surface."""
        import jax.numpy as jnp

        p = self.problem
        S_eval = (1.0 / strikes).astype(np.float32)
        X = jnp.stack([jnp.asarray(S_eval),
                       jnp.full_like(jnp.asarray(S_eval), p.v0)], axis=-1)
        u, _ = trainer.net_u(trainer.ema_params,
                             jnp.full((len(strikes), 1), float(t)), X)
        return strikes * np.asarray(u[:, 0])

    def _iv(self, prices: np.ndarray, strikes: np.ndarray,
            t: float = 0.0) -> np.ndarray:
        from dnnpde_tpu.numerics import implied_vol

        p = self.problem
        return np.asarray(implied_vol(prices, 1.0, strikes, p.T - t, p.r))

    # -- driver ------------------------------------------------------------
    def execute(self) -> "ResultsReport":
        from dnnpde_tpu.sim import lognormal_x0

        cfg, p = self.cfg, self.problem
        layers = [p.dim + 1] + [cfg.width] * cfg.depth + [1]
        scale = (cfg.x0_scale if cfg.x0_scale_v is None
                 else [cfg.x0_scale, cfg.x0_scale_v])
        trainer = Trainer(
            p, M=cfg.M, N=cfg.N, layers=layers, mode="FC",
            activation="Sine", seed=cfg.seed, ema_decay=cfg.ema_decay,
            x0_sampler=lognormal_x0(p.x0, scale),
            objective=cfg.objective,
            z_match_weight=cfg.z_match_weight,
            z_match_mask=cfg.z_match_mask,
        )
        tic = time.time()
        half, quarter = cfg.budget // 2, cfg.budget - 2 * (cfg.budget // 4)
        for iters, lr in ((half, 1e-3), (cfg.budget // 4, 1e-4),
                          (quarter, 1e-5)):
            if iters > 0:
                trainer.train(iters, lr, "Adam", verbose=False)
        train_wall = time.time() - tic

        strikes = np.asarray(cfg.strikes, np.float64)
        atm = int(np.argmin(np.abs(strikes - 1.0)))
        smile_ts = tuple(cfg.smile_t_evals) or (0.0,)
        for t in smile_ts:
            cf_iv = self._iv(self._closed_form_smile(strikes, t), strikes, t)
            model_iv = self._iv(
                self._model_smile(trainer, strikes, t), strikes, t)
            err = (model_iv - cf_iv) * 100.0  # vol points
            row = dict(
                kind="iv_smile", t=float(t), M=cfg.M, N=cfg.N,
                width=cfg.width, budget=cfg.budget, objective=cfg.objective,
                output_mode=cfg.output_mode, x0_scale=cfg.x0_scale,
                seed=cfg.seed, n_strikes=len(strikes),
                mean_abs_iv_err_volpts=float(np.mean(np.abs(err))),
                max_abs_iv_err_volpts=float(np.max(np.abs(err))),
                atm_iv_err_volpts=float(err[atm]),
                ok=bool(np.mean(np.abs(err)) <= cfg.iv_gate_volpts),
                run_time=train_wall,
            )
            discrete_iv = None
            if cfg.discrete_oracle_paths > 0 and t == 0.0:
                # the discrete oracle spans the full [0, T] N-step scheme;
                # it only grades the served t=0 smile
                discrete_iv = self._iv(self._discrete_smile(strikes), strikes)
                err_d = (model_iv - discrete_iv) * 100.0
                row["mean_abs_iv_err_vs_discrete_volpts"] = float(
                    np.mean(np.abs(err_d)))
                row["atm_iv_err_vs_discrete_volpts"] = float(err_d[atm])
            self.report.add_row(**row)
            if t == 0.0:
                self.plot.plot_iv_smile(strikes, model_iv, cf_iv,
                                        discrete_iv=discrete_iv,
                                        name="HestonSurface")

        self._grade_greeks(trainer)
        self._grade_surface2d(trainer)
        self.report.to_csv(f"{self.save_path}/results_heston_surface.csv")
        return self.report

    def _grade_greeks(self, trainer) -> None:
        """Price/Δ/Γ surface rel-L2 vs the closed form's finite-difference
        surfaces on the S-grid at v=v0, per grading time. The Δ oracle lives
        at forward-difference midpoints, so the model Δ is averaged onto the
        same staggering; the stencil's zero-padded boundary rows are
        excluded (same protocol as scripts/studies.py::heston_trained_greeks)."""
        from dnnpde_tpu.evals.greeks import heston_greeks
        from dnnpde_tpu.numerics import (
            heston_delta_surface, heston_gamma_surface, heston_price_surface,
        )

        cfg, p = self.cfg, self.problem
        lo, hi, n = cfg.s_grid
        S = np.linspace(lo, hi, int(n))
        V = np.asarray([p.v0])
        sl = slice(1, -1)

        def rel_l2(a, b):
            return float(np.linalg.norm(a - b)
                         / max(np.linalg.norm(b), 1e-12))

        for t_eval in cfg.t_evals:
            hp_t = HestonParams(K=p.strike, r=p.r, T=p.T - t_eval,
                                kappa=p.kappa, theta=p.theta,
                                sigma=p.sigma_v, rho=p.rho, v0=p.v0)
            price_o = np.asarray(heston_price_surface(S, V, hp_t))[:, 0]
            delta_o = np.asarray(heston_delta_surface(S, V, hp_t))[:, 0]
            gamma_o = np.asarray(heston_gamma_surface(S, V, hp_t))[:, 0]
            u, delta, gamma = heston_greeks(
                trainer, S, np.full_like(S, p.v0), t_eval, use_ema=True)
            delta_mid = 0.5 * (delta[:-1] + delta[1:])
            self.report.add_row(
                kind="greeks", t=float(t_eval),
                M=cfg.M, N=cfg.N, width=cfg.width, budget=cfg.budget,
                objective=cfg.objective, output_mode=cfg.output_mode,
                x0_scale=cfg.x0_scale, seed=cfg.seed,
                price_rel_l2=rel_l2(u[sl], price_o[sl]),
                delta_rel_l2=rel_l2(delta_mid[:-1], delta_o[:-2]),
                gamma_rel_l2=rel_l2(gamma[sl], gamma_o[sl]),
                ok=bool(rel_l2(u[sl], price_o[sl]) < 0.02),
            )
            if t_eval == 0.0:
                self._plot_surfaces(trainer)

    def _grade_surface2d(self, trainer) -> None:
        """Grade u as a full (S, v) SURFACE plus variance-vega ∂u/∂v.

        The lognormal X0 sampler jitters BOTH state coordinates, so training
        constrains u(0, S, v) on a 2-D region — not just the v = v0 slice the
        smile and greeks grade. Scored per grading time: price rel-L2 over
        the (s_grid × v_grid·v0) mesh vs the closed form, and variance-vega
        ∂u/∂v on the v = v0 slice (autodiff through the shared transform_u)
        vs a central-difference closed-form oracle. The reference renders
        (S, v) surfaces without scoring them (``heston_dnnpde.py:977-1120``)
        and has no vega at all."""
        from dnnpde_tpu.evals import compute_greeks
        from dnnpde_tpu.numerics import heston_price_surface

        cfg, p = self.cfg, self.problem
        lo, hi, n = cfg.s_grid
        S = np.linspace(lo, hi, int(n))
        vlo, vhi, vn = cfg.v_grid
        V = np.linspace(vlo, vhi, int(vn)) * p.v0
        iv0 = int(np.argmin(np.abs(V - p.v0)))

        def rel_l2(a, b):
            return float(np.linalg.norm(a - b)
                         / max(np.linalg.norm(b), 1e-12))

        Sg, Vg = np.meshgrid(S, V, indexing="ij")
        X = np.stack([Sg.ravel(), Vg.ravel()], axis=-1)
        h = 0.05 * p.v0
        for t_eval in cfg.t_evals:
            hp_t = HestonParams(K=p.strike, r=p.r, T=p.T - t_eval,
                                kappa=p.kappa, theta=p.theta,
                                sigma=p.sigma_v, rho=p.rho, v0=p.v0)
            price_o = np.asarray(heston_price_surface(S, V, hp_t))
            tcol = np.full((X.shape[0], 1), t_eval, np.float32)
            u, grad, _ = compute_greeks(trainer, tcol, X, use_ema=True)
            price2d = rel_l2(u[:, 0].reshape(len(S), len(V)), price_o)
            po = np.asarray(heston_price_surface(
                S, np.asarray([p.v0 - h, p.v0 + h]), hp_t))
            vega_o = (po[:, 1] - po[:, 0]) / (2.0 * h)
            vega_m = grad[:, 1].reshape(len(S), len(V))[:, iv0]
            self.report.add_row(
                kind="surface2d", t=float(t_eval), M=cfg.M, N=cfg.N,
                width=cfg.width, budget=cfg.budget, objective=cfg.objective,
                output_mode=cfg.output_mode, x0_scale=cfg.x0_scale,
                seed=cfg.seed,
                price2d_rel_l2=price2d,
                vega_rel_l2=rel_l2(vega_m, vega_o),
                ok=bool(price2d < 0.02
                        and rel_l2(vega_m, vega_o) < cfg.vega_gate_rel_l2),
            )

    def _plot_surfaces(self, trainer) -> None:
        from dnnpde_tpu.evals import compute_greeks

        S_vals = np.linspace(0.6, 1.5, 19)
        v_vals = np.linspace(0.05, 0.5, 8)
        Sg, Vg = np.meshgrid(S_vals, v_vals, indexing="ij")
        X = np.stack([Sg.ravel(), Vg.ravel()], axis=-1)
        t = np.zeros((X.shape[0], 1))
        u, delta, gamma_diag = compute_greeks(trainer, t, X, use_ema=True)
        shape = (len(S_vals), len(v_vals))
        self.plot.plot_heston_surfaces(
            S_vals, v_vals, u[:, 0].reshape(shape),
            delta[:, 0].reshape(shape), gamma_diag[:, 0].reshape(shape),
            name="HestonSurfaceLearned",
        )


class SensitivityExecutor:
    """Real training samples + synthetic augmentation → HSIC analysis
    (reference ``SensitivityExecutor``, ``sensitivity_analysis_trun.py:1100-1217``).
    The reference fans real runs over ``ProcessPoolExecutor``; here ALL real
    samples train simultaneously as one vmapped two-phase program on device
    (``train.ensemble.train_sensitivity_ensemble``) — per-member lrs and
    phase lengths, fixed shapes, one compile. ``evaluate_model`` remains for
    single ad-hoc runs and for optimizers outside the ensemble's
    preconditioner set (LBFGS etc.), which fall back to sequential."""

    def __init__(
        self,
        problem,
        M: int = 32,
        N: int = 16,
        mode: str = "FC",
        activation: str = "Sine",
        optimizer: str = "Adam",
        save_path: str = ".",
        seed: int = 0,
        iter_scale: float = 1.0,
    ):
        self.problem = problem
        self.M = M
        self.N = N
        self.mode = mode
        self.activation = activation
        self.optimizer = optimizer
        self.save_path = save_path
        self.seed = seed
        self.iter_scale = iter_scale
        self.analyzer = SensitivityAnalyzer()

    def evaluate_model(self, hp: dict) -> float:
        """One real sample: two-phase training, returns min loss
        (reference ``evaluate_model``, ``sensitivity_analysis_trun.py:1196-1217``)."""
        trainer = Trainer(
            self.problem, M=self.M, N=self.N,
            layers=default_layers(self.problem.dim, width=64),
            mode=self.mode, activation=self.activation, seed=self.seed,
        )
        n1 = max(1, int(hp["initial_n_iter"] * self.iter_scale))
        n2 = max(1, int(hp["fine_tuning_n_iter"] * self.iter_scale))
        r1 = trainer.train(n1, hp["initial_lr"], self.optimizer, verbose=False)
        r2 = trainer.train(n2, hp["fine_tuning_lr"], self.optimizer, verbose=False)
        return min(r1.min_loss, r2.min_loss)

    def execute(
        self, num_real_samples: int = 32, num_simulated_samples: int = 968
    ) -> dict[str, float]:
        rng = np.random.default_rng(self.seed)
        results = []
        real_hps = [sample_hyperparameters(rng) for _ in range(num_real_samples)]
        if real_hps:
            from dnnpde_tpu.train.ensemble import (
                _PRECONDITIONERS,
                train_sensitivity_ensemble,
            )

            if self.optimizer.lower() in _PRECONDITIONERS:
                perfs = train_sensitivity_ensemble(
                    self.problem, real_hps, M=self.M, N=self.N,
                    layers=default_layers(self.problem.dim, width=64),
                    mode=self.mode, activation=self.activation,
                    optimizer_type=self.optimizer, seed=self.seed,
                    iter_scale=self.iter_scale,
                )
                results += [
                    {"hyperparams": hp, "performance": float(p)}
                    for hp, p in zip(real_hps, perfs)
                ]
            else:  # sequential fallback (e.g. LBFGS)
                results += [
                    {"hyperparams": hp, "performance": self.evaluate_model(hp)}
                    for hp in real_hps
                ]
        for _ in range(num_simulated_samples):
            hp = sample_hyperparameters(rng)
            perf = float(simulate_performance(
                {k: np.asarray(v) for k, v in hp.items()}, rng
            ))
            results.append({"hyperparams": hp, "performance": perf})
        scores, _, _ = self.analyzer.analyze(results)
        return scores
