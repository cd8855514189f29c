"""Hyperparameter sensitivity analysis: HSIC, rank correlation, permutation
importance, and the sampling/simulation machinery around them.

Parity targets (reference ``sensitivity_analysis_trun.py``):
- ``HyperparameterSensitivityAnalyzer._calculate_hsic_single`` (:1051-1066):
  HSIC with RBF kernels, median-heuristic bandwidth, centered Gram matrices.
- ``SensitivityExecutor.sample_hyperparameters`` (:1169-1175): log-uniform
  LRs + uniform iteration counts over {initial_lr, fine_tuning_lr,
  initial_n_iter, fine_tuning_n_iter}.
- ``FastSensitivityExecutor`` (:1220-1311): synthetic performance model,
  Spearman-rank-correlation "HSIC" proxy and permutation importance.
- ``simulate_performance`` (:1186-1194): the synthetic model used to augment
  scarce real samples.

The HSIC itself is JAX (one jit over the Gram computation); orchestration is
host-side (it drives full training runs).
"""

from __future__ import annotations

import dataclasses
import jax.numpy as jnp
import numpy as np


def hsic_rbf(x: np.ndarray, y: np.ndarray) -> float:
    """Biased HSIC estimate with RBF kernels and median-heuristic bandwidths
    (reference ``_calculate_hsic_single``, ``sensitivity_analysis_trun.py:1051-1066``:
    HSIC = Σᵢⱼ (HK_XH)ᵢⱼ(HK_YH)ᵢⱼ / n²)."""
    x = jnp.asarray(x, jnp.float32).reshape(-1, 1)
    y = jnp.asarray(y, jnp.float32).reshape(-1, 1)
    n = x.shape[0]

    def gram(v):
        d = jnp.abs(v - v.T)
        med = jnp.median(d)
        med = jnp.where(med <= 0, 1.0, med)
        return jnp.exp(-(d**2) / (2 * med**2))

    kx, ky = gram(x), gram(y)
    h = jnp.eye(n) - jnp.ones((n, n)) / n
    kxc = h @ kx @ h
    kyc = h @ ky @ h
    return float(jnp.sum(kxc * kyc) / n**2)


def spearman_rank_correlation(x: np.ndarray, y: np.ndarray) -> float:
    """Rank-correlation sensitivity proxy (reference
    ``FastSensitivityExecutor``'s 'HSIC', ``sensitivity_analysis_trun.py:1262-1274``)."""
    rx = np.argsort(np.argsort(x)).astype(np.float64)
    ry = np.argsort(np.argsort(y)).astype(np.float64)
    rx = (rx - rx.mean()) / (rx.std() + 1e-12)
    ry = (ry - ry.mean()) / (ry.std() + 1e-12)
    return float(np.mean(rx * ry))


def permutation_importance(
    hyperparams: dict[str, np.ndarray],
    performance: np.ndarray,
    n_repeats: int = 10,
    seed: int = 0,
) -> dict[str, float]:
    """Permutation importance against a nearest-neighbour surrogate of the
    performance surface (reference ``FastSensitivityExecutor`` permutation
    importance, ``sensitivity_analysis_trun.py:1276-1297``)."""
    from sklearn.ensemble import RandomForestRegressor
    from sklearn.inspection import permutation_importance as sk_pi

    names = list(hyperparams)
    X = np.stack([np.asarray(hyperparams[k], np.float64) for k in names], axis=1)
    y = np.asarray(performance, np.float64)
    model = RandomForestRegressor(n_estimators=50, random_state=seed).fit(X, y)
    result = sk_pi(model, X, y, n_repeats=n_repeats, random_state=seed)
    return dict(zip(names, result.importances_mean.tolist()))


def sample_hyperparameters(rng: np.random.Generator) -> dict[str, float]:
    """Log-uniform LRs, uniform iteration counts (reference
    ``sample_hyperparameters``, ``sensitivity_analysis_trun.py:1169-1175``)."""
    logu = lambda lo, hi: float(10 ** rng.uniform(np.log10(lo), np.log10(hi)))
    return {
        "initial_lr": logu(1e-6, 1e-2),
        "fine_tuning_lr": logu(1e-7, 1e-3),
        "initial_n_iter": int(rng.integers(5000, 30000)),
        "fine_tuning_n_iter": int(rng.integers(1000, 6000)),
    }


def simulate_performance(
    hyperparams: dict[str, np.ndarray], rng: np.random.Generator
) -> np.ndarray:
    """Synthetic performance model (reference ``simulate_performance``,
    ``sensitivity_analysis_trun.py:1186-1194``): quadratic bowls in log-lr +
    log gains in iteration counts + N(0, 2) noise; lower is better."""
    perf = (
        -20 * (np.log10(hyperparams["initial_lr"]) + 4) ** 2
        + -10 * (np.log10(hyperparams["fine_tuning_lr"]) + 5) ** 2
        + np.log(hyperparams["initial_n_iter"]) * 2
        + np.log(hyperparams["fine_tuning_n_iter"])
    )
    return -(perf + rng.normal(0, 2, np.shape(perf)))


@dataclasses.dataclass
class SensitivityAnalyzer:
    """HSIC scores per hyperparameter (reference
    ``HyperparameterSensitivityAnalyzer.analyze_sensitivity``,
    ``sensitivity_analysis_trun.py:1040-1049``)."""

    def calculate_hsic(
        self, hyperparams: dict[str, np.ndarray], performance: np.ndarray
    ) -> dict[str, float]:
        return {k: hsic_rbf(v, performance) for k, v in hyperparams.items()}

    def analyze(
        self, results: list[dict]
    ) -> tuple[dict[str, float], dict[str, np.ndarray], np.ndarray]:
        hyperparams = {
            k: np.array([r["hyperparams"][k] for r in results])
            for k in results[0]["hyperparams"]
        }
        performance = np.array([r["performance"] for r in results])
        return self.calculate_hsic(hyperparams, performance), hyperparams, performance


@dataclasses.dataclass
class FastSensitivityAnalysis:
    """Synthetic-model sensitivity sweep (reference ``FastSensitivityExecutor``,
    ``sensitivity_analysis_trun.py:1220-1311``): draw samples, score with the
    synthetic performance model, report rank-correlation + permutation
    importance + HSIC."""

    num_samples: int = 1000
    seed: int = 0

    def run(self) -> dict[str, dict[str, float]]:
        rng = np.random.default_rng(self.seed)
        initial_lr = rng.uniform(1e-6, 1e-2, self.num_samples)
        hp = {
            "initial_lr": initial_lr,
            "fine_tuning_lr": initial_lr * rng.uniform(0.1, 0.5, self.num_samples),
            "initial_n_iter": rng.integers(20000, 100000, self.num_samples).astype(float),
            "fine_tuning_n_iter": rng.integers(5000, 20000, self.num_samples).astype(float),
        }
        perf = simulate_performance(hp, rng)
        return {
            "hsic": {k: hsic_rbf(v, perf) for k, v in hp.items()},
            "rank_correlation": {
                k: spearman_rank_correlation(v, perf) for k, v in hp.items()
            },
            "permutation_importance": permutation_importance(hp, perf),
        }
