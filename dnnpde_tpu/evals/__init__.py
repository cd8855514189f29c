"""Evaluation & analysis layer (L5): predictions, metrics, stability,
sensitivity, plots, reports."""

from dnnpde_tpu.evals.control_variate import (
    NeuralCVValue,
    neural_cv_from_trainer,
    neural_cv_value,
)
from dnnpde_tpu.evals.policy_value import (
    PolicyValue,
    policy_value,
    policy_value_from_trainer,
)
from dnnpde_tpu.evals.correlation_analysis import (
    RandomCorrelationSensitivityAnalysis,
    equicorrelation_sensitivity,
)
from dnnpde_tpu.evals.greeks import compute_greeks, heston_greeks, learned_price_surface
from dnnpde_tpu.evals.metrics import (
    ConvergenceAnalysis,
    error_stats,
    relative_l2_error,
    squared_errors,
)
from dnnpde_tpu.evals.plots import TrainingPlot, figsize
from dnnpde_tpu.evals.predictions import PredictionGenerator, PredictionResult
from dnnpde_tpu.evals.reports import RESULT_COLUMNS, ResultsReport, quality_row
from dnnpde_tpu.evals.sensitivity import (
    FastSensitivityAnalysis,
    SensitivityAnalyzer,
    hsic_rbf,
    permutation_importance,
    sample_hyperparameters,
    simulate_performance,
    spearman_rank_correlation,
)
from dnnpde_tpu.evals.stability import StabilityCheck

__all__ = [
    "NeuralCVValue",
    "neural_cv_from_trainer",
    "neural_cv_value",
    "PolicyValue",
    "policy_value",
    "policy_value_from_trainer",
    "ConvergenceAnalysis",
    "error_stats",
    "relative_l2_error",
    "squared_errors",
    "TrainingPlot",
    "figsize",
    "PredictionGenerator",
    "PredictionResult",
    "RESULT_COLUMNS",
    "ResultsReport",
    "quality_row",
    "FastSensitivityAnalysis",
    "SensitivityAnalyzer",
    "hsic_rbf",
    "permutation_importance",
    "sample_hyperparameters",
    "simulate_performance",
    "spearman_rank_correlation",
    "StabilityCheck",
    "RandomCorrelationSensitivityAnalysis",
    "equicorrelation_sensitivity",
    "compute_greeks",
    "heston_greeks",
    "learned_price_surface",
]
