"""Experiment drivers (L6): sweep executors producing CSV + PNG artifacts."""

from dnnpde_tpu.experiments.executors import (
    CorrExecutor,
    HestonExecutor,
    HJBExecutor,
    SensitivityExecutor,
    SweepConfig,
    TestCaseExecutor,
    TrainingExecutor,
)

__all__ = [
    "SweepConfig",
    "TrainingExecutor",
    "CorrExecutor",
    "TestCaseExecutor",
    "HJBExecutor",
    "HestonExecutor",
    "SensitivityExecutor",
]
