"""Experiment drivers (L6): sweep executors producing CSV + PNG artifacts."""

from dnnpde_tpu.experiments.executors import (
    CorrExecutor,
    HestonExecutor,
    HestonSurfaceExecutor,
    HJBExecutor,
    SensitivityExecutor,
    SurfaceConfig,
    SweepConfig,
    TestCaseExecutor,
    TrainingExecutor,
)

__all__ = [
    "SweepConfig",
    "SurfaceConfig",
    "TrainingExecutor",
    "CorrExecutor",
    "TestCaseExecutor",
    "HJBExecutor",
    "HestonExecutor",
    "HestonSurfaceExecutor",
    "SensitivityExecutor",
]
