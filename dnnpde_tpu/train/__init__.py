"""Training: optimizer factory, schedules, trainer, checkpointing."""

from dnnpde_tpu.train.diagnostics import (
    StepTimer,
    detect_anomalies,
    device_memory_stats,
    profile_trace,
)
from dnnpde_tpu.train.checkpoint import (
    restore_checkpoint,
    restore_checkpoint_orbax,
    save_checkpoint,
    save_checkpoint_orbax,
)
from dnnpde_tpu.train.ensemble import EnsembleResult, train_ensemble
from dnnpde_tpu.train.replicas import (
    ReplicaResult,
    replica_values_at,
    train_replicas,
)
from dnnpde_tpu.train.extrapolation import richardson_y0, train_y0
from dnnpde_tpu.train.optimizers import OPTIMIZER_NAMES, build_optimizer, is_lbfgs
from dnnpde_tpu.train.schedules import PhaseSpec, TimeStepRefinement, two_phase
from dnnpde_tpu.train.trainer import (
    Trainer,
    TrainingPhases,
    TrainResult,
    default_layers,
    scaled_lr,
)

__all__ = [
    "richardson_y0",
    "train_y0",
    "OPTIMIZER_NAMES",
    "build_optimizer",
    "is_lbfgs",
    "PhaseSpec",
    "TimeStepRefinement",
    "two_phase",
    "Trainer",
    "TrainingPhases",
    "TrainResult",
    "default_layers",
    "scaled_lr",
    "save_checkpoint",
    "restore_checkpoint",
    "save_checkpoint_orbax",
    "restore_checkpoint_orbax",
    "StepTimer",
    "detect_anomalies",
    "device_memory_stats",
    "profile_trace",
    "EnsembleResult",
    "train_ensemble",
    "ReplicaResult",
    "replica_values_at",
    "train_replicas",
]
