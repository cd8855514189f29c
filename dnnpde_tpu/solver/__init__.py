"""Deep-BSDE objective: scan rollout, Z via autodiff, terminal penalties."""

from dnnpde_tpu.solver.bsde import (
    RolloutResult,
    SolverConfig,
    make_loss_fn,
    make_net_u,
    make_path_loss_fn,
)

__all__ = [
    "RolloutResult",
    "SolverConfig",
    "make_loss_fn",
    "make_net_u",
    "make_path_loss_fn",
]
