"""Pallas TPU kernels for the hot simulation ops."""

from dnnpde_tpu.ops.path_kernel import pallas_basket_call_mc, pallas_gbm_terminal
from dnnpde_tpu.ops.rollout_kernel import (
    gbm_coefficients,
    predict_paths_fast,
    rollout_paths_pallas,
    rollout_paths_xla,
)

__all__ = [
    "pallas_gbm_terminal",
    "pallas_basket_call_mc",
    "gbm_coefficients",
    "predict_paths_fast",
    "rollout_paths_pallas",
    "rollout_paths_xla",
]
