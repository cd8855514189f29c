"""Pallas TPU kernels for the hot simulation ops."""

from dnnpde_tpu.ops.path_kernel import pallas_basket_call_mc, pallas_gbm_terminal

__all__ = ["pallas_gbm_terminal", "pallas_basket_call_mc"]
