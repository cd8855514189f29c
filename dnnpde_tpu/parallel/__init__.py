"""Mesh + sharding: data-parallel path axis over TPU chips."""

from dnnpde_tpu.parallel.mesh import (
    DP_AXIS,
    batch_sharding,
    check_divisible,
    make_mesh,
    replicated,
)

__all__ = [
    "DP_AXIS",
    "batch_sharding",
    "check_divisible",
    "make_mesh",
    "replicated",
]
