"""Device-mesh construction + data-parallel sharding of the path axis.

The reference is single-device (``torch.cuda.is_available()`` →
``1d_BSPDE_case.py:143-148``; SURVEY.md §2.6). Here the path/batch axis M is
first-class data-parallel over a 1-D ``jax.sharding.Mesh`` ("dp"):

- Brownian increments are generated on device with a sharding constraint so
  each chip materializes only its slice of the (M, N, D) increment tensor.
- The loss is a *sum* over the batch → XLA inserts the cross-chip psum for
  both the loss value and the parameter gradients; collectives ride ICI.
- Parameters and optimizer state are replicated (the nets are ~270K params;
  there is nothing to gain from sharding them — SURVEY.md §2.6 TP row).

Multi-chip behavior is testable without hardware by forcing virtual CPU
devices: ``XLA_FLAGS=--xla_force_host_platform_device_count=8``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DP_AXIS = "dp"


def make_mesh(
    n_devices: Optional[int] = None,
    devices: Optional[Sequence[jax.Device]] = None,
    axis_name: str = DP_AXIS,
) -> Mesh:
    """1-D data-parallel mesh over the first ``n_devices`` devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"requested {n_devices} devices, only {len(devices)} available"
            )
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = DP_AXIS) -> NamedSharding:
    """Shard the leading (path/batch) axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def check_divisible(M: int, mesh: Mesh, axis_name: str = DP_AXIS) -> None:
    n = mesh.shape[axis_name]
    if M % n != 0:
        raise ValueError(
            f"batch size M={M} must be divisible by mesh axis {axis_name!r} "
            f"size {n}"
        )
