"""Model-axis (tensor-parallel) sharding for wide networks.

The reference's nets are tiny (4×256 hidden, ~270K params at D=100) so TP is
unnecessary for parity (SURVEY.md §2.6), but the mesh axis is exposed so
D-wide layers shard when the problem grows: hidden-layer kernels are laid out
``P(None, "tp")`` / ``P("tp", None)`` alternately (Megatron-style column→row
pairing), so each Dense pair needs a single psum which XLA inserts from the
sharding constraints — no hand-written collectives.

Use a 2-D mesh ``make_mesh_2d(dp, tp)``; batch stays on "dp", features on
"tp".
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DP_AXIS = "dp"
TP_AXIS = "tp"


def make_mesh_2d(
    dp: int,
    tp: int,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """(dp × tp) mesh over the first dp·tp devices."""
    if devices is None:
        devices = jax.devices()
    if dp * tp > len(devices):
        raise ValueError(f"need {dp * tp} devices, have {len(devices)}")
    grid = np.asarray(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(grid, (DP_AXIS, TP_AXIS))


def _kernel_spec(path: tuple, leaf, min_shard_dim: int) -> P:
    """Column-parallel for even-depth Dense kernels, row-parallel for odd —
    alternating so activations stay sharded between pairs with one psum per
    pair. Biases follow their kernel's output sharding. Small dims stay
    replicated (a 128-wide layer on 8 chips is 16 lanes — not worth it)."""
    names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
    is_kernel = leaf.ndim == 2
    # depth index: the OUTER module name carries the layer index (paths look
    # like ('params', 'Dense_3', 'Dense_0', 'kernel') — the inner wrapper is
    # always Dense_0, so take the first indexed name, not the last)
    depth = 0
    for n in names:
        if isinstance(n, str) and "_" in n:
            try:
                depth = int(n.rsplit("_", 1)[1])
                break
            except ValueError:
                pass
    if is_kernel and max(leaf.shape) >= min_shard_dim:
        if depth % 2 == 0 and leaf.shape[1] >= min_shard_dim:
            return P(None, TP_AXIS)  # column parallel
        if leaf.shape[0] >= min_shard_dim:
            return P(TP_AXIS, None)  # row parallel
    return P()


def shard_params_tp(
    params: Any, mesh: Mesh, min_shard_dim: int = 512
) -> Any:
    """Place parameters with alternating column/row TP sharding over ``mesh``.

    Layers narrower than ``min_shard_dim`` stay replicated. Returns the
    resharded pytree; under jit, XLA propagates the layouts and inserts the
    reductions.
    """

    def place(path, leaf):
        spec = _kernel_spec(path, leaf, min_shard_dim)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def tp_sharding_summary(params: Any) -> dict[str, str]:
    """Human-readable map of parameter shardings (for tests/debugging)."""
    out = {}

    def visit(path, leaf):
        name = "/".join(str(getattr(p, "key", getattr(p, "name", p))) for p in path)
        sharding = getattr(leaf, "sharding", None)
        out[name] = str(getattr(sharding, "spec", "none"))
        return leaf

    jax.tree_util.tree_map_with_path(visit, params)
    return out
