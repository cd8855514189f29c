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

import re
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


def _path_names(path: tuple) -> tuple[str, ...]:
    return tuple(str(getattr(p, "key", getattr(p, "name", p))) for p in path)


def _natural_key(names: Sequence[str]) -> tuple:
    """Sort key that orders ``Dense_2`` before ``Dense_10`` (numeric runs
    compare as integers, text runs as strings)."""
    key = []
    for n in names:
        for tok in re.split(r"(\d+)", n):
            if tok.isdigit():
                key.append((1, int(tok), ""))
            elif tok:
                key.append((0, 0, tok))
    return tuple(key)


def plan_tp_specs(params: Any, min_shard_dim: int = 512) -> dict[tuple, P]:
    """Alternating column/row TP plan keyed by parameter path names.

    Walks every 2-D kernel in the pytree in natural forward order (module
    auto-names sort numerically, so ``Dense_10`` follows ``Dense_9``) and
    alternates column-parallel ``P(None, "tp")`` / row-parallel
    ``P("tp", None)`` (Megatron pairing: activations stay feature-sharded
    between a col/row pair, one psum per pair). The alternation index
    advances only when a kernel actually shards, so a too-narrow layer in
    the middle doesn't flip the phase. This is structural — no string
    parsing of layer indices — so nets with irregular param names
    (``_StableBlockDense_0``, ``brownian_kernel_0``, ``verlet_kernel_0``)
    get consistent placements instead of a silently-wrong depth. Dims below
    ``min_shard_dim`` stay replicated (a 128-wide layer on 8 chips is 16
    lanes — not worth the collective)."""
    leaves = jax.tree_util.tree_flatten_with_path(params)[0]
    mats = [
        (_path_names(path), leaf)
        for path, leaf in leaves
        if getattr(leaf, "ndim", 0) == 2
    ]
    mats.sort(key=lambda pl: _natural_key(pl[0]))
    specs: dict[tuple, P] = {}
    k = 0
    for names, leaf in mats:
        spec = P()
        if k % 2 == 0 and leaf.shape[1] >= min_shard_dim:
            spec = P(None, TP_AXIS)  # column parallel
            k += 1
        elif k % 2 == 1 and leaf.shape[0] >= min_shard_dim:
            spec = P(TP_AXIS, None)  # row parallel
            k += 1
        specs[names] = spec
    return specs


def shard_params_tp(
    params: Any, mesh: Mesh, min_shard_dim: int = 512
) -> Any:
    """Place parameters with alternating column/row TP sharding over ``mesh``.

    Layers narrower than ``min_shard_dim`` stay replicated. Returns the
    resharded pytree; under jit, XLA propagates the layouts and inserts the
    reductions.
    """
    plan = plan_tp_specs(params, min_shard_dim)

    def place(path, leaf):
        spec = plan.get(_path_names(path), P())
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
