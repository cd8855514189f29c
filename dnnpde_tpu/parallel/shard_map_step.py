"""Explicit-collective data-parallel train step via ``shard_map``.

The Trainer's default multi-chip path uses the global-view style (sharding
constraints + XLA-inserted collectives). This module provides the
explicit-SPMD alternative: each device runs a *local* program on its own path
shard with its own folded RNG key, and the cross-chip reductions are written
out as ``lax.psum`` over the "dp" mesh axis — the pattern that generalizes to
custom collectives (ring schedules, reduce_scatter grads) when the model
grows. Semantics are identical: the summed BSDE loss and its gradients are
psum-reduced, and every device applies the same optimizer update.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from dnnpde_tpu.pde.base import PDEProblem
from dnnpde_tpu.sim.brownian import time_major_batch
from dnnpde_tpu.solver.bsde import SolverConfig, make_loss_fn

DP_AXIS = "dp"


def make_shard_map_train_step(
    problem: PDEProblem,
    net,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    M: int,
    N: int,
    config: Optional[SolverConfig] = None,
    chol=None,
):
    """Build step(params, opt_state, key) → (params, opt_state, loss).

    M is the GLOBAL batch; each of the mesh's dp devices simulates
    M / n_dev paths from ``jax.random.fold_in(key, axis_index)``.
    """
    n_dev = mesh.shape[DP_AXIS]
    if M % n_dev != 0:
        raise ValueError(f"global batch M={M} not divisible by {n_dev} devices")
    m_local = M // n_dev
    loss_fn = make_loss_fn(problem, net, config or SolverConfig())
    D, Dw, T = problem.dim, problem.noise_dim, problem.T
    x0 = jnp.asarray(problem.x0, jnp.float32)

    def local_step(params, opt_state, key):
        idx = jax.lax.axis_index(DP_AXIS)
        local_key = jax.random.fold_in(key, idx)
        kw, kn = jax.random.split(local_key)
        ts_local, dWs = time_major_batch(kw, m_local, N, Dw, T, chol)
        X0 = jnp.broadcast_to(x0, (m_local, D))

        def local_loss(p):
            return loss_fn(p, ts_local, dWs, X0, kn).loss

        loss_local, grads_local = jax.value_and_grad(local_loss)(params)
        # the reference loss is a SUM over the batch → psum is exact parity
        loss = jax.lax.psum(loss_local, DP_AXIS)
        grads = jax.tree.map(lambda g: jax.lax.psum(g, DP_AXIS), grads_local)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    step = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(step)
