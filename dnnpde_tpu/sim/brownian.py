"""On-device Brownian path generation.

The reference generates increments with host NumPy every training iteration
and pays a host→device copy (``fetch_minibatch``, ``1d_BSPDE_case.py:291-321``).
Here increments are drawn **inside the jitted step** from a threefry key, with
optional Cholesky correlation applied as a single batched matmul
(reference einsum ``with_corr_high_dimension_pde.py:339-341``).

Conventions: batch M, steps N, noise dim D.
  increments: dW (M, N, D); paths: W (M, N+1, D) with W[:, 0] = 0;
  time grid:  t  (M, N+1, 1) with t[:, n] = n·dt  (matches fetch_minibatch's
  cumsum layout where Dt[:, 0] = 0).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def brownian_increments(
    key: jax.Array,
    M: int,
    N: int,
    D: int,
    dt: float | Array,
    chol: Optional[Array] = None,
    dtype=jnp.float32,
    antithetic: bool = False,
) -> Array:
    """√dt · N(0, I) increments, optionally correlated: dW ← dW · Lᵀ.

    ``chol`` is the lower Cholesky factor L of the correlation matrix; the
    einsum ``L_{ij} dW_j`` (reference ``heston_dnnpde.py:339-341``) is written
    as ``dW @ Lᵀ`` so XLA maps it onto the MXU as one batched matmul.

    ``antithetic=True`` draws M/2 increments and mirrors them (dW, −dW) —
    a classic variance-reduction pairing the reference never uses: the
    minibatch loss/gradient estimator keeps its mean but its odd-moment
    noise cancels within each pair, at half the RNG cost. Requires even M.
    """
    if antithetic:
        if M % 2:
            raise ValueError(f"antithetic sampling requires even M, got {M}")
        half = jax.random.normal(key, (M // 2, N, D), dtype)
        dw = jnp.sqrt(dt).astype(dtype) * jnp.concatenate([half, -half], axis=0)
    else:
        dw = jnp.sqrt(dt).astype(dtype) * jax.random.normal(key, (M, N, D), dtype)
    if chol is not None:
        dw = dw @ chol.T.astype(dtype)
    return dw


def time_grid(M: int, N: int, T: float, dtype=jnp.float32) -> Array:
    """(M, N+1, 1) time grid with uniform dt = T/N (reference Dt-cumsum)."""
    t = jnp.linspace(0.0, T, N + 1, dtype=dtype).reshape(1, N + 1, 1)
    return jnp.broadcast_to(t, (M, N + 1, 1))


def brownian_paths(
    key: jax.Array,
    M: int,
    N: int,
    D: int,
    T: float,
    chol: Optional[Array] = None,
    dtype=jnp.float32,
) -> tuple[Array, Array]:
    """Sample (t, W) with the reference's ``fetch_minibatch`` shapes:
    t (M, N+1, 1), W (M, N+1, D), W[:, 0] = 0.
    """
    dt = T / N
    dw = brownian_increments(key, M, N, D, dt, chol, dtype)
    w = jnp.concatenate(
        [jnp.zeros((M, 1, D), dtype), jnp.cumsum(dw, axis=1)], axis=1
    )
    return time_grid(M, N, T, dtype), w


def time_major_batch(
    key: jax.Array,
    M: int,
    N: int,
    D: int,
    T: float,
    chol: Optional[Array] = None,
    dtype=jnp.float32,
) -> tuple[Array, Array]:
    """One training minibatch in the solver's time-major layout:
    (ts (N+1, M, 1), dWs (N, M, D)) — the common prep shared by the trainer
    chunk, the ensemble trainer, and the shard_map step."""
    ts = jnp.swapaxes(time_grid(M, N, T, dtype), 0, 1)
    dW = brownian_increments(key, M, N, D, T / N, chol, dtype)
    return ts, jnp.swapaxes(dW, 0, 1)


def paths_to_increments(t: Array, W: Array) -> tuple[Array, Array]:
    """Convert (t, W) path arrays to per-step (dt, dW) increments.

    Returns dt (M, N, 1) and dW (M, N, D) — the internal solver currency.
    """
    return jnp.diff(t, axis=1), jnp.diff(W, axis=1)
