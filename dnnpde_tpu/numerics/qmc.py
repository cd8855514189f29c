"""Randomized quasi-Monte Carlo (Owen-scrambled Sobol) oracle pricing.

The reference's ground-truth pricers are all plain Monte Carlo (e.g.
``numerics/multidimensional_mc_pricer.py:39-93``,
``heston_dnnpde.py:309-343``) — their standard error shrinks as n^{-1/2}.
This module upgrades the framework's training-free discrete-BSDE oracle
(``numerics/discrete_bsde.py``) to randomized QMC:

- **Sobol points** (scipy's direction numbers, up to 21201 dimensions)
  replace pseudo-random draws; smooth integrands converge near n^{-1}.
- **Owen scrambling** keeps every replicate an *unbiased* estimator, so
  R independent scrambles give both the value (mean of replicate means)
  and an honest standard error (spread of replicate means / √R) — the
  plain-MC within-batch SE formula does not apply to QMC points, which
  are deliberately anti-independent.
- **Brownian-bridge ordering** maps the best-equidistributed leading
  Sobol coordinates onto the path's coarsest structure (W_T first, then
  midpoints, recursively): for payoffs dominated by the terminal state —
  every contract in the zoo — this concentrates the integrand's variance
  in the first few QMC dimensions, where Sobol is strongest.

The chain itself is the solver's exact jitted Euler recursion (same μ, σ,
``sigma_dw``, ``post_step``, dtype as ``solver/bsde.py::em_step``): points
are generated host-side (scipy owns the direction numbers), transformed to
increments, and the N-step rollout runs on device.

Measured (results_r5/qmc_oracle.log): equal-path-count SE vs the
pseudo-random oracle on the 1D call / Heston chains, plus the n^-alpha
convergence-rate fit per replicate size.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from scipy.stats import norm as _norm
from scipy.stats import qmc as _qmc

from dnnpde_tpu.numerics.discrete_bsde import probe_linear_driver

Array = jnp.ndarray

# scipy's Joe–Kuo direction numbers end here; beyond it QMC cannot be used.
_SOBOL_MAX_DIM = 21201


def brownian_bridge_order(N: int) -> np.ndarray:
    """Time-step visitation order for the Brownian-bridge construction.

    Returns a permutation ``order`` of {0, …, N−1} (grid indices of the
    path times t_1 … t_N): ``order[0] = N−1`` (the terminal point, built
    from the first — best — QMC coordinate), then recursively the midpoint
    of each longest unresolved span. Standard Caflisch–Morokoff–Owen
    bridge ordering.
    """
    order = [N - 1]
    spans = [(-1, N - 1)]  # (known left grid index, known right grid index)
    while spans:
        nxt = []
        for lo, hi in spans:
            if hi - lo <= 1:
                continue
            mid = (lo + hi) // 2
            order.append(mid)
            nxt.append((lo, mid))
            nxt.append((mid, hi))
        spans = nxt
    return np.asarray(order, np.int64)


def _bridge_paths(z_bridge: np.ndarray, N: int, dtype) -> np.ndarray:
    """Assemble standardized Brownian paths W(t_k)/√dt from bridge normals.

    ``z_bridge``: (n, N, Dw) standard normals in BRIDGE order — column k
    holds the normal consumed at the k-th visit of the (BFS) span order
    that :func:`brownian_bridge_order` defines. Returns W at grid indices
    0…N−1 (times t_1…t_N) in units of √dt, so W(t_j) has variance (j+1)
    and per-step increments are standard normals.
    """
    n, _, Dw = z_bridge.shape
    W = np.empty((n, N, Dw), dtype)
    # First visit: terminal point, unconditional N(0, N) in √dt units.
    W[:, N - 1] = np.sqrt(float(N)) * z_bridge[:, 0]
    col = 1
    # Conditional bridge fill, same BFS span walk as brownian_bridge_order:
    # visiting grid index mid inside (lo, hi) with W known at both ends
    # (W at the virtual index −1 is 0).
    pend = [(-1, N - 1)]
    while pend:
        nxt = []
        for lo, hi in pend:
            if hi - lo <= 1:
                continue
            mid = (lo + hi) // 2
            Wlo = 0.0 if lo < 0 else W[:, lo]
            Whi = W[:, hi]
            a = float(mid - lo)
            b = float(hi - mid)
            mean = (b * Wlo + a * Whi) / (a + b)
            std = np.sqrt(a * b / (a + b))
            W[:, mid] = mean + std * z_bridge[:, col]
            col += 1
            nxt.append((lo, mid))
            nxt.append((mid, hi))
        pend = nxt
    return W


def sobol_brownian_increments(
    n: int,
    N: int,
    Dw: int,
    dt: float,
    seed: int = 0,
    dtype=np.float32,
    bridge: bool = True,
) -> np.ndarray:
    """(n, N, Dw) Brownian increments from one Owen-scrambled Sobol stream.

    ``bridge=True`` applies the Brownian-bridge ordering (terminal point
    first); ``bridge=False`` maps Sobol coordinates to steps in time order
    (useful as an ablation). ``n`` is rounded UP to the next power of two
    and the FULL 2^m point set is returned (its first axis may therefore
    be larger than ``n``) — truncating a Sobol sequence off a power of two
    silently destroys its balance properties, so we never do it.
    """
    dim = N * Dw
    if dim > _SOBOL_MAX_DIM:
        raise ValueError(
            f"QMC dimension N*Dw = {dim} exceeds the Sobol table "
            f"({_SOBOL_MAX_DIM}); use the pseudo-random oracle"
        )
    m = int(np.ceil(np.log2(max(n, 2))))
    n = 1 << m
    eng = _qmc.Sobol(d=dim, scramble=True, seed=seed)
    u = eng.random_base2(m)
    # Scrambling keeps points in (0,1) almost surely; clip for ppf safety.
    z = _norm.ppf(np.clip(u, 1e-12, 1.0 - 1e-12)).astype(np.float64)
    # Coordinate k*Dw+j → bridge position k, noise dim j: each noise dim
    # gets an equally-good slice of the leading coordinates.
    z = z.reshape(n, N, Dw)
    sqrt_dt = np.sqrt(dt)
    if not bridge:
        return (sqrt_dt * z).astype(dtype)
    W = _bridge_paths(z, N, np.float64)  # (n, N, Dw), √dt units
    dW = np.empty_like(W)
    dW[:, 0] = W[:, 0]
    dW[:, 1:] = W[:, 1:] - W[:, :-1]
    return (sqrt_dt * dW).astype(dtype)


class QMCValue(NamedTuple):
    """Randomized-QMC estimate with an honest (replicate-spread) SE."""

    value: float
    standard_error: float
    n_paths: int
    n_replicates: int
    N: int
    rate: float


# jitted fed-increment terminal chains, keyed like discrete_bsde._KERNELS.
_KERNELS: dict = {}


def _make_chain(problem, N, batch, chol, dtype):
    """jitted (x0, dW (batch, N, Dw)) → Σ g(X_N), discounting left to host."""
    D = problem.dim
    dt = problem.T / N
    chol_T = None if chol is None else jnp.asarray(chol, dtype).T
    Yz = jnp.zeros((batch, 1), dtype)
    Zz = jnp.zeros((batch, D), dtype)

    def run(x0, dWs):
        def step(X0, inp):
            n, dw = inp
            if chol_T is not None:
                dw = dw @ chol_T
            t0 = n[None, None] * dt
            t0 = jnp.broadcast_to(t0.astype(dtype), (batch, 1))
            sig = problem.sigma(t0, X0, Yz)
            X1 = (
                X0
                + problem.mu(t0, X0, Yz, Zz) * dt
                + problem.sigma_dw(sig, dw)
            )
            if problem.has_post_step:
                X1 = problem.post_step(t0 + dt, X1)
            return X1, None

        X0 = jnp.broadcast_to(jnp.asarray(x0, dtype), (batch, D))
        dWs = jnp.swapaxes(dWs, 0, 1)  # (N, batch, Dw) — scan-major
        XN, _ = jax.lax.scan(
            step, X0, (jnp.arange(N, dtype=dtype), dWs)
        )
        return jnp.sum(problem.g(XN)[:, 0])

    return jax.jit(run)


def discrete_bsde_value_qmc(
    problem,
    N: int,
    n_paths: int = 65_536,
    n_replicates: int = 16,
    seed: int = 0,
    chol: Optional[Array] = None,
    dtype=jnp.float32,
    x0: Optional[Array] = None,
    bridge: bool = True,
) -> QMCValue:
    """Randomized-QMC D(N) = E[g(X_N)]/(1+r·Δt)^N on the solver's chain.

    Same value as :func:`numerics.discrete_bsde_value` (both unbiased for
    the identical discrete chain), typically at a far smaller SE per path:
    ``n_replicates`` independent Owen scrambles of ``n_paths`` Sobol points
    each. The SE comes from the replicate spread — the only valid error
    bar for QMC points (within one scramble the points are negatively
    dependent by construction).
    """
    rate = probe_linear_driver(problem)
    Dw, T = problem.noise_dim, problem.T
    dt = T / N
    # Round up to a power of two (Sobol balance) and key the kernel on it.
    n = 1 << int(np.ceil(np.log2(max(n_paths, 2))))
    cache_key = (
        problem, N, n, jnp.dtype(dtype).name,
        None if chol is None else np.asarray(chol).tobytes(),
    )
    try:
        fn = _KERNELS.get(cache_key)
    except TypeError:
        fn, cache_key = None, None
    if fn is None:
        fn = _make_chain(problem, N, n, chol, dtype)
        if cache_key is not None:
            _KERNELS[cache_key] = fn
    x0 = jnp.asarray(problem.x0 if x0 is None else x0, dtype)
    # Increments at the kernel's own precision: a float64 kernel request
    # must not silently run on float32 increments.
    inc_dtype = np.dtype(jnp.dtype(dtype).name)
    means = np.empty(n_replicates, np.float64)
    for r in range(n_replicates):
        dW = sobol_brownian_increments(
            n, N, Dw, dt, seed=seed + 7919 * r, dtype=inc_dtype,
            bridge=bridge,
        )
        means[r] = float(fn(x0, jnp.asarray(dW))) / n
    disc = float((1.0 + rate * dt) ** (-N))
    value = disc * float(means.mean())
    se = disc * float(means.std(ddof=1) / np.sqrt(n_replicates))
    return QMCValue(
        value=value,
        standard_error=se,
        n_paths=n * n_replicates,
        n_replicates=n_replicates,
        N=N,
        rate=rate,
    )
