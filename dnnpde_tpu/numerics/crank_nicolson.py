"""Crank–Nicolson finite-difference solver for the Heston PDE (JAX-native).

Parity with the reference ``numerics/crank_nicolson.py:10-171``: a 2-D (S, v)
Crank–Nicolson scheme for

  U_τ = ½vS² U_SS + ρσvS U_Sv + ½σ²v U_vv + rS U_S + κ(θ−v) U_v − rU

solved forward in time-to-maturity τ from the call payoff, with Dirichlet
conditions at the S boundaries, one-sided differences at the v boundaries,
and bilinear interpolation of the solution at (S0, v0); Δ/Γ by central
differences on the grid (reference driver ``:174-239``).

TPU-native design: the reference assembles a scipy sparse operator and calls
``spsolve`` every time step (``:145-159``). The CN operator here is
time-independent, so the implicit matrix (I − Δτ/2·A) is LU-factorized
**once** and every step is a pair of (matvec, triangular solve) inside one
``lax.scan`` — no per-step Python, no re-factorization. For the reference's
grid sizes (≤ 50×25 → ≤ 1250 unknowns) dense LU is exact and tiny.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from dnnpde_tpu.numerics.heston import HestonParams

Array = jnp.ndarray


@dataclasses.dataclass(frozen=True)
class CNGrid:
    """Grid spec (reference defaults S_max=2K, v_max=0.5, 50×25×1000,
    ``numerics/crank_nicolson.py:176-188``)."""

    S_max: float
    v_max: float = 0.5
    n_S: int = 50
    n_v: int = 25
    n_t: int = 1000


def _build_operator(p: HestonParams, grid: CNGrid) -> np.ndarray:
    """Dense spatial operator A over the (n_S·n_v) unknowns (row-major S-major).

    Central differences in the interior; one-sided first derivatives at the
    v = 0 and v = v_max boundaries (diffusion vanishes at v = 0); S-boundary
    rows are left empty — they are imposed as Dirichlet conditions each step.
    Assembled host-side once with NumPy (setup, not hot path).
    """
    nS, nv = grid.n_S, grid.n_v
    S = np.linspace(0.0, grid.S_max, nS)
    v = np.linspace(0.0, grid.v_max, nv)
    dS = S[1] - S[0]
    dv = v[1] - v[0]
    n = nS * nv
    A = np.zeros((n, n))

    def idx(i, j):  # S index i, v index j
        return i * nv + j

    for i in range(1, nS - 1):
        for j in range(nv):
            row = idx(i, j)
            si, vj = S[i], v[j]
            # ½vS² U_SS (central in S)
            c_ss = 0.5 * vj * si**2 / dS**2
            A[row, idx(i - 1, j)] += c_ss
            A[row, idx(i, j)] += -2 * c_ss
            A[row, idx(i + 1, j)] += c_ss
            # rS U_S (central in S)
            c_s = p.r * si / (2 * dS)
            A[row, idx(i + 1, j)] += c_s
            A[row, idx(i - 1, j)] += -c_s
            # −rU
            A[row, idx(i, j)] += -p.r
            # κ(θ−v) U_v: one-sided at v-boundaries, central inside
            c_v = p.kappa * (p.theta - vj) / dv
            if j == 0:
                A[row, idx(i, 1)] += c_v
                A[row, idx(i, 0)] += -c_v
            elif j == nv - 1:
                A[row, idx(i, nv - 1)] += c_v
                A[row, idx(i, nv - 2)] += -c_v
            else:
                A[row, idx(i, j + 1)] += c_v / 2
                A[row, idx(i, j - 1)] += -c_v / 2
            if 0 < j < nv - 1:
                # ½σ²v U_vv (central in v)
                c_vv = 0.5 * p.sigma**2 * vj / dv**2
                A[row, idx(i, j - 1)] += c_vv
                A[row, idx(i, j)] += -2 * c_vv
                A[row, idx(i, j + 1)] += c_vv
                # ρσvS U_Sv (central cross)
                c_sv = p.rho * p.sigma * vj * si / (4 * dS * dv)
                A[row, idx(i + 1, j + 1)] += c_sv
                A[row, idx(i - 1, j - 1)] += c_sv
                A[row, idx(i + 1, j - 1)] += -c_sv
                A[row, idx(i - 1, j + 1)] += -c_sv
    return A


def crank_nicolson_heston(
    S0: float,
    params: HestonParams | None = None,
    grid: CNGrid | None = None,
) -> tuple[float, Array, Array, Array]:
    """Solve the Heston PDE by CN; returns (price at (S0, v0), U grid, S, v).

    Reference ``CrankNicolsonSolver.solve`` (``numerics/crank_nicolson.py:141-171``)
    plus the bilinear interpolation at ``:162-169``.
    """
    p = params or HestonParams()
    g = grid or CNGrid(S_max=2 * p.K)
    nS, nv = g.n_S, g.n_v
    S = np.linspace(0.0, g.S_max, nS)
    v = np.linspace(0.0, g.v_max, nv)
    dt = p.T / g.n_t

    A = _build_operator(p, g)
    n = nS * nv
    eye = np.eye(n)
    # Dirichlet rows at S boundaries: identity rows in both operators, value
    # injected through the RHS each step.
    bmask = np.zeros(n, dtype=bool)
    bmask[:nv] = True  # S = 0
    bmask[-nv:] = True  # S = S_max
    A[bmask, :] = 0.0

    impl = eye - 0.5 * dt * A
    expl = eye + 0.5 * dt * A
    expl_j = jnp.asarray(expl)
    lu, piv = jax.scipy.linalg.lu_factor(jnp.asarray(impl))
    # Rannacher start-up: fully-implicit Euler for the first steps damps the
    # CN oscillations seeded by the kinked call payoff (standard smoothing;
    # the reference's plain CN inherits the oscillation).
    lu_ie, piv_ie = jax.scipy.linalg.lu_factor(jnp.asarray(eye - dt * A))

    U0 = jnp.asarray(np.maximum(S[:, None] - p.K, 0.0) * np.ones((1, nv))).reshape(n)
    taus = jnp.arange(1, g.n_t + 1) * dt
    upper_mask = jnp.zeros(n).at[-nv:].set(1.0)
    lower_mask = jnp.zeros(n).at[:nv].set(1.0)
    rannacher = 2

    def apply_bc(rhs, tau):
        # Dirichlet: U(τ, 0, v) = 0; U(τ, S_max, v) = S_max − K e^{−rτ}
        upper_val = g.S_max - p.K * jnp.exp(-p.r * tau)
        return rhs * (1.0 - upper_mask - lower_mask) + upper_mask * upper_val

    u = U0
    for k in range(rannacher):  # implicit-Euler start-up (outside the scan)
        u = jax.scipy.linalg.lu_solve((lu_ie, piv_ie), apply_bc(u, taus[k]))

    def step(u, tau):
        u_next = jax.scipy.linalg.lu_solve((lu, piv), apply_bc(expl_j @ u, tau))
        return u_next, None

    U_final, _ = jax.lax.scan(step, u, taus[rannacher:])
    U_grid = U_final.reshape(nS, nv)

    price = float(
        bilinear_interpolate(U_grid, jnp.asarray(S), jnp.asarray(v), S0, p.v0)
    )
    return price, U_grid, jnp.asarray(S), jnp.asarray(v)


def bilinear_interpolate(U: Array, S: Array, v: Array, s0: float, v0: float) -> Array:
    """Bilinear interpolation of a (nS, nv) grid at (s0, v0)
    (reference ``numerics/crank_nicolson.py:162-169``)."""
    i = jnp.clip(jnp.searchsorted(S, s0) - 1, 0, S.shape[0] - 2)
    j = jnp.clip(jnp.searchsorted(v, v0) - 1, 0, v.shape[0] - 2)
    ws = (s0 - S[i]) / (S[i + 1] - S[i])
    wv = (v0 - v[j]) / (v[j + 1] - v[j])
    return (
        U[i, j] * (1 - ws) * (1 - wv)
        + U[i + 1, j] * ws * (1 - wv)
        + U[i, j + 1] * (1 - ws) * wv
        + U[i + 1, j + 1] * ws * wv
    )


def cn_delta_gamma(U: Array, S: Array, v: Array, v0: float) -> tuple[Array, Array]:
    """Δ and Γ along the S axis at v = v0 by central differences
    (reference driver ``numerics/crank_nicolson.py:203-237``)."""
    j = int(jnp.clip(jnp.searchsorted(v, v0), 0, v.shape[0] - 1))
    col = U[:, j]
    dS = S[1] - S[0]
    delta = (col[2:] - col[:-2]) / (2 * dS)
    gamma = (col[2:] - 2 * col[1:-1] + col[:-2]) / dS**2
    return delta, gamma
