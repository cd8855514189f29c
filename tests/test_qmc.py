"""Tests for the randomized-QMC (Owen-scrambled Sobol) discrete oracle.

The QMC oracle must be an *unbiased* estimator of the same quantity as
``discrete_bsde_value`` (the exact discrete-chain value) — it only changes
the point set, never the chain — and at equal path budget its replicate-
spread SE must be far below the pseudo-random oracle's (ADVICE r4 asked
for agreement on CallOption1D; VERDICT r4 asked for balance/unbiasedness/
bridge-invariance coverage).
"""

import numpy as np
import pytest

from dnnpde_tpu.numerics import (
    black_scholes_call,
    brownian_bridge_order,
    discrete_bsde_value,
    discrete_bsde_value_qmc,
    sobol_brownian_increments,
)
from dnnpde_tpu.numerics.qmc import _bridge_paths
from dnnpde_tpu.pde import CallOption1D, HestonPDE, UpAndOutCall


def test_bridge_order_is_permutation():
    for N in (1, 2, 3, 7, 8, 50, 64):
        order = brownian_bridge_order(N)
        assert sorted(order.tolist()) == list(range(N))
        assert order[0] == N - 1  # terminal point gets the best coordinate


def test_bridge_paths_covariance():
    """The bridge construction must reproduce Brownian covariance
    Cov[W_i, W_j] = min(i,j)+1 (in sqrt-dt units on the grid t_1..t_N)."""
    rng = np.random.default_rng(0)
    N, n = 8, 200_000
    z = rng.standard_normal((n, N, 1))
    W = _bridge_paths(z, N, np.float64)[:, :, 0]
    cov = W.T @ W / n
    want = np.minimum.outer(np.arange(1, N + 1), np.arange(1, N + 1))
    assert np.max(np.abs(cov - want)) < 0.15


def test_sobol_increments_power_of_two_and_balance():
    """Non-power-of-two n is rounded UP and the full 2^m set returned
    (never truncated — that would break Sobol balance); the per-step
    increment sample moments match N(0, dt) tightly (QMC balance beats
    the sqrt-n MC rate)."""
    dt = 0.02
    dW = sobol_brownian_increments(1000, N=4, Dw=2, dt=dt, seed=3)
    assert dW.shape == (1024, 4, 2)
    # Owen-scrambled Sobol at a power of two: means are near-exactly 0
    # (plain MC at n=1024 would have SE = sqrt(dt)/32 ~ 0.031*sqrt(dt)).
    assert np.max(np.abs(dW.mean(axis=0))) < 3e-3 * np.sqrt(dt)
    assert np.max(np.abs(dW.var(axis=0) - dt)) < 0.01 * dt


def test_sobol_increments_dtype_passthrough():
    d32 = sobol_brownian_increments(64, N=2, Dw=1, dt=0.5, dtype=np.float32)
    d64 = sobol_brownian_increments(64, N=2, Dw=1, dt=0.5, dtype=np.float64)
    assert d32.dtype == np.float32
    assert d64.dtype == np.float64


def test_qmc_agrees_with_pseudorandom_oracle_call1d():
    """Same chain, same value: QMC and plain-MC oracles must agree within
    their combined error bars on the 1D call, and both near Black-Scholes."""
    p = CallOption1D()
    q = discrete_bsde_value_qmc(p, N=32, n_paths=4096, n_replicates=8,
                                seed=0)
    d = discrete_bsde_value(p, N=32, n_paths=300_000, batch=100_000)
    tol = 3.0 * np.hypot(q.standard_error, d.standard_error) + 1e-5
    assert abs(q.value - d.value) < tol
    bs = float(black_scholes_call(1.0, p.K, p.T, p.r, p.sigma_bar))
    assert abs(q.value - bs) < 3e-3  # small Euler bias allowance at N=32
    # The point of QMC: far tighter error at a fraction of the paths.
    assert q.standard_error < d.standard_error
    assert q.n_paths == 4096 * 8


def test_qmc_unbiased_across_scrambles():
    """Independent scramble seeds are independent unbiased estimates: two
    disjoint runs agree within their combined replicate-spread SEs."""
    p = CallOption1D()
    a = discrete_bsde_value_qmc(p, N=16, n_paths=2048, n_replicates=8,
                                seed=0)
    b = discrete_bsde_value_qmc(p, N=16, n_paths=2048, n_replicates=8,
                                seed=10_000)
    tol = 4.0 * np.hypot(a.standard_error, b.standard_error) + 1e-6
    assert abs(a.value - b.value) < tol


def test_qmc_bridge_ordering_invariance():
    """Bridge vs time-order mapping changes only WHICH Sobol coordinate
    feeds which step — both are unbiased for the same chain value."""
    p = CallOption1D()
    a = discrete_bsde_value_qmc(p, N=16, n_paths=2048, n_replicates=8,
                                seed=0, bridge=True)
    b = discrete_bsde_value_qmc(p, N=16, n_paths=2048, n_replicates=8,
                                seed=0, bridge=False)
    tol = 4.0 * np.hypot(a.standard_error, b.standard_error) + 1e-6
    assert abs(a.value - b.value) < tol


def test_qmc_heston_chain():
    """2-noise-dim chain (Heston Cholesky diffusion) runs and lands near
    the pseudo-random oracle."""
    p = HestonPDE()
    q = discrete_bsde_value_qmc(p, N=16, n_paths=4096, n_replicates=8,
                                seed=1)
    d = discrete_bsde_value(p, N=16, n_paths=300_000, batch=100_000, seed=1)
    tol = 4.0 * np.hypot(q.standard_error, d.standard_error) + 1e-5
    assert abs(q.value - d.value) < tol


def test_qmc_post_step_chain():
    """post_step contracts (barrier monitor) ride the same QMC chain."""
    p = UpAndOutCall()
    q = discrete_bsde_value_qmc(p, N=16, n_paths=4096, n_replicates=8,
                                seed=2)
    d = discrete_bsde_value(p, N=16, n_paths=300_000, batch=100_000, seed=2)
    tol = 4.0 * np.hypot(q.standard_error, d.standard_error) + 1e-5
    assert abs(q.value - d.value) < tol
