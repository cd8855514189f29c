"""Tests for the discrete-N BSDE forward-MC oracle (numerics/discrete_bsde).

The oracle computes D(N) = E[g(X_N^Euler)]/(1+r·Δt)^N — the exact value of
the explicit Euler BSDE recursion for linear Z-free drivers — and is the
independent yardstick separating time-discretization bias from
optimization/approximation error (ARCHITECTURE.md §6b).
"""

import numpy as np
import pytest

from dnnpde_tpu.numerics import (
    discrete_bsde_surface,
    HestonParams,
    black_scholes_call,
    discrete_bsde_value,
    heston_call_price,
    probe_linear_driver,
)
from dnnpde_tpu.pde import (
    BasketCallOption,
    BlackScholesBarenblatt,
    CallOption1D,
    HamiltonJacobiBellman,
    HestonPDE,
)


def test_probe_accepts_linear_drivers():
    assert probe_linear_driver(CallOption1D()) == pytest.approx(0.01)
    assert probe_linear_driver(HestonPDE()) == pytest.approx(0.05)
    assert probe_linear_driver(BasketCallOption(D=3)) == pytest.approx(0.05)


def test_probe_rejects_z_coupled_drivers():
    """BSB's φ=r(Y−X·Z) and HJB's φ=‖Z‖² break the telescoping argument."""
    with pytest.raises(ValueError, match="depends on Z"):
        probe_linear_driver(BlackScholesBarenblatt(D=4))
    with pytest.raises(ValueError, match="depends on Z"):
        probe_linear_driver(HamiltonJacobiBellman(D=4))


def test_call_1d_discrete_value_approaches_black_scholes():
    """GBM Euler has small weak bias at N=50; D(50) must land within MC noise
    + a small discretization allowance of the closed form."""
    p = CallOption1D()
    out = discrete_bsde_value(p, N=50, n_paths=400_000, batch=100_000)
    bs = float(black_scholes_call(1.0, p.K, p.T, p.r, p.sigma_bar))
    assert out.rate == pytest.approx(p.r)
    assert out.n_paths >= 400_000
    assert abs(out.value - bs) < 3 * out.standard_error + 0.004 * bs


def _heston_cf(p):
    return float(heston_call_price(
        p.S0, p.v0,
        HestonParams(K=p.strike, r=p.r, T=p.T, kappa=p.kappa, theta=p.theta,
                     sigma=p.sigma_v, rho=p.rho, v0=p.v0)))


def test_heston_cholesky_discrete_value_matches_closed_form():
    """With the correct Cholesky diffusion (the HestonPDE default since
    round 3) the exact discrete value D(N) lands within MC noise + a small
    discretization allowance of the Heston closed form already at N=32."""
    p = HestonPDE()
    assert p.diffusion == "cholesky"
    out = discrete_bsde_value(p, N=32, n_paths=300_000, batch=100_000)
    cf = _heston_cf(p)
    assert abs(out.value - cf) < 3 * out.standard_error + 0.008 * cf


def test_heston_reference_diffusion_prices_a_different_model():
    """REFERENCE BUG #4: the reference's σ matrix (heston_dnnpde.py:593-605)
    is not a factor of the Heston covariance, so the model it simulates
    prices BELOW the Heston closed form (measured −2.4% at N=32, −3.6% in
    the continuum limit — BENCH_REPORT_r3.jsonl heston_discrete_value)."""
    p = HestonPDE(diffusion="reference")
    out = discrete_bsde_value(p, N=32, n_paths=300_000, batch=100_000)
    cf = _heston_cf(p)
    rel = (out.value - cf) / cf
    assert -0.06 < rel < -0.005, f"expected a clear negative bias, got {rel}"


def test_heston_cholesky_sigma_factors_the_heston_covariance():
    """σσᵀ must equal [[vS², ρσ_v·vS], [ρσ_v·vS, σ_v²·v]] for the default
    diffusion; the reference matrix must NOT (its Var(dv) is ~8× too big
    at the defaults)."""
    import jax.numpy as jnp

    p = HestonPDE()
    S, v = 1.3, 0.25
    X = jnp.asarray([[S, v]])
    t = jnp.zeros((1, 1))
    sig = np.asarray(p.sigma(t, X, jnp.zeros((1, 1))))[0]
    cov = sig @ sig.T
    expected = np.array([
        [v * S**2, p.rho * p.sigma_v * v * S],
        [p.rho * p.sigma_v * v * S, p.sigma_v**2 * v],
    ])
    np.testing.assert_allclose(cov, expected, rtol=1e-5)

    ref = HestonPDE(diffusion="reference")
    sig_r = np.asarray(ref.sigma(t, X, jnp.zeros((1, 1))))[0]
    cov_r = sig_r @ sig_r.T
    assert cov_r[1, 1] > 5 * expected[1, 1]  # the bug: huge Var(dv)

    with pytest.raises(ValueError, match="diffusion"):
        HestonPDE(diffusion="banana").sigma(t, X, jnp.zeros((1, 1)))


def test_antithetic_reduces_standard_error():
    p = CallOption1D()
    a = discrete_bsde_value(p, N=10, n_paths=100_000, batch=50_000,
                            antithetic=True)
    b = discrete_bsde_value(p, N=10, n_paths=100_000, batch=50_000,
                            antithetic=False)
    assert a.standard_error < b.standard_error
    assert np.isclose(a.value, b.value, rtol=0.02)


def test_discrete_surface_matches_pointwise_and_shares_compile():
    """discrete_bsde_surface at the problem's own x0 must agree with
    discrete_bsde_value (same estimator), and nearby states must move the
    value monotonically for a call payoff (higher S0 -> higher value)."""
    p = CallOption1D()
    x0s = np.array([[0.9], [1.0], [1.1]], np.float32)
    vals = discrete_bsde_surface(p, N=10, x0s=x0s, n_paths=60_000,
                                 batch=30_000, seed=0)
    point = discrete_bsde_value(p, N=10, n_paths=60_000, batch=30_000,
                                seed=1000)  # surface row i=1 uses seed+1000
    assert vals[1].value == pytest.approx(point.value, abs=1e-9)
    assert vals[0].value < vals[1].value < vals[2].value
    assert all(v.standard_error > 0 for v in vals)

    with pytest.raises(ValueError, match="x0s"):
        discrete_bsde_surface(p, N=10, x0s=np.zeros((3,)), n_paths=1000)
