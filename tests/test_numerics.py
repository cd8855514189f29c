"""Numerics oracle cross-checks (the reference's methodology, SURVEY.md §4,
promoted to automated tolerance-gated tests): closed form vs MC vs FD vs FFT
vs moment matching must agree within stated tolerances."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import integrate
from scipy.stats import norm as scipy_norm

from dnnpde_tpu.numerics import (
    CNGrid,
    HestonParams,
    basket_analytical_approx,
    basket_call_mc,
    basket_delta_mc,
    black_scholes_call,
    black_scholes_delta,
    bsb_exact_solution,
    call_price_grid,
    crank_nicolson_heston,
    fft_basket_call,
    gauss_legendre,
    heston_call_price,
    heston_mc_price,
    heston_price_surface,
    hjb_exact_mc,
    moment_matched_basket_call,
    vg_basket_call,
)
from dnnpde_tpu.sim import cholesky_factor, generate_correlation_matrix


# ----------------------------------------------------------------- quadrature
def test_gauss_legendre_vs_scipy():
    f = lambda x: jnp.exp(-x) * jnp.cos(3 * x)
    ours = float(gauss_legendre(f, 0.0, 50.0, order=128))
    ref, _ = integrate.quad(lambda x: np.exp(-x) * np.cos(3 * x), 0, 50)
    assert abs(ours - ref) < 1e-5  # float32 round-off bound


# -------------------------------------------------------------- black-scholes
def test_black_scholes_closed_form_value():
    # classic benchmark: S=100, K=100, T=1, r=0.05, sigma=0.2 → C ≈ 10.4506
    c = float(black_scholes_call(100.0, 100.0, 1.0, 0.05, 0.2))
    assert c == pytest.approx(10.4506, abs=2e-3)
    d = float(black_scholes_delta(100.0, 100.0, 1.0, 0.05, 0.2))
    d1 = (np.log(1.0) + (0.05 + 0.02) * 1.0) / 0.2
    assert d == pytest.approx(scipy_norm.cdf(d1), abs=1e-4)


def test_black_scholes_terminal_intrinsic():
    assert float(black_scholes_call(1.3, 1.0, 0.0, 0.05, 0.2)) == pytest.approx(0.3)
    assert float(black_scholes_call(0.7, 1.0, 0.0, 0.05, 0.2)) == 0.0


def test_call_price_grid_broadcast():
    X = jnp.linspace(0.5, 1.5, 11)[None, :].repeat(3, 0)  # (3, 11) paths
    t = jnp.linspace(0, 1.0, 11)
    prices, deltas = call_price_grid(X, t, K=1.0, T=1.0, r=0.05, sigma=0.2)
    assert prices.shape == (3, 11) and deltas.shape == (3, 11)
    # terminal column is intrinsic
    np.testing.assert_allclose(
        np.asarray(prices[:, -1]), np.maximum(np.asarray(X[:, -1]) - 1.0, 0.0), atol=1e-6
    )


def test_black_scholes_vs_mc(rng_key):
    c_exact = float(black_scholes_call(1.0, 1.0, 1.0, 0.05, 0.2))
    c_mc, se = basket_call_mc(
        rng_key, jnp.ones(1), 1.0, 1.0, 0.05, 0.2, payoff="sum", num_paths=400_000
    )
    assert abs(float(c_mc) - c_exact) < 4 * float(se)


def test_bsb_exact_solution_terminal():
    X = jnp.array([[1.0, 0.5, 2.0]])
    u_T = bsb_exact_solution(1.0, X, T=1.0)
    assert float(u_T[0, 0]) == pytest.approx(1 + 0.25 + 4)


# -------------------------------------------------------------------- heston
REF_HESTON = HestonParams()  # κ=2, θ=0.2, σ=0.3, ρ=0.8, v0=0.2, r=0.05, K=1, T=1


def _scipy_heston_price(S, V, p: HestonParams):
    """Independent scipy implementation of Heston 1993 for cross-validation."""

    def cf(phi, which):
        a = p.kappa * p.theta
        if which == 1:
            u, b = 0.5, p.kappa - p.rho * p.sigma
        else:
            u, b = -0.5, p.kappa
        rspi = p.rho * p.sigma * 1j * phi
        d = np.sqrt((rspi - b) ** 2 - p.sigma**2 * (2 * u * 1j * phi - phi**2))
        g = (b - rspi + d) / (b - rspi - d)
        ge = g * np.exp(d * p.T)
        C = p.r * 1j * phi * p.T + a / p.sigma**2 * (
            (b - rspi + d) * p.T - 2 * np.log((1 - ge) / (1 - g))
        )
        Dv = (b - rspi + d) / p.sigma**2 * ((1 - np.exp(d * p.T)) / (1 - ge))
        return np.exp(C + Dv * V + 1j * phi * np.log(S))

    def prob(which):
        integrand = lambda phi: np.real(
            np.exp(-1j * phi * np.log(p.K)) * cf(phi, which) / (1j * phi)
        )
        val, _ = integrate.quad(integrand, 1e-10, 100, limit=200)
        return 0.5 + val / np.pi

    # correct Heston assembly: S·P1 − K·e^{−rT}·P2 (see heston.py docstring
    # for the reference's discounting bug)
    return S * prob(1) - p.K * np.exp(-p.r * p.T) * prob(2)


def test_heston_closed_form_vs_scipy_quad():
    for S, V in [(1.0, 0.2), (0.8, 0.2), (1.2, 0.1), (1.0, 0.04)]:
        ours = float(heston_call_price(S, V, REF_HESTON, order=512))
        ref = _scipy_heston_price(S, V, REF_HESTON)
        assert ours == pytest.approx(ref, abs=2e-4), (S, V)


def test_heston_price_surface_monotone_in_S():
    S_vals = np.linspace(0.5, 1.5, 6)
    V_vals = np.array([0.1, 0.2])
    grid = np.asarray(heston_price_surface(S_vals, V_vals, REF_HESTON, order=256))
    assert grid.shape == (6, 2)
    assert (np.diff(grid[:, 0]) > 0).all()  # increasing in S
    assert (grid[:, 1] >= grid[:, 0] - 1e-6).all()  # increasing in v


def test_heston_mc_vs_closed_form(rng_key):
    exact = float(heston_call_price(1.0, REF_HESTON.v0, REF_HESTON, order=512))
    mc, se = heston_mc_price(rng_key, 1.0, REF_HESTON, num_paths=60_000, num_steps=400)
    assert abs(float(mc) - exact) < 4 * float(se) + 5e-3  # Milstein bias margin


def test_heston_mc_ii_three_way_cross_check(rng_key):
    """Closed form, reflection-Milstein MC (scheme I), and the independent
    truncation MC (scheme II, reference heston_closed_form_ii.py:6-114) must
    all agree — the triple oracle the reference runs by hand."""
    from dnnpde_tpu.numerics import heston_mc_price_ii

    exact = float(heston_call_price(1.0, REF_HESTON.v0, REF_HESTON, order=512))
    k1, k2 = jax.random.split(rng_key)
    mc1, se1 = heston_mc_price(k1, 1.0, REF_HESTON, num_paths=60_000, num_steps=400)
    mc2, se2 = heston_mc_price_ii(k2, 1.0, REF_HESTON, num_paths=60_000, num_steps=400)
    assert abs(float(mc2) - exact) < 4 * float(se2) + 5e-3
    assert abs(float(mc1) - float(mc2)) < 4 * (float(se1) + float(se2)) + 5e-3


def test_heston_mc_ii_off_equilibrium_v0(rng_key):
    """The v0 override prices from an off-equilibrium variance — used for the
    (S, v) surfaces (reference ii price_surface, :56-63)."""
    from dnnpde_tpu.numerics import heston_mc_price_ii

    lo, _ = heston_mc_price_ii(
        rng_key, 1.0, REF_HESTON, num_paths=30_000, num_steps=200, v0=0.05
    )
    hi, _ = heston_mc_price_ii(
        rng_key, 1.0, REF_HESTON, num_paths=30_000, num_steps=200, v0=0.5
    )
    assert float(hi) > float(lo)  # vega > 0


def test_heston_reference_compat_flag():
    """The reference's buggy assembly over-discounts: its value equals the
    correct price with the S·P1 term multiplied by e^{−rT}. The compat flag
    reproduces it exactly for side-by-side parity studies."""
    correct = float(heston_call_price(1.0, 0.2, REF_HESTON, order=512))
    compat = float(
        heston_call_price(1.0, 0.2, REF_HESTON, order=512, reference_compat=True)
    )
    assert compat < correct  # over-discounted
    assert compat == pytest.approx(0.169, abs=2e-3)
    assert correct == pytest.approx(0.1984, abs=2e-3)


@pytest.mark.slow
def test_crank_nicolson_vs_closed_form():
    # reference-style config: S0=K=100, r=0.03 (numerics/crank_nicolson.py:176-188)
    p = HestonParams(K=100.0, r=0.03, T=1.0, kappa=2.0, theta=0.2, sigma=0.3,
                     rho=0.8, v0=0.2)
    price, U, S, v = crank_nicolson_heston(
        100.0, p, CNGrid(S_max=200.0, v_max=0.5, n_S=60, n_v=30, n_t=400)
    )
    exact = _scipy_heston_price(100.0, 0.2, p)
    # Rannacher start-up + CN: sub-percent agreement at this grid
    assert price == pytest.approx(exact, rel=0.01)
    assert np.all(np.isfinite(np.asarray(U)))


# ------------------------------------------------------------------- baskets
def test_fft_vs_mc_vs_moment_matching(rng_key):
    D, K, T, r, sigma = 5, 1.0, 1.0, 0.05, 0.2
    C = generate_correlation_matrix(D, "restricted_random_correlation", seed=2)
    L = jnp.asarray(cholesky_factor(C))
    mc, se = basket_call_mc(
        rng_key, jnp.ones(D), K, T, r, sigma, chol=L, num_paths=400_000, payoff="mean"
    )
    fft_p = fft_basket_call(np.ones(D), K, T, r, sigma, corr=C)
    mm_p = moment_matched_basket_call(np.ones(D), K, T, r, sigma, corr=C)
    # lognormal-proxy methods vs MC: few-percent agreement expected
    assert fft_p == pytest.approx(float(mc), rel=0.05)
    assert mm_p == pytest.approx(float(mc), rel=0.05)
    assert abs(fft_p - mm_p) < 0.02


def test_analytical_basket_approx_uncorrelated(rng_key):
    # with ρ=0 the σ/√D rule IS the two-moment proxy to first order
    D = 10
    approx = float(basket_analytical_approx(np.ones(D), 1.0, 1.0, 0.05, 0.2, D))
    mc, se = basket_call_mc(
        rng_key, jnp.ones(D), 1.0, 1.0, 0.05, 0.2, num_paths=400_000, payoff="mean"
    )
    assert approx == pytest.approx(float(mc), rel=0.06)


def test_basket_delta_mc_sane(rng_key):
    D = 3
    deltas = np.asarray(
        basket_delta_mc(rng_key, jnp.ones(D), 1.0, 1.0, 0.05, 0.2, num_paths=100_000)
    )
    assert deltas.shape == (D,)
    assert (deltas > 0).all() and (deltas < 1).all()
    # symmetric basket → symmetric deltas
    assert np.abs(deltas - deltas.mean()).max() < 0.02


# ----------------------------------------------------------------------- hjb
def test_hjb_exact_mc_terminal_limit(rng_key):
    # at t → T the MC oracle reduces to g(x)
    x = np.zeros(10)
    u = float(hjb_exact_mc(rng_key, 1.0 - 1e-9, x, T=1.0))
    g = np.log(0.5 + 0.5 * (x**2).sum())
    assert u == pytest.approx(g, abs=1e-3)


def test_hjb_exact_mc_known_structure(rng_key):
    # u(t,0) in D dims is deterministic given samples; check reproducibility + range
    u1 = float(hjb_exact_mc(rng_key, 0.0, np.zeros(100), T=1.0))
    u2 = float(hjb_exact_mc(rng_key, 0.0, np.zeros(100), T=1.0))
    assert u1 == u2
    u3 = float(hjb_exact_mc(jax.random.PRNGKey(5), 0.0, np.zeros(100), T=1.0))
    assert u1 == pytest.approx(u3, rel=1e-2)
    assert 4.0 < u1 < 6.0  # log(1/2 + |N(0,2I_100)|²/2) ≈ log(100) ≈ 4.6


# ----------------------------------------------------------- variance gamma
def test_vg_pricer_finite_and_monotone_in_K():
    S0w = [(40.0, 1 / 3), (50.0, 1 / 3), (60.0, 1 / 3)]
    prices = [vg_basket_call(S0w, K, 1.0, 0.05) for K in (50.0, 55.0, 60.0)]
    assert all(np.isfinite(p) for p in prices)
    assert prices[0] >= prices[1] >= prices[2] >= 0  # decreasing in strike


def test_vg_matches_scipy_quad_formulation():
    """Our GL quadrature must reproduce the reference's scipy.quad integral."""
    S0w = [(100.0, 0.5), (100.0, 0.5)]
    sigma, nu, theta = 0.3477, 0.4932, -0.3919
    from dnnpde_tpu.numerics.variance_gamma import VGParams

    ours = vg_basket_call(S0w, 105.13, 1.0, 0.05, VGParams(sigma, nu, theta))
    B0 = 100.0
    omega = (1 / nu) * np.log(max(1e-10, 1 - theta * nu - 0.5 * sigma**2 * nu))

    def integrand(u):
        expo = 1j * u * (np.log(B0) + (0.05 + omega) * 1.0)
        denom = np.abs(1 - 1j * theta * nu * u + 0.5 * sigma**2 * nu * u**2) ** (1.0 / nu)
        cf = np.exp(expo) / denom
        return np.real(np.exp(-1j * u * np.log(105.13)) * cf / (1j * u))

    integral, _ = integrate.quad(integrand, 1e-10, 1000, limit=3000)
    ref = max(B0 - 105.13 * np.exp(-0.05) * (0.5 + integral / np.pi), 0.0)
    assert ours == pytest.approx(ref, abs=5e-3)


def test_basket_price_paths_mc(rng_key):
    from dnnpde_tpu.numerics import basket_price_paths_mc

    t, path = basket_price_paths_mc(
        rng_key, np.ones(3), 1.0, 1.0, 0.05, 0.2, N=10, num_paths=50_000
    )
    assert t.shape == (11,) and path.shape == (11,)
    # t=0 estimate is the discounted intrinsic of the forward-grown basket —
    # bounded below by intrinsic and near the MC price at the money
    mc, se = basket_call_mc(rng_key, jnp.ones(3), 1.0, 1.0, 0.05, 0.2,
                            num_paths=200_000)
    assert 0 < float(path[0]) < 3 * float(mc)
    assert np.isfinite(np.asarray(path)).all()


def test_heston_delta_gamma_surfaces():
    """Delta/gamma FD surfaces from the closed form: call delta in [0,1],
    gamma non-negative near the money (reference surface methods,
    numerics/sv_heston.py:74-96)."""
    from dnnpde_tpu.numerics import heston_delta_surface, heston_gamma_surface

    S_vals = np.linspace(0.6, 1.4, 9)
    V_vals = np.array([0.1, 0.2])
    delta = np.asarray(heston_delta_surface(S_vals, V_vals, REF_HESTON, order=128))
    gamma = np.asarray(heston_gamma_surface(S_vals, V_vals, REF_HESTON, order=128))
    assert delta.shape == gamma.shape == (9, 2)
    # interior deltas in (0, 1); last row zero-padded by the stencil
    assert (delta[:-1] > 0).all() and (delta[:-1] < 1).all()
    assert (gamma[1:-1] > -1e-3).all()
