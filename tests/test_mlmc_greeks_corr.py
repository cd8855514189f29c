"""Tests: MLMC estimator, greeks via autodiff, correlation sensitivity + PCA."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dnnpde_tpu.evals import (
    RandomCorrelationSensitivityAnalysis,
    compute_greeks,
    equicorrelation_sensitivity,
    heston_greeks,
)
from dnnpde_tpu.numerics import basket_call_mc, black_scholes_call
from dnnpde_tpu.pde import BlackScholesBarenblatt, HestonPDE
from dnnpde_tpu.sim import (
    MLMCConfig,
    coupled_brownian_increments,
    mlmc_gbm_price,
    mlmc_minibatch,
)
from dnnpde_tpu.train import Trainer


# ------------------------------------------------------------------- MLMC
def test_coupled_increments_exact_coarsening(rng_key):
    dw_f, dw_c = coupled_brownian_increments(rng_key, 8, 12, 3, 0.01, factor=4)
    assert dw_f.shape == (8, 12, 3) and dw_c.shape == (8, 3, 3)
    np.testing.assert_allclose(
        np.asarray(dw_c),
        np.asarray(dw_f).reshape(8, 3, 4, 3).sum(axis=2),
        rtol=1e-6,
    )


def test_coupled_increments_bad_factor(rng_key):
    with pytest.raises(ValueError):
        coupled_brownian_increments(rng_key, 4, 10, 2, 0.1, factor=3)


def test_mlmc_price_matches_bs(rng_key):
    cfg = MLMCConfig(num_levels=4, M_const=2, N0=4, M0=200_000)
    price, se, diag = mlmc_gbm_price(
        rng_key, jnp.ones(1), 1.0, 1.0, 0.05, 0.2, cfg, payoff="sum"
    )
    exact = float(black_scholes_call(1.0, 1.0, 1.0, 0.05, 0.2))
    # MLMC at finest level N=32 Euler: weak error O(1/N) ≈ 0.3% + MC error
    assert abs(float(price) - exact) < 4 * float(se) + 0.004
    # correction variance must DECAY with level (the whole point of MLMC)
    assert diag[1]["var"] > diag[3]["var"]


def test_mlmc_correction_means_shrink(rng_key):
    cfg = MLMCConfig(num_levels=4, M_const=2, N0=4, M0=100_000)
    _, _, diag = mlmc_gbm_price(
        rng_key, jnp.ones(3), 1.0, 1.0, 0.05, 0.2, cfg, payoff="mean"
    )
    assert abs(diag[3]["mean"]) < abs(diag[1]["mean"]) + 1e-3


def test_mlmc_minibatch_coupling(rng_key):
    (t_f, w_f), (t_c, w_c) = mlmc_minibatch(rng_key, 4, 8, 2, T=1.0, factor=2)
    assert w_f.shape == (4, 9, 2) and w_c.shape == (4, 5, 2)
    # coarse path visits the same Brownian values at shared times
    np.testing.assert_allclose(
        np.asarray(w_c), np.asarray(w_f[:, ::2, :]), rtol=1e-5, atol=1e-6
    )
    assert float(t_c[0, -1, 0]) == pytest.approx(1.0)


# ----------------------------------------------------------------- greeks
@pytest.fixture(scope="module")
def heston_trainer():
    tr = Trainer(HestonPDE(), M=8, N=4, layers=[3, 16, 16, 16, 16, 1], seed=0)
    tr.train(10, 1e-3, log_every=10, verbose=False)
    return tr


def test_compute_greeks_shapes(heston_trainer):
    X = np.abs(np.random.default_rng(0).standard_normal((5, 2))) + 0.5
    t = np.zeros((5, 1))
    u, delta, gamma = compute_greeks(heston_trainer, t, X)
    assert u.shape == (5, 1) and delta.shape == (5, 2) and gamma.shape == (5, 2)
    assert np.isfinite(gamma).all()


def test_greeks_delta_matches_net_u(heston_trainer):
    """First-order greek must equal the solver's Z from net_u."""
    X = jnp.asarray([[1.0, 0.2], [0.9, 0.3]], jnp.float32)
    t = jnp.zeros((2, 1))
    _, delta, _ = compute_greeks(heston_trainer, t, X)
    _, Z = heston_trainer.net_u(heston_trainer.params, t, X)
    np.testing.assert_allclose(delta, np.asarray(Z), rtol=1e-4, atol=1e-6)


def test_heston_greeks_wrapper(heston_trainer):
    price, delta, gamma = heston_greeks(
        heston_trainer, [0.9, 1.0, 1.1], [0.2, 0.2, 0.2], t=0.0
    )
    assert price.shape == delta.shape == gamma.shape == (3,)


def test_greeks_use_ema_evaluates_the_shadow():
    """use_ema=True must price with the EMA shadow (same convention as
    Trainer.predict(use_ema=True)): after training, shadow != raw params,
    and greeks(use_ema=True) equals greeks of a trainer whose params are
    swapped for the shadow."""
    tr = Trainer(HestonPDE(), M=8, N=4, layers=[3, 16, 16, 1], seed=1,
                 ema_decay=0.9)
    tr.train(20, 1e-2, log_every=10, verbose=False)
    X = np.asarray([[1.0, 0.2], [1.1, 0.25]], np.float32)
    t = np.zeros((2, 1), np.float32)
    u_raw, _, _ = compute_greeks(tr, t, X)
    u_ema, _, _ = compute_greeks(tr, t, X, use_ema=True)
    assert not np.allclose(u_raw, u_ema)
    u_direct, _ = tr.net_u(tr.ema_params, jnp.asarray(t), jnp.asarray(X))
    np.testing.assert_allclose(u_ema, np.asarray(u_direct), rtol=1e-5)


def test_greeks_quadratic_sanity():
    """For a trainer whose exact solution is known (BSB: u ∝ ΣX² at t=T),
    gamma of the *payoff* g = ΣX² is exactly 2 — check autodiff wiring with
    an analytic function rather than a trained net."""
    prob = BlackScholesBarenblatt(D=3)
    X = jnp.asarray([[1.0, 2.0, 3.0]])
    g = lambda x: jnp.sum(x**2)
    gamma = jnp.diagonal(jax.jacfwd(jax.grad(g))(X[0]))
    np.testing.assert_allclose(np.asarray(gamma), 2.0)


# ---------------------------------------------- correlation sensitivity/PCA
def test_equicorrelation_monotone(rng_key):
    """Basket call value increases with uniform correlation (less
    diversification → fatter basket tail)."""
    prices = equicorrelation_sensitivity(
        np.ones(5), 1.0, 1.0, 0.05, 0.2, [0.0, 0.3, 0.6, 0.9],
        num_simulations=100_000,
    )
    assert (np.diff(prices) > 0).all()


def test_random_correlation_analysis_and_pca(tmp_path):
    an = RandomCorrelationSensitivityAnalysis(n=4)
    prices, mats = an.run_analysis(
        "restricted_random_correlation", num_simulations=20_000, num_samples=20
    )
    assert prices.shape == (20,) and mats.shape == (20, 16)
    assert np.isfinite(prices).all()
    comps, evr = an.pca_components(mats, n_components=2)
    assert comps.shape == (20, 2)
    assert 0 < evr.sum() <= 1.0 + 1e-9
    path = an.plot_pca_results(prices, mats, str(tmp_path / "pca.png"))
    import os

    assert os.path.getsize(path) > 0


def test_no_correlation_returns_empty_mats():
    an = RandomCorrelationSensitivityAnalysis(n=3)
    prices, mats = an.run_analysis("no_correlation", 10_000, num_samples=5)
    # identity matrices per scenario → all prices identical (common randoms)
    assert np.allclose(prices, prices[0])


def test_mlmc_with_correlation(rng_key):
    """Giles estimator under a correlated basket still matches plain MC."""
    from dnnpde_tpu.numerics import basket_call_mc
    from dnnpde_tpu.sim import cholesky_factor, generate_correlation_matrix

    C = generate_correlation_matrix(3, "restricted_random_correlation", seed=5)
    L = jnp.asarray(cholesky_factor(C))
    cfg = MLMCConfig(num_levels=4, M_const=2, N0=4, M0=150_000)
    price, se, _ = mlmc_gbm_price(
        rng_key, jnp.ones(3), 1.0, 1.0, 0.05, 0.2, cfg, chol=L, payoff="mean"
    )
    mc, mc_se = basket_call_mc(
        jax.random.PRNGKey(9), jnp.ones(3), 1.0, 1.0, 0.05, 0.2,
        chol=L, num_paths=300_000,
    )
    assert abs(float(price) - float(mc)) < 4 * (float(se) + float(mc_se)) + 0.004
