"""Path-engine tests: increment statistics, correlation, martingale property."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dnnpde_tpu.sim import (
    brownian_increments,
    brownian_paths,
    cholesky_factor,
    euler_maruyama,
    gbm_paths,
    generate_correlation_matrix,
    make_positive_definite,
    paths_to_increments,
    time_grid,
)


def test_brownian_increment_moments(rng_key):
    M, N, D, dt = 4000, 10, 3, 0.01
    dw = np.asarray(brownian_increments(rng_key, M, N, D, dt))
    assert dw.shape == (M, N, D)
    assert abs(dw.mean()) < 3 * np.sqrt(dt / (M * N * D))  # 3 SE
    assert abs(dw.var() - dt) / dt < 0.05


def test_brownian_paths_shapes_and_grid(rng_key):
    t, w = brownian_paths(rng_key, 8, 5, 2, T=1.0)
    assert t.shape == (8, 6, 1) and w.shape == (8, 6, 2)
    assert np.allclose(np.asarray(t[0, :, 0]), np.linspace(0, 1, 6), atol=1e-6)
    assert np.allclose(np.asarray(w[:, 0, :]), 0.0)
    dt, dw = paths_to_increments(t, w)
    assert dt.shape == (8, 5, 1) and dw.shape == (8, 5, 2)
    assert np.allclose(np.asarray(dt), 0.2, atol=1e-6)


def test_correlated_increments_match_target_correlation(rng_key):
    D = 4
    C = generate_correlation_matrix(D, "random_correlation", seed=1)
    L = jnp.asarray(cholesky_factor(C))
    dw = np.asarray(brownian_increments(rng_key, 20000, 4, D, 0.25, chol=L))
    flat = dw.reshape(-1, D)
    emp = np.corrcoef(flat.T)
    assert np.abs(emp - C).max() < 0.03


@pytest.mark.parametrize(
    "ctype", ["no_correlation", "random_correlation", "restricted_random_correlation"]
)
def test_correlation_matrix_properties(ctype):
    C = generate_correlation_matrix(5, ctype, seed=3)
    assert np.allclose(np.diag(C), 1.0, atol=1e-8)
    assert np.allclose(C, C.T)
    np.linalg.cholesky(C)  # PD
    if ctype == "restricted_random_correlation":
        assert (C >= -1e-12).all()


def test_make_positive_definite_repairs():
    bad = np.array([[1.0, 0.999, 0.0], [0.999, 1.0, 0.999], [0.0, 0.999, 1.0]])
    bad[0, 2] = bad[2, 0] = -0.999  # violates PD
    fixed = make_positive_definite(bad)
    np.linalg.cholesky(fixed)


def test_euler_maruyama_gbm_moments(rng_key):
    """EM paths of GBM: E[S_T] = S0·e^{rT} (martingale-after-discount)."""
    M, N, D, T, r, sig = 20000, 50, 1, 1.0, 0.05, 0.2
    dw = brownian_increments(rng_key, M, N, D, T / N)
    x0 = jnp.ones((M, D))
    paths = euler_maruyama(
        mu=lambda t, x: r * x,
        sigma_dw=lambda t, x, dw_: sig * x * dw_,
        x0=x0,
        dW=dw,
        dt=T / N,
    )
    assert paths.shape == (M, N + 1, D)
    mean_T = float(np.asarray(paths[:, -1, 0]).mean())
    se = float(np.asarray(paths[:, -1, 0]).std()) / np.sqrt(M)
    assert abs(mean_T - np.exp(r * T)) < 4 * se + 2e-3  # EM bias O(dt)


def test_gbm_paths_exact_scheme(rng_key):
    M, N, T, r, sig = 40000, 20, 1.0, 0.05, 0.2
    paths = gbm_paths(rng_key, jnp.ones(1), r, sig, T, N, M)
    s_T = np.asarray(paths[:, -1, 0])
    se = s_T.std() / np.sqrt(M)
    assert abs(s_T.mean() - np.exp(r * T)) < 4 * se
    # lognormal variance check
    var_exact = np.exp(2 * r * T) * (np.exp(sig**2 * T) - 1)
    assert abs(s_T.var() - var_exact) / var_exact < 0.1


def test_gbm_antithetic_pairs(rng_key):
    paths = gbm_paths(rng_key, jnp.ones(1), 0.0, 0.2, 1.0, 4, 100, antithetic=True)
    logs = np.log(np.asarray(paths[:, -1, 0]))
    drift = -0.5 * 0.2**2  # log drift
    assert np.allclose(logs[:50] + logs[50:], 2 * drift, atol=1e-5)


def test_time_grid_broadcast():
    t = time_grid(3, 4, 2.0)
    assert t.shape == (3, 5, 1)
    assert np.allclose(np.asarray(t[2, :, 0]), [0, 0.5, 1.0, 1.5, 2.0])


def test_antithetic_increments_mirror_and_match_moments():
    """antithetic=True yields exact (dW, -dW) pairs: zero batch mean per
    (step, dim), same marginal variance, even-M enforced."""
    from dnnpde_tpu.sim.brownian import brownian_increments

    key = jax.random.PRNGKey(3)
    dw = brownian_increments(key, 64, 5, 3, 0.02, antithetic=True)
    np.testing.assert_allclose(np.asarray(dw[:32]), -np.asarray(dw[32:]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(dw).mean(axis=0), 0.0, atol=1e-7)
    assert abs(float(dw.std()) - np.sqrt(0.02)) < 0.02
    with pytest.raises(ValueError):
        brownian_increments(key, 7, 5, 3, 0.02, antithetic=True)


def test_antithetic_correlated_increments():
    """Cholesky correlation commutes with the antithetic mirror."""
    from dnnpde_tpu.sim.brownian import brownian_increments
    from dnnpde_tpu.sim.correlation import cholesky_factor, generate_correlation_matrix

    corr = generate_correlation_matrix(3, "random_correlation", seed=0)
    L = jnp.asarray(cholesky_factor(corr))
    dw = brownian_increments(jax.random.PRNGKey(0), 32, 4, 3, 0.1, chol=L,
                             antithetic=True)
    np.testing.assert_allclose(np.asarray(dw[:16]), -np.asarray(dw[16:]), rtol=1e-6)


def test_trainer_antithetic_trains():
    from dnnpde_tpu.pde import BlackScholesBarenblatt
    from dnnpde_tpu.train import Trainer

    prob = BlackScholesBarenblatt(D=4)
    tr = Trainer(prob, M=8, N=4, layers=[5, 16, 16, 16, 16, 1], mode="FC",
                 seed=0, antithetic=True)
    res = tr.train(6, 1e-3, log_every=3, verbose=False)
    assert np.isfinite(res.graph[1]).all()
    with pytest.raises(ValueError):
        Trainer(prob, M=7, N=4, layers=[5, 16, 16, 16, 16, 1], antithetic=True)
