"""Pallas kernel tests. On the CPU test backend the public API routes to a
jnp implementation of the kernel's exact math (the interpreter's PRNG is not
statistically faithful off-TPU); the statistical assertions therefore gate
the shared math, and the interpreted Pallas lowering gets a compile/run
smoke check. The kernel's on-hardware statistics are validated by
scripts/verify_tpu_kernels.py on a real chip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dnnpde_tpu.numerics import black_scholes_call
from dnnpde_tpu.ops import pallas_basket_call_mc, pallas_gbm_terminal
from dnnpde_tpu.sim import cholesky_factor, generate_correlation_matrix

# interpreter mode is slow — keep sizes small
M, N, D = 1024, 5, 3


def test_gbm_terminal_moments():
    ST = np.asarray(
        pallas_gbm_terminal(0, np.ones(D), 0.05, 0.2, 1.0, N, M, tile_m=256)
    )
    assert ST.shape == (M, D)
    assert (ST > 0).all()
    logs = np.log(ST)
    # E[logS_T] = (r - sigma^2/2)T, std = sigma sqrt(T)
    se = 0.2 / np.sqrt(M)
    assert abs(logs.mean() - 0.03) < 4 * se
    assert abs(logs.std() - 0.2) < 0.02


def test_gbm_terminal_correlated():
    C = generate_correlation_matrix(D, "random_correlation", seed=1)
    L = cholesky_factor(C)
    ST = np.asarray(
        pallas_gbm_terminal(1, np.ones(D), 0.0, 0.3, 1.0, N, 4096, chol=L, tile_m=256)
    )
    emp = np.corrcoef(np.log(ST).T)
    assert np.abs(emp - C).max() < 0.08


def test_gbm_terminal_seed_determinism():
    a = np.asarray(pallas_gbm_terminal(7, np.ones(D), 0.05, 0.2, 1.0, N, M, tile_m=256))
    b = np.asarray(pallas_gbm_terminal(7, np.ones(D), 0.05, 0.2, 1.0, N, M, tile_m=256))
    c = np.asarray(pallas_gbm_terminal(8, np.ones(D), 0.05, 0.2, 1.0, N, M, tile_m=256))
    np.testing.assert_array_equal(a, b)
    assert not np.allclose(a, c)


def test_gbm_terminal_tiles_differ():
    """Each grid program must seed independently — tiles must not repeat."""
    ST = np.asarray(
        pallas_gbm_terminal(0, np.ones(1), 0.0, 0.2, 1.0, 2, 512, tile_m=256)
    )
    assert not np.allclose(ST[:256], ST[256:])


def test_pallas_mc_price_vs_black_scholes():
    p, se = pallas_basket_call_mc(
        3, np.ones(1), 1.0, 1.0, 0.05, 0.2, num_paths=8192, num_steps=2, payoff="sum"
    )
    exact = float(black_scholes_call(1.0, 1.0, 1.0, 0.05, 0.2))
    assert abs(float(p) - exact) < 4 * float(se)


def test_m_not_multiple_of_tile_raises():
    with pytest.raises(ValueError):
        pallas_gbm_terminal(0, np.ones(D), 0.05, 0.2, 1.0, N, 100, tile_m=256)


def test_interpreted_pallas_lowering_compiles():
    """The actual Pallas kernel must lower and execute under the TPU
    interpreter (shape/compile check only — see module docstring)."""
    out = pallas_gbm_terminal(
        0, np.ones(D), 0.05, 0.2, 1.0, 2, 256, tile_m=256, interpret=True
    )
    assert out.shape == (256, D)
    assert np.isfinite(np.asarray(out)).all()
