"""Asian and lookback payoffs: the post_step state hook beyond barriers.

Like the barrier family (``test_barrier.py``), these are path-dependent
contracts the reference cannot express (every reference payoff is a
function of the terminal state alone, e.g. ``1d_BSPDE_case.py:246-289``).
The running statistic (average / minimum) rides as a state coordinate
updated by ``PDEProblem.post_step`` in BOTH transition kernels, so
``numerics.discrete_bsde_value`` is an exact oracle. Independent
cross-checks used here:

- a pure-numpy re-implementation of the Euler+post_step chain (different
  code path, different RNG — catches any jax-side chain bug),
- the Kemna–Vorst discrete GEOMETRIC Asian closed form (pathwise AM–GM:
  the arithmetic value sits above it, and close),
- the Goldman–Sosin–Gatto continuous lookback closed form (a strict
  upper bound for discrete monitoring, approached as N grows).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from dnnpde_tpu.numerics import (
    discrete_bsde_value,
    geometric_asian_call,
    lookback_call_floating,
)
from dnnpde_tpu.pde import AsianCallOption, LookbackCallOption
from dnnpde_tpu.train import Trainer


def _numpy_euler_value(problem, N, M=200_000, seed=123):
    """Independent numpy Euler+post_step chain: D(N) = E[g(X_N)]/(1+rΔt)^N."""
    rng = np.random.default_rng(seed)
    dt = problem.T / N
    X = np.broadcast_to(np.asarray(problem.x0, np.float64), (M, 2)).copy()
    r, sig = problem.r, problem.sigma_bar
    for n in range(N):
        dW = rng.standard_normal(M) * np.sqrt(dt)
        X[:, 0] = X[:, 0] * (1.0 + r * dt + sig * dW)
        t1 = np.full((M, 1), (n + 1) * dt)
        X = np.array(problem.post_step(jnp.asarray(t1), jnp.asarray(X)))
    pay = np.asarray(problem.g(jnp.asarray(X)))[:, 0]
    return pay.mean() / (1.0 + r * dt) ** N, pay.std() / np.sqrt(M)


class TestClosedForms:
    def test_geometric_asian_vs_exact_gbm_mc(self):
        """Kemna–Vorst discrete form vs EXACT GBM sampling (lognormal
        increments, not Euler) — validated at 0.05641 vs MC 0.05645±1.2e-4."""
        rng = np.random.default_rng(0)
        N, M = 50, 400_000
        dt = 1.0 / N
        Z = rng.standard_normal((M, N))
        logS = np.cumsum((0.05 - 0.02) * dt + 0.2 * np.sqrt(dt) * Z, axis=1)
        G = np.exp(logS.mean(axis=1))
        pay = np.exp(-0.05) * np.maximum(G - 1.0, 0.0)
        cf = geometric_asian_call(1.0, 1.0, 1.0, 0.05, 0.2, N)
        assert abs(cf - pay.mean()) < 4 * pay.std() / np.sqrt(M)

    def test_lookback_gsg_brackets_discrete_mc(self):
        """GSG continuous value sits just above a fine-grid (N=400) exact
        GBM discrete MC — gap ≈ β₁σ√(T/N) (Broadie–Glasserman–Kou).
        (Sized for a 1-core CI host: 32k×400 ≈ 13M normals, a few seconds;
        the bracket window scales as √(1/N) so the assertion stays sharp.)"""
        rng = np.random.default_rng(1)
        N, M = 400, 32_768
        logS = np.cumsum(
            (0.05 - 0.02) / N + 0.2 * np.sqrt(1.0 / N) * rng.standard_normal((M, N)),
            axis=1,
        )
        S = np.exp(logS)
        m = np.minimum(S.min(axis=1), 1.0)
        disc = np.exp(-0.05) * (S[:, -1] - m)
        se = disc.std() / np.sqrt(M)
        cf = lookback_call_floating(1.0, 1.0, 0.05, 0.2)
        gap = 0.5826 * 0.2 * np.sqrt(1.0 / N)  # ≈ 0.0058
        assert disc.mean() - 3 * se < cf < disc.mean() + 2.0 * gap + 3 * se


class TestAsian:
    def test_post_step_accumulates_running_average(self):
        p = AsianCallOption(N_samples=4)
        X = jnp.asarray([[2.0, 0.5]])
        out = p.post_step(jnp.zeros((1, 1)), X)
        np.testing.assert_allclose(np.asarray(out), [[2.0, 0.5 + 2.0 / 4]])

    def test_oracle_matches_independent_numpy_chain(self):
        p = AsianCallOption(N_samples=50)
        d = discrete_bsde_value(p, N=50, n_paths=262_144, seed=0)
        v_np, se_np = _numpy_euler_value(p, N=50)
        tol = 4.0 * np.hypot(d.standard_error, se_np)
        assert abs(d.value - v_np) < tol, (d.value, v_np, tol)

    def test_arithmetic_above_geometric_closed_form(self):
        """Pathwise AM–GM: arithmetic-average call ≥ geometric; Jensen gap
        small at σ=0.2, T=1 (measured ~3.9% relative)."""
        p = AsianCallOption(N_samples=50)
        d = discrete_bsde_value(p, N=50, n_paths=262_144, seed=1)
        geo = geometric_asian_call(1.0, p.strike, p.T, p.r, p.sigma_bar, 50)
        assert d.value > geo - 3 * d.standard_error
        assert d.value < 1.12 * geo  # close: the gap is O(σ²T)


class TestLookback:
    def test_post_step_tracks_running_min(self):
        p = LookbackCallOption()
        X = jnp.asarray([[0.8, 0.9], [1.2, 0.9]])
        out = p.post_step(jnp.zeros((2, 1)), X)
        np.testing.assert_allclose(np.asarray(out[:, 1]), [0.8, 0.9])

    def test_payoff_nonnegative_and_oracle_matches_numpy(self):
        p = LookbackCallOption()
        d = discrete_bsde_value(p, N=25, n_paths=262_144, seed=0)
        v_np, se_np = _numpy_euler_value(p, N=25)
        assert d.value > 0
        tol = 4.0 * np.hypot(d.standard_error, se_np)
        assert abs(d.value - v_np) < tol, (d.value, v_np, tol)

    def test_monitoring_bounds(self):
        """Discrete value increases with monitoring frequency (the min can
        only fall) and stays below the continuous GSG closed form; above
        the trivial forward bound S0(1 − e^{−rT})."""
        p = LookbackCallOption()
        d5 = discrete_bsde_value(p, N=5, n_paths=262_144, seed=2)
        d25 = discrete_bsde_value(p, N=25, n_paths=262_144, seed=2)
        cont = lookback_call_floating(1.0, p.T, p.r, p.sigma_bar)
        lower = 1.0 * (1.0 - np.exp(-p.r * p.T))
        se = 3 * max(d5.standard_error, d25.standard_error)
        assert lower < d5.value < d25.value + se
        assert d25.value < cont


@pytest.mark.slow
def test_asian_converges_to_discrete_oracle():
    """End-to-end (CPU budget): the running-average state is continuous
    (no value jumps), so the default objective setup prices the Asian
    within 5% of the matching discrete oracle."""
    N = 10
    p = AsianCallOption(N_samples=N)
    d = discrete_bsde_value(p, N=N, n_paths=1_000_000, seed=7)
    tr = Trainer(p, M=256, N=N, layers=[3, 32, 32, 32, 1], mode="FC",
                 activation="Sine", seed=0, ema_decay=0.999,
                 objective="local")
    tr.train(2500, 1e-3, log_every=500, verbose=False)
    tr.train(500, 1e-4, log_every=250, verbose=False)
    y0 = float(np.mean(tr.y0_log[-3:]))
    rel = abs(y0 - d.value) / d.value
    assert rel < 0.05, f"asian rel err {rel:.4f} vs D({N}) {d.value:.5f}"


@pytest.mark.slow
def test_lookback_converges_to_discrete_oracle():
    """End-to-end (CPU budget): running-min state, piecewise-smooth."""
    N = 10
    p = LookbackCallOption()
    d = discrete_bsde_value(p, N=N, n_paths=1_000_000, seed=7)
    tr = Trainer(p, M=256, N=N, layers=[3, 32, 32, 32, 1], mode="FC",
                 activation="Sine", seed=0, ema_decay=0.999,
                 objective="local")
    tr.train(2500, 1e-3, log_every=500, verbose=False)
    tr.train(500, 1e-4, log_every=250, verbose=False)
    y0 = float(np.mean(tr.y0_log[-3:]))
    rel = abs(y0 - d.value) / d.value
    assert rel < 0.05, f"lookback rel err {rel:.4f} vs D({N}) {d.value:.5f}"
