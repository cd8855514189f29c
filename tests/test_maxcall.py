"""Bermudan max-call: multi-asset optimal stopping (``pde.BermudanMaxCall``).

The reference's only high-dimensional payoff family is the European basket
call (``high_dimension_test.py:627-629``) — no early exercise anywhere.
This problem is its optimal-stopping extension, graded against PUBLISHED
benchmark values (Broadie–Glasserman / Andersen–Broadie 2004 Table 2;
Becker–Cheridito–Jentzen 2019 Table 2: d=2 → 13.902, d=5 → 26.15) and,
at d=1, against an independent dividend-CRR Bermudan tree.

Three exactness properties make the solver chain bias-free (so any error
is learning/MC error, not scheme error), each pinned here:
- log-state ⇒ the Euler step IS the exact GBM transition,
- driver rate r̂ = (e^{rΔt}−1)/Δt ⇒ per-step (1+r̂Δt)⁻¹ = e^{−rΔt} exactly,
- the Snell clamp masked to the 9 contract dates via ``exercise_every``.

The full-budget training gate (d∈{2,5} vs published) runs in the TPU
study ``scripts/studies_r5.py max_call``.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from dnnpde_tpu.numerics import basis_size, crr_binomial, lsmc_value
from dnnpde_tpu.numerics.longstaff_schwartz import _MAX_BASIS, _basis
from dnnpde_tpu.pde import AmericanPutOption, BermudanMaxCall
from dnnpde_tpu.train import Trainer

PUBLISHED = {2: 13.902, 3: 18.69, 5: 26.15}  # S0=100, Andersen–Broadie


class TestProblemChain:
    def test_r_hat_makes_per_step_discount_exact(self):
        p = BermudanMaxCall(D=2)
        dt = p.T / p.N_steps
        assert 1.0 / (1.0 + p.r_hat * dt) == pytest.approx(
            np.exp(-p.r * dt), rel=1e-12)

    def test_exercise_dates_are_the_nine_contract_dates(self):
        p = BermudanMaxCall(D=2, N_steps=45)
        assert p.exercise_every == 5
        dates = [n for n in range(1, 46) if n % p.exercise_every == 0]
        assert len(dates) == 9 and dates[-1] == 45

    def test_grid_must_cover_the_dates(self):
        with pytest.raises(ValueError):
            BermudanMaxCall(D=2, N_steps=44)

    def test_head_exact_at_maturity(self):
        """At τ=0 the BS anchor collapses to intrinsic and the premium to
        zero, so transform_u(T, ·, u) == g(·) for ANY net output — the
        terminal residual carries no head-induced bias."""
        p = BermudanMaxCall(D=3)
        X = jnp.log(jnp.asarray([[80.0, 100.0, 125.0],
                                 [90.0, 95.0, 101.0]]))
        u = jnp.asarray([[2.7], [-1.3]])
        out = p.transform_u(jnp.full((2, 1), p.T), X, u)
        np.testing.assert_allclose(np.asarray(out), np.asarray(p.g(X)),
                                   rtol=0, atol=2e-4)

    def test_payoff_is_max_call(self):
        p = BermudanMaxCall(D=2)
        X = jnp.log(jnp.asarray([[110.0, 90.0], [95.0, 99.0]]))
        np.testing.assert_allclose(np.asarray(p.g(X))[:, 0], [10.0, 0.0],
                                   atol=1e-4)


class TestSortedBasis:
    def test_permutation_invariant(self):
        """The order-statistics features cannot depend on asset labels —
        exchangeable dynamics + symmetric payoff ⇒ symmetric continuation."""
        rng = np.random.default_rng(0)
        X = rng.lognormal(0.0, 0.3, (64, 5))
        g = np.maximum(X.max(axis=1) - 1.0, 0.0)
        perm = rng.permutation(5)
        a = _basis(X, g, 3, basis="sorted", basis_top=3)
        b = _basis(X[:, perm], g, 3, basis="sorted", basis_top=3)
        np.testing.assert_allclose(a, b, rtol=1e-12)

    def test_basis_size_formula_matches_built_columns(self):
        rng = np.random.default_rng(1)
        for D, degree, basis in [(2, 3, "monomial"), (5, 3, "sorted"),
                                 (2, 2, "sorted"), (50, 3, "sorted")]:
            X = rng.lognormal(0.0, 0.3, (32, D))
            g = np.maximum(X.max(axis=1) - 1.0, 0.0)
            Phi = _basis(X, g, degree, basis=basis)
            assert Phi.shape[1] == basis_size(D, degree, basis)

    def test_sorted_constant_in_dimension(self):
        assert basis_size(5, 3, "sorted") == basis_size(500, 3, "sorted")

    def test_monomial_cap_raises(self):
        assert basis_size(10, 3) > _MAX_BASIS
        rng = np.random.default_rng(2)
        X = rng.lognormal(0.0, 0.3, (8, 10))
        g = np.maximum(X.max(axis=1) - 1.0, 0.0)
        with pytest.raises(ValueError, match="cap"):
            _basis(X, g, 3, basis="monomial")


class TestLSMCExerciseDates:
    def test_sparser_dates_worth_less(self):
        """Bermudan-3 ≤ Bermudan-9 on the identical chain (fewer rights),
        both above the European leg (exercise only at maturity)."""
        p = BermudanMaxCall(D=2, N_steps=9)
        kw = dict(N=9, n_regression=32_768, n_pricing=65_536, seed=0,
                  basis="sorted")
        b9 = lsmc_value(p, exercise_every=1, **kw)
        b3 = lsmc_value(p, exercise_every=3, **kw)
        eu = lsmc_value(p, exercise_every=9, **kw)
        se = 4 * max(b9.standard_error, b3.standard_error,
                     eu.standard_error)
        assert b3.value <= b9.value + se
        assert eu.value <= b3.value + se

    def test_grid_multiple_validation(self):
        p = BermudanMaxCall(D=2, N_steps=9)
        with pytest.raises(ValueError, match="multiple"):
            lsmc_value(p, N=9, n_regression=4096, n_pricing=4096,
                       exercise_every=4)

    def test_put_family_unaffected_by_default(self):
        """exercise_every defaults to the problem's own attribute — 1 for
        the put family, so nothing changes for round-4 callers."""
        p = AmericanPutOption()
        assert p.exercise_every == 1


class TestAgainstIndependentOracles:
    def test_d1_degenerates_to_dividend_call_tree(self):
        """At D=1 the max-call IS an American-style call on a dividend
        payer (δ=10% > r ⇒ early exercise strictly valuable); a fine CRR
        tree with exercise masked to the SAME 9 dates is an independent
        discretization of the same contract. Measured: LSMC 7.943±0.032
        vs tree 7.964 (0.26%, inside the LSMC low bias + scheme gap)."""
        p = BermudanMaxCall(D=1, N_steps=45)
        v = lsmc_value(p, N=45, n_regression=65_536, n_pricing=131_072,
                       seed=0)
        tree = crr_binomial(p.S0, p.K, p.T, p.r, p.sigma_bar,
                            n_steps=45 * 40, payoff="call", american=True,
                            exercise_every=5 * 40, q=p.delta)
        eu = crr_binomial(p.S0, p.K, p.T, p.r, p.sigma_bar,
                          n_steps=45 * 40, payoff="call", american=False,
                          q=p.delta)
        assert abs(v.value - tree) / tree < 0.01, (v.value, tree)
        assert tree - eu > 1.5  # the dividend-call early-exercise premium

    @pytest.mark.slow
    def test_d2_matches_published_benchmark(self):
        """Published Bermudan-9 value 13.902 (Andersen–Broadie Table 2).
        Full budget measures 13.874±0.030; this reduced budget gates 1%."""
        p = BermudanMaxCall(D=2)
        v = lsmc_value(p, N=45, n_regression=65_536, n_pricing=131_072,
                       seed=0, basis="sorted")
        assert abs(v.value - PUBLISHED[2]) / PUBLISHED[2] < 0.01, v.value

    @pytest.mark.slow
    def test_d5_matches_published_benchmark(self):
        """Published 26.15; full budget measures 26.157±0.038."""
        p = BermudanMaxCall(D=5)
        v = lsmc_value(p, N=45, n_regression=65_536, n_pricing=131_072,
                       seed=0, basis="sorted")
        assert abs(v.value - PUBLISHED[5]) / PUBLISHED[5] < 0.01, v.value


class TestSolverIntegration:
    def test_loss_compiles_and_trains_a_step(self):
        """The masked Snell clamp + local objective compile and descend on
        a tiny budget; the learned value stays in a sane bracket."""
        p = BermudanMaxCall(D=2, N_steps=9)
        tr = Trainer(p, M=64, N=9, layers=[3, 16, 16, 1], mode="FC",
                     activation="Sine", seed=0, objective="local")
        tr.train(60, 1e-3, log_every=30, verbose=False)
        u, _ = tr.net_u(tr.params, jnp.zeros((1, 1)), p.x0[None, :])
        y0 = float(p.value_u(p.x0[None, :], u)[0, 0])
        assert np.isfinite(y0) and 0.0 < y0 < 60.0

    def test_global_objective_rejected(self):
        p = BermudanMaxCall(D=2, N_steps=9)
        with pytest.raises(ValueError):
            tr = Trainer(p, M=16, N=9, layers=[3, 8, 1], mode="FC",
                         activation="Sine", seed=0, objective="global")
            tr.train(1, 1e-3, verbose=False)

    def test_grid_mismatch_rejected(self):
        p = BermudanMaxCall(D=2, N_steps=9)
        with pytest.raises(ValueError):
            Trainer(p, M=16, N=10, layers=[3, 8, 1], mode="FC",
                    activation="Sine", seed=0, objective="local")


def test_crr_dividend_yield_merton_boundary():
    """q=0 keeps the no-dividend Merton result (American call == European);
    q>0 breaks it — pins the new ``q`` parameter's drift placement."""
    kw = dict(S0=1.0, K=1.0, T=1.0, r=0.06, sigma=0.2, n_steps=2000,
              payoff="call")
    assert crr_binomial(american=True, q=0.0, **kw) == pytest.approx(
        crr_binomial(american=False, q=0.0, **kw), rel=1e-9)
    am = crr_binomial(american=True, q=0.08, **kw)
    eu = crr_binomial(american=False, q=0.08, **kw)
    assert am > eu + 1e-4
