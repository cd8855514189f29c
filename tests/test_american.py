"""Early exercise: reflected-BSDE local objective + CRR binomial oracle.

The optimal-stopping capability is beyond-reference (the reference's only
objective is the global summed residual over European-style rollouts,
``1d_BSPDE_case.py:246-289``); the oracle and scheme are validated here,
the full convergence gate runs in the TPU study
(``scripts/studies_r4.py american_put``).
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from dnnpde_tpu.numerics import black_scholes_call, crr_binomial
from dnnpde_tpu.pde import AmericanPutOption
from dnnpde_tpu.train import Trainer


class TestBinomialOracle:
    def test_european_put_matches_black_scholes_parity(self):
        eu = crr_binomial(1.0, 1.0, 1.0, 0.06, 0.2, n_steps=4000,
                          payoff="put", american=False)
        bs_put = (float(black_scholes_call(1.0, 1.0, 1.0, 0.06, 0.2))
                  - 1.0 + np.exp(-0.06))
        assert abs(eu - bs_put) / bs_put < 5e-4

    def test_european_call_matches_black_scholes(self):
        eu = crr_binomial(1.0, 1.1, 0.5, 0.03, 0.3, n_steps=4000,
                          payoff="call", american=False)
        bs = float(black_scholes_call(1.0, 1.1, 0.5, 0.03, 0.3))
        assert abs(eu - bs) / bs < 1e-3

    def test_american_premium_ordering(self):
        """European ≤ Bermudan-N ≤ American, premium strictly positive for
        an ITM-prone put under r > 0."""
        kw = dict(S0=1.0, K=1.0, T=1.0, r=0.06, sigma=0.2, n_steps=4000,
                  payoff="put")
        eu = crr_binomial(american=False, **kw)
        berm = crr_binomial(american=True, exercise_every=80, **kw)
        am = crr_binomial(american=True, **kw)
        assert eu < berm <= am
        assert am - eu > 0.004  # the measured premium is ~0.0063

    def test_american_call_no_dividends_equals_european(self):
        """Merton: early exercise of a call on a non-dividend stock is
        never optimal."""
        kw = dict(S0=1.0, K=1.0, T=1.0, r=0.06, sigma=0.2, n_steps=2000,
                  payoff="call")
        assert crr_binomial(american=True, **kw) == pytest.approx(
            crr_binomial(american=False, **kw), rel=1e-9)

    def test_intrinsic_floor(self):
        """Deep-ITM American put is worth at least intrinsic."""
        am = crr_binomial(0.5, 1.0, 1.0, 0.06, 0.2, n_steps=1000,
                          payoff="put", american=True)
        assert am >= 0.5 - 1e-12

    def test_validation(self):
        with pytest.raises(ValueError, match="payoff"):
            crr_binomial(1.0, 1.0, 1.0, 0.05, 0.2, payoff="straddle")
        with pytest.raises(ValueError, match="exercise_every"):
            crr_binomial(1.0, 1.0, 1.0, 0.05, 0.2, exercise_every=0)


class TestAmericanProblem:
    def test_value_u_is_snell_read(self):
        p = AmericanPutOption()
        X = jnp.asarray([[0.7], [1.3]])
        u = jnp.asarray([[0.1], [0.05]])
        v = p.value_u(X, u)
        # ITM state: value floored at intrinsic 0.3; OTM: continuation
        assert float(v[0, 0]) == pytest.approx(0.3)
        assert float(v[1, 0]) == pytest.approx(0.05)

    def test_value_u_identity_for_european(self):
        from dnnpde_tpu.pde import CallOption1D

        p = CallOption1D()
        X = jnp.asarray([[1.5]])
        u = jnp.asarray([[0.01]])  # below intrinsic — stays untouched
        assert float(p.value_u(X, u)[0, 0]) == pytest.approx(0.01)

    def test_bs_head_reduces_to_european_at_zero_premium(self):
        """raw → −∞ ⇒ premium → 0 ⇒ value = closed-form European put; and
        the head is EXACT at maturity (both terminal penalties vanish)."""
        p = AmericanPutOption(bs_head=True)
        X = jnp.asarray([[0.7], [1.0], [1.3]])
        v = p.transform_u(jnp.zeros((3, 1)), X, jnp.full((3, 1), -30.0))
        bs_put = (np.asarray(black_scholes_call(
            X[:, 0], 1.0, 1.0, 0.06, 0.2, cdf="tanh"))
            - np.asarray(X[:, 0]) + np.exp(-0.06))
        np.testing.assert_allclose(np.asarray(v[:, 0]), bs_put, atol=1e-6)
        vT = p.transform_u(jnp.ones((3, 1)), X, jnp.zeros((3, 1)))
        np.testing.assert_allclose(
            np.asarray(vT), np.asarray(p.g(X)), atol=1e-6)

    def test_bs_head_premium_nonnegative(self):
        p = AmericanPutOption()  # bs_head=True is the measured default
        plain = AmericanPutOption(bs_head=False)
        X = jnp.linspace(0.5, 1.5, 11).reshape(-1, 1)
        t = jnp.full((11, 1), 0.3)
        raw = jnp.asarray(np.random.default_rng(0).normal(size=(11, 1)),
                          jnp.float32)
        euro_base = p.transform_u(t, X, jnp.full((11, 1), -30.0))
        assert bool(jnp.all(p.transform_u(t, X, raw) >= euro_base - 1e-7))
        assert not plain.has_output_transform and p.has_output_transform

    def test_bs_head_requires_1d(self):
        with pytest.raises(ValueError, match="D=1"):
            AmericanPutOption(D=2, bs_head=True).transform_u(
                jnp.zeros((1, 1)), jnp.ones((1, 2)), jnp.zeros((1, 1)))

    def test_global_objective_rejected(self):
        with pytest.raises(ValueError, match="objective='local'"):
            Trainer(AmericanPutOption(), M=8, N=4, layers=[2, 8, 8, 1],
                    mode="FC", activation="Sine", seed=0, objective="global")

    def test_reflection_raises_learned_value(self):
        """Same seed/budget, European vs American variant of the identical
        dynamics: the reflected targets must train a strictly larger Y0 —
        the early-exercise premium is ~12% of the option value here."""

        @dataclasses.dataclass(frozen=True)
        class EuroPut(AmericanPutOption):
            @property
            def early_exercise(self):
                return False

        def y0(problem):
            tr = Trainer(problem, M=128, N=10, layers=[2, 32, 32, 1],
                         mode="FC", activation="Sine", seed=0,
                         objective="local")
            tr.train(800, 1e-3, log_every=400, verbose=False)
            tr.train(200, 1e-4, log_every=200, verbose=False)
            return tr.y0_log[-1]

        assert y0(AmericanPutOption()) > y0(EuroPut()) + 0.001
