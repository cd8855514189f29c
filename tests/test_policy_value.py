"""Policy-value lower bound (``evals/policy_value.py``).

Degenerate policies pin the machinery against exact oracles without any
training: a never-exercise policy must reproduce the European discrete
value on the identical chain, an always-exercise policy is a valid (bad)
policy whose value must stay below the Bermudan optimum, and ANY policy is
a lower bound up to MC noise.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from dnnpde_tpu.evals import policy_value, policy_value_from_trainer
from dnnpde_tpu.numerics import crr_binomial, discrete_bsde_value
from dnnpde_tpu.pde import AmericanPutOption, BermudanMaxCall, CallOption1D

N = 10


def _const_policy(c):
    def net_u(params, t, X):
        u = jnp.full((X.shape[0], 1), c, X.dtype)
        return u, jnp.zeros_like(X)
    return net_u


class TestDegeneratePolicies:
    def test_never_exercise_equals_european_discrete_value(self):
        """u ≡ +1e9 never exercises early → the policy value IS the
        European leg of the same chain."""
        p = AmericanPutOption()
        pv = policy_value(p, _const_policy(1e9), None, N=N,
                          n_paths=262_144, seed=0)
        eu = discrete_bsde_value(p, N=N, n_paths=1_048_576, seed=1)
        z = abs(pv.value - eu.value) / np.hypot(pv.standard_error,
                                                eu.standard_error)
        assert pv.exercise_fraction == 0.0
        assert z < 4.0, (pv.value, eu.value)

    def test_always_exercise_below_bermudan_optimum(self):
        """u ≡ −1e9 exercises at the first ITM date — a legal but greedy
        policy; its value must sit strictly below the Bermudan optimum
        and above zero."""
        p = AmericanPutOption()
        pv = policy_value(p, _const_policy(-1e9), None, N=N,
                          n_paths=262_144, seed=0)
        tree = crr_binomial(1.0, p.K, p.T, p.r, p.sigma_bar,
                            n_steps=N * 100, exercise_every=100)
        assert 0.0 < pv.value < tree + 4 * pv.standard_error
        assert pv.exercise_fraction > 0.5  # the put goes ITM often

    def test_exercise_dates_masked(self):
        """With exercise_every=N the only date is maturity → identical to
        the never-exercise European read."""
        p = BermudanMaxCall(D=2, N_steps=N, n_exercise=2)
        greedy = policy_value(p, _const_policy(-1e9), None, N=N,
                              n_paths=65_536, seed=3, exercise_every=N)
        hold = policy_value(p, _const_policy(1e9), None, N=N,
                            n_paths=65_536, seed=3)
        assert greedy.exercise_fraction == 0.0
        assert greedy.value == pytest.approx(hold.value, abs=1e-9)

    def test_validation(self):
        with pytest.raises(ValueError, match="optimal-stopping"):
            policy_value(CallOption1D(), _const_policy(0.0), None, N=N)
        with pytest.raises(ValueError, match="multiple"):
            policy_value(BermudanMaxCall(D=2, N_steps=N, n_exercise=2),
                         _const_policy(0.0), None, N=N, exercise_every=3)


class TestTrainedPolicy:
    def test_trained_net_policy_brackets_with_direct_read(self):
        """Short training on the max-call: the policy value (unbiased-low)
        must not exceed the Bermudan optimum, must beat the European leg
        once the policy is at all sensible, and the lower-bound property
        pins it below the tree value within MC noise."""
        from dnnpde_tpu.train import Trainer

        p = BermudanMaxCall(D=1, N_steps=9, n_exercise=9)
        tr = Trainer(p, M=128, N=9, layers=[2, 32, 32, 1], mode="FC",
                     activation="Sine", seed=0, ema_decay=0.999,
                     objective="local")
        tr.train(800, 1e-3, log_every=400, verbose=False)
        pv = policy_value_from_trainer(tr, n_paths=262_144, seed=5)
        n_tree = 9 * 200
        tree = crr_binomial(p.S0, p.K, p.T, p.r, p.sigma_bar,
                            n_steps=n_tree, payoff="call", american=True,
                            exercise_every=n_tree // 9, q=p.delta)
        eu = crr_binomial(p.S0, p.K, p.T, p.r, p.sigma_bar,
                          n_steps=n_tree, payoff="call", american=False,
                          q=p.delta)
        assert pv.value < tree + 4 * pv.standard_error
        assert pv.value > eu  # even a rough policy beats never-exercising
