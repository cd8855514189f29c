"""Neural control-variate pricing (``evals/control_variate.py``).

The load-bearing property is EXACT unbiasedness for ANY parameters: the
martingale Σ disc·Zᵀσ dW has zero mean because each ΔW_n is independent of
the filtration Z_θ(t_n, X_n) lives in — the net's accuracy only moves the
variance. So the tests gate (a) agreement with the independent discrete
oracle under an UNTRAINED net (no luck involved: pure probability), and
(b) a real measured variance-reduction factor once the net has trained.
"""

import numpy as np
import pytest

from dnnpde_tpu.evals import neural_cv_from_trainer, neural_cv_value
from dnnpde_tpu.numerics import discrete_bsde_value
from dnnpde_tpu.pde import AsianCallOption, CallOption1D
from dnnpde_tpu.train import Trainer

N, M_PATHS = 10, 131_072


@pytest.fixture(scope="module")
def call1d():
    return CallOption1D()


@pytest.fixture(scope="module")
def call1d_oracle(call1d):
    return discrete_bsde_value(call1d, N=N, n_paths=1_048_576, seed=42)


@pytest.fixture(scope="module")
def untrained(call1d):
    return Trainer(call1d, M=64, N=N, layers=[2, 32, 32, 1], mode="FC",
                   activation="Sine", seed=3)


@pytest.fixture(scope="module")
def trained(call1d):
    tr = Trainer(call1d, M=256, N=N, layers=[2, 32, 32, 32, 1], mode="FC",
                 activation="Sine", seed=0, ema_decay=0.999)
    tr.train(1200, 1e-3, log_every=400, verbose=False)
    tr.train(300, 1e-4, log_every=300, verbose=False)
    return tr


class TestUnbiasedness:
    def test_untrained_net_agrees_with_discrete_oracle(
        self, call1d, untrained, call1d_oracle
    ):
        cv = neural_cv_value(call1d, untrained.net_u, untrained.params,
                             N=N, n_paths=M_PATHS, seed=0)
        tol = 4.0 * np.hypot(cv.standard_error, call1d_oracle.standard_error)
        assert abs(cv.value - call1d_oracle.value) < tol
        # the control's sample mean itself is a zero-mean average
        assert abs(cv.martingale_mean) < 6.0 * cv.plain_standard_error

    def test_c1_strictly_unbiased_variant(self, call1d, untrained, call1d_oracle):
        cv = neural_cv_value(call1d, untrained.net_u, untrained.params,
                             N=N, n_paths=M_PATHS, seed=1, c=1.0)
        assert cv.c == 1.0
        tol = 4.0 * np.hypot(cv.standard_error, call1d_oracle.standard_error)
        assert abs(cv.value - call1d_oracle.value) < tol

    def test_plain_leg_matches_oracle_same_chain(
        self, call1d, untrained, call1d_oracle
    ):
        """The no-control leg is itself the discrete value's plain MC —
        same Euler chain, so same target."""
        cv = neural_cv_value(call1d, untrained.net_u, untrained.params,
                             N=N, n_paths=M_PATHS, seed=2)
        tol = 4.0 * np.hypot(
            cv.plain_standard_error, call1d_oracle.standard_error
        )
        assert abs(cv.plain_value - call1d_oracle.value) < tol


class TestVarianceReduction:
    def test_trained_net_reduces_variance(self, call1d, trained, call1d_oracle):
        """One body for both the EMA and raw-params reads: the trained
        fixture is the expensive part, and module fixtures rebuild per
        xdist worker — splitting this in two doubled the suite cost."""
        cv = neural_cv_from_trainer(trained, n_paths=M_PATHS, seed=0)
        assert cv.N == N
        # CPU-budget net: expect an order of magnitude; assert a safe floor
        assert cv.variance_reduction > 5.0, cv
        assert cv.standard_error < cv.plain_standard_error / 2.0
        # fitted coefficient near 1 — the net's martingale IS the payoff's
        assert 0.7 < cv.c < 1.3, cv.c
        tol = 4.0 * np.hypot(cv.standard_error, call1d_oracle.standard_error)
        assert abs(cv.value - call1d_oracle.value) < tol
        raw = neural_cv_from_trainer(trained, n_paths=M_PATHS, seed=3,
                                     use_ema=False)
        assert raw.variance_reduction > 5.0
        tol = 4.0 * np.hypot(raw.standard_error, call1d_oracle.standard_error)
        assert abs(raw.value - call1d_oracle.value) < tol


class TestPathDependent:
    def test_asian_post_step_chain_unbiased(self):
        """The CV chain applies the identical post_step hook, so the
        estimator targets the same D(N) for path-dependent contracts."""
        p = AsianCallOption(N_samples=N)
        tr = Trainer(p, M=64, N=N, layers=[3, 32, 32, 1], mode="FC",
                     activation="Sine", seed=5)
        d = discrete_bsde_value(p, N=N, n_paths=1_048_576, seed=43)
        cv = neural_cv_value(p, tr.net_u, tr.params, N=N,
                             n_paths=M_PATHS, seed=4)
        tol = 4.0 * np.hypot(cv.standard_error, d.standard_error)
        assert abs(cv.value - d.value) < tol


def test_rejects_nonlinear_driver():
    from dnnpde_tpu.pde import BlackScholesBarenblatt

    p = BlackScholesBarenblatt(D=4)
    tr = Trainer(p, M=32, N=4, layers=[5, 16, 1], mode="FC",
                 activation="Sine", seed=0)
    with pytest.raises(ValueError):
        neural_cv_value(p, tr.net_u, tr.params, N=4, n_paths=1024)


def test_rejects_early_exercise_problem():
    """The telescoped estimator is European — American contracts must be
    routed to the CV-boosted LSMC, not silently priced European."""
    from dnnpde_tpu.pde import AmericanPutOption

    p = AmericanPutOption()
    tr = Trainer(p, M=32, N=4, layers=[2, 16, 1], mode="FC",
                 activation="Sine", seed=0, objective="local")
    with pytest.raises(ValueError, match="lsmc_value"):
        neural_cv_value(p, tr.net_u, tr.params, N=4, n_paths=1024)
