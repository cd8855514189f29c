"""Longstaff–Schwartz Bermudan oracle (``numerics/longstaff_schwartz.py``)
and the Heston American put problem it exists to score.

Gating logic: for 1-D GBM the CRR Bermudan tree is an independent
discretization of the *same* contract (small O(Δt) scheme gap measured at
+0.4% for N=25: Euler chain + (1+rΔt) discounting vs CRR lattice + exp
discounting), so agreement within 1% plus ordering constraints
(American ≥ European, out-of-sample ≤ in-sample) pin the implementation.
For Heston there is no tree; the exact European put bound comes from
put–call parity applied to the discrete call value — parity is EXACT for
the Euler chain since E[S_{n+1}|F_n] = S_n(1+rΔt) telescopes.
"""

import numpy as np
import pytest

from dnnpde_tpu.numerics import (
    crr_binomial,
    discrete_bsde_value,
    lsmc_value,
)
from dnnpde_tpu.pde import AmericanPutOption, HestonAmericanPut, HestonPDE

N = 10


@pytest.fixture(scope="module")
def bs_put():
    return AmericanPutOption()


@pytest.fixture(scope="module")
def bs_lsmc(bs_put):
    return lsmc_value(bs_put, N=N, n_regression=65_536, n_pricing=131_072,
                      seed=0)


class TestBlackScholesCase:
    def test_matches_bermudan_tree_within_scheme_gap(self, bs_put, bs_lsmc):
        tree = crr_binomial(1.0, bs_put.K, bs_put.T, bs_put.r,
                            bs_put.sigma_bar, n_steps=N * 100,
                            exercise_every=100)
        assert abs(bs_lsmc.value - tree) / tree < 0.01, (bs_lsmc.value, tree)

    def test_american_above_european_same_chain(self, bs_put, bs_lsmc):
        """Early exercise is worth something for a put with r > 0; the
        European leg of the SAME Euler chain is the exact lower bound."""
        euro = discrete_bsde_value(bs_put, N=N, n_paths=1_048_576, seed=9)
        gap = bs_lsmc.value - euro.value
        assert gap > 4 * np.hypot(bs_lsmc.standard_error,
                                  euro.standard_error), (bs_lsmc.value,
                                                         euro.value)

    def test_out_of_sample_not_above_in_sample(self, bs_lsmc):
        """Fresh-path policy value carries no foresight — it should not
        exceed the regression pass's own estimate beyond MC noise."""
        assert bs_lsmc.value <= bs_lsmc.in_sample_value + 4 * bs_lsmc.standard_error

    def test_deterministic_given_seed(self, bs_put, bs_lsmc):
        again = lsmc_value(bs_put, N=N, n_regression=65_536,
                           n_pricing=131_072, seed=0)
        assert again.value == bs_lsmc.value


class TestHestonAmericanPut:
    def test_put_payoff_and_bs_put_head_terminal_exact(self):
        import jax.numpy as jnp

        p = HestonAmericanPut()
        X = jnp.asarray([[0.8, 0.2], [1.2, 0.2]])
        np.testing.assert_allclose(np.asarray(p.g(X))[:, 0], [0.2, 0.0])
        # at τ=0 the bs-put base IS the payoff and the head vanishes
        tT = jnp.full((2, 1), p.T)
        raw = jnp.full((2, 1), 7.0)
        u = p.transform_u(tT, X, raw)
        np.testing.assert_allclose(np.asarray(u), np.asarray(p.g(X)),
                                   atol=2e-4)  # tanh-CDF base accuracy

    def test_lsmc_above_parity_european_bound(self):
        """No Heston tree exists; the exact European-put bound is parity
        on the discrete CALL value of the same chain."""
        p = HestonAmericanPut()
        ls = lsmc_value(p, N=N, n_regression=65_536, n_pricing=131_072,
                        seed=1)
        call = discrete_bsde_value(HestonPDE(clamp_output=False), N=N,
                                   n_paths=1_048_576, seed=11)
        disc = (1.0 + p.r * p.T / N) ** (-N)
        euro_put = call.value - p.S0 + p.strike * disc
        se = np.hypot(ls.standard_error, call.standard_error)
        assert ls.value > euro_put + 2 * se, (ls.value, euro_put)
        # premium plausibly small at these parameters
        assert ls.value < 1.15 * euro_put

    def test_rejects_legacy_clamp_modes(self):
        import jax.numpy as jnp

        p = HestonAmericanPut(clamp_smoothing="anchor")
        with pytest.raises(ValueError):
            p.transform_u(jnp.zeros((1, 1)), jnp.asarray([[1.0, 0.2]]),
                          jnp.zeros((1, 1)))


def test_lsmc_rejects_nonlinear_driver():
    from dnnpde_tpu.pde import BlackScholesBarenblatt

    with pytest.raises(ValueError):
        lsmc_value(BlackScholesBarenblatt(D=2), N=4, n_regression=1024,
                   n_pricing=1024)


@pytest.mark.slow
def test_heston_american_trains_to_lsmc():
    """End-to-end (CPU budget): reflected local objective + bs-put head
    lands within 5% of the matching LSMC oracle at N=10."""
    from dnnpde_tpu.train import Trainer

    p = HestonAmericanPut()
    ls = lsmc_value(p, N=N, n_regression=131_072, n_pricing=262_144, seed=2)
    tr = Trainer(p, M=256, N=N, layers=[3, 32, 32, 32, 1], mode="FC",
                 activation="Sine", seed=0, ema_decay=0.999,
                 objective="local")
    tr.train(2500, 1e-3, log_every=500, verbose=False)
    tr.train(500, 1e-4, log_every=250, verbose=False)
    import jax.numpy as jnp

    u, _ = tr.net_u(tr.ema_params, jnp.zeros((1, 1)), p.x0[None, :])
    y0 = float(p.value_u(p.x0[None, :], u)[0, 0])
    rel = abs(y0 - ls.value) / ls.value
    assert rel < 0.05, f"heston american rel err {rel:.4f} vs {ls.value:.5f}"


def test_lsmc_x0_override_monotone_in_moneyness():
    """Deep-ITM put start is worth at least intrinsic and more than ATM."""
    p = AmericanPutOption()
    itm = lsmc_value(p, N=N, n_regression=32_768, n_pricing=65_536, seed=3,
                     x0=np.asarray([0.8], np.float32))
    atm = lsmc_value(p, N=N, n_regression=32_768, n_pricing=65_536, seed=3)
    assert itm.value >= 0.2 - 1e-6  # immediate-exercise floor (f32 payoff)
    assert itm.value > atm.value


def test_cv_boosted_lsmc(bs_put, bs_lsmc):
    """Neural control variate on the STOPPED process: optional stopping
    keeps E[m_tau]=0 exactly, so the CV value agrees with the plain LSMC
    on the same paths while the variance drops (the bs_head makes even a
    fresh net's martingale useful — the head carries the European Z)."""
    from dnnpde_tpu.train import Trainer

    tr = Trainer(bs_put, M=64, N=N, layers=[2, 32, 32, 1], mode="FC",
                 activation="Sine", seed=3, objective="local")
    cv = lsmc_value(bs_put, N=N, n_regression=65_536, n_pricing=131_072,
                    seed=0, cv_net_u=tr.net_u, cv_params=tr.params)
    assert cv.cv_variance_reduction > 3.0, cv.cv_variance_reduction
    assert cv.plain_value == bs_lsmc.value  # same paths, same policy
    tol = 4.0 * np.hypot(cv.standard_error, bs_lsmc.standard_error)
    assert abs(cv.value - bs_lsmc.value) < tol
    # cv_c passthrough (ADVICE/VERDICT r4 weak #9): a FIXED coefficient is
    # strictly unbiased (no same-path chat-fit) and must still agree and
    # still reduce variance with the theoretical c=1.
    fixed = lsmc_value(bs_put, N=N, n_regression=65_536, n_pricing=131_072,
                       seed=0, cv_net_u=tr.net_u, cv_params=tr.params,
                       cv_c=1.0)
    assert fixed.cv_c == 1.0
    assert fixed.plain_value == cv.plain_value  # identical paths/policy
    assert fixed.cv_variance_reduction > 2.0
    tol = 4.0 * np.hypot(fixed.standard_error, bs_lsmc.standard_error)
    assert abs(fixed.value - bs_lsmc.value) < tol
