"""Discretely-monitored barrier options: the post_step state hook.

Path-dependent payoffs are beyond the reference (every reference payoff is
terminal-state-only). The alive indicator rides as a state coordinate,
updated by ``PDEProblem.post_step`` in BOTH transition kernels (training
rollout and discrete-BSDE oracle), so the accuracy gate is exact at any N
and any monitor smoothing. The TPU study is
``scripts/studies_r4.py barrier_call``.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from dnnpde_tpu.numerics import black_scholes_call, discrete_bsde_value
from dnnpde_tpu.pde import UpAndOutCall
from dnnpde_tpu.train import Trainer


class TestBarrierProblem:
    def test_hard_monitor_kills_above_barrier(self):
        p = UpAndOutCall(smooth_beta=None)
        X = jnp.asarray([[1.1, 1.0], [1.35, 1.0], [1.1, 0.0]])
        out = p.post_step(jnp.zeros((3, 1)), X)
        np.testing.assert_allclose(np.asarray(out[:, 0]), [1.1, 1.35, 1.1])
        # alive below B; killed above; dead stays dead
        np.testing.assert_allclose(np.asarray(out[:, 1]), [1.0, 0.0, 0.0])

    def test_smooth_monitor_is_differentiable_and_sharp(self):
        import jax

        p = UpAndOutCall(smooth_beta=50.0)
        g = jax.grad(p.monitor)
        assert float(p.monitor(jnp.asarray(1.0))) > 0.999
        assert float(p.monitor(jnp.asarray(1.6))) < 1e-4
        assert float(g(jnp.asarray(1.3))) < 0.0  # decreasing through B

    def test_value_linear_in_alive_indicator(self):
        p = UpAndOutCall()
        t = jnp.zeros((2, 1))
        X = jnp.asarray([[1.0, 1.0], [1.0, 0.0]])
        raw = jnp.full((2, 1), 0.37)
        u = p.transform_u(t, X, raw)
        assert float(u[0, 0]) == pytest.approx(0.37)
        assert float(u[1, 0]) == 0.0  # dead path carries value 0
        g = p.g(X)
        assert float(g[1, 0]) == 0.0

    def test_discrete_oracle_below_vanilla(self):
        """Knock-out strictly cheapens the call; both monitors positive."""
        vanilla = float(black_scholes_call(1.0, 1.0, 1.0, 0.05, 0.2))
        for p in (UpAndOutCall(), UpAndOutCall(smooth_beta=None)):
            d = discrete_bsde_value(p, N=10, n_paths=262_144, seed=0)
            assert 0.0 < d.value < 0.6 * vanilla, d.value

    def test_oracle_chain_applies_post_step(self):
        """With an ALWAYS-KILL barrier (B below every reachable state) the
        discrete value must be ~0 — proving the oracle chain runs the
        hook (without it the value would be the vanilla call's)."""
        p = UpAndOutCall(barrier=0.01, smooth_beta=None)
        d = discrete_bsde_value(p, N=5, n_paths=65_536, seed=0)
        assert abs(d.value) < 1e-6


@pytest.mark.slow
def test_barrier_call_converges_to_discrete_oracle():
    """End-to-end (CPU budget): LOCAL objective within 5% of the matching
    discrete oracle. The global objective is measured far worse here
    (−44% at this budget): the value process JUMPS at knockout dates,
    which the local objective's one-step targets absorb while the global
    summed-rollout residual cannot."""
    p = UpAndOutCall()
    N = 10
    d = discrete_bsde_value(p, N=N, n_paths=1_000_000, seed=7)
    tr = Trainer(p, M=256, N=N, layers=[3, 32, 32, 32, 1], mode="FC",
                 activation="Sine", seed=0, ema_decay=0.999,
                 objective="local")
    tr.train(2500, 1e-3, log_every=500, verbose=False)
    tr.train(500, 1e-4, log_every=250, verbose=False)
    y0 = float(np.mean(tr.y0_log[-3:]))
    rel = abs(y0 - d.value) / d.value
    assert rel < 0.05, f"barrier rel err {rel:.4f} vs D({N}) {d.value:.5f}"
