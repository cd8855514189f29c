"""Whole-rollout-resident Pallas kernel (ops/rollout_kernel.py) vs the XLA
scan reference — explicit-increment variant, interpret mode (the hardware
PRNG variant has no CPU interpreter and is validated on-chip by
``scripts/bench_rollout_kernel.py``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dnnpde_tpu.ops.rollout_kernel import (
    rollout_paths_pallas,
    rollout_paths_xla,
)


def _mlp(rng, D, H, depth):
    Ws = [jnp.asarray(rng.normal(size=(D + 1, H)) * 0.1, jnp.float32)]
    bs = [jnp.zeros(H)]
    for _ in range(depth - 2):
        Ws.append(jnp.asarray(rng.normal(size=(H, H)) * 0.05, jnp.float32))
        bs.append(jnp.zeros(H))
    Ws.append(jnp.asarray(rng.normal(size=(H, 1)) * 0.1, jnp.float32))
    bs.append(jnp.asarray(rng.normal(size=(1,)) * 0.1, jnp.float32))
    return Ws, bs


@pytest.mark.parametrize(
    "D,H,depth,N,M,tile_b",
    [
        (5, 256, 5, 7, 16, 8),     # flagship-shaped net, tiny batch
        (3, 128, 3, 4, 24, 8),     # shallow net, batch not a tile multiple
        (100, 128, 4, 5, 8, 8),    # wide state (D→128-lane padding)
    ],
)
def test_rollout_kernel_matches_xla_scan(np_rng, D, H, depth, N, M, tile_b):
    Ws, bs = _mlp(np_rng, D, H, depth)
    x0 = jnp.asarray(np.tile([1.0, 0.5], (D + 1) // 2)[:D], jnp.float32)
    dWs = jnp.asarray(np_rng.normal(size=(M, N, D)) * 0.14, jnp.float32)
    kw = dict(N=N, dt=1.0 / N, mu_c=0.05, sig_c=0.2)
    y_xla = rollout_paths_xla(Ws, bs, x0, dWs=dWs, **kw)
    y_pal = rollout_paths_pallas(
        Ws, bs, x0, dWs=dWs, tile_b=tile_b, interpret=True, **kw
    )
    assert y_pal.shape == (M, N + 1)
    np.testing.assert_allclose(
        np.asarray(y_pal), np.asarray(y_xla), rtol=1e-5, atol=1e-6
    )


def test_rollout_kernel_argument_validation(np_rng):
    Ws, bs = _mlp(np_rng, 3, 128, 3)
    x0 = jnp.ones(3)
    with pytest.raises(ValueError, match="exactly one"):
        rollout_paths_pallas(Ws, bs, x0, N=4, dt=0.25, mu_c=0.0, sig_c=0.4)
    with pytest.raises(ValueError, match="M is required"):
        rollout_paths_pallas(
            Ws, bs, x0, N=4, dt=0.25, mu_c=0.0, sig_c=0.4,
            seed=jnp.asarray([1]),
        )


def test_rollout_xla_reference_is_a_real_rollout(np_rng):
    """The oracle itself: zero increments + zero drift ⇒ X frozen at x0, so
    every column n equals u(t_n, x0) evaluated directly."""
    Ws, bs = _mlp(np_rng, 4, 128, 3)
    x0 = jnp.ones(4)
    N, M = 5, 3
    y = rollout_paths_xla(
        Ws, bs, x0, N=N, dt=1.0 / N, mu_c=0.0, sig_c=0.3,
        dWs=jnp.zeros((M, N, 4)),
    )
    # all paths identical (no noise)
    np.testing.assert_allclose(np.asarray(y[0]), np.asarray(y[1]), rtol=1e-6)
    # and time-dependence is real: u(t0, x0) != u(t1, x0) for a generic net
    assert not np.isclose(float(y[0, 0]), float(y[0, 1]))


def test_gbm_coefficients_and_fast_path_guards():
    from dnnpde_tpu.ops.rollout_kernel import (
        gbm_coefficients,
        predict_paths_fast,
    )
    from dnnpde_tpu.pde import (
        BasketCallOption,
        BlackScholesBarenblatt,
        HestonPDE,
    )
    from dnnpde_tpu.train import Trainer

    assert gbm_coefficients(BlackScholesBarenblatt(D=4)) == (0.0, 0.4)
    assert gbm_coefficients(BasketCallOption(D=4)) == (0.05, 0.2)
    assert gbm_coefficients(HestonPDE()) is None  # full sigma, not GBM

    tr = Trainer(HestonPDE(), M=4, N=2, layers=[3, 8, 1], seed=0)
    with pytest.raises(ValueError, match="not GBM"):
        predict_paths_fast(tr, M=4)
    tr2 = Trainer(BlackScholesBarenblatt(D=3), M=4, N=2,
                  layers=[4, 8, 1], mode="Naisnet", seed=0)
    with pytest.raises(ValueError, match="FC-sine"):
        predict_paths_fast(tr2, M=4)
    tr3 = Trainer(BasketCallOption(D=3), M=4, N=2, layers=[4, 8, 1],
                  seed=0, correlation_type="random_correlation")
    with pytest.raises(ValueError, match="correlate"):
        predict_paths_fast(tr3, M=4)
