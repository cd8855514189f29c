"""Fused net_u (hand-derived first-order VJP) vs autodiff — exactness tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dnnpde_tpu.nets import build_network
from dnnpde_tpu.ops.fused_net_u import (
    extract_mlp_params,
    fused_mlp_u_z,
    make_fused_net_u,
    mlp_u_z,
)
from dnnpde_tpu.solver.bsde import make_net_u

LAYERS = [5, 16, 16, 16, 1]


@pytest.fixture(scope="module")
def setup():
    net = build_network("FC", LAYERS, "Sine")
    params = net.init(jax.random.PRNGKey(0), jnp.ones((1, 5)))
    t = jax.random.uniform(jax.random.PRNGKey(1), (7, 1))
    X = jax.random.normal(jax.random.PRNGKey(2), (7, 4))
    return net, params, t, X


def test_fused_values_match_default(setup):
    net, params, t, X = setup
    u1, z1 = make_net_u(net)(params, t, X)
    u2, z2 = make_fused_net_u(LAYERS, "sine")(params, t, X)
    np.testing.assert_allclose(u1, u2, rtol=1e-5)
    np.testing.assert_allclose(z1, z2, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("act", ["sine", "tanh", "relu"])
def test_fused_grads_match_autodiff(act):
    """The hand-written backward must equal jax autodiff THROUGH the
    Z-computing VJP (second-order structure) for every activation."""
    Ws = []
    bs = []
    key = jax.random.PRNGKey(3)
    for i in range(len(LAYERS) - 1):
        key, k1, k2 = jax.random.split(key, 3)
        Ws.append(jax.random.normal(k1, (LAYERS[i], LAYERS[i + 1])) * 0.5)
        bs.append(jax.random.normal(k2, (LAYERS[i + 1],)) * 0.1)
    Ws, bs = tuple(Ws), tuple(bs)
    x = jax.random.normal(jax.random.PRNGKey(4), (9, LAYERS[0]))

    def scalar(fn):
        def f(Ws, bs, x):
            u, z = fn(Ws, bs, x, act)
            x2 = x + 0.1 * z  # feed Z back like the rollout does
            u2, z2 = fn(Ws, bs, x2, act)
            return jnp.sum(u2 * u) + jnp.sum(z2 * z)
        return f

    g_ref = jax.grad(scalar(mlp_u_z), argnums=(0, 1, 2))(Ws, bs, x)
    g_fused = jax.grad(scalar(fused_mlp_u_z), argnums=(0, 1, 2))(Ws, bs, x)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_fused)):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-6)


def test_fused_in_rollout_trains(setup):
    """End-to-end: a short training run with the fused net_u reaches the
    same loss trajectory as the default path (same keys)."""
    from dnnpde_tpu.pde import BlackScholesBarenblatt
    from dnnpde_tpu.train import Trainer

    prob = BlackScholesBarenblatt(D=4)
    kw = dict(M=16, N=4, layers=[5, 16, 16, 16, 1], seed=7)
    r_def = Trainer(prob, **kw).train(6, 1e-3, log_every=3, verbose=False)
    from dnnpde_tpu.solver import SolverConfig

    r_fused = Trainer(
        prob, solver_config=SolverConfig(remat=False, fused_net_u=True), **kw
    ).train(6, 1e-3, log_every=3, verbose=False)
    np.testing.assert_allclose(r_def.graph[1], r_fused.graph[1], rtol=1e-3)


def test_extract_mlp_params_order(setup):
    net, params, _, _ = setup
    Ws, bs = extract_mlp_params(params)
    assert [w.shape for w in Ws] == [(5, 16), (16, 16), (16, 16), (16, 1)]
    assert [b.shape for b in bs] == [(16,), (16,), (16,), (1,)]
