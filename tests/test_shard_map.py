"""Explicit-collective (shard_map + psum) train-step tests."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from dnnpde_tpu.nets import build_network
from dnnpde_tpu.parallel import make_mesh
from dnnpde_tpu.parallel.shard_map_step import make_shard_map_train_step
from dnnpde_tpu.pde import BlackScholesBarenblatt
from dnnpde_tpu.sim.brownian import brownian_increments, time_grid
from dnnpde_tpu.solver import SolverConfig, make_loss_fn


@pytest.fixture(scope="module")
def setup():
    mesh = make_mesh(8)
    prob = BlackScholesBarenblatt(D=4)
    net = build_network("FC", [5, 16, 16, 16, 16, 1], "Sine")
    params = net.init(jax.random.PRNGKey(0), jnp.ones((1, 5)))
    tx = optax.adam(1e-3)
    return mesh, prob, net, params, tx


def test_psum_loss_matches_global_computation(setup):
    """The shard_map step's psum-reduced loss must equal the single-program
    loss over the concatenation of every device's local increments."""
    mesh, prob, net, params, tx = setup
    opt = tx.init(params)
    M, N = 16, 4
    step = make_shard_map_train_step(prob, net, tx, mesh, M=M, N=N)
    key = jax.random.PRNGKey(7)
    _, _, loss = step(params, opt, key)

    m_local, n_dev = M // 8, 8
    shards = []
    for i in range(n_dev):
        kw, _ = jax.random.split(jax.random.fold_in(key, i))
        shards.append(brownian_increments(kw, m_local, N, prob.dim, 1.0 / N))
    dW = jnp.concatenate(shards, axis=0)
    loss_fn = make_loss_fn(prob, net, SolverConfig())
    ts = jnp.swapaxes(time_grid(M, N, 1.0), 0, 1)
    X0 = jnp.broadcast_to(prob.x0, (M, prob.dim))
    ref = float(loss_fn(params, ts, jnp.swapaxes(dW, 0, 1), X0).loss)
    assert float(loss) == pytest.approx(ref, rel=1e-5)


def test_step_updates_and_stays_replicated(setup):
    mesh, prob, net, params, tx = setup
    opt = tx.init(params)
    step = make_shard_map_train_step(prob, net, tx, mesh, M=16, N=4)
    p1, o1, l1 = step(params, opt, jax.random.PRNGKey(0))
    p2, o2, l2 = step(p1, o1, jax.random.PRNGKey(1))
    assert np.isfinite(float(l1)) and np.isfinite(float(l2))
    # params changed and remain globally consistent (replicated out_spec)
    moved = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(p2))
    )
    assert moved


def test_indivisible_batch_raises(setup):
    mesh, prob, net, params, tx = setup
    with pytest.raises(ValueError):
        make_shard_map_train_step(prob, net, tx, mesh, M=12, N=4)


def test_training_loop_reduces_loss(setup):
    mesh, prob, net, params, tx = setup
    opt = tx.init(params)
    step = make_shard_map_train_step(prob, net, tx, mesh, M=16, N=4)
    losses = []
    key = jax.random.PRNGKey(3)
    for i in range(30):
        key, sub = jax.random.split(key)
        params, opt, loss = step(params, opt, sub)
        losses.append(float(loss))
    assert np.mean(losses[-5:]) < np.mean(losses[:5])
