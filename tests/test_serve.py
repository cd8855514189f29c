"""Serving artifacts: export → bytes → load → evaluate, no model code needed.

Gates the deployment story (serve/export.py): the exported StableHLO program
must reproduce the training-side net_u exactly, accept any batch size through
its symbolic batch dimension, carry the Heston output clamp, and ship as a
multi-platform (cpu+tpu) artifact.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dnnpde_tpu.nets import build_network
from dnnpde_tpu.serve import (
    export_solution,
    load_solution,
    save_solution,
)
from dnnpde_tpu.solver.bsde import make_net_u

D = 4


@pytest.fixture(scope="module")
def net_and_params():
    net = build_network("FC", [D + 1, 16, 16, 1], "Sine")
    params = net.init(jax.random.PRNGKey(0), jnp.ones((1, D + 1)))
    return net, params


@pytest.fixture(scope="module")
def artifact(net_and_params, tmp_path_factory):
    net, params = net_and_params
    path = tmp_path_factory.mktemp("serve") / "solution.stablehlo"
    save_solution(str(path), net, params, D)
    return load_solution(str(path))


def test_artifact_metadata(artifact):
    assert artifact.dim == D
    assert set(artifact.platforms) == {"cpu", "tpu"}


@pytest.mark.parametrize("batch", [1, 3, 17])
def test_roundtrip_matches_net_u_any_batch(artifact, net_and_params, batch):
    """Symbolic batch dim: one artifact, every batch size; values and
    gradients equal the training-side net_u."""
    net, params = net_and_params
    net_u = make_net_u(net)
    t = jnp.linspace(0.0, 1.0, batch).reshape(-1, 1)
    X = jax.random.normal(jax.random.PRNGKey(batch), (batch, D))
    u_ref, Z_ref = net_u(params, t, X)
    u, Z = artifact.u_and_grad(t, X)
    np.testing.assert_allclose(u, u_ref, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(Z, Z_ref, rtol=1e-5, atol=1e-6)


def test_scalar_time_broadcast(artifact):
    u, Z = artifact.u_and_grad(0.5, np.zeros((7, D)))
    assert u.shape == (7, 1) and Z.shape == (7, D)
    # same t for every row → identical rows at identical X
    np.testing.assert_allclose(u, np.broadcast_to(u[:1], u.shape), rtol=1e-6)


def test_surface_grid_shape_and_values(artifact):
    ts = [0.0, 0.5, 1.0]
    xs = np.random.default_rng(0).normal(size=(5, D)).astype(np.float32)
    surf = artifact.surface(ts, xs)
    assert surf.shape == (3, 5)
    u_mid = artifact.u(np.full((5, 1), 0.5), xs)
    np.testing.assert_allclose(surf[1], u_mid[:, 0], rtol=1e-6, atol=1e-7)


def test_clamped_export_matches_clamped_net_u(net_and_params):
    """Heston semantics: clamp u at 0 BEFORE the gradient (zero-gradient
    region included), matching training (heston_dnnpde.py:560-577)."""
    net, params = net_and_params
    blob = export_solution(net, params, D, clamp_u=0.0)
    from jax import export as jax_export

    from dnnpde_tpu.serve.export import ServedSolution

    sol = ServedSolution(jax_export.deserialize(blob))
    net_u = make_net_u(net, clamp_u=0.0)
    t = jnp.zeros((9, 1))
    X = jax.random.normal(jax.random.PRNGKey(7), (9, D)) * 3.0
    u_ref, Z_ref = net_u(params, t, X)
    u, Z = sol.u_and_grad(t, X)
    assert (u >= 0.0).all()
    np.testing.assert_allclose(u, u_ref, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(Z, Z_ref, rtol=1e-5, atol=1e-6)


def test_save_solution_accepts_trainer(tmp_path):
    """Duck-typed convenience: save_solution(path, trainer) exports the
    trainer's current params/problem."""
    from dnnpde_tpu.pde import BlackScholesBarenblatt
    from dnnpde_tpu.train import Trainer

    trainer = Trainer(
        BlackScholesBarenblatt(D=D, T=1.0),
        M=4, N=2, layers=[D + 1, 8, 8, 1], mode="FC", activation="Sine", seed=0,
    )
    path = tmp_path / "trained.stablehlo"
    save_solution(str(path), trainer)
    sol = load_solution(str(path))
    u, Z = sol.u_and_grad(np.zeros((2, 1)), np.ones((2, D)))
    u_ref, Z_ref = trainer.evaluate_u(np.zeros((2, 1)), np.ones((2, D)))
    np.testing.assert_allclose(u, u_ref, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(Z, Z_ref, rtol=1e-5, atol=1e-6)


def test_u_and_grad_device_matches_host(artifact):
    """The device-native serving path (no host sync — the pipelined hot
    path) returns the same values as the blocking host path."""
    sol = artifact
    X = np.linspace(0.8, 1.2, 4 * D, dtype=np.float32).reshape(-1, D)
    u_h, Z_h = sol.u_and_grad(0.1, X)
    u_d, Z_d = sol.u_and_grad_device(0.1, X)
    jax.block_until_ready((u_d, Z_d))
    np.testing.assert_allclose(u_h, np.asarray(u_d), rtol=1e-6)
    np.testing.assert_allclose(Z_h, np.asarray(Z_d), rtol=1e-6)
