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


def test_heston_export_parity_with_greeks(tmp_path):
    """Serving parity for the multi-factor problem (VERDICT r2 #8): export a
    briefly-trained Heston solution (2-factor, payoff-anchored output) and
    check the served u/Z against the training-side net_u AND the
    evals.greeks delta on an (S, v) grid — the artifact must carry the full
    output transform, not just a hard clamp (reference greeks
    ``heston_dnnpde.py:685-699``)."""
    from dnnpde_tpu.evals import compute_greeks
    from dnnpde_tpu.pde import HestonPDE
    from dnnpde_tpu.train import Trainer

    p = HestonPDE(clamp_output=True, clamp_smoothing="anchor")  # anchored output transform
    trainer = Trainer(p, M=8, N=4, layers=[3, 16, 16, 1], mode="FC",
                      activation="Sine", seed=0)
    trainer.train(4, 1e-3, log_every=2, verbose=False)
    path = tmp_path / "heston.stablehlo"
    save_solution(str(path), trainer)
    sol = load_solution(str(path))

    S = np.linspace(0.6, 1.4, 5, dtype=np.float32)
    v = np.linspace(0.1, 0.4, 3, dtype=np.float32)
    Sg, Vg = np.meshgrid(S, v, indexing="ij")
    X = np.stack([Sg.ravel(), Vg.ravel()], axis=-1)
    t = np.zeros((X.shape[0], 1), np.float32)

    u, Z = sol.u_and_grad(t, X)
    u_ref, Z_ref = trainer.evaluate_u(t, X)
    np.testing.assert_allclose(u, u_ref, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(Z, Z_ref, rtol=1e-5, atol=1e-6)
    # cross-check against the greeks pipeline (independent per-sample grads)
    u_g, delta, _ = compute_greeks(trainer, t, X)
    np.testing.assert_allclose(u, u_g, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(Z, delta, rtol=1e-4, atol=1e-5)
    # anchor semantics survived the export: u >= intrinsic floor everywhere
    floor = np.maximum(X[:, :1] - p.strike * np.exp(-p.r * p.T), 0.0)
    assert (u >= floor - 1e-6).all()


def test_softplus_clamp_export_parity():
    """ADVICE r2 (medium): a softplus-clamped problem must serve the SAME
    u/Z as training near the floor — the old export hard-clamped
    unconditionally, zeroing served gradients where training had nonzero."""
    from dnnpde_tpu.pde import HestonPDE
    from dnnpde_tpu.train import Trainer

    p = HestonPDE(clamp_output=True, clamp_smoothing="softplus", smooth_beta=50.0)
    trainer = Trainer(p, M=4, N=2, layers=[3, 12, 1], mode="FC",
                      activation="Sine", seed=1)
    from dnnpde_tpu.serve.export import ServedSolution, export_trainer
    from jax import export as jax_export

    sol = ServedSolution(jax_export.deserialize(export_trainer(trainer)))
    # points where the raw net sits near/below 0 — the divergence regime
    X = np.asarray([[0.2, 0.05], [0.5, 0.1], [1.0, 0.2]], np.float32)
    t = np.zeros((3, 1), np.float32)
    u, Z = sol.u_and_grad(t, X)
    u_ref, Z_ref = trainer.evaluate_u(t, X)
    np.testing.assert_allclose(u, u_ref, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(Z, Z_ref, rtol=1e-5, atol=1e-7)
    assert (u > 0.0).all()  # softplus floor is strictly positive


def test_bs_anchor_export_parity():
    """The BS control-variate mode serves the same u/Z as training (the
    transform — BS base + √τ head — is baked into the artifact)."""
    from dnnpde_tpu.pde import HestonPDE
    from dnnpde_tpu.train import Trainer

    p = HestonPDE(clamp_output=True, clamp_smoothing="bs")
    trainer = Trainer(p, M=4, N=2, layers=[3, 12, 1], mode="FC",
                      activation="Sine", seed=1)
    from jax import export as jax_export

    from dnnpde_tpu.serve.export import ServedSolution, export_trainer

    sol = ServedSolution(jax_export.deserialize(export_trainer(trainer)))
    X = np.asarray([[0.8, 0.15], [1.0, 0.2], [1.3, 0.3]], np.float32)
    t = np.zeros((3, 1), np.float32)
    u, Z = sol.u_and_grad(t, X)
    u_ref, Z_ref = trainer.evaluate_u(t, X)
    np.testing.assert_allclose(u, u_ref, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(Z, Z_ref, rtol=1e-5, atol=1e-7)


def test_sdenet_export(tmp_path):
    """ADVICE r2 (low): exporting a stochastic net must not fail at trace
    time — it serves the fixed-key eval path, matching make_net_u."""
    from dnnpde_tpu.pde import BlackScholesBarenblatt
    from dnnpde_tpu.train import Trainer

    trainer = Trainer(
        BlackScholesBarenblatt(D=D), M=4, N=2, layers=[D + 1, 8, 8, 1],
        mode="SDEnet", activation="Sine", seed=0,
    )
    path = tmp_path / "sde.stablehlo"
    save_solution(str(path), trainer)
    sol = load_solution(str(path))
    u, Z = sol.u_and_grad(np.zeros((3, 1)), np.ones((3, D)))
    # the artifact serves the FIXED noise key (make_net_u's eval default) —
    # compare against that path, not evaluate_u's per-call fresh key
    net_u = make_net_u(trainer.net, stochastic=True)
    u_ref, Z_ref = net_u(
        trainer.params, jnp.zeros((3, 1)), jnp.ones((3, D)),
        jax.random.PRNGKey(0),
    )
    np.testing.assert_allclose(u, np.asarray(u_ref), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(Z, np.asarray(Z_ref), rtol=1e-5, atol=1e-6)


def test_export_ema_params(tmp_path):
    """ADVICE r2 (low): with EMA on, export_trainer(use_ema=True) bakes the
    shadow parameters — the same ones the summary/eval headline."""
    from dnnpde_tpu.pde import BlackScholesBarenblatt
    from dnnpde_tpu.serve.export import ServedSolution, export_trainer
    from dnnpde_tpu.train import Trainer
    from jax import export as jax_export

    trainer = Trainer(
        BlackScholesBarenblatt(D=D), M=4, N=2, layers=[D + 1, 8, 1],
        mode="FC", activation="Sine", seed=0, ema_decay=0.5,
    )
    trainer.train(6, 1e-2, log_every=3, verbose=False)
    t, X = np.zeros((2, 1)), np.ones((2, D))
    sol_raw = ServedSolution(jax_export.deserialize(export_trainer(trainer)))
    sol_ema = ServedSolution(
        jax_export.deserialize(export_trainer(trainer, use_ema=True))
    )
    u_raw, _ = sol_raw.u_and_grad(t, X)
    u_ema, _ = sol_ema.u_and_grad(t, X)
    net_u = make_net_u(trainer.net)
    u_shadow, _ = net_u(trainer.ema_params, jnp.zeros((2, 1)), jnp.ones((2, D)))
    np.testing.assert_allclose(u_ema, np.asarray(u_shadow), rtol=1e-5, atol=1e-7)
    assert not np.allclose(u_ema, u_raw)  # shadow differs from last iterate


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
