"""Fused MLP Pallas kernels vs the jnp reference (interpret mode off-TPU).

The kernels compute with bf16 matmul operands (XLA-default precision), so
they are compared against a bf16-dot replica exactly and against the f32
jnp reference with bf16-level tolerances.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from dnnpde_tpu.ops.fused_net_u import _fused_bwd, mlp_u_z
from dnnpde_tpu.ops.mlp_kernel import mlp_u_z_bwd_pallas, mlp_u_z_fwd_pallas

LAYERS = [101, 256, 256, 256, 256, 1]
B = 100


@pytest.fixture(scope="module")
def wb():
    key = jax.random.PRNGKey(0)
    Ws, bs = [], []
    for i in range(len(LAYERS) - 1):
        key, k1, k2 = jax.random.split(key, 3)
        Ws.append(
            jax.random.normal(k1, (LAYERS[i], LAYERS[i + 1]))
            / np.sqrt(LAYERS[i])
        )
        bs.append(jax.random.normal(k2, (LAYERS[i + 1],)) * 0.1)
    x = jax.random.normal(jax.random.PRNGKey(5), (B, LAYERS[0]))
    return tuple(Ws), tuple(bs), x


def test_fwd_kernel_matches_reference(wb):
    Ws, bs, x = wb
    u_ref, z_ref = mlp_u_z(Ws, bs, x)
    u_k, z_k = mlp_u_z_fwd_pallas(Ws, bs, x, interpret=True)
    assert u_k.shape == (B, 1) and z_k.shape == (B, LAYERS[0])
    # bf16 operand precision (~8 mantissa bits through 5 layers)
    np.testing.assert_allclose(u_k, u_ref, rtol=0, atol=1e-2)
    np.testing.assert_allclose(z_k, z_ref, rtol=0, atol=1e-2)


def test_fwd_kernel_bitexact_vs_bf16_replica(wb):
    """Against a jnp replica that uses the SAME bf16-operand dots the kernel
    does, the result must be (near-)bit-exact — isolating precision from
    logic."""
    Ws, bs, x = wb

    def dot(a, w):
        return lax.dot_general(
            a.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    def dot_bt(a, w):
        return lax.dot_general(
            a.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)

    a, ps = x, []
    for k in range(4):
        p = dot(a, Ws[k]) + bs[k][None, :]
        ps.append(p)
        a = jnp.sin(p)
    u = dot(a, Ws[4]) + bs[4][None, :]
    r = jnp.broadcast_to(Ws[4][:, 0][None, :], a.shape)
    for k in range(3, -1, -1):
        r = dot_bt(r * jnp.cos(ps[k]), Ws[k])
    u_k, z_k = mlp_u_z_fwd_pallas(Ws, bs, x, interpret=True)
    np.testing.assert_allclose(u_k, u, atol=1e-6)
    np.testing.assert_allclose(z_k, r, atol=1e-6)


def test_bwd_kernel_matches_hand_vjp(wb):
    Ws, bs, x = wb
    u_bar = jax.random.normal(jax.random.PRNGKey(6), (B, 1))
    z_bar = jax.random.normal(jax.random.PRNGKey(7), (B, LAYERS[0]))
    Wb_ref, bb_ref, xb_ref = _fused_bwd("sine", (Ws, bs, x), (u_bar, z_bar))
    Wb_k, bb_k, xb_k = mlp_u_z_bwd_pallas(
        Ws, bs, x, u_bar, z_bar, interpret=True
    )
    np.testing.assert_allclose(xb_k, xb_ref, rtol=0, atol=2e-2)
    for a, b in zip(Wb_k, Wb_ref):
        scale = float(jnp.max(jnp.abs(b))) + 1e-6
        np.testing.assert_allclose(a / scale, b / scale, rtol=0, atol=2e-2)
    for a, b in zip(bb_k, bb_ref):
        scale = float(jnp.max(jnp.abs(b))) + 1e-6
        np.testing.assert_allclose(a / scale, b / scale, rtol=0, atol=2e-2)


def test_bwd_kernel_accumulates_over_batch_tiles(wb):
    """Grid accumulation: B spanning several tiles must equal the sum of
    per-tile gradients (= the single-tile run on the same rows)."""
    Ws, bs, _ = wb
    x = jax.random.normal(jax.random.PRNGKey(8), (96, LAYERS[0]))
    u_bar = jax.random.normal(jax.random.PRNGKey(9), (96, 1))
    z_bar = jax.random.normal(jax.random.PRNGKey(10), (96, LAYERS[0]))
    big = mlp_u_z_bwd_pallas(Ws, bs, x, u_bar, z_bar, interpret=True,
                             tile_b=32)
    one = mlp_u_z_bwd_pallas(Ws, bs, x, u_bar, z_bar, interpret=True,
                             tile_b=96)
    for a, b in zip(jax.tree.leaves(big), jax.tree.leaves(one)):
        np.testing.assert_allclose(a, b, rtol=0, atol=5e-3)


@pytest.mark.slow  # Pallas interpreter rollout; kernel math covered by the lighter tests
def test_rollout_with_pallas_interpret_matches_default():
    """End-to-end: the pallas_interpret fused path trains to the same loss
    trajectory as the default autodiff path (same keys)."""
    from dnnpde_tpu.pde import BlackScholesBarenblatt
    from dnnpde_tpu.solver import SolverConfig
    from dnnpde_tpu.train import Trainer

    prob = BlackScholesBarenblatt(D=4)
    kw = dict(M=16, N=3, layers=[5, 128, 128, 1], seed=7)
    r_def = Trainer(prob, **kw).train(4, 1e-3, log_every=2, verbose=False)
    r_pal = Trainer(
        prob,
        solver_config=SolverConfig(remat=False, fused_net_u="pallas_interpret"),
        **kw,
    ).train(4, 1e-3, log_every=2, verbose=False)
    np.testing.assert_allclose(r_def.graph[1], r_pal.graph[1], rtol=2e-2)
