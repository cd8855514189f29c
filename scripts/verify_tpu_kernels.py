"""On-hardware validation of the Pallas kernels (run on a real TPU chip).

Checks the fused GBM path kernel's statistics against closed forms and the
jnp golden model, and reports throughput. The CPU test suite cannot do this
(the Pallas interpreter's PRNG is not statistically faithful off-TPU).

Usage: python scripts/verify_tpu_kernels.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from dnnpde_tpu.numerics import black_scholes_call
from dnnpde_tpu.ops import pallas_basket_call_mc, pallas_gbm_terminal
from dnnpde_tpu.sim import cholesky_factor, generate_correlation_matrix


def main() -> None:
    assert jax.default_backend() == "tpu", "run on a TPU chip"
    M, N, D = 131072, 50, 100

    ST = np.asarray(pallas_gbm_terminal(0, np.ones(D), 0.05, 0.2, 1.0, N, M))
    logs = np.log(ST)
    print(f"mean S_T {ST.mean():.5f} (expect {np.exp(0.05):.5f})")
    print(f"std logS {logs.std():.5f} (expect 0.2)")
    assert abs(ST.mean() - np.exp(0.05)) < 4 * ST.std() / np.sqrt(M * D)
    assert abs(logs.std() - 0.2) < 2e-3

    C = generate_correlation_matrix(D, "random_correlation", seed=1)
    L = cholesky_factor(C)
    STc = np.asarray(pallas_gbm_terminal(1, np.ones(D), 0.0, 0.3, 1.0, N, M, chol=L))
    err = np.abs(np.corrcoef(np.log(STc).T) - C).max()
    print(f"correlation max err {err:.4f}")
    assert err < 0.05

    p, se = pallas_basket_call_mc(
        2, np.ones(1), 1.0, 1.0, 0.05, 0.2, num_paths=524288, payoff="sum"
    )
    exact = float(black_scholes_call(1.0, 1.0, 1.0, 0.05, 0.2))
    print(f"MC price {float(p):.5f}±{float(se):.5f} vs BS {exact:.5f}")
    assert abs(float(p) - exact) < 4 * float(se)

    for name, chol in (("uncorrelated", None), ("correlated", L)):
        fn = lambda i: float(
            jnp.sum(pallas_gbm_terminal(i, np.ones(D), 0.05, 0.2, 1.0, N, M, chol=chol))
        )
        fn(0)  # compile
        times = []
        for i in range(5):
            t0 = time.perf_counter()
            fn(i + 1)  # host read forces device sync (block_until_ready is
            # unreliable through the axon tunnel)
            times.append(time.perf_counter() - t0)
        dt = float(np.median(times))
        print(f"{name}: {dt*1e3:.1f} ms -> {M/dt:,.0f} paths/s (D={D}, N={N})")

    verify_mlp_kernels()
    print("ALL KERNEL CHECKS PASSED")


def verify_mlp_kernels() -> None:
    """Fused MLP (u, ∇ₓu) fwd/bwd kernels vs the jnp reference, ON CHIP
    (bf16-operand tolerance; see ops/mlp_kernel.py)."""
    from dnnpde_tpu.ops.fused_net_u import _fused_bwd, mlp_u_z
    from dnnpde_tpu.ops.mlp_kernel import mlp_u_z_bwd_pallas, mlp_u_z_fwd_pallas

    layers = [101, 256, 256, 256, 256, 1]
    key = jax.random.PRNGKey(0)
    Ws, bs = [], []
    for i in range(len(layers) - 1):
        key, k1, k2 = jax.random.split(key, 3)
        Ws.append(
            jax.random.normal(k1, (layers[i], layers[i + 1]))
            / np.sqrt(layers[i])
        )
        bs.append(jax.random.normal(k2, (layers[i + 1],)) * 0.1)
    Ws, bs = tuple(Ws), tuple(bs)
    B = 2048
    x = jax.random.normal(jax.random.PRNGKey(5), (B, layers[0]))
    u_ref, z_ref = mlp_u_z(Ws, bs, x)
    u_k, z_k = mlp_u_z_fwd_pallas(Ws, bs, x)
    du = float(jnp.max(jnp.abs(u_k - u_ref)))
    dz = float(jnp.max(jnp.abs(z_k - z_ref)))
    print(f"mlp fwd kernel: |Δu| {du:.2e}, |ΔZ| {dz:.2e} (bf16 tol 2e-2)")
    assert du < 2e-2 and dz < 2e-2

    u_bar = jax.random.normal(jax.random.PRNGKey(6), (B, 1))
    z_bar = jax.random.normal(jax.random.PRNGKey(7), (B, layers[0]))
    ref = _fused_bwd("sine", (Ws, bs, x), (u_bar, z_bar))
    got = mlp_u_z_bwd_pallas(Ws, bs, x, u_bar, z_bar)
    worst = 0.0
    for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(ref)):
        scale = float(jnp.max(jnp.abs(b))) + 1e-6
        worst = max(worst, float(jnp.max(jnp.abs(a - b))) / scale)
    print(f"mlp bwd kernel: worst grad rel err {worst:.2e} (bf16 tol 3e-2)")
    assert worst < 3e-2


if __name__ == "__main__":
    main()
