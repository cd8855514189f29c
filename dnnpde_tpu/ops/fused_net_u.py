"""Fused (u, ∇ₓu) evaluation for plain MLPs with a hand-derived VJP.

``net_u`` — the hot inner call of the BSDE rollout (reference
``1d_BSPDE_case.py:204-229``) — evaluates u and Z = ∇ₓu. The default path
computes Z with ``jax.vjp`` and lets XLA differentiate *through that VJP*
(forward-over-reverse) for the parameter gradients. This module implements
the same function with the first-order backward written out by hand:

  forward:  a₀ = [t, X];  p_k = a_{k-1} W_k + b_k;  a_k = σ(p_k)
            u  = a_{L-1} W_L + b_L
  Z-sweep:  r_{L-1} = W_L[:,0]ᵀ (broadcast);  q_k = r_k ⊙ σ'(p_k);
            r_{k-1} = q_k W_kᵀ;   Z = r₀ (the X-columns)

  backward (cotangents ū, Z̄):
    Z-path (adjoint of the sweep, ascending k):
       q̄_k = c_{k-1} W_k;            W̄_k += c_{k-1}ᵀ q_k
       p̄_k^Z = q̄_k ⊙ r_k ⊙ σ''(p_k);  c_k = q̄_k ⊙ σ'(p_k)
       (top) W̄_L[:,0] += Σ_b c_{L-1}
    u-path (descending k), merged with p̄^Z:
       ā_{L-1} = ū W_Lᵀ;  W̄_L += a_{L-1}ᵀ ū;  b̄_L = Σ ū
       p̄_k = ā_k ⊙ σ'(p_k) + p̄_k^Z
       W̄_k += a_{k-1}ᵀ p̄_k;  b̄_k = Σ p̄_k;  ā_{k-1} = p̄_k W_kᵀ
       x̄ = ā₀

Everything is matmuls + elementwise — exactly the op set XLA's autodiff
emits, but with the recomputation policy fixed (only x is saved per call;
p/r are rebuilt in the backward), which is the layout a fused Pallas
forward/backward kernel pair needs. Gradients are validated against
``jax.vjp``-of-``jax.vjp`` autodiff to float tolerance in
``tests/test_fused_net_u.py``.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Sequence

import jax
import jax.numpy as jnp

Array = jnp.ndarray

# activation σ, σ', σ'' triples
_ACT_DERIVS: dict[str, tuple[Callable, Callable, Callable]] = {
    "sine": (jnp.sin, jnp.cos, lambda p: -jnp.sin(p)),
    "tanh": (
        jnp.tanh,
        lambda p: 1.0 - jnp.tanh(p) ** 2,
        lambda p: -2.0 * jnp.tanh(p) * (1.0 - jnp.tanh(p) ** 2),
    ),
    "relu": (
        lambda p: jnp.maximum(p, 0.0),
        lambda p: (p > 0).astype(p.dtype),
        lambda p: jnp.zeros_like(p),
    ),
}


def extract_mlp_params(params) -> tuple[tuple[Array, ...], tuple[Array, ...]]:
    """(Ws, bs) in layer order from an ``nets.MLP`` flax tree
    (``params/Dense_k/Dense_0/{kernel,bias}``)."""
    tree = params["params"]
    names = sorted(tree.keys(), key=lambda n: int(n.rsplit("_", 1)[1]))
    Ws, bs = [], []
    for n in names:
        inner = tree[n]["Dense_0"]
        Ws.append(inner["kernel"])
        bs.append(inner["bias"])
    return tuple(Ws), tuple(bs)


def _forward_sweeps(Ws, bs, x, act: str):
    """Shared primal: returns (u, Z_full, ps, as_, rs) — ps/as_ per hidden
    layer, rs the Z-sweep intermediates r_{L-1}..r_0 stored as rs[k] = r_k."""
    sig, dsig, _ = _ACT_DERIVS[act]
    L = len(Ws)
    a = x
    ps, as_ = [], [x]
    for k in range(L - 1):
        p = a @ Ws[k] + bs[k]
        a = sig(p)
        ps.append(p)
        as_.append(a)
    u = a @ Ws[L - 1] + bs[L - 1]

    r = jnp.broadcast_to(Ws[L - 1][:, 0], (x.shape[0], Ws[L - 1].shape[0]))
    rs = [None] * L
    rs[L - 1] = r
    for k in range(L - 2, -1, -1):
        q = rs[k + 1] * dsig(ps[k])
        rs[k] = q @ Ws[k].T
    return u, rs[0], ps, as_, rs


def mlp_u_z(Ws, bs, x, act: str = "sine") -> tuple[Array, Array]:
    """Plain-jnp reference: (u (B,1), Z_full (B, n0)) for x = [t, X]."""
    u, z_full, *_ = _forward_sweeps(Ws, bs, x, act)
    return u, z_full


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_mlp_u_z(Ws, bs, x, act: str = "sine"):
    return mlp_u_z(Ws, bs, x, act)


def _fused_fwd(Ws, bs, x, act):
    out = mlp_u_z(Ws, bs, x, act)
    return out, (Ws, bs, x)  # save only inputs; recompute in bwd


def _fused_bwd(act, res, cts):
    Ws, bs, x = res
    u_bar, z_bar = cts
    sig, dsig, ddsig = _ACT_DERIVS[act]
    L = len(Ws)
    _, _, ps, as_, rs = _forward_sweeps(Ws, bs, x, act)

    W_bars = [jnp.zeros_like(W) for W in Ws]
    b_bars = [jnp.zeros_like(b) for b in bs]

    # ---- Z-path adjoint (ascending k): c_{k} = cotangent of r_k
    p_bars_z = [None] * (L - 1)
    c = z_bar
    for k in range(L - 1):
        q = rs[k + 1] * dsig(ps[k])
        q_bar = c @ Ws[k]
        W_bars[k] = W_bars[k] + c.T @ q
        p_bars_z[k] = q_bar * rs[k + 1] * ddsig(ps[k])
        c = q_bar * dsig(ps[k])
    # top of the sweep: r_{L-1} broadcasts W_L[:, 0]
    W_bars[L - 1] = W_bars[L - 1].at[:, 0].add(jnp.sum(c, axis=0))

    # ---- u-path backward merged with the Z-path p̄ contributions
    a_bar = u_bar @ Ws[L - 1].T
    W_bars[L - 1] = W_bars[L - 1] + as_[L - 1].T @ u_bar
    b_bars[L - 1] = jnp.sum(u_bar, axis=0)
    for k in range(L - 2, -1, -1):
        p_bar = a_bar * dsig(ps[k]) + p_bars_z[k]
        W_bars[k] = W_bars[k] + as_[k].T @ p_bar
        b_bars[k] = jnp.sum(p_bar, axis=0)
        a_bar = p_bar @ Ws[k].T

    return tuple(W_bars), tuple(b_bars), a_bar


fused_mlp_u_z.defvjp(_fused_fwd, _fused_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_mlp_u_z_pallas(Ws, bs, x, interpret: bool = False):
    """Sine-MLP (u, Z_full) on the fused Pallas kernels (ops/mlp_kernel.py):
    one VMEM-resident kernel for forward+Z, one for the hand-derived
    backward. bf16 matmul operands / f32 accumulate — the same precision as
    XLA's default path (kernels are bit-exact vs a bf16-dot jnp replica)."""
    from dnnpde_tpu.ops.mlp_kernel import mlp_u_z_fwd_pallas

    return mlp_u_z_fwd_pallas(Ws, bs, x, interpret)


def _pallas_fwd(Ws, bs, x, interpret):
    from dnnpde_tpu.ops.mlp_kernel import mlp_u_z_fwd_pallas

    return mlp_u_z_fwd_pallas(Ws, bs, x, interpret), (Ws, bs, x)


def _pallas_bwd(interpret, res, cts):
    from dnnpde_tpu.ops.mlp_kernel import mlp_u_z_bwd_pallas

    Ws, bs, x = res
    u_bar, z_bar = cts
    return mlp_u_z_bwd_pallas(Ws, bs, x, u_bar, z_bar, interpret)


fused_mlp_u_z_pallas.defvjp(_pallas_fwd, _pallas_bwd)


def make_fused_net_u(
    layers: Sequence[int], activation: str = "sine", backend: str = "jnp"
):
    """net_u(params, t, X) → (u, Z) built on the fused hand-VJP path.

    Drop-in for ``solver.bsde.make_net_u`` restricted to plain MLPs with a
    supported activation and no output clamp (the FC-Sine flagship path).
    ``backend``: "jnp" (any activation, any device), "pallas" (sine, TPU),
    or "pallas_interpret" (sine, any device — for tests)."""
    act = activation.lower()
    if act not in _ACT_DERIVS:
        raise ValueError(f"fused net_u supports {sorted(_ACT_DERIVS)}, got {act!r}")
    if backend.startswith("pallas") and act != "sine":
        raise ValueError("the Pallas fused net_u kernels support sine only")

    def net_u(params, t: Array, X: Array, key=None):
        Ws, bs = extract_mlp_params(params)
        x = jnp.concatenate([t, X], axis=-1)
        if backend == "jnp":
            u, z_full = fused_mlp_u_z(Ws, bs, x, act)
        else:
            u, z_full = fused_mlp_u_z_pallas(
                Ws, bs, x, backend == "pallas_interpret"
            )
        return u, z_full[:, 1:]  # drop the t column

    return net_u
