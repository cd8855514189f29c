"""Pallas TPU kernels: fused MLP (u, ∇ₓu) forward and backward.

The measured roofline of the BSDE train step (results_r2/profile_summary.json)
is HBM traffic: XLA executes each scan step as ~10 separate matmul fusions,
each reading and writing (B, 256) activations to HBM, plus
dynamic-update-slice saves for the backward (25% of device time). These
kernels run the whole layer chain of ``ops/fused_net_u.py`` — forward,
Z-sweep, and the hand-derived first-order backward — inside VMEM: per step
only x, u, Z (forward) and the cotangents/gradients (backward) touch HBM.

Layout contract (enforced by the wrappers):
- hidden widths multiples of 128 (MXU lanes); input width and the 1-wide
  output are zero-padded to 128 multiples; batch zero-padded to the tile.
- matmul operands are cast to bf16 with f32 accumulation — the same
  precision XLA's default uses for these dots (verified in the compiled HLO).
- the backward accumulates weight/bias gradients across batch-grid programs
  (TPU grids are sequential, so read-modify-write on a constant-index output
  block is race-free).

Math and citations: see ``ops/fused_net_u.py`` (sine activation only here;
the jnp path covers tanh/relu). Validated against the jnp reference in
``tests/test_mlp_kernel.py`` (interpret mode off-TPU) and on-chip by
``scripts/verify_tpu_kernels.py``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

_TILE_B = 128  # VMEM stack budget: the bwd kernel keeps L activation lists
_LANES = 128
_VMEM_LIMIT = 100 * 1024 * 1024  # raise Mosaic's 16MB default scoped cap


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _dot(a: Array, w: Array) -> Array:
    """a @ w on the MXU, bf16 operands / f32 accumulate (XLA-default)."""
    return lax.dot_general(
        a.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )


def _dot_bt(a: Array, w: Array) -> Array:
    """a @ wᵀ (contract last dims)."""
    return lax.dot_general(
        a.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    )


def _dot_tb(a: Array, b: Array) -> Array:
    """aᵀ @ b (contract batch dims)."""
    return lax.dot_general(
        a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )


def _forward_in_vmem(x, Ws, bs):
    """Shared VMEM math: returns (u, ps, as_, rs)."""
    L = len(Ws)
    a = x
    ps, as_ = [], [x]
    for k in range(L - 1):
        p = _dot(a, Ws[k]) + bs[k]
        ps.append(p)
        a = jnp.sin(p)
        as_.append(a)
    u = _dot(a, Ws[L - 1]) + bs[L - 1]
    rs = [None] * L
    rs[L - 1] = jnp.broadcast_to(Ws[L - 1][:, 0][None, :], a.shape)
    for k in range(L - 2, -1, -1):
        q = rs[k + 1] * jnp.cos(ps[k])
        rs[k] = _dot_bt(q, Ws[k])
    return u, ps, as_, rs


def _fwd_kernel(*refs, L: int):
    """Lean forward: keeps only the L-1 pre-activations live (needed for
    cos in the Z-sweep); a and r stream through single buffers."""
    x_ref = refs[0]
    W = [r[:] for r in refs[1 : 1 + L]]
    b = [r[:] for r in refs[1 + L : 1 + 2 * L]]
    u_ref, z_ref = refs[1 + 2 * L], refs[2 + 2 * L]
    a = x_ref[:]
    ps = []
    for k in range(L - 1):
        p = _dot(a, W[k]) + b[k]
        ps.append(p)
        a = jnp.sin(p)
    u_ref[:] = _dot(a, W[L - 1]) + b[L - 1]
    r = jnp.broadcast_to(W[L - 1][:, 0][None, :], a.shape)
    for k in range(L - 2, -1, -1):
        r = _dot_bt(r * jnp.cos(ps[k]), W[k])
    z_ref[:] = r


def _bwd_kernel(*refs, L: int):
    x_ref, ubar_ref, zbar_ref = refs[0:3]
    W = [r[:] for r in refs[3 : 3 + L]]
    b = [r[:] for r in refs[3 + L : 3 + 2 * L]]
    out = refs[3 + 2 * L :]
    xbar_ref = out[0]
    Wbar_refs = out[1 : 1 + L]
    bbar_refs = out[1 + L : 1 + 2 * L]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for r in (*Wbar_refs, *bbar_refs):
            r[:] = jnp.zeros(r.shape, r.dtype)

    _, ps, as_, rs = _forward_in_vmem(x_ref[:], W, b)

    W_new = [Wbar_refs[k][:] for k in range(L)]
    b_new = [bbar_refs[k][:] for k in range(L)]

    # Z-path adjoint (ascending): c = cotangent of r_k
    p_bars_z = []
    c = zbar_ref[:]
    for k in range(L - 1):
        q = rs[k + 1] * jnp.cos(ps[k])
        q_bar = _dot(c, W[k])
        W_new[k] = W_new[k] + _dot_tb(c, q)
        p_bars_z.append(-q_bar * rs[k + 1] * jnp.sin(ps[k]))
        c = q_bar * jnp.cos(ps[k])
    # += column-0 update without scatter (unsupported in Mosaic): iota mask
    col0 = lax.broadcasted_iota(jnp.int32, W_new[L - 1].shape, 1) == 0
    W_new[L - 1] = W_new[L - 1] + jnp.where(
        col0, jnp.sum(c, axis=0)[:, None], 0.0
    )

    # u-path backward merged with the Z-path contributions
    u_bar = ubar_ref[:]
    a_bar = _dot_bt(u_bar, W[L - 1])
    W_new[L - 1] = W_new[L - 1] + _dot_tb(as_[L - 1], u_bar)
    b_new[L - 1] = b_new[L - 1] + jnp.sum(u_bar, axis=0, keepdims=True)
    for k in range(L - 2, -1, -1):
        p_bar = a_bar * jnp.cos(ps[k]) + p_bars_z[k]
        W_new[k] = W_new[k] + _dot_tb(as_[k], p_bar)
        b_new[k] = b_new[k] + jnp.sum(p_bar, axis=0, keepdims=True)
        a_bar = _dot_bt(p_bar, W[k])
    xbar_ref[:] = a_bar

    for k in range(L):
        Wbar_refs[k][:] = W_new[k]
        bbar_refs[k][:] = b_new[k]


def _pad_inputs(Ws, bs, x, tile_b_max=_TILE_B):
    """Zero-pad (Ws, bs, x) to 128-lane widths and the batch tile; returns
    (Ws_p, bs_p (as (1, n)), x_p, B, n0, tile_b)."""
    B, n0 = x.shape
    n0p = _round_up(n0, _LANES)
    tile_b = min(tile_b_max, _round_up(B, 8))
    Bp = _round_up(B, tile_b)
    x_p = jnp.pad(x, ((0, Bp - B), (0, n0p - n0)))
    Ws_p, bs_p = [], []
    for k, (W, b) in enumerate(zip(Ws, bs)):
        rp = n0p - W.shape[0] if k == 0 else 0
        cp = _round_up(W.shape[1], _LANES) - W.shape[1]
        Ws_p.append(jnp.pad(W, ((0, rp), (0, cp))))
        bs_p.append(jnp.pad(b, (0, cp))[None, :])
    return Ws_p, bs_p, x_p, B, n0, tile_b


def _wb_specs(Ws_p, bs_p):
    return (
        [pl.BlockSpec(W.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
         for W in Ws_p]
        + [pl.BlockSpec(b.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
           for b in bs_p]
    )


@functools.partial(jax.jit, static_argnames=("interpret", "tile_b"))
def mlp_u_z_fwd_pallas(Ws, bs, x, interpret: bool = False, tile_b: int = _TILE_B):
    """(u (B,1), Z_full (B,n0)) — fused forward+Z sweep, one kernel."""
    L = len(Ws)
    Ws_p, bs_p, x_p, B, n0, tile_b = _pad_inputs(Ws, bs, x, tile_b)
    Bp = x_p.shape[0]
    n0p = x_p.shape[1]
    outp = Ws_p[-1].shape[1]
    grid = (Bp // tile_b,)
    u_pad, z_pad = pl.pallas_call(
        functools.partial(_fwd_kernel, L=L),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_b, n0p), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            *_wb_specs(Ws_p, bs_p),
        ],
        out_specs=[
            pl.BlockSpec((tile_b, outp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, n0p), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bp, outp), jnp.float32),
            jax.ShapeDtypeStruct((Bp, n0p), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(x_p, *Ws_p, *bs_p)
    return u_pad[:B, :1], z_pad[:B, :n0]


@functools.partial(jax.jit, static_argnames=("interpret", "tile_b"))
def mlp_u_z_bwd_pallas(Ws, bs, x, u_bar, z_bar, interpret: bool = False, tile_b: int = _TILE_B):
    """Hand-derived backward in one kernel: (W̄s, b̄s, x̄)."""
    L = len(Ws)
    Ws_p, bs_p, x_p, B, n0, tile_b = _pad_inputs(Ws, bs, x, tile_b)
    Bp, n0p = x_p.shape
    outp = Ws_p[-1].shape[1]
    ubar_p = jnp.pad(u_bar, ((0, Bp - B), (0, outp - u_bar.shape[1])))
    zbar_p = jnp.pad(z_bar, ((0, Bp - B), (0, n0p - z_bar.shape[1])))
    grid = (Bp // tile_b,)
    io_spec = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, L=L),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_b, n0p), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, outp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, n0p), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            *_wb_specs(Ws_p, bs_p),
        ],
        out_specs=[
            pl.BlockSpec((tile_b, n0p), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            *[io_spec(W.shape) for W in Ws_p],
            *[io_spec(b.shape) for b in bs_p],
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bp, n0p), jnp.float32),
            *[jax.ShapeDtypeStruct(W.shape, jnp.float32) for W in Ws_p],
            *[jax.ShapeDtypeStruct(b.shape, jnp.float32) for b in bs_p],
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(x_p, ubar_p, zbar_p, *Ws_p, *bs_p)
    x_bar = outs[0][:B, :n0]
    W_bars = [
        o[: W.shape[0], : W.shape[1]] for o, W in zip(outs[1 : 1 + L], Ws)
    ]
    b_bars = [
        o[0, : b.shape[0]] for o, b in zip(outs[1 + L : 1 + 2 * L], bs)
    ]
    return tuple(W_bars), tuple(b_bars), x_bar
