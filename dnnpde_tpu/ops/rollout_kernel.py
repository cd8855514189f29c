"""Whole-rollout-resident Pallas TPU kernel: N Euler–Maruyama steps + a
sine-MLP u-evaluation per step in ONE kernel launch.

Why this exists (VERDICT r2 #4): the per-call fused-MLP kernel pair
(``ops/mlp_kernel.py``) lost 3.7× to XLA because one kernel launch per
``net_u`` call executes its VPU transcendental chain and MXU matmuls
serially, while XLA's fusion scheduler overlaps them ACROSS the scan steps
it pipelines. The structurally different program tried here keeps the
entire rollout inside one Mosaic program:

- grid over batch tiles (the only parallel axis);
- the ~0.3 M-parameter weight set stays VMEM-resident for all N steps
  (constant-index blocks are fetched once, not per step);
- per-step activations NEVER touch HBM — the only HBM traffic is x0 in,
  Y out, and (in the explicit-increments variant) the dW tensor;
- the ``seed`` variant generates the Brownian increments IN-KERNEL
  (hardware PRNG + Box–Muller), eliminating the dW tensor entirely:
  HBM traffic becomes O(M·D + N·M) instead of O(N·M·D).

Scope: the forward/inference rollout (the reference's ``predict`` /
``PredictionGenerator`` workload, ``1d_BSPDE_case.py:420-451,562-603``) for
GBM-type diagonal problems — X₁ = X + (μ_c·X)dt + (σ_c·X)dW with a sine-MLP
u(t, X) read-out per step. This covers BSB (μ_c=0, σ_c=0.4), the basket
family (0.05, 0.2) and the 1D call (0.01, 0.25). Training stays on the XLA
path (the measured winner — ARCHITECTURE.md §3/§7).

Measured on the v5e (scripts/bench_rollout_kernel.py, round 3): parity
with the jitted ``lax.scan`` reference ``rollout_paths_xla`` below
(0.97–1.02× across M=2048/16384), and 1–2% ahead end-to-end when the
in-kernel PRNG replaces a staged ``jax.random`` dW tensor — see
ARCHITECTURE.md §7 for the full table and the structural conclusion.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

_LANES = 128
_TILE_B = 256  # batch tile: 2 MXU row-passes per matmul, still VMEM-cheap
_VMEM_LIMIT = 100 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _dot(a: Array, w: Array) -> Array:
    """a @ w on the MXU — bf16 operands, f32 accumulate (XLA's default
    precision for these dots; matches ops/mlp_kernel.py)."""
    return lax.dot_general(
        a.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )


def _uniform23(shape) -> Array:
    """u ∈ (0, 1) from the hardware PRNG: 23 random bits (uint32 → f32 is
    unsupported in Mosaic, so shift to int32 range first) + ½ulp offset.
    u ≥ 2⁻²⁴ keeps log(u) finite (z-tail clamp ~5.7σ — irrelevant for MC)."""
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32) >> 9
    f = pltpu.bitcast(bits, jnp.int32).astype(jnp.float32)
    return (f + 0.5) * (2.0 ** -23)


def _normals(shape) -> Array:
    """Standard normals via Box–Muller on two hardware-PRNG uniforms."""
    u1 = _uniform23(shape)
    u2 = _uniform23(shape)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    return r * jnp.cos((2.0 * jnp.pi) * u2)


def _rollout_kernel(
    *refs, L: int, N: int, dt: float, mu_c: float, sig_c: float,
    rng: bool, sqrt_dt: float,
):
    """Grid = (batch_tiles, N+1 steps); TPU grids execute sequentially with
    the LAST dimension fastest, so for each batch tile the time steps run in
    order and the path state X persists in VMEM scratch across them — the
    Mosaic-idiomatic way to write a sequential rollout (per-step blocks are
    pipelined/double-buffered by the Pallas runtime, vs a fori_loop with
    dynamic ref indexing which defeats the pipeliner).

    Ref layout: [seed (SMEM, rng only)], x0 (8, Dp),
    [dW (1, tile_b, Dp) per-step block, explicit only], w_t (8, H),
    W_x (Dp, H), W_1..W_{L-2} (H, H), w_out (H, LANES), b_0..b_{L-2} (8, H),
    b_out (8, LANES)  →  y (tile_b, N1p) block revisited across the tile's
    steps (stays VMEM-resident; written back once per tile), one column
    stored per step; scratch X (tile_b, Dp).
    """
    i = 0
    if rng:
        seed_ref = refs[i]
        i += 1
    x0_ref = refs[i]
    i += 1
    if not rng:
        dw_ref = refs[i]
        i += 1
    wt_ref, wx_ref = refs[i], refs[i + 1]
    i += 2
    Wh = [refs[i + k] for k in range(L - 2)]
    i += L - 2
    wout_ref = refs[i]
    i += 1
    bh = [refs[i + k] for k in range(L - 1)]
    i += L - 1
    bout_ref = refs[i]
    i += 1
    y_ref = refs[i]
    x_scratch = refs[i + 1]

    tile_b, Dp = x_scratch.shape
    n = pl.program_id(1)

    @pl.when(n == 0)
    def _init():
        x_scratch[:] = jnp.broadcast_to(x0_ref[0:1, :], (tile_b, Dp))
        if rng:
            # distinct stream per batch tile; the hardware PRNG state then
            # advances statefully across this tile's sequential steps
            pltpu.prng_seed(seed_ref[0] + pl.program_id(0))

    wt = wt_ref[0:1, :]          # (1, H) — the t-row of the input layer
    wout = wout_ref[:, 0:1]      # (H, 1) — the single output column
    b_out = bout_ref[0, 0]
    X = x_scratch[:]

    # u(t, X) for the tile as a (tile_b, 1) column. The t-row term uses the
    # same bf16-operand rounding the MXU applies to the concat([t, X]) form
    # (bf16×bf16 products are exact in f32).
    t = n.astype(jnp.float32) * dt
    t_term = (
        t.astype(jnp.bfloat16).astype(jnp.float32)
        * wt.astype(jnp.bfloat16).astype(jnp.float32)
    )
    a = _dot(X, wx_ref[:]) + t_term + bh[0][0:1, :]
    a = jnp.sin(a)
    for k in range(L - 2):
        a = jnp.sin(_dot(a, Wh[k][:]) + bh[k + 1][0:1, :])
    u_col = _dot(a, wout) + b_out  # (tile_b, 1)
    # Column write via masked merge: a dynamic lane-dim store would need a
    # statically 128-aligned index (Mosaic constraint); the block is VMEM-
    # resident across the tile's steps, so this is one small VPU op.
    col = lax.broadcasted_iota(jnp.int32, y_ref.shape, 1)
    y_ref[:] = jnp.where(col == n, u_col, y_ref[:])

    @pl.when(n < N)
    def _step():
        if rng:
            dw = sqrt_dt * _normals((tile_b, Dp))
        else:
            dw = dw_ref[0]
        # GBM-type Euler–Maruyama; x0's zero padding keeps pad lanes at 0
        x_scratch[:] = X + (mu_c * dt) * X + sig_c * X * dw


def _split_pad_weights(Ws, bs, D):
    """Split W0 into its t-row and X-rows; pad everything to TPU tiles."""
    H = Ws[0].shape[1]
    Dp = _round_up(D, _LANES)
    w_t = jnp.pad(Ws[0][0:1, :], ((0, 7), (0, 0)))            # (8, H)
    W_x = jnp.pad(Ws[0][1:, :], ((0, Dp - D), (0, 0)))        # (Dp, H)
    w_out = jnp.pad(Ws[-1], ((0, 0), (0, _LANES - 1)))        # (H, LANES)
    b_h = [jnp.pad(b[None, :], ((0, 7), (0, 0))) for b in bs[:-1]]
    b_out = jnp.pad(bs[-1][None, :], ((0, 7), (0, _LANES - 1)))
    return w_t, W_x, list(Ws[1:-1]), w_out, b_h, b_out, Dp


@functools.partial(
    jax.jit,
    static_argnames=("N", "dt", "mu_c", "sig_c", "M", "tile_b", "interpret"),
)
def rollout_paths_pallas(
    Ws, bs, x0, *, N: int, dt: float, mu_c: float, sig_c: float,
    dWs: Array | None = None, seed: Array | None = None,
    M: int | None = None, tile_b: int = _TILE_B, interpret: bool = False,
) -> Array:
    """Y paths (M, N+1): u(tₙ, Xₙ) along GBM Euler–Maruyama paths, one
    kernel launch. Exactly one of ``dWs`` (M, N, D — explicit increments,
    bit-comparable to the XLA reference) or ``seed`` (scalar int32, with
    ``M`` — in-kernel hardware-PRNG increments, zero dW HBM traffic) must
    be given."""
    if (dWs is None) == (seed is None):
        raise ValueError("pass exactly one of dWs or seed")
    rng = dWs is None
    if rng and M is None:
        raise ValueError("M is required with seed (no dW tensor to infer it)")
    D = x0.shape[-1]
    if not rng:
        M = dWs.shape[0]
    w_t, W_x, Wh, w_out, b_h, b_out, Dp = _split_pad_weights(Ws, bs, D)
    H = W_x.shape[1]
    L = len(Ws)
    x0_p = jnp.pad(
        jnp.asarray(x0, jnp.float32).reshape(1, D), ((0, 7), (0, Dp - D))
    )
    N1p = _round_up(N + 1, 8)
    Mp = _round_up(M, tile_b)
    grid = (Mp // tile_b, N + 1)  # time is the FAST (sequential) axis

    def _const(shape):
        return pl.BlockSpec(shape, lambda i, n: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    in_specs = []
    inputs = []
    if rng:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        inputs.append(jnp.asarray(seed, jnp.int32).reshape(1))
    in_specs.append(_const((8, Dp)))
    inputs.append(x0_p)
    if not rng:
        dws_tm = jnp.swapaxes(jnp.asarray(dWs, jnp.float32), 0, 1)  # (N, M, D)
        dws_p = jnp.pad(dws_tm, ((0, 0), (0, Mp - M), (0, Dp - D)))
        in_specs.append(
            pl.BlockSpec(
                (1, tile_b, Dp),
                # step n consumes dW[n]; the n == N program reads a dummy
                # (clamped) block it never uses
                lambda i, n: (jnp.minimum(n, N - 1), i, 0),
                memory_space=pltpu.VMEM,
            )
        )
        inputs.append(dws_p)
    in_specs += [
        _const((8, H)), _const((Dp, H)),
        *[_const((H, H)) for _ in Wh],
        _const((H, _LANES)),
        *[_const((8, H)) for _ in b_h],
        _const((8, _LANES)),
    ]
    inputs += [w_t, W_x, *Wh, w_out, *b_h, b_out]

    y = pl.pallas_call(
        functools.partial(
            _rollout_kernel, L=L, N=N, dt=dt, mu_c=mu_c, sig_c=sig_c,
            rng=rng, sqrt_dt=float(dt) ** 0.5,
        ),
        grid=grid,
        in_specs=in_specs,
        # constant index over n → the tile's block stays VMEM-resident for
        # all its steps and is written back to HBM once per tile
        out_specs=pl.BlockSpec((tile_b, N1p), lambda i, n: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, N1p), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tile_b, Dp), jnp.float32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(*inputs)
    return y[:M, : N + 1]  # (M, N+1)


@functools.partial(jax.jit, static_argnames=("N", "dt", "mu_c", "sig_c"))
def rollout_paths_xla(
    Ws, bs, x0, *, N: int, dt: float, mu_c: float, sig_c: float, dWs: Array
) -> Array:
    """The same forward rollout as a jitted ``lax.scan`` — the XLA baseline
    the kernel is measured against, and the correctness oracle for tests."""
    D = x0.shape[-1]
    M = dWs.shape[0]

    def u(t, X):
        a = jnp.concatenate([jnp.full((X.shape[0], 1), t), X], axis=1)
        for W, b in zip(Ws[:-1], bs[:-1]):
            a = jnp.sin(
                lax.dot_general(
                    a.astype(jnp.bfloat16), W.astype(jnp.bfloat16),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) + b
            )
        return lax.dot_general(
            a.astype(jnp.bfloat16), Ws[-1].astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        ) + bs[-1]

    X0 = jnp.broadcast_to(jnp.asarray(x0, jnp.float32), (M, D))

    def step(carry, inp):
        n, dw = inp
        X = carry
        t = n.astype(jnp.float32) * dt
        y = u(t, X)
        X1 = X + (mu_c * dt) * X + sig_c * X * dw
        return X1, y

    dws_tm = jnp.swapaxes(dWs, 0, 1)
    XN, ys = lax.scan(step, X0, (jnp.arange(N), dws_tm))
    yN = u(N * dt, XN)
    return jnp.concatenate(
        [jnp.swapaxes(ys, 0, 1), yN[:, None, :]], axis=1
    )[..., 0]


def gbm_coefficients(problem) -> tuple[float, float] | None:
    """(μ_c, σ_c) when the problem's dynamics are GBM-type
    (μ = μ_c·X, σ = σ_c·diag(X)), else None. Matches the problem zoo's
    diagonal family (pde/problems.py): BSB (0, σ̄), 1D/nD calls and
    baskets (r, σ̄)."""
    from dnnpde_tpu.pde.problems import (
        BasketCallOption,
        BlackScholesBarenblatt,
        CallOption1D,
        CallOptionND,
        BSPDETestCase,
    )

    if isinstance(problem, BlackScholesBarenblatt):
        return 0.0, float(problem.sigma_bar)
    if isinstance(
        problem, (CallOption1D, CallOptionND, BasketCallOption, BSPDETestCase)
    ):
        return float(problem.r), float(problem.sigma_bar)
    return None


def predict_paths_fast(trainer, M: int, seed: int = 0) -> Array:
    """Y paths (M, N+1) for a trained FC-sine model on a GBM-type problem —
    the serving/inference counterpart of ``Trainer.predict`` /
    ``PredictionGenerator`` (reference ``1d_BSPDE_case.py:420-451``), run as
    ONE whole-rollout-resident kernel launch with in-kernel increment
    generation (no dW tensor, no per-step HBM activation traffic).

    Restrictions (falls back with ValueError otherwise): FC mode, sine
    activation, no output transform, GBM-type dynamics, no dW correlation.
    """
    from dnnpde_tpu.ops.fused_net_u import extract_mlp_params

    problem = trainer.problem
    coefs = gbm_coefficients(problem)
    if coefs is None:
        raise ValueError(f"{problem.name}: dynamics are not GBM-type")
    if trainer.mode.lower() != "fc" or str(trainer.activation).lower() != "sine":
        raise ValueError("fast rollout supports the FC-sine network only")
    if problem.has_output_transform:
        raise ValueError("fast rollout does not apply output transforms")
    if trainer.chol is not None:
        raise ValueError("fast rollout does not correlate increments")
    Ws, bs = extract_mlp_params(trainer.params)
    mu_c, sig_c = coefs
    return rollout_paths_pallas(
        list(Ws), list(bs), jnp.asarray(problem.x0),
        N=trainer.N, dt=problem.T / trainer.N, mu_c=mu_c, sig_c=sig_c,
        seed=jnp.asarray([seed]), M=M,
    )
