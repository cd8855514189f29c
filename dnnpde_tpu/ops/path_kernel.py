"""Pallas TPU kernels for fused stochastic path generation.

The reference generates Brownian increments on the host with NumPy and pays a
host→device copy each use (``fetch_minibatch``, ``1d_BSPDE_case.py:291-321``).
The plain-JAX replacement (``dnnpde_tpu.sim``) already moves this on device;
these kernels go further for the Monte-Carlo/pricing workloads where path
generation IS the workload (BASELINE.md north-star "SDE paths/sec/chip"):

- RNG (per-core hardware PRNG), Box–Muller, Cholesky correlation (one MXU
  matmul per step) and the log-Euler GBM step are fused in VMEM; only the
  terminal state is written to HBM. The whole N-step rollout streams zero
  intermediate traffic, vs. N×(M×D) HBM round-trips for the unfused version
  (the XLA scan materializes every step's increment tensor).
- The path batch is tiled over a 1-D grid; each program owns a
  (TILE_M, D_pad) block with D padded to the 128-lane boundary.

On non-TPU backends the kernels run in interpreter mode (slow but exact),
keeping the test suite hardware-independent.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

_TILE_M = 256
_LANES = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _uniform_from_bits(bits: Array) -> Array:
    """uint32 → float32 uniform in (0, 1): top 24 bits scaled, zero-excluded.

    Mosaic has no uint32→f32 cast; the shifted value fits in 24 bits, so it
    is bitcast to int32 (identical bits, non-negative) and converted from
    there.
    """
    top24 = pltpu.bitcast(bits >> 8, jnp.int32)
    u = top24.astype(jnp.float32) * (1.0 / (1 << 24))
    return jnp.maximum(u, 1e-12)


def _box_muller(shape) -> Array:
    """Standard normals from the per-core PRNG (must be seeded first).

    Uses BOTH Box–Muller branches (r·cos, r·sin from one uniform pair), so
    each output normal costs one uniform + ~1.5 transcendentals instead of
    two uniforms + 3 — the kernel is transcendental-bound, this matters.
    """
    half = (shape[0] // 2, shape[1])
    b1 = pltpu.bitcast(pltpu.prng_random_bits(half), jnp.uint32)
    b2 = pltpu.bitcast(pltpu.prng_random_bits(half), jnp.uint32)
    u1 = _uniform_from_bits(b1)
    u2 = _uniform_from_bits(b2)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    ang = 2.0 * jnp.pi * u2
    return jnp.concatenate([r * jnp.cos(ang), r * jnp.sin(ang)], axis=0)


def _gbm_terminal_kernel(
    seed_ref, s0_ref, sig_ref, chol_ref, out_ref, *, n_steps, r, dt, correlate
):
    """One grid program: TILE_M paths × D_pad assets, N steps fused in VMEM.

    log-Euler (exact-scheme) GBM: logS += (r − σ²/2)dt + σ√dt·(z·Lᵀ).
    """
    pid = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0] + pid)

    shape = out_ref.shape  # (TILE_M, D_pad)
    sig = sig_ref[:]  # (1, D_pad)
    drift = (r - 0.5 * sig * sig) * dt
    scale = sig * jnp.sqrt(dt)

    # GBM log-dynamics are linear in the normals, so the Cholesky correlation
    # commutes with the time sum: accumulate Σ z_n in the loop and apply L
    # ONCE at the end — one (TILE_M, D)×(D, D) MXU matmul per program instead
    # of N small ones (exact, not an approximation).
    def body(_, z_acc):
        return z_acc + _box_muller(shape)

    z_sum = jax.lax.fori_loop(
        0, n_steps, body, jnp.zeros(shape, jnp.float32)
    )
    if correlate:
        # z·Lᵀ on the MXU; padded rows of L are zero so padded lanes
        # contribute nothing to real assets.
        z_sum = jax.lax.dot_general(
            z_sum,
            chol_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    logS = n_steps * drift + scale * z_sum
    out_ref[:] = s0_ref[:] * jnp.exp(logS)


@functools.partial(
    jax.jit, static_argnames=("M", "N", "r", "dt", "interpret", "tile_m")
)
def _gbm_terminal_call(
    seed: Array,
    s0_pad: Array,
    sig_pad: Array,
    chol_pad: Array,
    M: int,
    N: int,
    r: float,
    dt: float,
    interpret: bool,
    tile_m: int,
) -> Array:
    d_pad = s0_pad.shape[-1]
    correlate = chol_pad.shape[0] > 1  # (1,1) sentinel disables the matmul
    kernel = functools.partial(
        _gbm_terminal_kernel, n_steps=N, r=r, dt=dt, correlate=correlate
    )
    grid = (M // tile_m,)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seed (1,)
            pl.BlockSpec((1, d_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                chol_pad.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (tile_m, d_pad), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((M, d_pad), jnp.float32),
        # the TPU interpreter (not the HLO one) understands pltpu.prng_*
        interpret=pltpu.InterpretParams() if interpret else False,
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * d_pad * (d_pad if correlate else 1),
            bytes_accessed=M * d_pad * 4,
            transcendentals=3 * M * N * d_pad,
        ),
    )(seed, s0_pad, sig_pad, chol_pad)


def _gbm_terminal_reference(
    seed: int | Array,
    S0,
    r: float,
    sigma,
    T: float,
    N: int,
    M: int,
    chol: Optional[np.ndarray] = None,
) -> Array:
    """jnp implementation of the kernel's exact math (sum of N normals,
    correlate once, exponentiate) — the non-TPU fallback and the golden model
    the Pallas kernel is validated against on hardware."""
    S0 = jnp.atleast_1d(jnp.asarray(S0, jnp.float32))
    D = S0.shape[0]
    key = jax.random.PRNGKey(int(seed) if not hasattr(seed, "dtype") else seed)
    z_sum = jnp.sqrt(float(N)) * jax.random.normal(key, (M, D))
    if chol is not None:
        z_sum = z_sum @ jnp.asarray(chol, jnp.float32).T
    sig = jnp.broadcast_to(jnp.asarray(sigma, jnp.float32), (D,))
    dt = T / N
    logS = N * (r - 0.5 * sig**2) * dt + sig * jnp.sqrt(dt) * z_sum
    return S0[None, :] * jnp.exp(logS)


def pallas_gbm_terminal(
    seed: int | Array,
    S0,
    r: float,
    sigma,
    T: float,
    N: int,
    M: int,
    chol: Optional[np.ndarray] = None,
    tile_m: int = _TILE_M,
    interpret: Optional[bool] = None,
) -> Array:
    """Terminal GBM values S_T, shape (M, D) — fused Pallas path generator.

    Drop-in accelerator for the Monte-Carlo pricers' path engines
    (``gbm_paths`` terminal slice): statistically identical (hardware PRNG
    instead of threefry), ~zero HBM traffic during the rollout.

    M must be a multiple of ``tile_m`` (pad the batch or lower ``tile_m``).

    On non-TPU backends the same math runs as a jnp fallback (the Pallas
    interpreter's PRNG primitives are not statistically faithful on CPU);
    pass ``interpret=True`` to force the interpreted kernel (compile-path
    debugging only).
    """
    if M % tile_m != 0:
        raise ValueError(f"M={M} must be a multiple of tile_m={tile_m}")
    if tile_m % 2 != 0:
        # _box_muller emits rows in two half-tile halves (cos/sin branches);
        # an odd tile would produce a (tile_m-1)-row block and fail at trace.
        raise ValueError(f"tile_m={tile_m} must be even (Box-Muller pairing)")
    if interpret is None and jax.default_backend() != "tpu":
        return _gbm_terminal_reference(seed, S0, r, sigma, T, N, M, chol)
    interpret = bool(interpret)
    S0 = np.atleast_1d(np.asarray(S0, np.float32))
    D = S0.shape[0]
    d_pad = _round_up(max(D, 1), _LANES)
    s0_pad = jnp.zeros((1, d_pad), jnp.float32).at[0, :D].set(jnp.asarray(S0))
    sig = np.broadcast_to(np.asarray(sigma, np.float32), (D,))
    sig_pad = jnp.zeros((1, d_pad), jnp.float32).at[0, :D].set(jnp.asarray(sig))
    if chol is not None:
        cp = jnp.zeros((d_pad, d_pad), jnp.float32)
        chol_pad = cp.at[:D, :D].set(jnp.asarray(chol, jnp.float32))
    else:
        chol_pad = jnp.zeros((1, 1), jnp.float32)  # sentinel: no correlation
    seed_arr = jnp.asarray([seed], jnp.int32).reshape(1)
    out = _gbm_terminal_call(
        seed_arr, s0_pad, sig_pad, chol_pad, M, N, r, float(T) / N, interpret, tile_m
    )
    return out[:, :D]


def pallas_basket_call_mc(
    seed: int,
    S0,
    K: float,
    T: float,
    r: float,
    sigma,
    chol: Optional[np.ndarray] = None,
    num_paths: int = 131072,
    num_steps: int = 1,
    payoff: str = "mean",
) -> tuple[Array, Array]:
    """Basket-call MC price using the fused Pallas path kernel.

    Same contract as :func:`dnnpde_tpu.numerics.basket_call_mc` (price, SE).
    """
    ST = pallas_gbm_terminal(seed, S0, r, sigma, T, num_steps, num_paths, chol)
    if payoff == "mean":
        basket = jnp.mean(ST, axis=-1)
    elif payoff == "sum":
        basket = jnp.sum(ST, axis=-1)
    else:
        raise ValueError(f"unknown payoff {payoff!r}")
    pay = jnp.maximum(basket - K, 0.0)
    disc = jnp.exp(-r * T)
    return disc * jnp.mean(pay), disc * jnp.std(pay) / jnp.sqrt(num_paths)
