"""Black–Scholes implied volatility — jittable, vmappable, differentiable.

Completes the market-data toolchain around ``calibrate_heston``: quotes are
usually handled in implied-vol space, so converting model/market prices to
IVs (and scoring smiles) needs a batched root-finder. The reference has no
counterpart (its pricers are scipy-side and scalar).

Method: safeguarded Newton on total volatility, run a FIXED number of
iterations with ``lax.fori_loop`` (no data-dependent control flow — the
whole solve stays one fused XLA program and vmaps over quote grids).
Newton on BS price in σ is globally well-behaved: price is strictly
increasing and convex-then-concave in σ with vega > 0, so a bisection
safeguard on a bracketing interval guarantees convergence; 64 iterations
halve the bracket to ~5e-20 even if every Newton step were rejected.

The solve is also DIFFERENTIABLE the cheap way: rather than
backpropagating through the iterations, ``implied_vol`` applies the
implicit-function theorem via ``jax.custom_vjp`` — ∂σ/∂price = 1/vega,
∂σ/∂(S, K, T, r) = −(∂C/∂·)/vega at the root. Gradients of IV-space losses
(e.g. calibrating to an IV smile) cost one closed-form evaluation.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from dnnpde_tpu.numerics.black_scholes import black_scholes_call

Array = jnp.ndarray

_SQRT2PI = 2.5066282746310002


def bs_vega(S, K, T, r, sigma, q: float = 0.0) -> Array:
    """∂C/∂σ (always ≥ 0)."""
    S = jnp.asarray(S, jnp.float32)
    T = jnp.maximum(jnp.asarray(T, jnp.float32), 1e-12)
    sigma = jnp.maximum(jnp.asarray(sigma, jnp.float32), 1e-12)
    sqrtT = jnp.sqrt(T)
    d1 = (jnp.log(jnp.maximum(S, 1e-12) / K) + (r - q + 0.5 * sigma**2) * T) / (
        sigma * sqrtT
    )
    phi = jnp.exp(-0.5 * d1**2) / _SQRT2PI
    return S * jnp.exp(-q * T) * phi * sqrtT


def _solve_iv(price, S, K, T, r, q, lo, hi, iters):
    """Safeguarded Newton inside a fori_loop. Carry: (sigma, lo, hi)."""

    def body(_, carry):
        sigma, lo, hi = carry
        c = black_scholes_call(S, K, T, r, sigma, q)
        v = bs_vega(S, K, T, r, sigma, q)
        # bracket update from the sign of the residual (price monotone in σ)
        too_low = c < price
        lo = jnp.where(too_low, sigma, lo)
        hi = jnp.where(too_low, hi, sigma)
        newton = sigma - (c - price) / jnp.maximum(v, 1e-12)
        in_bracket = (newton > lo) & (newton < hi)
        bisect = 0.5 * (lo + hi)
        sigma = jnp.where(in_bracket & jnp.isfinite(newton), newton, bisect)
        return sigma, lo, hi

    sigma0 = jnp.full_like(price, 0.5)
    sigma, _, _ = jax.lax.fori_loop(
        0, iters, body, (sigma0, jnp.full_like(price, lo),
                         jnp.full_like(price, hi))
    )
    return sigma


@partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def implied_vol(
    price, S, K, T, r,
    q: float = 0.0, lo: float = 1e-4, hi: float = 5.0, iters: int = 64,
) -> Array:
    """Black–Scholes implied volatility of a call ``price``; broadcasts over
    arrays (vmap/jit-safe). Prices at-or-below intrinsic return ``lo``;
    above the σ→``hi`` price return ``hi`` (clamped, no NaNs)."""
    price, S, K, T, r = jnp.broadcast_arrays(
        *(jnp.asarray(a, jnp.float32) for a in (price, S, K, T, r))
    )
    return _solve_iv(price, S, K, T, r, q, lo, hi, iters)


def _unbroadcast(x: Array, shape: tuple) -> Array:
    """Reduce a broadcast-shaped cotangent back to its primal's ``shape``
    (sum over the axes broadcasting added or stretched)."""
    if jnp.shape(x) == tuple(shape):
        return x
    n_lead = x.ndim - len(shape)
    if n_lead:
        x = jnp.sum(x, axis=tuple(range(n_lead)))
    stretched = tuple(
        i for i, s in enumerate(shape) if s == 1 and x.shape[i] != 1
    )
    if stretched:
        x = jnp.sum(x, axis=stretched, keepdims=True)
    return x.reshape(shape)


def _iv_fwd(price, S, K, T, r, q, lo, hi, iters):
    # Save the BROADCAST arrays as residuals (the raw args can have
    # heterogeneous shapes — e.g. scalar T against an array of prices —
    # and mixing shapes in the backward pass silently mis-associates
    # cotangents), plus each primal's shape so cotangents reduce back.
    shapes = tuple(jnp.shape(a) for a in (price, S, K, T, r))
    price_b, S_b, K_b, T_b, r_b = jnp.broadcast_arrays(
        *(jnp.asarray(a, jnp.float32) for a in (price, S, K, T, r))
    )
    sigma = _solve_iv(price_b, S_b, K_b, T_b, r_b, q, lo, hi, iters)
    return sigma, (sigma, S_b, K_b, T_b, r_b, shapes)


def _iv_bwd(q, lo, hi, iters, res, g):
    """Implicit function theorem at the root C(σ*) = price:
    dσ/dprice = 1/vega; dσ/dθ = −(∂C/∂θ)/vega for θ ∈ {S, K, T, r}.
    All partials are elementwise on the broadcast grid; each cotangent is
    then summed over broadcast axes back to its primal's shape."""
    sigma, S, K, T, r = res[:5]
    shapes = res[5]
    vega = jnp.maximum(bs_vega(S, K, T, r, sigma, q), 1e-12)

    def price_of(S, K, T, r):
        return black_scholes_call(S, K, T, r, sigma, q)

    grads = jax.grad(lambda s, k, t, rr: jnp.sum(price_of(s, k, t, rr)),
                     argnums=(0, 1, 2, 3))(S, K, T, r)
    coef = g / vega  # elementwise, broadcast shape
    cots = (coef, -coef * grads[0], -coef * grads[1],
            -coef * grads[2], -coef * grads[3])
    return tuple(_unbroadcast(c, s) for c, s in zip(cots, shapes))


implied_vol.defvjp(_iv_fwd, _iv_bwd)
