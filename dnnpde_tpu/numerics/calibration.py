"""Differentiable Heston calibration: fit (κ, θ, σ_v, ρ, v0) to option quotes.

Beyond-reference capability, and a direct payoff of the TPU-native numerics
design: the closed-form pricer here is fixed-order Gauss–Legendre on complex
jnp (``numerics/heston.py``), so it is `jax.grad`-differentiable END TO END —
the calibration loop is gradient descent on the exact pricing function. The
reference's pricer is adaptive `scipy.integrate.quad` inside Python loops
(``numerics/sv_heston.py:51-58``): no gradients, so this workflow does not
exist there at all.

Design:
- the quote grid (strikes × maturities) prices in ONE vmapped evaluation;
- parameters are optimized UNCONSTRAINED through smooth bijections
  (softplus for the positive ones, tanh for ρ ∈ (−1, 1)), so the optimizer
  can never step out of the admissible region;
- the whole fit is one ``lax.scan`` of optax-adam steps under ``jit`` — a
  few hundred iterations run in milliseconds once compiled.

The characteristic-function pricer is complex-valued, which the TPU backend
does not support — like every pricer in ``numerics/`` it runs on the
(always present) CPU backend via ``complex_safe``; calibration is a
host-side analytics task, not device compute.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dnnpde_tpu.numerics.heston import HestonParams, heston_call_price
from dnnpde_tpu.numerics.quadrature import complex_safe

Array = jnp.ndarray

# (name, init, lower-ish scale) — unconstrained <-> constrained bijections
_POSITIVE = ("kappa", "theta", "sigma", "v0")


def _softplus(x):
    return jax.nn.softplus(x)


def _softplus_inv(y):
    y = jnp.asarray(y, jnp.float32)
    return y + jnp.log(-jnp.expm1(-y))


def _pack(kappa, theta, sigma, rho, v0) -> Array:
    """Constrained params -> unconstrained optimization vector."""
    return jnp.stack([
        _softplus_inv(kappa),
        _softplus_inv(theta),
        _softplus_inv(sigma),
        jnp.arctanh(jnp.clip(rho, -0.999, 0.999)),
        _softplus_inv(v0),
    ])


def _unpack(u: Array) -> tuple[Array, Array, Array, Array, Array]:
    return (
        _softplus(u[0]),
        _softplus(u[1]),
        _softplus(u[2]),
        jnp.tanh(u[3]),
        _softplus(u[4]),
    )


class CalibrationResult(NamedTuple):
    params: HestonParams
    loss: float                 # final mean squared relative price error
    rmse_rel: float             # sqrt(loss): typical relative price misfit
    loss_history: np.ndarray    # (n_iter,)
    feller: float               # 2κθ − σ² (> 0: variance stays positive)


@complex_safe
def calibrate_heston(
    S0: float,
    strikes,
    maturities,
    market_prices,
    r: float,
    init: Optional[HestonParams] = None,
    n_iter: int = 400,
    lr: float = 0.05,
    order: int = 128,
    lr_stages: int = 1,
) -> CalibrationResult:
    """Fit Heston (κ, θ, σ_v, ρ, v0) to a quote grid by Adam on the exact
    differentiable closed form.

    Args:
      S0: spot.
      strikes / maturities / market_prices: same-length 1-D arrays — one
        entry per quote (flatten a surface before calling).
      r: risk-free rate (held fixed, as in the reference's setting).
      init: starting point (defaults to the reference's parameter set).
      order: Gauss–Legendre order per price (128 is plenty: the 256-order
        price differs by < 1e-7 at the reference parameters).
      lr_stages: piecewise lr decay — ``n_iter`` splits into this many
        equal stages, each at 10× smaller lr than the last. The (κ, ρ)
        valley of the Heston loss is extremely flat: single-stage Adam at
        a fixed lr STALLS in it looking converged (rmse ~1e-3 with κ 40%
        off on exact quotes — the round-4 "unidentifiable" artifact,
        results_r5/calibration_grid.log), while 3 stages over 24k
        iterations recover every parameter to <0.1% on the same grid.
        Use ``n_iter=24_000, lr=0.05, lr_stages=3`` for a production fit.

    Returns a :class:`CalibrationResult`; ``rmse_rel`` is the typical
    relative price misfit across the grid.
    """
    strikes = jnp.asarray(strikes, jnp.float32).reshape(-1)
    maturities = jnp.asarray(maturities, jnp.float32).reshape(-1)
    quotes = jnp.asarray(market_prices, jnp.float32).reshape(-1)
    if not (strikes.shape == maturities.shape == quotes.shape):
        raise ValueError(
            "strikes, maturities and market_prices must be the same length; "
            f"got {strikes.shape}, {maturities.shape}, {quotes.shape}"
        )
    p0 = init or HestonParams()
    u0 = _pack(p0.kappa, p0.theta, p0.sigma, p0.rho, p0.v0)

    def price_one(K, T, kappa, theta, sigma, rho, v0):
        hp = HestonParams(K=K, r=r, T=T, kappa=kappa, theta=theta,
                          sigma=sigma, rho=rho, v0=v0)
        return heston_call_price(S0, v0, hp, order=order)

    v_price = jax.vmap(price_one, in_axes=(0, 0, None, None, None, None, None))

    def loss_fn(u):
        kappa, theta, sigma, rho, v0 = _unpack(u)
        model = v_price(strikes, maturities, kappa, theta, sigma, rho, v0)
        rel = (model - quotes) / jnp.maximum(jnp.abs(quotes), 1e-6)
        return jnp.mean(rel**2)

    if lr_stages < 1:
        raise ValueError(f"lr_stages must be >= 1, got {lr_stages}")
    if lr_stages == 1:
        tx = optax.adam(lr)
    else:
        stage_len = max(1, n_iter // lr_stages)
        schedule = optax.piecewise_constant_schedule(
            init_value=lr,
            boundaries_and_scales={
                stage_len * s: 0.1 for s in range(1, lr_stages)
            },
        )
        tx = optax.adam(schedule)

    @jax.jit
    def fit(u):
        state = tx.init(u)

        def step(carry, _):
            u, state = carry
            loss, g = jax.value_and_grad(loss_fn)(u)
            updates, state = tx.update(g, state, u)
            return (optax.apply_updates(u, updates), state), loss

        (u, _), losses = jax.lax.scan(step, (u, state), None, length=n_iter)
        return u, losses

    u_fit, losses = fit(u0)
    kappa, theta, sigma, rho, v0 = (float(x) for x in _unpack(u_fit))
    final = float(loss_fn(u_fit))
    fitted = dataclasses.replace(
        p0, kappa=kappa, theta=theta, sigma=sigma, rho=rho, v0=v0
    )
    return CalibrationResult(
        params=fitted,
        loss=final,
        rmse_rel=float(np.sqrt(final)),
        loss_history=np.asarray(losses),
        feller=2.0 * kappa * theta - sigma**2,
    )
