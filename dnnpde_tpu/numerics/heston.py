"""Heston model oracles: closed-form (characteristic function) and Milstein MC.

Parity targets:
- ``HestonClosedFormSurface`` (reference ``numerics/sv_heston.py:7-127``; the
  same pricer is embedded at ``heston_dnnpde.py:831-951``): Heston-1993 P1/P2
  probabilities by integrating the characteristic function on [0, 100];
  price/delta/gamma surfaces. Here the adaptive scipy.quad is replaced by a
  fixed-order Gauss–Legendre rule so the whole pricer jits and vmaps over
  (S, v) grids in one XLA program instead of a Python double loop.
- ``MonteCarloPricer`` Milstein scheme (reference ``numerics/sv_heston.py:129-184``,
  ``numerics/heston_closed_form_ii.py:6-114``): per-path Python loops there;
  one vectorized ``lax.scan`` over time with the full path batch here.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from dnnpde_tpu.numerics.quadrature import complex_safe, gauss_legendre

Array = jnp.ndarray


@dataclasses.dataclass(frozen=True)
class HestonParams:
    """Reference defaults: κ=2, θ=0.2, σ=0.3, ρ=0.8, v0=0.2, r=0.05, K=1, T=1
    (``heston_dnnpde.py:1226-1273``)."""

    K: float = 1.0
    r: float = 0.05
    T: float = 1.0
    kappa: float = 2.0
    theta: float = 0.2
    sigma: float = 0.3
    rho: float = 0.8
    v0: float = 0.2
    lam: float = 0.0  # market price of vol risk (reference fixes λ=0)


def _char_func(p: HestonParams, phi: Array, S: Array, V: Array, which: int) -> Array:
    """Heston characteristic function f_j (j=1,2), Heston (1993) form
    (reference ``char_func``, ``numerics/sv_heston.py:20-45``)."""
    a = p.kappa * p.theta
    if which == 1:
        u = 0.5
        b = p.kappa + p.lam - p.rho * p.sigma
    else:
        u = -0.5
        b = p.kappa + p.lam
    i = 1j
    rspi = p.rho * p.sigma * i * phi
    d = jnp.sqrt((rspi - b) ** 2 - p.sigma**2 * (2 * u * i * phi - phi**2))
    # Trap-free (Albrecher–Mayer–Schoutens–Tistaert 2007) rotation: the
    # reference's Heston-1993 form (``numerics/sv_heston.py:20-45``) uses
    # g·e^{+dT}, which OVERFLOWS complex64 once Re(d)·T ≳ 88 (σ ≳ 0.5 at
    # T=2 with the φ∈[0,100] quadrature) — NaN prices exactly where a
    # calibration's early iterates wander (results_r5/calibration_grid.log).
    # With g2 = 1/g and e^{−dT} every factor is bounded (Re(d) ≥ 0 from the
    # principal sqrt), at any maturity and any admissible parameters; the
    # function value is mathematically identical.
    g2 = (b - rspi - d) / (b - rspi + d)
    exp_mdT = jnp.exp(-d * p.T)
    ge = g2 * exp_mdT
    # guard the removable singularities ge → 1 and g2 → 1 (d → 0)
    ge = jnp.where(jnp.abs(ge - 1.0) < 1e-8, 1e-8, ge)
    g2 = jnp.where(jnp.abs(g2 - 1.0) < 1e-8, 1e-8, g2)
    C = p.r * i * phi * p.T + (a / p.sigma**2) * (
        (b - rspi - d) * p.T - 2.0 * jnp.log((1.0 - ge) / (1.0 - g2))
    )
    Dv = ((b - rspi - d) / p.sigma**2) * ((1.0 - exp_mdT) / (1.0 - ge))
    S_safe = jnp.maximum(S, 1e-8)
    return jnp.exp(C + Dv * V + i * phi * jnp.log(S_safe))


def _prob(p: HestonParams, S: Array, V: Array, which: int, order: int) -> Array:
    """P_j = 1/2 + (1/π)∫₀^∞ Re[e^{-iφ ln K} f_j(φ)/(iφ)] dφ, truncated at 100
    (reference ``P1/P2``, ``numerics/sv_heston.py:50-58``)."""

    def integrand(phi):
        f = _char_func(p, phi, S, V, which)
        return jnp.real(jnp.exp(-1j * phi * jnp.log(p.K)) * f / (1j * phi + 1e-10))

    integral = gauss_legendre(integrand, 0.0, 100.0, order)
    return 0.5 + integral / jnp.pi


@complex_safe
def heston_call_price(
    S,
    V,
    params: HestonParams = HestonParams(),
    order: int = 256,
    reference_compat: bool = False,
) -> Array:
    """European call under Heston: S·P1 − K·e^{−rT}·P2 (Heston 1993).

    NOTE — reference bug, not replicated by default: the reference assembles
    the price as ``e^{−rT}·(S·P1 − K·P2)`` (``numerics/sv_heston.py:60-63``),
    discounting the S·P1 term too. P1 is already the exercise probability
    under the *stock* numeraire, so S·P1 must not be discounted. At the
    reference's own parameters (S=K=1, v0=0.2) its formula yields 0.169 while
    both a Milstein MC and an independent Euler MC converge to 0.198 — the
    value of the correct assembly. Pass ``reference_compat=True`` to get the
    reference's (buggy) number for side-by-side comparisons.

    Scalar in, scalar out; vmap for grids (see :func:`heston_price_surface`).
    """
    S = jnp.asarray(S, jnp.float64 if jax.config.read("jax_enable_x64") else jnp.float32)
    V = jnp.asarray(V, S.dtype)
    p1 = _prob(params, S, V, 1, order)
    p2 = _prob(params, S, V, 2, order)
    disc = jnp.exp(-params.r * params.T)
    if reference_compat:
        return disc * (S * p1 - params.K * p2)
    return S * p1 - params.K * disc * p2


@complex_safe
def heston_price_surface(
    S_values, V_values, params: HestonParams = HestonParams(), order: int = 256
) -> Array:
    """(len(S), len(V)) price grid — one vmapped XLA call (the reference loops
    in Python over every grid cell, ``numerics/sv_heston.py:65-72``)."""
    f = lambda s, v: heston_call_price(s, v, params, order)
    return jax.vmap(lambda s: jax.vmap(lambda v: f(s, v))(jnp.asarray(V_values)))(
        jnp.asarray(S_values)
    )


@complex_safe
def heston_delta_surface(
    S_values, V_values, params: HestonParams = HestonParams(), order: int = 256
) -> Array:
    """∂Price/∂S by forward difference over the S grid (reference
    ``delta_surface``, ``numerics/sv_heston.py:74-83``; same stencil, so the
    last S row is zero-padded as there)."""
    grid = heston_price_surface(S_values, V_values, params, order)
    dS = S_values[1] - S_values[0]
    d = (grid[1:, :] - grid[:-1, :]) / dS
    return jnp.concatenate([d, jnp.zeros_like(grid[:1, :])], axis=0)


@complex_safe
def heston_gamma_surface(
    S_values, V_values, params: HestonParams = HestonParams(), order: int = 256
) -> Array:
    """∂²Price/∂S² by central second difference (reference ``gamma_surface``,
    ``numerics/sv_heston.py:85-96``; first/last rows zero)."""
    grid = heston_price_surface(S_values, V_values, params, order)
    dS = S_values[1] - S_values[0]
    g = (grid[2:, :] - 2 * grid[1:-1, :] + grid[:-2, :]) / (dS**2)
    zero = jnp.zeros_like(grid[:1, :])
    return jnp.concatenate([zero, g, zero], axis=0)


def heston_mc_price(
    key: jax.Array,
    S0: float,
    params: HestonParams = HestonParams(),
    num_paths: int = 100_000,
    num_steps: int = 1000,
) -> tuple[Array, Array]:
    """Milstein Monte-Carlo call price, (price, standard_error).

    Variance: Milstein step with ¼σ²Δt(Z²−1) correction + reflection at 0;
    stock: log-Euler with ρ-correlated normals (reference ``simulate_paths``,
    ``numerics/sv_heston.py:134-160`` — a per-path Python loop there; here the
    whole batch advances per scan step).
    """
    dt = params.T / num_steps
    sqrt_dt = jnp.sqrt(dt)
    k1, k2 = jax.random.split(key)
    z1 = jax.random.normal(k1, (num_steps, num_paths))
    z2_ = jax.random.normal(k2, (num_steps, num_paths))
    z2 = params.rho * z1 + jnp.sqrt(1 - params.rho**2) * z2_

    def step(carry, zs):
        logS, v = carry
        z_s, z_v = zs
        v_pos = jnp.maximum(v, 0.0)
        sqrt_v = jnp.sqrt(v_pos)
        v_next = (
            v
            + params.kappa * (params.theta - v_pos) * dt
            + params.sigma * sqrt_v * sqrt_dt * z_v
            + 0.25 * params.sigma**2 * dt * (z_v**2 - 1.0)
        )
        v_next = jnp.abs(v_next)  # reflection (reference :150)
        logS_next = logS + (params.r - 0.5 * v_pos) * dt + sqrt_v * sqrt_dt * z_s
        return (logS_next, v_next), None

    init = (jnp.full((num_paths,), jnp.log(S0)), jnp.full((num_paths,), params.v0))
    (logS_T, _), _ = jax.lax.scan(step, init, (z1, z2))
    payoff = jnp.maximum(jnp.exp(logS_T) - params.K, 0.0)
    disc = jnp.exp(-params.r * params.T)
    price = disc * jnp.mean(payoff)
    se = disc * jnp.std(payoff) / jnp.sqrt(num_paths)
    return price, se


def heston_mc_price_ii(
    key: jax.Array,
    S0: float,
    params: HestonParams = HestonParams(),
    num_paths: int = 100_000,
    num_steps: int = 1000,
    v0: float | None = None,
) -> tuple[Array, Array]:
    """Second, independent Heston MC — the reference's
    ``numerics/heston_closed_form_ii.py:6-114`` scheme, (price, std_error).

    Differs from :func:`heston_mc_price` in two deliberate ways (keeping the
    cross-check independent):
    - negative variance handled by TRUNCATION ``v ← max(v, 0)`` after the
      Milstein step (reference ii ``:37``) instead of reflection ``|v|``;
    - the stock shock is built FROM the variance shock,
      ``Z_s = ρ·Z_v + √(1−ρ²)·Z`` (reference ii ``:29``), where scheme I
      correlates the variance shock from the stock shock. The joint law is
      identical; the code paths are not.
    The optional ``v0`` lets price/delta/gamma surfaces over (S, v) start at
    off-equilibrium variances (reference ii ``price_surface``, ``:56-63``).
    """
    dt = params.T / num_steps
    sqrt_dt = jnp.sqrt(dt)
    k1, k2 = jax.random.split(key)
    zv = jax.random.normal(k1, (num_steps, num_paths))
    zs = params.rho * zv + jnp.sqrt(1 - params.rho**2) * jax.random.normal(
        k2, (num_steps, num_paths)
    )
    v_init = params.v0 if v0 is None else v0

    def step(carry, zz):
        logS, v = carry
        z_s, z_v = zz
        sqrt_v = jnp.sqrt(v)
        v_next = (
            v
            + params.kappa * (params.theta - v) * dt
            + params.sigma * sqrt_v * sqrt_dt * z_v
            + 0.25 * params.sigma**2 * dt * (z_v**2 - 1.0)
        )
        v_next = jnp.maximum(v_next, 0.0)  # truncation (reference ii :37)
        logS_next = logS + (params.r - 0.5 * v) * dt + sqrt_v * sqrt_dt * z_s
        return (logS_next, v_next), None

    init = (jnp.full((num_paths,), jnp.log(S0)), jnp.full((num_paths,), v_init))
    (logS_T, _), _ = jax.lax.scan(step, init, (zs, zv))
    payoff = jnp.maximum(jnp.exp(logS_T) - params.K, 0.0)
    disc = jnp.exp(-params.r * params.T)
    price = disc * jnp.mean(payoff)
    se = disc * jnp.std(payoff) / jnp.sqrt(num_paths)
    return price, se
