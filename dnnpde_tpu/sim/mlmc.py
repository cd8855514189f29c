"""Multilevel Monte Carlo (MLMC): coupled-level Brownian increments and the
Giles estimator.

The reference *sketches* an MLMC ``fetch_minibatch`` but leaves it commented
out (``high_dimension_test.py:319-373``; todo at ``DeepBSDE.py:252``), and the
sketch is statistically incorrect (it averages interpolated paths across
levels, which biases the distribution). This module implements MLMC properly:

- :func:`coupled_brownian_increments` — fine-level increments plus the EXACT
  coarse-level increments obtained by summing fine increments within each
  coarse step (the standard Brownian coupling; both levels see the same path).
- :func:`mlmc_gbm_price` — the Giles telescoping estimator
  E[P_L] = E[P_0] + Σ_ℓ E[P_ℓ − P_{ℓ−1}] with geometric sample allocation
  M_ℓ = M₀·M_const^{−ℓ} (the sketch's intended allocation,
  ``high_dimension_test.py:327,338``) under the Euler scheme, where each
  correction term uses coupled paths so its variance decays with level.

Everything is jit-compiled; levels are static so XLA sees fixed shapes.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from dnnpde_tpu.sim.brownian import brownian_increments

Array = jnp.ndarray


@dataclasses.dataclass(frozen=True)
class MLMCConfig:
    """num_levels levels; level ℓ has N₀·M_const^ℓ steps and M₀·M_const^{−ℓ}
    samples (reference sketch constants: 3 levels, M_const = 2)."""

    num_levels: int = 3
    M_const: int = 2
    N0: int = 8
    M0: int = 4096

    def steps_at(self, level: int) -> int:
        return self.N0 * self.M_const**level

    def samples_at(self, level: int) -> int:
        return max(self.M0 // (self.M_const**level), 2)


def coupled_brownian_increments(
    key: jax.Array,
    M: int,
    N_fine: int,
    D: int,
    dt_fine: float,
    factor: int,
    chol: Optional[Array] = None,
) -> tuple[Array, Array]:
    """(dW_fine (M, N_fine, D), dW_coarse (M, N_fine/factor, D)) on the SAME
    Brownian path: coarse increments are sums of ``factor`` fine ones."""
    if N_fine % factor != 0:
        raise ValueError(f"N_fine={N_fine} not divisible by factor={factor}")
    dw_f = brownian_increments(key, M, N_fine, D, dt_fine, chol)
    dw_c = dw_f.reshape(M, N_fine // factor, factor, D).sum(axis=2)
    return dw_f, dw_c


def _euler_gbm_terminal(x0: Array, r: float, sigma, dW: Array, dt: float) -> Array:
    """Euler (not exact) GBM terminal values — the scheme whose weak error
    MLMC trades against; (M, D)."""
    sig = jnp.broadcast_to(jnp.asarray(sigma, jnp.float32), x0.shape[-1:])

    def step(x, dw):
        return x * (1.0 + r * dt + sig * dw), None

    xT, _ = jax.lax.scan(step, x0, jnp.swapaxes(dW, 0, 1))
    return xT


def _basket_payoff(ST: Array, K: float, payoff: str) -> Array:
    agg = jnp.mean(ST, axis=-1) if payoff == "mean" else jnp.sum(ST, axis=-1)
    return jnp.maximum(agg - K, 0.0)


def mlmc_gbm_price(
    key: jax.Array,
    S0,
    K: float,
    T: float,
    r: float,
    sigma,
    config: MLMCConfig = MLMCConfig(),
    chol: Optional[Array] = None,
    payoff: str = "mean",
) -> tuple[Array, Array, dict]:
    """Giles MLMC estimate of the discounted basket call under Euler GBM.

    Returns (price, standard_error, per-level diagnostics). The level-0 term
    uses N₀ coarse steps; each correction ℓ ≥ 1 uses coupled (fine, coarse)
    paths at (N₀·k^ℓ, N₀·k^{ℓ−1}) steps with k = M_const.
    """
    S0 = jnp.atleast_1d(jnp.asarray(S0, jnp.float32))
    D = S0.shape[0]
    disc = jnp.exp(-r * T)
    keys = jax.random.split(key, config.num_levels)

    total = jnp.asarray(0.0)
    var_total = jnp.asarray(0.0)
    diagnostics = {}

    # level 0: plain coarse estimator
    M0 = config.samples_at(0)
    N0 = config.steps_at(0)
    dW0 = brownian_increments(keys[0], M0, N0, D, T / N0, chol)
    x0 = jnp.broadcast_to(S0, (M0, D))
    p0 = disc * _basket_payoff(_euler_gbm_terminal(x0, r, sigma, dW0, T / N0), K, payoff)
    total = total + jnp.mean(p0)
    var_total = var_total + jnp.var(p0) / M0
    diagnostics[0] = {"mean": float(jnp.mean(p0)), "var": float(jnp.var(p0)), "M": M0}

    for lvl in range(1, config.num_levels):
        Ml = config.samples_at(lvl)
        Nf = config.steps_at(lvl)
        Nc = config.steps_at(lvl - 1)
        dt_f, dt_c = T / Nf, T / Nc
        dw_f, dw_c = coupled_brownian_increments(
            keys[lvl], Ml, Nf, D, dt_f, config.M_const, chol
        )
        xl = jnp.broadcast_to(S0, (Ml, D))
        pf = disc * _basket_payoff(_euler_gbm_terminal(xl, r, sigma, dw_f, dt_f), K, payoff)
        pc = disc * _basket_payoff(_euler_gbm_terminal(xl, r, sigma, dw_c, dt_c), K, payoff)
        corr = pf - pc
        total = total + jnp.mean(corr)
        var_total = var_total + jnp.var(corr) / Ml
        diagnostics[lvl] = {
            "mean": float(jnp.mean(corr)),
            "var": float(jnp.var(corr)),
            "M": Ml,
        }
    return total, jnp.sqrt(var_total), diagnostics


def mlmc_minibatch(
    key: jax.Array,
    M: int,
    N_fine: int,
    D: int,
    T: float,
    factor: int = 2,
    chol: Optional[Array] = None,
) -> tuple[tuple[Array, Array], tuple[Array, Array]]:
    """Coupled two-resolution BSDE minibatch: ((t_f, W_f), (t_c, W_c)) with
    W_c the exact coarsening of W_f — the statistically CORRECT version of
    the reference's disabled multi-resolution ``fetch_minibatch``. Useful for
    coarse-to-fine training where both resolutions must see the same paths.
    """
    dt_f = T / N_fine
    dw_f, dw_c = coupled_brownian_increments(key, M, N_fine, D, dt_f, factor, chol)
    N_c = N_fine // factor

    def paths(dw, n):
        w = jnp.concatenate(
            [jnp.zeros((M, 1, D), dw.dtype), jnp.cumsum(dw, axis=1)], axis=1
        )
        t = jnp.broadcast_to(
            jnp.linspace(0.0, T, n + 1).reshape(1, n + 1, 1), (M, n + 1, 1)
        )
        return t, w

    return paths(dw_f, N_fine), paths(dw_c, N_c)
