"""Monte-Carlo pricers (JAX-native, fully vectorized).

Parity targets:
- Multidimensional basket MC with Cholesky-correlated GBM paths
  (reference ``numerics/multidimensional_mc_pricer.py:38-93``;
  vectorized variant with PD repair ``basket_pricer.py:7-227``;
  naive per-asset variant ``old_ref_sample_file.py:6-112``;
  MC used as an oracle inside the sweep drivers,
  ``with_corr_high_dimension_pde.py:1316-1351``,
  ``background_running.py:674-773`` incl. bump-and-revalue deltas).
- HJB exact solution u(t,x) = −log E[exp(−g(x + √(2(T−t))·W))] with 10⁵
  samples (reference ``hjb_implement.py:1088-1096``).

All pricers return (value, standard_error) so tolerance gates can be stated
in MC-standard-error terms (SURVEY.md §7 "RNG discipline").
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from dnnpde_tpu.sim.euler_maruyama import gbm_paths

Array = jnp.ndarray


def basket_call_mc(
    key: jax.Array,
    S0,
    K: float,
    T: float,
    r: float,
    sigma,
    chol: Optional[Array] = None,
    weights: Optional[Array] = None,
    num_paths: int = 100_000,
    num_steps: int = 1,
    antithetic: bool = True,
    payoff: str = "mean",
    drift: Optional[float] = None,
) -> tuple[Array, Array]:
    """Discounted basket-call price E[e^{−rT} max(agg(S_T) − K, 0)].

    ``drift`` decouples the simulation drift from the discount rate ``r``
    (default: equal). Needed for PDEs whose generator implies a non-risk-
    neutral effective drift, e.g. CallOptionND's drift-2r semantics
    (see ``pde/problems.py``).

    ``payoff``: "mean" uses the equal-weight mean basket (reference
    ``g = max(mean(X) − K, 0)``, ``high_dimension_test.py:627-629``);
    "weighted" uses explicit ``weights`` (reference ``BasketOption.payoff``,
    ``numerics/multidimensional_mc_pricer.py:62-74``); "sum" uses ΣS
    (reference 1D/ND call convention, ``1d_BSPDE_case.py:545``).

    GBM terminal values are exact-scheme (lognormal), so ``num_steps=1``
    suffices for European payoffs — the reference simulates full paths even
    for terminal-only payoffs.
    """
    S0 = jnp.atleast_1d(jnp.asarray(S0, jnp.float32))
    mu = r if drift is None else drift
    paths = gbm_paths(key, S0, mu, sigma, T, num_steps, num_paths, chol, antithetic)
    ST = paths[:, -1, :]
    if payoff == "mean":
        basket = jnp.mean(ST, axis=-1)
    elif payoff == "sum":
        basket = jnp.sum(ST, axis=-1)
    elif payoff == "weighted":
        w = jnp.asarray(weights, jnp.float32)
        basket = ST @ w
    else:
        raise ValueError(f"unknown payoff {payoff!r}")
    pay = jnp.maximum(basket - K, 0.0)
    disc = jnp.exp(-r * T)
    price = disc * jnp.mean(pay)
    se = disc * jnp.std(pay) / jnp.sqrt(pay.shape[0])
    return price, se


def basket_delta_mc(
    key: jax.Array,
    S0,
    K: float,
    T: float,
    r: float,
    sigma,
    chol: Optional[Array] = None,
    bump: float = 0.01,
    num_paths: int = 100_000,
    payoff: str = "mean",
) -> Array:
    """Bump-and-revalue per-asset deltas with common random numbers
    (reference ``BasketOptionPricer.delta``, ``basket_pricer.py:150-176``;
    ``CorrelatedBasketOptionPriceCalculator``, ``background_running.py:735-773``).
    Returns (D,) deltas.
    """
    S0 = jnp.atleast_1d(jnp.asarray(S0, jnp.float32))
    D = S0.shape[0]

    def price_at(s0_vec):
        p, _ = basket_call_mc(
            key, s0_vec, K, T, r, sigma, chol,
            num_paths=num_paths, payoff=payoff,
        )
        return p

    def one(d):
        e = jnp.zeros(D).at[d].set(bump)
        return (price_at(S0 + e) - price_at(S0 - e)) / (2 * bump)

    return jax.vmap(one)(jnp.arange(D))


def basket_price_paths_mc(
    key: jax.Array,
    S0,
    K: float,
    T: float,
    r: float,
    sigma,
    N: int,
    chol: Optional[Array] = None,
    num_paths: int = 10_000,
    payoff: str = "mean",
) -> tuple[Array, Array]:
    """Price process along the time grid: for each step n, the discounted
    conditional-expectation estimate of the basket call given the simulated
    cross-section (used by the drivers to plot NN-vs-MC price *paths*,
    reference ``generate_monte_carlo_paths``,
    ``with_corr_high_dimension_pde.py:1327-1351``).

    Returns (t_grid (N+1,), price path (N+1,)).
    """
    S0 = jnp.atleast_1d(jnp.asarray(S0, jnp.float32))
    paths = gbm_paths(key, S0, r, sigma, T, N, num_paths, chol)
    t = jnp.linspace(0.0, T, N + 1)
    if payoff == "mean":
        basket = jnp.mean(paths, axis=-1)  # (M, N+1)
    else:
        basket = jnp.sum(paths, axis=-1)
    # per-step estimate: discounted intrinsic of the forward-grown basket,
    # averaged over paths (matches the reference's plotted price paths)
    tau = T - t
    grown = basket * jnp.exp(r * tau)[None, :]
    intrinsic_path = jnp.exp(-r * tau)[None, :] * jnp.maximum(grown - K, 0.0)
    return t, jnp.mean(intrinsic_path, axis=0)


def hjb_exact_mc(
    key: jax.Array,
    t: float,
    x,
    T: float = 1.0,
    num_samples: int = 100_000,
) -> Array:
    """HJB closed-form-by-MC: u(t,x) = −log E[exp(−g(x + √(2(T−t))·W))]
    with g(y) = log(½ + ½‖y‖²) (reference ``hjb_implement.py:1088-1096``,
    default 10⁵ samples)."""
    x = jnp.atleast_1d(jnp.asarray(x, jnp.float32))
    D = x.shape[-1]
    W = jax.random.normal(key, (num_samples, D))
    y = x[None, :] + jnp.sqrt(2.0 * jnp.maximum(T - t, 0.0)) * W
    g = jnp.log(0.5 + 0.5 * jnp.sum(y**2, axis=-1))
    return -jnp.log(jnp.mean(jnp.exp(-g)))
