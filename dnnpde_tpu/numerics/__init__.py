"""Classical numerics: JAX-native ground-truth oracles (SURVEY.md §2.4)."""

from dnnpde_tpu.numerics.black_scholes import (
    basket_analytical_approx,
    black_scholes_call,
    black_scholes_delta,
    bsb_exact_solution,
    call_price_grid,
)

__all__ = [
    "black_scholes_call",
    "black_scholes_delta",
    "call_price_grid",
    "basket_analytical_approx",
    "bsb_exact_solution",
]
