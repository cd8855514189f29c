"""Variance-Gamma basket option pricer (JAX-native quadrature).

Parity with the reference ``VGBasketOptionPricer`` (``basket_price_ii.py:12-43``):
the basket spot B0 = Σ wᵢS⁰ᵢ is driven by a VG process with parameters
(σ, ν, θ), martingale correction ω = ν⁻¹·ln(1 − θν − ½σ²ν), and the price is

  C = B0 − K·e^{−rT}·(½ + π⁻¹ ∫₀^∞ Re[e^{−iu ln K}·φ(u)/(iu)] du)

with φ(u) = exp(iu(ln B0 + (r+ω)T)) / |1 − iθνu + ½σ²νu²|^{T/ν}
(the reference's formulation, including its |·| in the denominator and its
[0, 1000] truncation — kept for parity; its table-replication drivers
``replicate_table_2/3`` are provided as :func:`vg_table_2`/:func:`vg_table_3`).
The adaptive quad becomes fixed-order Gauss–Legendre so the pricer jits.
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from dnnpde_tpu.numerics.quadrature import complex_safe, gauss_legendre


@dataclasses.dataclass(frozen=True)
class VGParams:
    """VG process parameters (reference Table-2 values: σ=0.57, ν=0.75, θ=−0.95)."""

    sigma: float = 0.57
    nu: float = 0.75
    theta: float = -0.95


@complex_safe
def vg_basket_call(
    S0_weights: Sequence[Tuple[float, float]],
    K: float,
    T: float,
    r: float,
    vg: VGParams = VGParams(),
    order: int = 2048,
    u_max: float = 1000.0,
) -> float:
    """VG basket call price (reference ``_price_vg``, ``basket_price_ii.py:27-43``)."""
    B0 = float(sum(s0 * w for s0, w in S0_weights))
    omega = (1.0 / vg.nu) * np.log(
        max(1e-10, 1.0 - vg.theta * vg.nu - 0.5 * vg.sigma**2 * vg.nu)
    )

    def integrand(u):
        i = 1j
        expo = i * u * (jnp.log(B0) + (r + omega) * T)
        denom = jnp.power(
            jnp.abs(1.0 - i * vg.theta * vg.nu * u + 0.5 * vg.sigma**2 * vg.nu * u**2),
            T / vg.nu,
        )
        cf = jnp.exp(expo) / denom
        return jnp.real(jnp.exp(-i * u * jnp.log(K)) * cf / (i * u))

    # avoid u = 0 singularity: start slightly above zero like quad's open rule
    integral = float(gauss_legendre(integrand, 1e-8, u_max, order))
    price = B0 - K * np.exp(-r * T) * (0.5 + integral / np.pi)
    return max(price, 0.0)


def vg_table_2() -> List[Tuple[float, float]]:
    """Reference Table-2 replication driver (``basket_price_ii.py:47-67``):
    3-asset basket S0 = (40, 50, 60), w = 1/3, K ∈ {50, 55, 60}, T=1, r=0.05,
    VG (0.57, 0.75, −0.95)."""
    S0w = [(40.0, 1 / 3), (50.0, 1 / 3), (60.0, 1 / 3)]
    vg = VGParams(0.57, 0.75, -0.95)
    return [(K, vg_basket_call(S0w, K, 1.0, 0.05, vg)) for K in (50.0, 55.0, 60.0)]


def vg_table_3() -> List[Tuple[float, float, float]]:
    """Reference Table-3 replication driver (``basket_price_ii.py:69-90``):
    2-asset basket S0 = (100, 100), w = ½, K = 105.13, VG
    (0.3477, 0.4932, −0.3919)."""
    S0w = [(100.0, 0.5), (100.0, 0.5)]
    vg = VGParams(0.3477, 0.4932, -0.3919)
    price = vg_basket_call(S0w, 105.13, 1.0, 0.05, vg)
    return [(sig, 0.5, price) for sig in (0.2, 0.4)]
