"""Carr–Madan FFT basket pricer (JAX-native, ``jnp.fft``).

Parity with the reference ``FFTPricer``
(``numerics/multidimensional_mc_pricer.py:111-181``): the basket is
approximated as one lognormal whose characteristic function is

  φ(u) = exp(i·u·(ln B0 + (r − ½σ_B²)T) − ½u²σ_B²T),
  σ_B² = wᵀ Σ w / B0-normalized variance of the log-basket proxy,

then priced with the damped Carr–Madan transform (α = 1.5, N = 2¹²) and
linearly interpolated to the strike. Same method, but the FFT and the
interpolation run in XLA.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from dnnpde_tpu.numerics.quadrature import complex_safe

Array = jnp.ndarray


def basket_lognormal_cf_params(
    S0,
    sigma,
    corr: Optional[np.ndarray],
    weights: Optional[np.ndarray] = None,
    T: float = 1.0,
) -> tuple[float, float]:
    """Moment-matched lognormal proxy for the basket: returns (B0, σ_B).

    The reference linearizes the basket variance
    (σ_B² ≈ Σᵢⱼ wᵢwⱼσᵢσⱼρᵢⱼ·S⁰ᵢS⁰ⱼ/B0², ``characteristic_function``,
    ``numerics/multidimensional_mc_pricer.py:123-136``), which drifts several
    percent from MC at σT ≈ 0.04. Here σ_B is the exact two-moment match
    σ_B² = ln(m₂/m₁²)/T with m₂ = Σᵢⱼ wᵢwⱼS⁰ᵢS⁰ⱼe^{σᵢσⱼρᵢⱼT} — same method
    class, materially tighter against MC (validated in tests).
    """
    S0 = np.atleast_1d(np.asarray(S0, dtype=np.float64))
    D = S0.shape[0]
    w = np.full(D, 1.0 / D) if weights is None else np.asarray(weights, np.float64)
    sig = np.broadcast_to(np.asarray(sigma, np.float64), (D,))
    C = np.eye(D) if corr is None else np.asarray(corr, np.float64)
    B0 = float(w @ S0)
    wS = w * S0
    m1 = wS.sum()
    cross = np.outer(sig, sig) * C * T
    m2 = float(np.einsum("i,j,ij->", wS, wS, np.exp(cross)))
    sigma_B = float(np.sqrt(max(np.log(m2 / m1**2), 1e-12) / T))
    return B0, sigma_B


@complex_safe
def carr_madan_call(
    B0: float,
    K: float,
    T: float,
    r: float,
    sigma_B: float,
    alpha: float = 1.5,
    n_fft: int = 4096,
    eta: float = 0.25,
) -> float:
    """Damped-FFT call price for a lognormal underlier (reference
    ``fft_option_price``, ``numerics/multidimensional_mc_pricer.py:138-181``;
    α=1.5, N=2¹² defaults preserved)."""
    u = jnp.arange(n_fft) * eta
    i = 1j
    # CF of ln B_T under the lognormal proxy
    mu = jnp.log(B0) + (r - 0.5 * sigma_B**2) * T

    def cf(v):
        return jnp.exp(i * v * mu - 0.5 * v**2 * sigma_B**2 * T)

    psi = (
        jnp.exp(-r * T)
        * cf(u - (alpha + 1) * i)
        / (alpha**2 + alpha - u**2 + i * (2 * alpha + 1) * u)
    )
    lam = 2 * jnp.pi / (n_fft * eta)
    b = 0.5 * n_fft * lam
    # Simpson weights 1/3, 4/3, 2/3, ... (standard Carr–Madan practice)
    simpson = (3.0 - (-1.0) ** jnp.arange(n_fft)) / 3.0
    simpson = simpson.at[0].set(1.0 / 3.0)
    x = jnp.exp(i * b * u) * psi * eta * simpson
    fft_vals = jnp.fft.fft(x)
    ks = -b + lam * jnp.arange(n_fft)  # log-strike grid
    calls = jnp.exp(-alpha * ks) / jnp.pi * jnp.real(fft_vals)
    return float(jnp.interp(jnp.log(K), ks, calls))


def fft_basket_call(
    S0,
    K: float,
    T: float,
    r: float,
    sigma,
    corr: Optional[np.ndarray] = None,
    weights: Optional[np.ndarray] = None,
    alpha: float = 1.5,
    n_fft: int = 4096,
) -> float:
    """End-to-end FFT basket call price (reference ``FFTPricer`` API)."""
    B0, sigma_B = basket_lognormal_cf_params(S0, sigma, corr, weights, T)
    return carr_madan_call(B0, K, T, r, sigma_B, alpha, n_fft)
