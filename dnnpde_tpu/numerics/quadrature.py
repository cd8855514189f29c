"""Fixed-order Gauss–Legendre quadrature (JAX-native, jittable).

The reference integrates characteristic functions with adaptive
``scipy.integrate.quad`` (``numerics/sv_heston.py:51-58``,
``basket_price_ii.py``) which cannot run under jit. A fixed-order
Gauss–Legendre rule on the same truncated interval is deterministic,
vectorizes over surface grids via vmap, and its accuracy vs scipy.quad is
validated in tests (SURVEY.md §7 "oracles under jit").
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=16)
def _gl_nodes(order: int) -> tuple[np.ndarray, np.ndarray]:
    x, w = np.polynomial.legendre.leggauss(order)
    return x.astype(np.float64), w.astype(np.float64)


def gauss_legendre(f, a: float, b: float, order: int = 256):
    """∫_a^b f(x) dx with an order-point Gauss–Legendre rule.

    ``f`` must accept a jnp vector of nodes and return values (complex ok).
    """
    x, w = _gl_nodes(order)
    half = 0.5 * (b - a)
    mid = 0.5 * (b + a)
    nodes = jnp.asarray(mid + half * x)
    weights = jnp.asarray(w)
    return half * jnp.sum(weights * f(nodes), axis=-1)
