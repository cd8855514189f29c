"""Fixed-order Gauss–Legendre quadrature (JAX-native, jittable).

The reference integrates characteristic functions with adaptive
``scipy.integrate.quad`` (``numerics/sv_heston.py:51-58``,
``basket_price_ii.py``) which cannot run under jit. A fixed-order
Gauss–Legendre rule on the same truncated interval is deterministic,
vectorizes over surface grids via vmap, and its accuracy vs scipy.quad is
validated in tests (SURVEY.md §7 "oracles under jit").
"""

from __future__ import annotations

from functools import lru_cache, wraps

import jax
import jax.numpy as jnp
import numpy as np


def complex_safe(fn):
    """Run ``fn`` on the CPU backend when the default backend lacks complex
    arithmetic (TPU: complex64 ops are UNIMPLEMENTED). The characteristic-
    function pricers are tiny host-side oracles — microseconds on CPU — so
    this costs nothing while keeping them usable from TPU programs."""

    @wraps(fn)
    def wrapper(*args, **kwargs):
        if jax.default_backend() in ("cpu",):
            return fn(*args, **kwargs)
        cpu = jax.local_devices(backend="cpu")[0]
        with jax.default_device(cpu):
            return fn(*args, **kwargs)

    return wrapper


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
