"""Initial-state samplers: train the solution SURFACE, not one point.

The reference (and the vanilla deep-BSDE objective) starts every simulated
path from the single point ``Xi`` (``1d_BSPDE_case.py:291-321`` broadcasts
one ``Xi`` row to the whole batch). The trained net is therefore only
constrained where those paths go: at t=0 that is exactly ONE state, and the
learned u(0, ·) away from ``x0`` is pure extrapolation (measured:
``BENCH_REPORT_r3.jsonl`` "heston_trained_greeks" — Y0 at x0 is 0.2%
accurate while the t=0 price surface over S ∈ [0.6, 1.5] is off by ~9% in
relative L2).

These samplers randomize X0 per iteration *inside the jitted chunk* (drawn
on device from the same folded key stream as the Brownian increments), which
turns the identical training loop into a surface learner: u(0, ·) is now
constrained on the whole sampled region. Pass one to
``Trainer(x0_sampler=...)``. Beyond-reference capability; no reference
counterpart exists.

Both samplers are mean-preserving around ``x0`` so headline Y0-at-x0
comparisons stay meaningful.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray
X0Sampler = Callable[[jax.Array, int], Array]


def lognormal_x0(x0, scale) -> X0Sampler:
    """Multiplicative lognormal jitter for strictly-positive states (prices,
    variances): ``X0 = x0 · exp(scale·Z − scale²/2)`` with Z ~ N(0, I), so
    E[X0] = x0 exactly and X0 > 0 always. ``scale`` is the log-space standard
    deviation (0.2 ≈ ±20% one-sigma spread) — a scalar, or a length-D vector
    for PER-COORDINATE spreads (e.g. Heston surface training samples the
    v-coordinate wider than S to pin the vega direction, VERDICT r4 #5)."""
    x0 = jnp.asarray(x0, jnp.float32).reshape(-1)
    scale = jnp.asarray(scale, jnp.float32).reshape(-1)
    if scale.shape[0] not in (1, x0.shape[0]):
        raise ValueError(
            f"scale must be scalar or length {x0.shape[0]}, "
            f"got shape {scale.shape}"
        )
    if not bool(jnp.all(scale > 0.0)):
        raise ValueError(f"scale must be positive, got {scale}")
    shift = 0.5 * scale**2

    def sample(key: jax.Array, M: int) -> Array:
        z = jax.random.normal(key, (M, x0.shape[0]), jnp.float32)
        return x0[None, :] * jnp.exp(scale[None, :] * z - shift[None, :])

    return sample


def gaussian_x0(x0, scale: float) -> X0Sampler:
    """Additive Gaussian jitter ``X0 = x0 + scale·Z`` for unconstrained
    states (e.g. HJB's ℝ^D state, where multiplicative jitter degenerates at
    x0 = 0)."""
    x0 = jnp.asarray(x0, jnp.float32).reshape(-1)
    if float(scale) <= 0.0:
        raise ValueError(f"scale must be positive, got {scale}")

    def sample(key: jax.Array, M: int) -> Array:
        z = jax.random.normal(key, (M, x0.shape[0]), jnp.float32)
        return x0[None, :] + scale * z

    return sample
