"""Standalone Euler–Maruyama forward-SDE simulator (``lax.scan``).

Capability parity with the reference's ``EulerMaruyamaScheme``
(``refactor_blackpde_dnn.py:144-168``) and the GBM path generators used by
the Monte-Carlo pricers (``numerics/multidimensional_mc_pricer.py:38-60``,
``basket_pricer.py:42-96``) — but as one fused XLA program: the whole N-step
loop compiles into a single scan, no per-step Python dispatch.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from dnnpde_tpu.sim.brownian import brownian_increments

Array = jnp.ndarray


def euler_maruyama(
    mu: Callable[[Array, Array], Array],
    sigma_dw: Callable[[Array, Array, Array], Array],
    x0: Array,
    dW: Array,
    dt: float,
    t0: float = 0.0,
) -> Array:
    """Roll X_{n+1} = X_n + mu(t, X)·dt + sigma_dw(t, X, dW_n) over N steps.

    Args:
      mu: drift, (M, D) ← (t_scalar, X).
      sigma_dw: applied diffusion increment σ(t,X)·ΔW, (M, D).
      x0: (M, D) initial states.
      dW: (M, N, D) Brownian increments.
      dt: step size.

    Returns: X paths, (M, N+1, D).
    """
    dW_t = jnp.swapaxes(dW, 0, 1)  # (N, M, D) time-major for scan

    def step(carry, dw):
        t, x = carry
        x1 = x + mu(t, x) * dt + sigma_dw(t, x, dw)
        return (t + dt, x1), x1

    (_, _), xs = jax.lax.scan(step, (jnp.asarray(t0), x0), dW_t)
    return jnp.concatenate([x0[:, None, :], jnp.swapaxes(xs, 0, 1)], axis=1)


def gbm_paths(
    key: jax.Array,
    S0: Array,
    r: float,
    sigma: Array,
    T: float,
    N: int,
    M: int,
    chol: Optional[Array] = None,
    antithetic: bool = False,
) -> Array:
    """Exact-scheme geometric Brownian motion paths (log-Euler), (M, N+1, D).

    S_{n+1} = S_n · exp((r − σ²/2)dt + σ·ΔW̃) with optionally correlated ΔW̃
    (reference ``basket_pricer.py:61-76`` cumprod form). ``antithetic`` pairs
    ΔW with −ΔW for variance reduction (M must be even).
    """
    S0 = jnp.atleast_1d(jnp.asarray(S0, jnp.float32))
    D = S0.shape[-1]
    dt = T / N
    if antithetic:
        if M % 2 != 0:
            raise ValueError(f"antithetic sampling requires even M, got {M}")
        half = brownian_increments(key, M // 2, N, D, dt, chol)
        dw = jnp.concatenate([half, -half], axis=0)
    else:
        dw = brownian_increments(key, M, N, D, dt, chol)
    sigma = jnp.broadcast_to(jnp.asarray(sigma, jnp.float32), (D,))
    log_steps = (r - 0.5 * sigma**2) * dt + sigma * dw
    log_paths = jnp.cumsum(log_steps, axis=1)
    paths = S0[None, None, :] * jnp.exp(log_paths)
    return jnp.concatenate(
        [jnp.broadcast_to(S0, (dw.shape[0], 1, D)), paths], axis=1
    )
