"""Greeks of the learned solution via autodiff.

Parity with the reference's Heston ``calculate_greeks``
(``heston_dnnpde.py:685-699``): delta = ∂u/∂S from the first-order input
gradient, gamma = ∂²u/∂S² by a second differentiation. Generalized to any
problem: delta is the full ∇ₓu (the solver's Z process) and gamma is the
diagonal of the input Hessian, computed as one forward-over-reverse
``jacfwd(grad)`` — no per-point Python loops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


def compute_greeks(
    trainer, t, X, use_ema: bool = False
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(u, delta, gamma_diag) at batched (t, X).

    u: (M, 1); delta = ∇ₓu: (M, D); gamma_diag = diag(∂²u/∂X²): (M, D).
    ``use_ema=True`` evaluates the Polyak/EMA shadow (same convention as
    ``Trainer.predict``); requires the trainer to have been built with
    ``ema_decay``.
    """
    params = trainer.ema_params if use_ema else trainer.params
    net = trainer.net
    problem = trainer.problem
    t = jnp.asarray(t, jnp.float32).reshape(-1, 1)
    X = jnp.asarray(X, jnp.float32).reshape(-1, trainer.problem.dim)

    stochastic = getattr(trainer.config, "stochastic_net", False)
    rngs = {"sde": jax.random.PRNGKey(0)} if stochastic else None

    def u_single(x, ti):
        raw = net.apply(params, jnp.concatenate([ti, x])[None, :], rngs=rngs)
        # problem.transform_u — the SAME output parametrization as training
        # (hard/softplus clamp, payoff anchor), so greeks see its gradient
        return problem.transform_u(ti[None, :], x[None, :], raw)[0, 0]

    def per_sample(x, ti):
        u = u_single(x, ti)
        delta = jax.grad(u_single)(x, ti)
        gamma = jnp.diagonal(jax.jacfwd(jax.grad(u_single))(x, ti))
        return u, delta, gamma

    u, delta, gamma = jax.vmap(per_sample)(X, t)
    return (
        np.asarray(u)[:, None],
        np.asarray(delta),
        np.asarray(gamma),
    )


def learned_price_surface(
    trainer, s_values, t_values, dim: int = 0
) -> np.ndarray:
    """u(t, x0 with component ``dim`` set to s) over a (t, S) grid — the
    learned-solution surface used for serving/analysis plots (reference
    surface evaluations, ``heston_dnnpde.py:1050-1120``). Returns
    (len(t_values), len(s_values))."""
    import jax

    params = trainer.params
    net = trainer.net
    problem = trainer.problem
    x0 = jnp.asarray(trainer.problem.x0)

    def at_point(t, s):
        x = x0.at[dim].set(s)[None, :]
        tcol = jnp.full((1, 1), t)
        raw = net.apply(params, jnp.concatenate([tcol, x], axis=-1))
        return problem.transform_u(tcol, x, raw)[0, 0]

    grid = jax.vmap(
        lambda t: jax.vmap(lambda s: at_point(t, s))(
            jnp.asarray(s_values, jnp.float32)
        )
    )(jnp.asarray(t_values, jnp.float32))
    return np.asarray(grid)


def heston_greeks(
    trainer, S, v, t, use_ema: bool = False
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Heston-layout wrapper: (price, delta=∂u/∂S, gamma=∂²u/∂S²) over
    batched (S, v) at time t (reference ``calculate_greeks`` signature)."""
    S = np.atleast_1d(np.asarray(S, np.float32))
    v = np.atleast_1d(np.asarray(v, np.float32))
    X = np.stack([S, v], axis=-1)
    tcol = np.full((S.shape[0], 1), t, np.float32)
    u, delta, gamma = compute_greeks(trainer, tcol, X, use_ema=use_ema)
    return u[:, 0], delta[:, 0], gamma[:, 0]
