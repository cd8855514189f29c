"""Policy-value read for optimal-stopping nets: the unbiased-low answer.

The direct net read ``max(g(x0), u_θ(0, x0))`` inherits the reflected local
objective's max-bootstrap bias (targets ``max(g, Ỹ)`` of a NOISY Ỹ are
biased up, and the bias compounds backward through the exercise dates —
measured +1.2–1.5% on the Bermudan max-call, ``results_r5/max_call.log``).
The standard cure in the optimal-stopping literature (and the protocol
behind the published Broadie–Glasserman / Andersen–Broadie / Becker–
Cheridito–Jentzen benchmark values) is to use the net only as an EXERCISE
POLICY on fresh paths:

    stop at the first exercise date with  g(X_n) > u_θ(t_n, X_n),

and average the discounted payoff at the stop. For ANY policy this is an
exact LOWER bound on the true value (suboptimal stopping can only lose
money), and a first-order-accurate one: an O(ε) error in the exercise
BOUNDARY costs only O(ε²) in value, because the two branches of the max
meet smoothly at the true boundary. So the policy value kills the
bootstrap bias without touching training — and it is the apples-to-apples
read against the published numbers, which are themselves policy values.

Chain semantics match the solver exactly (same Euler step, ``post_step``,
per-step discount (1+rΔt)⁻¹ — for problems built with the exact-rate trick
(``BermudanMaxCall.r_hat``) this is exactly e^{−rΔt}). One jitted scan per
batch: simulate AND decide on device; the only host traffic is the final
per-batch sums. No reference counterpart: the reference has no optimal
stopping at all (its objective is the European summed rollout,
``1d_BSPDE_case.py:246-289``).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dnnpde_tpu.numerics.discrete_bsde import probe_linear_driver

Array = jnp.ndarray


class PolicyValue(NamedTuple):
    """Fresh-path lower-bound estimate from the net's exercise policy."""

    value: float            # mean discounted payoff at the policy's stop
    standard_error: float
    n_paths: int
    N: int
    rate: float             # probed driver rate r of φ = r·Y
    exercise_fraction: float  # paths stopped strictly before maturity
    immediate: bool         # True when g(x0) beat the simulated value


def policy_value(
    problem,
    net_u: Callable,
    params,
    N: int,
    n_paths: int = 1_048_576,
    seed: int = 0,
    batch: int = 262_144,
    chol: Optional[Array] = None,
    dtype=jnp.float32,
    x0: Optional[Array] = None,
    exercise_every: Optional[int] = None,
) -> PolicyValue:
    """Price the Bermudan contract by running the net's stopping rule.

    ``net_u(params, t, X) → (u, Z)`` must be the training-identical
    callable (``Trainer.net_u``) — for ``early_exercise`` problems its u
    IS the continuation value, so the rule "exercise when g > u" is read
    straight off the trained surface. Exercise is restricted to grid
    indices that are multiples of ``exercise_every`` (default: the
    problem's own attribute), maturity always pays ``g(X_N)``; immediate
    exercise at t=0 is the final ``max(g(x0), ·)`` read, flagged in
    ``immediate``.
    """
    if not getattr(problem, "early_exercise", False):
        raise ValueError(
            f"{getattr(problem, 'name', type(problem).__name__)}: "
            "policy_value prices optimal-stopping contracts; for "
            "European-style problems the telescoped estimator "
            "(evals.neural_cv_value / numerics.discrete_bsde_value) "
            "is the right tool"
        )
    rate = probe_linear_driver(problem)
    D, Dw, T = problem.dim, problem.noise_dim, problem.T
    dt = T / N
    sqrt_dt = np.sqrt(dt)
    k_ex = int(getattr(problem, "exercise_every", 1)
               if exercise_every is None else exercise_every)
    if N % k_ex:
        raise ValueError(f"N={N} must be a multiple of "
                         f"exercise_every={k_ex}")
    batch = min(batch, n_paths)
    n_batches = max(1, int(np.ceil(n_paths / batch)))
    chol_T = None if chol is None else jnp.asarray(chol, dtype).T

    x0 = jnp.asarray(problem.x0 if x0 is None else x0, dtype)
    Yz = jnp.zeros((batch, 1), dtype)
    Zz = jnp.zeros((batch, D), dtype)
    # per-step discounts (1+rΔt)^{-n} at grid index n = 1..N — the solver
    # recursion's exact discounting (= e^{−r·t_n} under the r_hat trick)
    disc = jnp.asarray((1.0 + rate * dt) ** (-(np.arange(N) + 1.0)), dtype)
    ex_date = jnp.asarray((np.arange(1, N + 1) % k_ex) == 0)

    def one_batch(key):
        X0b = jnp.broadcast_to(x0, (batch, D))

        def step(carry, n):
            X0, alive, pv = carry
            kn = jax.random.fold_in(key, n)
            dw = sqrt_dt * jax.random.normal(kn, (batch, Dw), dtype)
            if chol_T is not None:
                dw = dw @ chol_T
            t0 = jnp.full((batch, 1), n * dt, dtype)
            sig = problem.sigma(t0, X0, Yz)
            X1 = (X0 + problem.mu(t0, X0, Yz, Zz) * dt
                  + problem.sigma_dw(sig, dw))
            t1 = jnp.full((batch, 1), (n + 1) * dt, dtype)
            if problem.has_post_step:
                X1 = problem.post_step(t1, X1)
            g1 = problem.g(X1)[:, 0]
            u1, _ = net_u(params, t1, X1)
            # maturity pays regardless of the net; earlier dates exercise
            # where the payoff beats the learned continuation
            stop = jnp.where(
                n + 1 == N,
                jnp.ones_like(g1, bool),
                ex_date[n] & (g1 > 0.0) & (g1 > u1[:, 0]),
            )
            exf = alive * stop.astype(dtype)
            pv = pv + exf * disc[n] * g1
            return (X1, alive - exf, pv), exf

        init = (X0b, jnp.ones((batch,), dtype), jnp.zeros((batch,), dtype))
        (_, _, pv), exfs = jax.lax.scan(step, init, jnp.arange(N))
        early = jnp.sum(exfs[:-1]) if N > 1 else jnp.asarray(0.0, dtype)
        # centered per-batch moments: f32-safe (no catastrophic
        # cancellation in the host-side variance pooling)
        m = jnp.mean(pv)
        return m, jnp.mean(jnp.square(pv - m)), early

    run = jax.jit(one_batch)
    key = jax.random.PRNGKey(seed)
    means, varis, early = [], [], 0.0
    for b in range(n_batches):
        bm, bv, be = run(jax.random.fold_in(key, b))
        means.append(float(bm))
        varis.append(float(bv))
        early += float(be)
    n = n_batches * batch
    mean = float(np.mean(means))
    # pooled variance: within-batch + between-batch spread of batch means
    var = float(np.mean(varis) + np.var(means))
    se = float(np.sqrt(var / n))
    g0 = float(np.asarray(problem.g(jnp.asarray(x0)[None, :]))[0, 0])
    immediate = g0 > mean
    return PolicyValue(
        value=float(max(g0, mean)), standard_error=se, n_paths=n, N=N,
        rate=rate, exercise_fraction=float(early / n), immediate=immediate,
    )


def policy_value_from_trainer(
    trainer, N: Optional[int] = None, use_ema: bool = True, **kwargs
) -> PolicyValue:
    """Convenience wrapper: run a trained ``Trainer``'s stopping rule.

    Defaults to the trainer's own time grid N and the EMA shadow parameters
    (the serving read). Extra kwargs pass through to :func:`policy_value`.
    """
    params = trainer.ema_params if use_ema else trainer.params
    return policy_value(
        trainer.problem, trainer.net_u, params,
        trainer.N if N is None else N, **kwargs,
    )
