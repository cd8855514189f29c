"""Neural control-variate pricing: the trained net as a variance killer.

The discrete-N value D(N) = E[g(X_N)]/(1+rΔt)^N (``numerics/discrete_bsde``)
telescopes the BSDE recursion into a plain Monte-Carlo average whose variance
is the payoff's own. But the trained solution carries exactly the object that
removes that variance: along the SAME Euler chain, the martingale

    m  =  Σ_{n=0}^{N-1} (1+rΔt)^{-(n+1)} · Z_θ(t_n, X_n)ᵀ σ(t_n, X_n) ΔW_n

has E[m] = 0 *exactly* for ANY parameters θ (each ΔW_n is independent of the
filtration that Z_θ(t_n, X_n) lives in — no accuracy assumption anywhere).
When the net is accurate, the discrete Itô/Euler expansion of u gives
discounted-payoff ≈ Y0 + m pathwise, so the residual payoff − c·m is nearly
deterministic: the estimator

    D̂ = mean(payoff) − c · mean(m),   c = Cov(payoff, m)/Var(m)

keeps MC unbiasedness (up to the O(1/n) same-sample-ĉ term; ``c=1.0`` is
strictly unbiased) while dividing the variance by the measured
``variance_reduction`` factor — equivalently, every MC price needs that many
times fewer paths at equal error.

This is a serving/evaluation capability the reference cannot express: its
trained models are only ever read back through plots
(``1d_BSPDE_case.py:453-464``); here the net composes with the classical MC
pricer to make the classical tool better. Applicability matches the discrete
oracle (linear Z-free driver, probed at runtime); path-dependent contracts
(barrier/Asian/lookback ``post_step`` chains) are supported unchanged.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dnnpde_tpu.numerics.discrete_bsde import probe_linear_driver

Array = jnp.ndarray


class NeuralCVValue(NamedTuple):
    """Control-variate MC estimate of the discrete-N value D(N)."""

    value: float               # mean(payoff) − c·mean(m)
    standard_error: float      # SE of the residual payoff − c·m
    plain_value: float         # mean(payoff): same paths, no control
    plain_standard_error: float
    variance_reduction: float  # Var(payoff) / Var(payoff − c·m)
    c: float                   # fitted control coefficient (≈1 for a good net)
    martingale_mean: float     # mean(m) — should sit within its own SE of 0
    n_paths: int
    N: int
    rate: float                # probed driver rate r of φ = r·Y


def neural_cv_value(
    problem,
    net_u: Callable,
    params,
    N: int,
    n_paths: int = 1_000_000,
    seed: int = 0,
    batch: int = 131_072,
    chol: Optional[Array] = None,
    dtype=jnp.float32,
    x0: Optional[Array] = None,
    c: Optional[float] = None,
) -> NeuralCVValue:
    """Price D(N) by forward MC with the trained net as control variate.

    ``net_u(params, t, X) → (u, Z)`` must be the training-identical callable
    (``Trainer.net_u`` / ``solver.make_net_u`` — the output transform is
    inside it, so Z is the transformed gradient exactly as trained). The
    simulation chain is the solver's own Euler step (same μ/σ/``sigma_dw``/
    ``post_step``/dtype as ``solver/bsde.py::em_step``), so the estimator
    targets the same D(N) as :func:`numerics.discrete_bsde_value` and the
    two agree within MC error — with the CV's error smaller by the measured
    ``variance_reduction``.

    ``c=None`` fits the optimal coefficient from the pooled sample moments
    (introduces an O(1/n_paths) bias, negligible at these path counts);
    pass ``c=1.0`` for the strictly unbiased estimator.
    """
    if getattr(problem, "early_exercise", False):
        raise ValueError(
            f"{getattr(problem, 'name', type(problem).__name__)}: the "
            "telescoped estimator targets the EUROPEAN discrete value "
            "D(N) and would silently ignore early exercise — price "
            "optimal-stopping contracts with numerics.lsmc_value("
            "cv_net_u=…) instead (the same control variate, applied to "
            "the stopped process)"
        )
    rate = probe_linear_driver(problem)
    D, Dw, T = problem.dim, problem.noise_dim, problem.T
    dt = T / N
    sqrt_dt = np.sqrt(dt)
    batch = min(batch, n_paths)
    n_batches = max(1, int(np.ceil(n_paths / batch)))
    chol_T = None if chol is None else jnp.asarray(chol, dtype).T

    x0 = jnp.asarray(problem.x0 if x0 is None else x0, dtype)
    Yz = jnp.zeros((batch, 1), dtype)
    Zz = jnp.zeros((batch, D), dtype)
    # per-step discounts (1+rΔt)^{-(n+1)}, n = 0..N−1, and the terminal one
    step_disc = jnp.asarray(
        (1.0 + rate * dt) ** (-(np.arange(N) + 1.0)), dtype
    )
    disc_N = float((1.0 + rate * dt) ** (-N))

    def one_batch(key):
        def step(carry, n):
            X0, m = carry
            kn = jax.random.fold_in(key, n)
            dw = sqrt_dt * jax.random.normal(kn, (batch, Dw), dtype)
            if chol_T is not None:
                dw = dw @ chol_T
            t0 = jnp.full((batch, 1), n * dt, dtype)
            sig = problem.sigma(t0, X0, Yz)
            _, Z = net_u(params, t0, X0)
            m = m + step_disc[n] * problem.z_sigma_dw(Z, sig, dw)[:, 0]
            X1 = (
                X0
                + problem.mu(t0, X0, Yz, Zz) * dt
                + problem.sigma_dw(sig, dw)
            )
            if problem.has_post_step:
                t1 = jnp.full((batch, 1), (n + 1) * dt, dtype)
                X1 = problem.post_step(t1, X1)
            return (X1, m), None

        X0 = jnp.broadcast_to(x0, (batch, D))
        m0 = jnp.zeros((batch,), dtype)
        (XN, m), _ = jax.lax.scan(step, (X0, m0), jnp.arange(N))
        p = disc_N * problem.g(XN)[:, 0]
        # pooled second moments — the host combines batches exactly
        return (
            jnp.sum(p), jnp.sum(p * p),
            jnp.sum(m), jnp.sum(m * m), jnp.sum(p * m),
        )

    fn = jax.jit(one_batch)
    sums = np.zeros(5, np.float64)
    keys = jax.random.split(jax.random.PRNGKey(seed), n_batches)
    for k in keys:
        sums += np.asarray([float(v) for v in fn(k)])
    n = n_batches * batch
    sp, spp, sm, smm, spm = sums
    mean_p, mean_m = sp / n, sm / n
    var_p = max(spp / n - mean_p**2, 0.0)
    var_m = max(smm / n - mean_m**2, 1e-300)
    cov = spm / n - mean_p * mean_m
    c_fit = cov / var_m if c is None else float(c)
    var_resid = max(var_p - 2.0 * c_fit * cov + c_fit**2 * var_m, 0.0)
    return NeuralCVValue(
        value=mean_p - c_fit * mean_m,
        standard_error=float(np.sqrt(var_resid / n)),
        plain_value=mean_p,
        plain_standard_error=float(np.sqrt(var_p / n)),
        variance_reduction=float(var_p / max(var_resid, 1e-300)),
        c=float(c_fit),
        martingale_mean=mean_m,
        n_paths=n,
        N=N,
        rate=rate,
    )


def neural_cv_from_trainer(
    trainer, N: Optional[int] = None, use_ema: bool = True, **kwargs
) -> NeuralCVValue:
    """Convenience wrapper: price with a trained ``Trainer``'s net.

    Defaults to the trainer's own time grid N and the EMA shadow parameters
    (the serving read). Extra kwargs pass through to :func:`neural_cv_value`.
    """
    params = trainer.ema_params if use_ema else trainer.params
    return neural_cv_value(
        trainer.problem, trainer.net_u, params,
        trainer.N if N is None else N, **kwargs,
    )
