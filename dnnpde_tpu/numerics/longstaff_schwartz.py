"""Longstaff–Schwartz Bermudan MC pricer on the solver's exact Euler chain.

The optimal-stopping counterpart of ``numerics/discrete_bsde.py``: a
training-free oracle for the Bermudan-N value the REFLECTED local objective
learns (``solver/bsde.py`` per-step Snell clamp, ARCHITECTURE §6f)

    V_n = max(g(X_n), E_n[V_{n+1}] / (1 + r·Δt)),   V_N = g(X_N),

under the SAME N-step Euler–Maruyama chain (same μ/σ/``sigma_dw``/
``post_step``/dtype as the training rollout) and the same per-step
(1+rΔt) discounting. Works for ANY problem with a linear Z-free driver —
in particular it prices the American put under HESTON dynamics, where no
binomial tree exists (``numerics.crr_binomial`` covers only 1-D GBM).

Classic two-pass construction (Longstaff & Schwartz 2001):

1. *Regression pass* (n_regression paths): backward induction on stored
   states; at each exercise date the continuation value is fit by
   weighted least squares of the one-step-discounted realized cash flow
   on a polynomial basis of the state (+ the payoff itself), using
   in-the-money paths only. This yields a STOPPING POLICY
   "exercise when g(X_n) > fitted continuation".
2. *Pricing pass* (n_pricing FRESH paths): the frozen policy is applied
   to an independent path set; the reported ``value``/``standard_error``
   is that policy's plain-MC value — LOW-biased (any suboptimal policy
   under-prices), with no foresight bias. ``in_sample_value`` (the
   regression pass's own estimate) is also reported; the true Bermudan-N
   value is bracketed near [value, in_sample_value] in practice.

The regression itself runs on the host in float64 (50 small weighted
normal-equation solves — conditioning, not throughput, is what matters);
path simulation is a jitted on-device scan.

No reference counterpart: the reference has no optimal stopping at all
(its only objective is the European-style global residual,
``1d_BSPDE_case.py:246-289``).
"""

from __future__ import annotations

import itertools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dnnpde_tpu.numerics.discrete_bsde import probe_linear_driver

Array = jnp.ndarray


class LSMCValue(NamedTuple):
    """Two-pass Longstaff–Schwartz estimate of the Bermudan-N value."""

    value: float            # out-of-sample policy value (low-biased)
    standard_error: float   # MC error of the pricing pass
    in_sample_value: float  # regression-pass estimate (foresight-tinged)
    n_regression: int
    n_pricing: int
    N: int
    rate: float             # probed driver rate r of φ = r·Y
    # set when a cv_net was supplied (neural control variate on the
    # STOPPED process — see lsmc_value docstring). NOTE: when the control
    # coefficient is FITTED (cv_c=None at call time), ĉ is estimated on
    # the same pricing paths it is applied to — an O(1/n_pricing) bias
    # (negligible at the default 262k paths but not zero), and the
    # reported ``standard_error`` ignores the ĉ-estimation variance term.
    # Pass ``cv_c=1.0`` to lsmc_value for a strictly unbiased estimator
    # with an exact SE (the net's theoretical coefficient; matches
    # evals.control_variate's ``c=1.0`` convention).
    cv_variance_reduction: float = 1.0
    cv_c: float = 0.0
    plain_value: Optional[float] = None  # same paths, no control


def _simulate_paths(problem, N, n, seed, chol, dtype, x0=None,
                    cv_net=None, rate=0.0):
    """(N, n, D) stacked post-step states X_1..X_N of the solver's chain.

    With ``cv_net = (net_u, params)``, also returns the (N, n) per-step
    discounted martingale increments (1+rΔt)^{-(step+1)}·Z_θᵀσΔW computed
    IN the scan at the pre-transition state — the stopped-process control
    variate (each increment has zero conditional mean for any θ)."""
    D, Dw, T = problem.dim, problem.noise_dim, problem.T
    dt = T / N
    sqrt_dt = np.sqrt(dt)
    chol_T = None if chol is None else jnp.asarray(chol, dtype).T
    Yz = jnp.zeros((n, 1), dtype)
    Zz = jnp.zeros((n, D), dtype)
    key = jax.random.PRNGKey(seed)
    step_disc = jnp.asarray((1.0 + rate * dt) ** (-(np.arange(N) + 1.0)),
                            dtype)

    def step(X0, step_i):
        kn = jax.random.fold_in(key, step_i)
        dw = sqrt_dt * jax.random.normal(kn, (n, Dw), dtype)
        if chol_T is not None:
            dw = dw @ chol_T
        t0 = jnp.full((n, 1), step_i * dt, dtype)
        sig = problem.sigma(t0, X0, Yz)
        if cv_net is not None:
            net_u, params = cv_net
            _, Z = net_u(params, t0, X0)
            minc = step_disc[step_i] * problem.z_sigma_dw(Z, sig, dw)[:, 0]
        else:
            minc = jnp.zeros((n,), dtype)
        X1 = X0 + problem.mu(t0, X0, Yz, Zz) * dt + problem.sigma_dw(sig, dw)
        if problem.has_post_step:
            t1 = jnp.full((n, 1), (step_i + 1) * dt, dtype)
            X1 = problem.post_step(t1, X1)
        return X1, (X1, minc)

    x0 = problem.x0 if x0 is None else x0
    X0 = jnp.broadcast_to(jnp.asarray(x0, dtype), (n, D))
    _, (Xs, Minc) = jax.jit(
        lambda x0: jax.lax.scan(step, x0, jnp.arange(N))
    )(X0)
    if cv_net is None:
        return np.asarray(Xs, np.float32), None
    return np.asarray(Xs, np.float32), np.asarray(Minc, np.float64)


_MAX_BASIS = 256  # hard cap on regressors — past this the normal equations
                  # are both slow and ill-conditioned; use basis="sorted"


def basis_size(D: int, degree: int, basis: str = "monomial",
               basis_top: int = 3) -> int:
    """Number of regressors ``_basis`` will build (incl. the payoff column).

    The full monomial basis is C(D+degree, degree) — combinatorial in D
    (D=10, degree=3 → 286); the "sorted" basis is C(k+degree, degree)+k−1
    with k = min(D, basis_top), CONSTANT in D.
    """
    k = D if basis == "monomial" else min(D, basis_top)
    from math import comb

    extra = 0 if basis == "monomial" else max(k - 1, 0)
    return comb(k + degree, degree) + 1 + extra


def _basis(X, g, degree, basis="monomial", basis_top=3):
    """Regression features at one exercise date, (n, B).

    - "monomial": monomials of total degree ≤ ``degree`` over ALL D state
      coords, plus the payoff itself (the classic LS extra regressor).
      Combinatorial in D — fine for small D.
    - "sorted": monomials of the TOP ``basis_top`` order statistics
      (coords sorted descending per sample) plus the payoff and the gaps
      between consecutive order stats. For exchangeable dynamics with a
      symmetric payoff (the Bermudan max-call family) the continuation
      value IS a symmetric function — i.e. a function of the order
      statistics — and the max payoff is driven by the leading ones, so
      this structured basis scales to any D at constant regressor count
      (Andersen–Broadie 2004 use the same idea for their max-call LSMC
      policies).
    """
    D = X.shape[1]
    if basis == "sorted":
        k = min(D, basis_top)
        Xs = -np.sort(-X, axis=1)[:, :k]  # descending order stats
        cols = [np.prod([Xs[:, d] ** p for d, p in enumerate(powers)],
                        axis=0)
                for powers in itertools.product(range(degree + 1), repeat=k)
                if sum(powers) <= degree]
        # gaps between consecutive order stats: where the max is contested
        # the continuation differs most from the single-asset picture
        cols.extend(Xs[:, d] - Xs[:, d + 1] for d in range(k - 1))
    elif basis == "monomial":
        cols = [np.prod([X[:, d] ** p for d, p in enumerate(powers)],
                        axis=0)
                for powers in itertools.product(range(degree + 1), repeat=D)
                if sum(powers) <= degree]
    else:
        raise ValueError(f"basis must be 'monomial' or 'sorted', got {basis!r}")
    cols.append(g)
    if len(cols) > _MAX_BASIS:
        raise ValueError(
            f"{len(cols)} regressors (D={D}, degree={degree}, "
            f"basis={basis!r}) exceeds the {_MAX_BASIS} cap — use "
            "basis='sorted' (constant in D) or a lower degree"
        )
    return np.stack(cols, axis=1)


def _fit(Phi, y, w, ridge=1e-8):
    """Weighted ridge normal equations in float64 with standardized
    features — conditioning beats raw lstsq with cubic terms."""
    Phi = Phi.astype(np.float64)
    mu = Phi.mean(axis=0)
    sd = Phi.std(axis=0)
    sd[sd < 1e-12] = 1.0
    Z = (Phi - mu) / sd
    Z[:, 0] = 1.0  # intercept column stays the intercept
    A = (Z * w[:, None]).T @ Z
    A[np.diag_indices_from(A)] += ridge * np.trace(A) / A.shape[0]
    b = (Z * w[:, None]).T @ y
    beta = np.linalg.solve(A, b)
    return beta, mu, sd


def _predict(Phi, fit):
    beta, mu, sd = fit
    Z = (Phi.astype(np.float64) - mu) / sd
    Z[:, 0] = 1.0
    return Z @ beta


def lsmc_value(
    problem,
    N: int,
    n_regression: int = 131_072,
    n_pricing: int = 262_144,
    degree: int = 3,
    seed: int = 0,
    chol: Optional[Array] = None,
    dtype=jnp.float32,
    x0: Optional[Array] = None,
    cv_net_u=None,
    cv_params=None,
    cv_c: Optional[float] = None,
    exercise_every: Optional[int] = None,
    basis: str = "monomial",
    basis_top: int = 3,
) -> LSMCValue:
    """Price the Bermudan-N contract of an ``early_exercise`` problem.

    Exercise dates are the solver grid t_1..t_N (payoff at t_N is the
    terminal condition; immediate exercise at t=0 is taken as a final
    max with ``g(x0)``), matching the reflected local objective's
    recursion and the ``crr_binomial(..., exercise_every=·)`` convention.
    Applicability (linear Z-free driver, (Y,Z)-independent dynamics) is
    probed at runtime exactly like the discrete European oracle.
    ``x0`` overrides the starting state — the hook surface grading uses
    to score a trained value SURFACE against per-point LSMC values
    (mirrors ``discrete_bsde_surface``).

    ``cv_net_u``/``cv_params`` (the training-identical ``Trainer.net_u``
    callable + parameters) enable the neural control variate on the
    STOPPED process: the pricing-pass estimator becomes
    ``payoff_τ − c·m_τ`` with ``m_τ = Σ_{n<τ} (1+rΔt)^{-(n+1)} Z_θᵀσΔW_n``.
    By optional stopping, E[m_τ] = 0 exactly for ANY θ (τ ≤ N is adapted:
    the exercise decision at each date reads only the current state), so
    unbiasedness is preserved and the net's accuracy only shrinks the
    variance — the same exactness argument as ``evals.neural_cv_value``,
    extended to the stopping time.

    ``cv_c`` fixes the control coefficient (e.g. 1.0, the net's own
    theoretical value); ``None`` fits ĉ = Cov(pv, m_τ)/Var(m_τ) on the
    pricing paths themselves — slightly more variance reduction at the
    cost of an O(1/n_pricing) bias and an SE that omits the ĉ-estimation
    term (see the LSMCValue note).

    ``exercise_every`` restricts exercise to grid indices that are
    multiples of k (default: the problem's own ``exercise_every`` — 1 for
    the put family, N/9 for the max-call benchmark); ``basis``/
    ``basis_top`` select the regression features (see :func:`_basis` —
    use "sorted" for symmetric multi-asset payoffs).
    """
    rate = probe_linear_driver(problem)
    dt = problem.T / N
    disc1 = 1.0 / (1.0 + rate * dt)
    k_ex = int(getattr(problem, "exercise_every", 1)
               if exercise_every is None else exercise_every)
    if N % k_ex:
        raise ValueError(
            f"N={N} must be a multiple of exercise_every={k_ex}"
        )

    def payoff(Xn):
        return np.asarray(problem.g(jnp.asarray(Xn)), np.float64)[:, 0]

    # --- pass 1: regression ------------------------------------------------
    Xs, _ = _simulate_paths(problem, N, n_regression, seed, chol, dtype, x0)
    CF = payoff(Xs[N - 1])  # value at t_N
    fits = [None] * N  # fits[n] = continuation fit at date t_n (1-indexed -1)
    min_itm = 16 * (degree + 2)
    for n in range(N - 1, 0, -1):  # dates t_{N-1} .. t_1
        y = CF * disc1  # one-step-discounted realized cash flow
        if n % k_ex:  # not an exercise date — pure discounting
            CF = y
            continue
        Xn = Xs[n - 1]
        g_n = payoff(Xn)
        itm = g_n > 0.0
        if itm.sum() >= min_itm:
            Phi = _basis(Xn.astype(np.float64), g_n, degree, basis,
                         basis_top)
            fit = _fit(Phi, y, itm.astype(np.float64))
            cont = _predict(Phi, fit)
            ex = itm & (g_n > cont)
            CF = np.where(ex, g_n, y)
            fits[n] = fit
        else:  # too few ITM paths to fit — never exercise at this date
            CF = y
    x0_row = np.asarray(problem.x0 if x0 is None else x0,
                        np.float64)[None, :]
    g0 = float(payoff(x0_row.astype(np.float32))[0])
    in_sample = max(g0, float(CF.mean() * disc1))

    # --- pass 2: fresh paths, frozen policy --------------------------------
    cv_net = None if cv_net_u is None else (cv_net_u, cv_params)
    Xs, Minc = _simulate_paths(problem, N, n_pricing, seed + 777_001, chol,
                               dtype, x0, cv_net=cv_net, rate=rate)
    alive = np.ones(n_pricing, bool)
    pv = np.zeros(n_pricing, np.float64)
    tau = np.full(n_pricing, N, np.int64)  # exercise date (N = maturity)
    for n in range(1, N):
        if fits[n] is None:
            continue
        Xn = Xs[n - 1]
        g_n = payoff(Xn)
        Phi = _basis(Xn.astype(np.float64), g_n, degree, basis, basis_top)
        cont = _predict(Phi, fits[n])
        ex = alive & (g_n > 0.0) & (g_n > cont)
        pv[ex] = g_n[ex] * disc1**n
        tau[ex] = n
        alive &= ~ex
    g_N = payoff(Xs[N - 1])
    pv[alive] = g_N[alive] * disc1**N

    cv_vrf, plain_value = 1.0, None
    if Minc is None:
        cv_c = 0.0
    else:
        # m_τ = Σ_{n<τ} increments: exercise at date n uses the first n
        # increments (steps 0..n−1) — cumulative sum row τ−1
        Mcum = np.cumsum(Minc, axis=0)  # (N, n_pricing)
        m_tau = Mcum[tau - 1, np.arange(n_pricing)]
        var_p = pv.var()
        if cv_c is None:
            var_m = max(m_tau.var(), 1e-300)
            cov = np.cov(pv, m_tau, ddof=0)[0, 1]
            cv_c = float(cov / var_m)
        else:
            cv_c = float(cv_c)
        plain_value = max(g0, float(pv.mean()))
        pv = pv - cv_c * m_tau
        cv_vrf = float(var_p / max(pv.var(), 1e-300))
    value = max(g0, float(pv.mean()))
    se = float(pv.std() / np.sqrt(n_pricing))
    return LSMCValue(
        value=value,
        standard_error=se,
        in_sample_value=in_sample,
        n_regression=n_regression,
        n_pricing=n_pricing,
        N=N,
        rate=rate,
        cv_variance_reduction=cv_vrf,
        cv_c=cv_c,
        plain_value=plain_value,
    )
