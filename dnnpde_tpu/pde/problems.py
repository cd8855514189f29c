"""The PDE problem zoo (SURVEY.md §2.3).

Each problem cites the reference definition it reproduces. All coefficients
are parametrized (the reference hard-codes several strike conventions —
K = 1.0·D in ``1d_BSPDE_case.py:160`` vs K = 1.0 in ``hjb_implement.py:152`` —
both are expressible here via the ``strike`` field).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from dnnpde_tpu.pde.base import Array, PDEProblem


def _ones_x0(dim: int, lo: float = 1.0, hi: float = 0.5) -> Array:
    """Reference initial condition: alternating [1, 0.5, 1, 0.5, ...].

    (``DeepBSDE.py:437``: ``np.array([1.0, 0.5] * 50)`` for D=100.)
    """
    base = jnp.tile(jnp.array([lo, hi], dtype=jnp.float32), (dim + 1) // 2)
    return base[:dim]


@dataclasses.dataclass(frozen=True)
class BlackScholesBarenblatt(PDEProblem):
    """100D Black–Scholes–Barenblatt equation.

    phi = r(Y − ΣXZ), g = Σ X², mu = 0, sigma = σ_bar·diag(X)
    (reference ``DeepBSDE.py:326-341``), with closed form
    u(t,X) = exp((r + σ̄²)(T − t))·ΣX² (``DeepBSDE.py:345-349``).
    """

    D: int = 100
    r: float = 0.05
    sigma_bar: float = 0.4
    name: str = "BlackScholesBarenblatt"

    @property
    def dim(self) -> int:
        return self.D

    @property
    def x0(self) -> Array:
        return _ones_x0(self.D)

    def mu(self, t, X, Y, Z):
        return jnp.zeros_like(X)

    def sigma(self, t, X, Y):
        return self.sigma_bar * X

    def phi(self, t, X, Y, Z):
        return self.r * (Y - jnp.sum(X * Z, axis=-1, keepdims=True))

    def g(self, X):
        return jnp.sum(X**2, axis=-1, keepdims=True)

    def exact_solution(self, t, X):
        return jnp.exp((self.r + self.sigma_bar**2) * (self.T - t)) * jnp.sum(
            X**2, axis=-1, keepdims=True
        )


@dataclasses.dataclass(frozen=True)
class CallOption1D(PDEProblem):
    """1D European call under Black–Scholes dynamics.

    phi = r·Y, g = max(ΣX − K, 0), mu = r·X, sigma = σ̄·diag(X) with
    r = 0.01, σ̄ = 0.25, K = 1.0·D (reference ``1d_BSPDE_case.py:510-560``;
    strike convention ``1d_BSPDE_case.py:160``).
    """

    D: int = 1
    r: float = 0.01
    sigma_bar: float = 0.25
    strike: Optional[float] = None  # default 1.0 * D
    name: str = "CallOption1D"

    @property
    def dim(self) -> int:
        return self.D

    @property
    def K(self) -> float:
        return 1.0 * self.D if self.strike is None else self.strike

    @property
    def x0(self) -> Array:
        return jnp.ones((self.D,), dtype=jnp.float32)

    def mu(self, t, X, Y, Z):
        return self.r * X

    def sigma(self, t, X, Y):
        return self.sigma_bar * X

    def phi(self, t, X, Y, Z):
        return self.r * Y

    def g(self, X):
        return jnp.maximum(jnp.sum(X, axis=-1, keepdims=True) - self.K, 0.0)


@dataclasses.dataclass(frozen=True)
class AmericanPutOption(PDEProblem):
    """American (Bermudan-N) put under Black–Scholes dynamics — an
    OPTIMAL-STOPPING problem, beyond anything the reference can express
    (its only objective is the global summed residual over European-style
    rollouts, ``1d_BSPDE_case.py:246-289``; no early exercise anywhere).

    phi = r·Y, g = max(K − ΣX, 0), mu = r·X, sigma = σ̄·diag(X). With the
    local (backward-induction) objective the per-step regression target is
    clamped at the payoff — the discrete reflected-BSDE / Snell-envelope
    recursion V_k = max(g(X_k), E_k[V_{k+1}]/(1+rΔt)) — so the net learns
    the CONTINUATION value and the served value is max(g, u)
    (:meth:`PDEProblem.value_u`). With N solver steps the learned price is
    the Bermudan-N value; score it against the matching discrete oracle
    ``numerics.crr_binomial(..., exercise_every=n_steps//N)`` (or the full
    American tree, an O(Δt) gap). Requires ``Trainer(objective="local")``.
    """

    D: int = 1
    r: float = 0.06
    sigma_bar: float = 0.2
    strike: Optional[float] = None  # default 1.0 * D
    # European control-variate head (D=1 only, DEFAULT): u = euro_put(S, τ)
    # + √(τ/T)·softplus(raw + shift). The base is the closed-form European
    # put via put-call parity — exact payoff at τ=0 (both terminal
    # penalties vanish by construction, same argument as the Heston bs
    # head, pde/heston.py) — and the net learns only the NON-NEGATIVE
    # early-exercise premium (continuation ≥ European: holding to maturity
    # is an admissible policy from any node). Softplus keeps the premium
    # admissible; ``head_shift`` starts it small. Measured
    # ("r4_american_put" vs "r4_american_put_head", 3 seeds each, M=1024
    # N=50 @ 20k iters vs the matching Bermudan-N CRR tree): plain head
    # +2.4…+3.9% high (bootstrapped-max overestimation at the exercise
    # boundary); bs head 0.15–0.35% — the 10–20× cure, so it is the
    # default. local_ema targets were measured and REJECTED both ways
    # (−24…−33% cold-start failure plain; +37…+78% runaway with the head).
    bs_head: bool = True
    head_shift: float = -3.0
    name: str = "AmericanPut"

    @property
    def dim(self) -> int:
        return self.D

    @property
    def early_exercise(self) -> bool:
        return True

    @property
    def has_output_transform(self) -> bool:
        return self.bs_head

    def transform_u(self, t, X, u):
        if not self.bs_head:
            return super().transform_u(t, X, u)
        if self.D != 1:
            raise ValueError("bs_head supports D=1 only")
        from dnnpde_tpu.numerics.black_scholes import black_scholes_call

        S = X[..., 0:1]
        tau = jnp.clip(self.T - t, 0.0, None)
        euro = (black_scholes_call(S, self.K, tau, self.r, self.sigma_bar,
                                   cdf="tanh")
                - S + self.K * jnp.exp(-self.r * tau))
        premium = jnp.sqrt(tau / self.T) * jax.nn.softplus(u + self.head_shift)
        return euro + premium

    @property
    def K(self) -> float:
        return 1.0 * self.D if self.strike is None else self.strike

    @property
    def x0(self) -> Array:
        return jnp.ones((self.D,), dtype=jnp.float32)

    def mu(self, t, X, Y, Z):
        return self.r * X

    def sigma(self, t, X, Y):
        return self.sigma_bar * X

    def phi(self, t, X, Y, Z):
        return self.r * Y

    def g(self, X):
        return jnp.maximum(self.K - jnp.sum(X, axis=-1, keepdims=True), 0.0)


@dataclasses.dataclass(frozen=True)
class BermudanMaxCall(PDEProblem):
    """Bermudan MAX-CALL on d independent dividend-paying GBM assets — the
    classic high-dimensional optimal-stopping benchmark (Broadie &
    Glasserman 1997; Andersen & Broadie 2004 Table 2; Becker, Cheridito &
    Jentzen 2019 Table 2): K=100, r=5%, dividend δ=10%, σ=20%, ρ=0, T=3,
    nine equally spaced exercise dates t_j = jT/9. The reference's only
    high-D payoff family is the basket call (``high_dimension_test.py:
    627-629``) with no early exercise anywhere; this problem is its
    optimal-stopping extension with PUBLISHED values to grade against
    (d=2, S0=100: 13.902; d=5, S0=100: 26.15).

    TPU-first chain design — two choices make the learned value EXACTLY
    the published Bermudan-9 value (no Euler bias, no discounting-scheme
    bias), so model error is pure learning error:

    - State = LOG-prices: x_i = ln S_i. Then μ = (r − δ − σ²/2)·1 and
      σ = σ̄·1 are CONSTANT, so the solver's explicit Euler step is the
      exact GBM transition at any N.
    - Driver φ = r̂·Y with r̂ = (e^{rΔt} − 1)/Δt: the discrete recursion's
      per-step factor (1 + r̂Δt)⁻¹ is then exactly e^{−rΔt} — the solver
      grid N only has to be a multiple of ``n_exercise``
      (:attr:`exercise_every` masks the Snell clamp to the 9 dates).

    Payoff g(x) = max(max_i e^{x_i} − K, 0). The output head (default)
    anchors the net at max_i BSCall(S_i, τ; δ) — a LOWER bound on the
    European max-call, hence on the continuation value — plus a
    √(τ/T)-scaled softplus premium: exact at τ=0 (both terminal penalties
    vanish by construction, same argument as :class:`AmericanPutOption`).

    Requires ``Trainer(objective="local")``; grade against
    ``numerics.lsmc_value(problem, N, basis="sorted")`` on the identical
    chain and the published values above.
    """

    D: int = 2
    S0: float = 100.0
    strike: float = 100.0
    r: float = 0.05
    delta: float = 0.10
    sigma_bar: float = 0.2
    T: float = 3.0
    n_exercise: int = 9
    N_steps: int = 45  # solver grid; must be a multiple of n_exercise
    head: bool = True
    head_shift: float = -3.0
    name: str = "BermudanMaxCall"

    def __post_init__(self):
        if self.N_steps % self.n_exercise:
            raise ValueError(
                f"N_steps={self.N_steps} must be a multiple of "
                f"n_exercise={self.n_exercise}"
            )

    @property
    def dim(self) -> int:
        return self.D

    @property
    def K(self) -> float:
        return self.strike

    @property
    def early_exercise(self) -> bool:
        return True

    @property
    def exercise_every(self) -> int:
        return self.N_steps // self.n_exercise

    @property
    def N_samples(self) -> int:
        # Like the path-dependent contracts: the chain is calibrated to a
        # specific grid (r̂ depends on Δt = T/N_steps), so the Trainer's N
        # must match.
        return self.N_steps

    @property
    def dt(self) -> float:
        return self.T / self.N_steps

    @property
    def r_hat(self) -> float:
        """Per-step driver rate making (1 + r̂Δt)⁻¹ = e^{−rΔt} exact."""
        import math

        return float(math.expm1(self.r * self.dt) / self.dt)

    @property
    def x0(self) -> Array:
        return jnp.full((self.D,), jnp.log(self.S0), dtype=jnp.float32)

    def mu(self, t, X, Y, Z):
        drift = self.r - self.delta - 0.5 * self.sigma_bar**2
        return jnp.full_like(X, drift)

    def sigma(self, t, X, Y):
        return jnp.full_like(X, self.sigma_bar)

    def phi(self, t, X, Y, Z):
        return self.r_hat * Y

    def g(self, X):
        mx = jnp.max(jnp.exp(X), axis=-1, keepdims=True)
        return jnp.maximum(mx - self.K, 0.0)

    @property
    def has_output_transform(self) -> bool:
        return self.head

    def transform_u(self, t, X, u):
        if not self.head:
            return u
        from dnnpde_tpu.numerics.black_scholes import black_scholes_call

        S = jnp.exp(X)
        tau = jnp.clip(self.T - t, 0.0, None)
        base = jnp.max(
            black_scholes_call(S, self.K, tau, self.r, self.sigma_bar,
                               q=self.delta, cdf="tanh"),
            axis=-1, keepdims=True,
        )
        premium = jnp.sqrt(tau / self.T) * jax.nn.softplus(
            u + self.head_shift
        )
        return base + premium


@dataclasses.dataclass(frozen=True)
class UpAndOutCall(PDEProblem):
    """Discretely-monitored up-and-out barrier call — a PATH-DEPENDENT
    payoff, beyond anything in the reference (every reference payoff is a
    function of the terminal state alone).

    State X = (S, a): GBM underlying plus a multiplicative ALIVE indicator
    updated at every solver step (= monitoring date) through the
    :meth:`post_step` hook: a ← a·m(S) with m = 1{S < B}
    (``smooth_beta=None``) or the sigmoid σ(β(B − S)) (smoothed monitor —
    differentiable through the barrier, the trainable default; β → ∞
    recovers the hard contract). The payoff is g = a·max(S − K, 0) and the
    value is exactly LINEAR in a, so the output transform is u = a·raw:
    knocked-out paths carry value 0 identically (their residuals vanish —
    a never re-grows) and the net spends all capacity on the alive surface
    f(t, S). Works under BOTH objectives (the path-dependence lives in the
    state, not the objective). The discrete oracle
    (``numerics.discrete_bsde_value``) runs the SAME post_step chain, so
    the accuracy gate is exact at any N and any smoothing — no
    Broadie–Glasserman continuity correction needed.
    """

    r: float = 0.05
    sigma_bar: float = 0.2
    strike: float = 1.0
    barrier: float = 1.3
    smooth_beta: Optional[float] = 50.0
    name: str = "UpAndOutCall"

    @property
    def dim(self) -> int:
        return 2

    @property
    def has_post_step(self) -> bool:
        return True

    @property
    def has_output_transform(self) -> bool:
        return True

    @property
    def x0(self) -> Array:
        return jnp.asarray([1.0, 1.0], dtype=jnp.float32)

    def monitor(self, S: Array) -> Array:
        """Knock-out factor at one monitoring date: 1 below the barrier,
        0 above (smoothed by ``smooth_beta`` unless None)."""
        if self.smooth_beta is None:
            return (S < self.barrier).astype(S.dtype)
        return jax.nn.sigmoid(self.smooth_beta * (self.barrier - S))

    def post_step(self, t, X):
        S, a = X[..., 0:1], X[..., 1:2]
        return jnp.concatenate([S, a * self.monitor(S)], axis=-1)

    def transform_u(self, t, X, u):
        return X[..., 1:2] * u

    def mu(self, t, X, Y, Z):
        return jnp.concatenate(
            [self.r * X[..., 0:1], jnp.zeros_like(X[..., 1:2])], axis=-1
        )

    def sigma(self, t, X, Y):
        return jnp.concatenate(
            [self.sigma_bar * X[..., 0:1], jnp.zeros_like(X[..., 1:2])],
            axis=-1,
        )

    def phi(self, t, X, Y, Z):
        return self.r * Y

    def g(self, X):
        return X[..., 1:2] * jnp.maximum(X[..., 0:1] - self.strike, 0.0)


@dataclasses.dataclass(frozen=True)
class AsianCallOption(PDEProblem):
    """Discretely-sampled arithmetic-average Asian call — path-dependent
    via the :meth:`post_step` hook (no reference counterpart; the
    arithmetic-average contract has no closed form even classically).

    State X = (S, A): GBM underlying plus the RUNNING AVERAGE of the N
    post-step samples, accumulated as A ← A + S/N at each step (A0 = 0;
    after step k, A = (1/N)·Σ_{j≤k} S_j — at maturity the full discrete
    average). Payoff g = max(A − K, 0). The average evolves continuously
    (no value jumps, unlike the barrier monitor), so BOTH objectives
    apply. The exact oracle is ``numerics.discrete_bsde_value`` over the
    identical chain; a classical cross-check is the geometric-average
    closed form (the arithmetic value sits above it by Jensen).
    """

    r: float = 0.05
    sigma_bar: float = 0.2
    strike: float = 1.0
    N_samples: int = 50  # must equal the Trainer's N (1/N weight per step)
    name: str = "AsianCall"

    @property
    def dim(self) -> int:
        return 2

    @property
    def has_post_step(self) -> bool:
        return True

    @property
    def x0(self) -> Array:
        return jnp.asarray([1.0, 0.0], dtype=jnp.float32)

    def post_step(self, t, X):
        S, A = X[..., 0:1], X[..., 1:2]
        return jnp.concatenate([S, A + S / self.N_samples], axis=-1)

    def mu(self, t, X, Y, Z):
        return jnp.concatenate(
            [self.r * X[..., 0:1], jnp.zeros_like(X[..., 1:2])], axis=-1
        )

    def sigma(self, t, X, Y):
        return jnp.concatenate(
            [self.sigma_bar * X[..., 0:1], jnp.zeros_like(X[..., 1:2])],
            axis=-1,
        )

    def phi(self, t, X, Y, Z):
        return self.r * Y

    def g(self, X):
        return jnp.maximum(X[..., 1:2] - self.strike, 0.0)


@dataclasses.dataclass(frozen=True)
class LookbackCallOption(PDEProblem):
    """Discretely-monitored floating-strike lookback call — path-dependent
    via the :meth:`post_step` hook (no reference counterpart).

    State X = (S, m): GBM underlying plus the RUNNING MINIMUM over the
    monitoring dates, m ← min(m, S) at each step (m0 = S0). Payoff
    g = S_N − m_N ≥ 0 (buy at the observed low). min() is continuous and
    piecewise-smooth, so gradients flow without smoothing and both
    objectives apply. Exact oracle: ``numerics.discrete_bsde_value`` over
    the identical chain.
    """

    r: float = 0.05
    sigma_bar: float = 0.2
    name: str = "LookbackCall"

    @property
    def dim(self) -> int:
        return 2

    @property
    def has_post_step(self) -> bool:
        return True

    @property
    def x0(self) -> Array:
        return jnp.asarray([1.0, 1.0], dtype=jnp.float32)

    def post_step(self, t, X):
        S, m = X[..., 0:1], X[..., 1:2]
        return jnp.concatenate([S, jnp.minimum(m, S)], axis=-1)

    def mu(self, t, X, Y, Z):
        return jnp.concatenate(
            [self.r * X[..., 0:1], jnp.zeros_like(X[..., 1:2])], axis=-1
        )

    def sigma(self, t, X, Y):
        return jnp.concatenate(
            [self.sigma_bar * X[..., 0:1], jnp.zeros_like(X[..., 1:2])],
            axis=-1,
        )

    def phi(self, t, X, Y, Z):
        return self.r * Y

    def g(self, X):
        return X[..., 0:1] - X[..., 1:2]


@dataclasses.dataclass(frozen=True)
class CallOptionND(PDEProblem):
    """nD call in BSB form: phi = r(Y − ΣXZ), g = max(ΣX − K, 0),
    mu = r·X, sigma = σ̄·diag(X); r = 0.05, σ̄ = 0.20, K = 1.0·D
    (reference ``nd_BSPDE_case.py:503-539``).

    Semantics note: combining the BSB-form driver r(Y − X·Z) with drift r·X
    gives the PDE u_t + 2r·X·Du + ½σ̄²X²D²u − r·u = 0, i.e. the option value
    is e^{−rT}·E[g(X_T)] with X simulated at drift **2r** — NOT the plain
    Black–Scholes price at drift r that the reference compares against
    (``nd_BSPDE_case.py:621-658``). Verified numerically: the trained Y0
    converges to the drift-2r Monte-Carlo value (tests/test_convergence.py).
    Use :class:`BasketCallOption` (driver r·Y) for standard risk-neutral
    pricing semantics.
    """

    D: int = 100
    r: float = 0.05
    sigma_bar: float = 0.20
    strike: Optional[float] = None
    name: str = "CallOptionND"

    @property
    def dim(self) -> int:
        return self.D

    @property
    def K(self) -> float:
        return 1.0 * self.D if self.strike is None else self.strike

    @property
    def x0(self) -> Array:
        return _ones_x0(self.D)

    def mu(self, t, X, Y, Z):
        return self.r * X

    def sigma(self, t, X, Y):
        return self.sigma_bar * X

    def phi(self, t, X, Y, Z):
        return self.r * (Y - jnp.sum(X * Z, axis=-1, keepdims=True))

    def g(self, X):
        return jnp.maximum(jnp.sum(X, axis=-1, keepdims=True) - self.K, 0.0)


@dataclasses.dataclass(frozen=True)
class BasketCallOption(PDEProblem):
    """Basket call: phi = r·Y, g = max(mean(X) − K, 0), mu = r·X,
    sigma = σ̄·diag(X); r = 0.05, σ̄ = 0.20, K = 1.0
    (reference ``hjb_implement.py:543-586``, ``high_dimension_test.py:603-646``,
    ``with_corr_high_dimension_pde.py:546-596``).

    Correlated Brownian increments (reference
    ``with_corr_high_dimension_pde.py:339-341``) are handled by the path
    engine (``dnnpde_tpu.sim``) via a Cholesky factor, not by the problem.
    """

    D: int = 100
    r: float = 0.05
    sigma_bar: float = 0.20
    strike: float = 1.0
    weights: Optional[tuple] = None  # None → equal-weight mean basket
    name: str = "BasketCallOption"

    def __post_init__(self):
        if self.weights is not None and len(self.weights) != self.D:
            raise ValueError(
                f"weights must have length D={self.D}, got {len(self.weights)}"
            )

    @property
    def dim(self) -> int:
        return self.D

    @property
    def x0(self) -> Array:
        return jnp.ones((self.D,), dtype=jnp.float32)

    def mu(self, t, X, Y, Z):
        return self.r * X

    def sigma(self, t, X, Y):
        return self.sigma_bar * X

    def phi(self, t, X, Y, Z):
        return self.r * Y

    def g(self, X):
        if self.weights is not None:
            w = jnp.asarray(self.weights, X.dtype)
            basket = jnp.sum(X * w, axis=-1, keepdims=True)
        else:
            basket = jnp.mean(X, axis=-1, keepdims=True)
        return jnp.maximum(basket - self.strike, 0.0)


@dataclasses.dataclass(frozen=True)
class BSPDETestCase(PDEProblem):
    """BSB test case with drift: phi = r(Y − ΣXZ), g = ΣX², mu = r·X,
    sigma = σ̄·diag(X) (reference ``with_corr_high_dimension_pde.py:599-616``).

    NOTE — reference oracle bug, not replicated by default: the reference
    reuses the μ=0 BSB closed form ``e^{(r+σ̄²)(T−t)}ΣX²``
    (``with_corr_high_dimension_pde.py:1594-1595``), but with drift r·X the
    PDE is u_t + 2r·X·Du + ½σ̄²X²D²u − r·u = 0, whose solution is
    ``e^{(3r+σ̄²)(T−t)}ΣX²`` (substitute u = A(t)ΣX²: A′ = −(3r+σ̄²)A).
    Verified numerically: the trained Y0 matches the corrected exponent to
    0.14% and misses the reference's formula by 10%
    (tests/test_convergence.py). Use :meth:`reference_exact_solution` for
    side-by-side parity with the reference's number.
    """

    D: int = 100
    r: float = 0.05
    sigma_bar: float = 0.20
    name: str = "BSPDETestCase"

    @property
    def dim(self) -> int:
        return self.D

    @property
    def x0(self) -> Array:
        return _ones_x0(self.D)

    def mu(self, t, X, Y, Z):
        return self.r * X

    def sigma(self, t, X, Y):
        return self.sigma_bar * X

    def phi(self, t, X, Y, Z):
        return self.r * (Y - jnp.sum(X * Z, axis=-1, keepdims=True))

    def g(self, X):
        return jnp.sum(X**2, axis=-1, keepdims=True)

    def exact_solution(self, t, X):
        return jnp.exp((3 * self.r + self.sigma_bar**2) * (self.T - t)) * jnp.sum(
            X**2, axis=-1, keepdims=True
        )

    def reference_exact_solution(self, t, X):
        """The reference's (incorrect for μ=r·X) μ=0 BSB formula."""
        return jnp.exp((self.r + self.sigma_bar**2) * (self.T - t)) * jnp.sum(
            X**2, axis=-1, keepdims=True
        )


@dataclasses.dataclass(frozen=True)
class HamiltonJacobiBellman(PDEProblem):
    """HJB equation: phi = ‖Z‖², g = log(½ + ½‖X‖²), mu = 0, sigma = √2·I
    (reference ``hjb_implement.py:590-604``). The exact solution
    u(t,x) = −log E[exp(−g(x + √(2(T−t))·W))] is a Monte-Carlo oracle
    (``hjb_implement.py:1088-1096``) provided in ``dnnpde_tpu.numerics``.
    """

    D: int = 100
    name: str = "HamiltonJacobiBellman"

    @property
    def dim(self) -> int:
        return self.D

    @property
    def x0(self) -> Array:
        return jnp.zeros((self.D,), dtype=jnp.float32)

    def mu(self, t, X, Y, Z):
        return jnp.zeros_like(X)

    def sigma(self, t, X, Y):
        return jnp.full_like(X, jnp.sqrt(2.0))

    def phi(self, t, X, Y, Z):
        return jnp.sum(Z**2, axis=-1, keepdims=True)

    def g(self, X):
        return jnp.log(0.5 + 0.5 * jnp.sum(X**2, axis=-1, keepdims=True))
