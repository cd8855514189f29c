"""Heston stochastic-volatility PDE problem.

2-factor state X = (S, v): CIR variance drift, 2×2 correlated diffusion
(reference ``heston_dnnpde.py:519-659``):

  mu    = [r·S, κ(θ − v)]                       (clamped to ±100, :587-591)
  sigma = Cholesky factor of the Heston covariance (default; the
          reference's matrix ``[[√v·S, ρσ_v√v], [ρ√v·S, σ_v√v]]``
          (:593-605) is NOT a factor of that covariance — reference
          bug #4, kept available as ``diffusion="reference"``; see the
          ``diffusion`` field)
  phi   = r·Y                                    (:607-609)
  g     = max(S − K, 0)  or  sigmoid-smoothed    (:546-558, alpha = 10)

Fits the generic solver contract: the network takes (t, S, v) (state dim 2 →
input width 3 naturally — the reference patches torch layer objects instead,
``heston_dnnpde.py:532-541``), Z = ∇ₓu = (∂u/∂S, ∂u/∂v), and the terminal
gradient penalty applies only to Z_S via ``z_penalty_mask``
(``heston_dnnpde.py:654``). The reference clamps the network output to u ≥ 0
(``heston_dnnpde.py:568``); the clamp's kink was measured to bias the
trained price +5…+6% high and its u≡0 state absorbs ~1/3 of long anneals
(see ``clamp_output``). The DEFAULT here (since round 4) is the BS
control-variate head ``clamp_smoothing="bs"`` — anchor-point parity with
the plain output plus production-grade greeks (Γ rel-L2 ≈ 0.02 with the
local objective; ARCHITECTURE.md §6d). The round-3 plain output stays
available via ``clamp_output=False``; reference semantics via
``clamp_output=True, clamp_smoothing="hard"``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from dnnpde_tpu.pde.base import Array, PDEProblem


@dataclasses.dataclass(frozen=True)
class HestonPDE(PDEProblem):
    """Heston FBSNN problem (reference defaults κ=2, θ=0.2, σ_v=0.3, ρ=0.8,
    v0=0.2, r=0.05, K=strike=1.0, S0=1.0)."""

    S0: float = 1.0
    v0: float = 0.2
    r: float = 0.05
    kappa: float = 2.0
    theta: float = 0.2
    sigma_v: float = 0.3
    rho: float = 0.8
    strike: float = 1.0
    payoff_type: str = "discontinuous"  # or "continuous" (sigmoid-smoothed)
    smoothing_alpha: float = 10.0
    clamp_bound: float = 100.0
    # Output parametrization — DEFAULT (round 4): the BS CONTROL-VARIATE
    # head, clamp_output=True + clamp_smoothing="bs". Promoted per the
    # round-4 measurements (results_r4/, VERDICT r3 #3): at the anchor it
    # matches the plain output (9/9 acceptance runs, 0 collapses, rels
    # +0.21…+0.43%) and it is the ONLY mode with production-grade greeks —
    # Γ rel-L2 0.02 at t ∈ {0, 0.5} with the local objective (plain: 0.25
    # at t=0, 0.99–2.04 at t=0.5). Its round-3 blocker (337 s first
    # compile) fell to ~13 s with the tanh-CDF base (``bs_cdf``).
    #
    # The full round-2/3 shoot-out that ruled the other modes (all under
    # the corrected Cholesky diffusion, 20k anneal, M=128, 3 seeds each):
    #
    # - plain (clamp_output=False): +0.49%/+0.10%/+0.12% vs the Heston
    #   closed form, 0 collapses (0/8 across rounds 2–3). Gradients never
    #   vanish, so there is no absorbing state to collapse into. The
    #   round-3 default; still the measured-parity control.
    # - "hard" max(u, 0) (reference semantics, heston_dnnpde.py:568):
    #   +5.3…+6.3% biased HIGH, and u ≡ 0 is an ABSORBING state (zero
    #   gradient below the clamp) — ~1/3 of round-2/3 long anneals died
    #   in it. The bias mechanism: the clamp embeds a kink along the
    #   u = 0 level set at every t, but the true solution is smooth for
    #   t < T; the spurious Γ-singularity feeds the BSDE residuals and
    #   the optimizer deforms u upward to suppress it.
    # - "softplus": still collapsible at β=50 (softplus(βu)/β has ~zero
    #   gradient for u ≲ −0.1 — seed 0 died) and +5.6% high otherwise.
    # - "anchor" (the round-3 interim fix): u = max(S − K·e^{−rτ}, 0) +
    #   √(τ/T)·softplus(raw + shift). Collapse structurally impossible and
    #   the terminal condition exact by construction — but the floor bakes
    #   its kink (at S = K·e^{−rτ}) into u at ALL t < T where the true
    #   solution is smooth, and the measured cost is a +7.8…+10.5%
    #   parametrization bias (isolated: it persists at σ_v → 0 and ρ = 0,
    #   so it is the parametrization, not the dynamics). Round 3's earlier
    #   "+4.3% at N=50" reading was this bias partially cancelled by the
    #   reference-diffusion model pricing −3.6% below the Heston closed
    #   form (see ``diffusion``).
    clamp_output: bool = True
    # Output transform when clamp_output=True — see the measured tradeoffs
    # above. "bs" (DEFAULT since round 4) is the BS CONTROL-VARIATE
    # parametrization (not a clamp): u = BS(S, K, τ, √v) + √(τ/T)·raw —
    # smooth for τ > 0, terminal condition exact, the Γ-peak carried
    # analytically (see transform_u). "anchor" remains the safest
    # positivity-ENFORCING mode (collapse impossible); "hard" is
    # reference parity.
    clamp_smoothing: str = "bs"  # "hard" | "softplus" | "anchor" | "bs"
    # Normal-CDF implementation inside the "bs" control-variate base:
    # "tanh" (default) is the GELU-style smooth approximation (≈3e-4 CDF
    # accuracy → ≤2e-4 base-price error, absorbed by the net) whose
    # 20k-iter training program compiles in ~13 s on the v5e where the
    # exact erf form takes ~143 s (round-4 measurement — the blocker that
    # kept bs-mode off the default in round 3, VERDICT r3 #3/weak #7).
    # "erf" keeps the exact base. Training, serving and greeks all read
    # this same transform (transform_u is the single source of truth).
    bs_cdf: str = "tanh"  # "tanh" | "erf"
    smooth_beta: float = 50.0
    # Anchor-head init prior: softplus(anchor_shift) is the head's output
    # scale at a zero-init net; −2 → 0.127, matching the flagship's ATM
    # time value ≈ 0.15 (oracle 0.198 − floor 0.049).
    anchor_shift: float = -2.0
    # Head time-scaling: "sqrt" multiplies the head by √((T−t)/T) — exact
    # terminal condition, head magnitude O(1) in t (ATM time value scales
    # as √τ) — "none" leaves the head unscaled (terminal condition learned
    # through the penalties, as in the reference).
    anchor_time_scale: str = "sqrt"  # "sqrt" | "none"
    # Which 2×2 diffusion matrix drives (S, v) — REFERENCE BUG #4
    # (discovered round 3 via the discrete-BSDE forward oracle,
    # numerics/discrete_bsde.py):
    #
    # - "cholesky" (DEFAULT): the lower-triangular Cholesky factor of the
    #   Heston covariance,
    #       L = [[√v·S, 0], [ρ·σ_v·√v, σ_v·√v·√(1−ρ²)]],
    #   so L·Lᵀ = [[v·S², ρ·σ_v·v·S], [ρ·σ_v·v·S, σ_v²·v]] — the actual
    #   Heston model the closed-form oracle prices. Measured: the exact
    #   discrete value D(N) = E[g(X_N)]/(1+rΔt)^N lands within MC noise of
    #   the closed form already at N=25 (+0.5% → +0.1% by N=200).
    # - "reference": the matrix the reference builds
    #   (``heston_dnnpde.py:593-605``),
    #       σ = [[√v·S, ρ·σ_v·√v], [ρ·√v·S, σ_v·√v]],
    #   which is NOT a factor of the Heston covariance: σσᵀ has
    #   Var(dv) = (ρ²·v·S² + σ_v²·v)dt ≈ 8× the Heston σ_v²·v·dt at the
    #   defaults, and corr(dS, dv) ≈ 0.99 instead of ρ = 0.8 — a nearly
    #   singular diffusion. The model the reference actually simulates is
    #   therefore not Heston; its continuum price, measured by tight
    #   forward MC (BENCH_REPORT_r3.jsonl "heston_discrete_value"), is
    #   0.1910–0.1912 = −3.6…−3.7% BELOW the Heston closed form the
    #   reference compares against (which it also mis-discounts — bug #1).
    diffusion: str = "cholesky"  # "cholesky" | "reference"
    name: str = "Heston"

    @property
    def dim(self) -> int:
        return 2

    @property
    def sigma_kind(self) -> str:
        return "full"

    @property
    def clamp_u(self) -> Optional[float]:
        # "bs" is a control-variate head, not a clamp: u can take any value
        # and there is no absorbing level set, so the collapse machinery
        # (Trainer._collapsed_y0) must not treat u≈0 as pinned.
        if self.clamp_output and self.clamp_smoothing != "bs":
            return 0.0
        return None

    @property
    def has_output_transform(self) -> bool:
        # clamp_u is None for the "bs" head (no clamp), but the transform
        # is still non-identity — fused_net_u and serving must know.
        return self.clamp_output

    @property
    def clamp_mode(self) -> str:
        return self.clamp_smoothing

    @property
    def clamp_beta(self) -> float:
        return self.smooth_beta

    def intrinsic_floor(self, t: Array, X: Array) -> Array:
        """European-call lower bound max(S − K·e^{−r(T−t)}, 0), (M, 1).

        The hard max is deliberate: the floor has no trainable parameters
        behind it, so its kink cannot create an absorbing state, while a
        softplus-smoothed floor would bias u UP by ≈ln2/β exactly at the
        near-the-money region we price (measured +0.9% of the oracle at
        β=50, S0=1)."""
        S = X[..., 0:1]
        return jnp.maximum(S - self.strike * jnp.exp(-self.r * (self.T - t)), 0.0)

    def transform_u(self, t: Array, X: Array, u: Array) -> Array:
        if not self.clamp_output or self.clamp_smoothing not in (
            "anchor", "bs"
        ):
            return super().transform_u(t, X, u)
        if self.clamp_smoothing == "bs":
            # Black–Scholes CONTROL-VARIATE parametrization:
            #     u = BS(S, K, τ, σ=√v) + √(τ/T)·raw
            # BS at σ=√v is the leading-order Heston price; it is C∞ for
            # τ > 0 (unlike the intrinsic-value anchor, whose kink biased
            # the trained price +8–10% high) and equals the payoff EXACTLY
            # at τ = 0 (BS(τ=0) = max(S−K, 0) = g, ∂S BS(τ=0) = Dg a.e.),
            # so both terminal penalties vanish by construction. The net
            # learns only the (small, smooth) stochastic-vol correction —
            # in particular the Γ-peak is carried analytically by the BS
            # base instead of being fit by a smooth MLP (the measured
            # ~2-volpt surface-mode IV floor of the plain output,
            # ARCHITECTURE.md §6c). The √τ factor keeps the correction
            # from violating terminal exactness; its sign is free.
            from dnnpde_tpu.numerics.black_scholes import black_scholes_call

            S, v = X[..., 0:1], X[..., 1:2]
            tau = jnp.clip(self.T - t, 0.0, None)
            sig = jnp.sqrt(jnp.clip(v, 1e-8, None))
            base = black_scholes_call(
                S, self.strike, tau, self.r, sig, cdf=self.bs_cdf
            )
            return base + jnp.sqrt(tau / self.T) * u
        head = jax.nn.softplus(u + self.anchor_shift)
        if self.anchor_time_scale == "sqrt":
            tau = jnp.clip((self.T - t) / self.T, 0.0, None)
            head = jnp.sqrt(tau) * head
        return self.intrinsic_floor(t, X) + head

    @property
    def z_penalty_mask(self) -> Optional[Array]:
        return jnp.array([1.0, 0.0], dtype=jnp.float32)

    @property
    def x0(self) -> Array:
        return jnp.array([self.S0, self.v0], dtype=jnp.float32)

    def mu(self, t, X, Y, Z):
        S, v = X[..., 0:1], X[..., 1:2]
        mu_s = self.r * S
        mu_v = self.kappa * (self.theta - v)
        out = jnp.concatenate([mu_s, mu_v], axis=-1)
        return jnp.clip(out, -self.clamp_bound, self.clamp_bound)

    def sigma(self, t, X, Y):
        S, v = X[..., 0], X[..., 1]
        sqrt_v = jnp.sqrt(jnp.clip(v, 1e-8, None))
        sig_s = sqrt_v * S
        sig_v = self.sigma_v * sqrt_v
        if self.diffusion == "cholesky":
            # True Heston: L·Lᵀ = [[vS², ρσ_v vS], [ρσ_v vS, σ_v² v]].
            row0 = jnp.stack([sig_s, jnp.zeros_like(sig_s)], axis=-1)
            row1 = jnp.stack(
                [self.rho * sig_v,
                 float(np.sqrt(1.0 - self.rho**2)) * sig_v],
                axis=-1,
            )
        elif self.diffusion == "reference":
            # Reference matrix (heston_dnnpde.py:593-605) — not a Heston
            # factorization; see the ``diffusion`` field docstring.
            row0 = jnp.stack([sig_s, self.rho * sig_v], axis=-1)
            row1 = jnp.stack([self.rho * sig_s, sig_v], axis=-1)
        else:
            raise ValueError(
                f"diffusion must be 'cholesky' or 'reference', "
                f"got {self.diffusion!r}"
            )
        out = jnp.stack([row0, row1], axis=-2)  # (M, 2, 2)
        return jnp.clip(out, -self.clamp_bound, self.clamp_bound)

    def phi(self, t, X, Y, Z):
        return self.r * Y

    def g(self, X):
        S = X[..., 0:1]
        if self.payoff_type == "discontinuous":
            return jnp.maximum(S - self.strike, 0.0)
        elif self.payoff_type == "continuous":
            # z·sigmoid(αz): same function as the reference's
            # z/(1+exp(−αz)) (heston_dnnpde.py:555) but numerically stable —
            # the naive form overflows exp() for large |z| and its VJP
            # produces inf·0 = NaN, killing training.
            z = S - self.strike
            return z * jax.nn.sigmoid(self.smoothing_alpha * z)
        raise ValueError(
            "Invalid payoff_type; choose 'discontinuous' or 'continuous'."
        )


@dataclasses.dataclass(frozen=True)
class HestonAmericanPut(HestonPDE):
    """American (Bermudan-N) put under HESTON dynamics — optimal stopping
    composed with stochastic volatility, a problem class neither piece of
    the reference can touch (no early exercise anywhere,
    ``1d_BSPDE_case.py:246-289``; and no binomial tree exists for Heston,
    so even the classical oracle must change: the matching oracle here is
    ``numerics.lsmc_value`` — Longstaff–Schwartz on the solver's exact
    Euler chain, the same scheme-vs-optimization separation as
    ``numerics.discrete_bsde``).

    Inherits the corrected Cholesky diffusion and the round-4 BS
    control-variate machinery from :class:`HestonPDE`; overrides the
    payoff to a put and the bs head to the BS PUT base via put–call
    parity on the same tanh-CDF call,

        u_cont = BS_put(S, K, τ, √v) + √(τ/T)·raw,

    which is exact at τ=0 (both terminal penalties vanish) and carries
    the payoff kink analytically; the net learns the smooth stochastic-
    vol correction PLUS the early-exercise premium (sign-free: the true
    continuation can sit above or below the BS-at-√v base, so the
    softplus-positive head of the GBM ``AmericanPutOption`` would be
    mis-specified here). Requires ``Trainer(objective="local")`` — the
    per-step detached target is clamped at the payoff (reflected
    BSDE / Snell recursion), and the served value is
    ``max(g, u)`` (:meth:`PDEProblem.value_u`).
    """

    name: str = "HestonAmericanPut"

    @property
    def early_exercise(self) -> bool:
        return True

    def g(self, X):
        S = X[..., 0:1]
        return jnp.maximum(self.strike - S, 0.0)

    def transform_u(self, t: Array, X: Array, u: Array) -> Array:
        if not self.clamp_output or self.clamp_smoothing != "bs":
            # plain output (control arm) or inherited legacy modes on the
            # CALL payoff make no sense for the put — restrict to bs/plain
            if self.clamp_output:
                raise ValueError(
                    "HestonAmericanPut supports clamp_output=False (plain) "
                    "or the default bs head only"
                )
            return u
        from dnnpde_tpu.numerics.black_scholes import black_scholes_call

        S, v = X[..., 0:1], X[..., 1:2]
        tau = jnp.clip(self.T - t, 0.0, None)
        sig = jnp.sqrt(jnp.clip(v, 1e-8, None))
        call = black_scholes_call(
            S, self.strike, tau, self.r, sig, cdf=self.bs_cdf
        )
        put = call - S + self.strike * jnp.exp(-self.r * tau)
        return put + jnp.sqrt(tau / self.T) * u
