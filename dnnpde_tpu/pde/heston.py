"""Heston stochastic-volatility PDE problem.

2-factor state X = (S, v): CIR variance drift, 2×2 correlated diffusion
(reference ``heston_dnnpde.py:519-659``):

  mu    = [r·S, κ(θ − v)]                       (clamped to ±100, :587-591)
  sigma = [[√v·S,   ρ·σ_v·√v],
           [ρ·√v·S, σ_v·√v  ]]                  (clamped to ±100, :593-605)
  phi   = r·Y                                    (:607-609)
  g     = max(S − K, 0)  or  sigmoid-smoothed    (:546-558, alpha = 10)

Fits the generic solver contract: the network takes (t, S, v) (state dim 2 →
input width 3 naturally — the reference patches torch layer objects instead,
``heston_dnnpde.py:532-541``), Z = ∇ₓu = (∂u/∂S, ∂u/∂v), and the terminal
gradient penalty applies only to Z_S via ``z_penalty_mask``
(``heston_dnnpde.py:654``). The network output is clamped to u ≥ 0
(``heston_dnnpde.py:568``) via ``clamp_u``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

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
    # Reference semantics clamp the network output to u ≥ 0 during training
    # (heston_dnnpde.py:568). The clamp has an ABSORBING state: if training
    # drives u all-negative, max(u, 0) zeroes u, Z, φ=rY AND every gradient
    # (measured: ~1/3 of 20k-iteration anneals collapse to u≡0 — the same
    # mode as the reference's degenerate M=2 run). clamp_output=False removes
    # the training-time clamp — measured: 0/5 collapses across seeds and
    # M ∈ {128,256,512} (vs ~1/3 clamped), at the cost of a 2.4–5.3% low
    # bias at the 20k-iteration budget (clamped non-collapsed runs reach
    # 0.75–1.9%); see BENCH_REPORT_r2.jsonl "heston_clamp_tradeoff".
    clamp_output: bool = True
    # How u ≥ 0 is enforced (requires clamp_output; all three non-anchor
    # variants measured in BENCH_REPORT_r2.jsonl):
    # - "hard": reference max(u, 0) — best accuracy when it survives
    #   (0.75–1.9% at the 20k anneal) but u≡0 is an ABSORBING state
    #   (~1/3 of (M, seed) runs collapse).
    # - "softplus": smooth positivity, no absorbing state, but 2/3 of seeds
    #   trap in a ~34%-high basin ("heston_softplus_clamp" rows).
    # - "anchor" (DEFAULT, round 3): payoff-anchored parametrization
    #       u = floor(t,S) + √((T−t)/T) · softplus(raw + anchor_shift)
    #   with floor = max(S − K·e^{−r(T−t)}, 0), the European-call lower
    #   bound. Collapse is structurally impossible (u ≥ floor > 0 at the
    #   money), the √τ factor makes the terminal condition EXACT by
    #   construction (u(T,·) = floor(T,·) = g, ∂u/∂S|_T = Dg a.e. — both
    #   terminal penalties vanish identically), and the head learns only
    #   the time value, which scales as √τ for at-the-money options — so
    #   the required head magnitude is O(1) uniformly in t. Measured
    #   (BENCH_REPORT_r3.jsonl "heston_anchor", "heston_diag"): 0 collapses
    #   over every (M, seed, N) tried, with seed spread ~0.3% — tight
    #   enough to EXPOSE the Euler BSDE recursion's own O(dt) bias
    #   (+7.9%/+4.3%/+2.1% vs the closed form at N=25/50/100; the same
    #   recursion the reference uses). First-order Richardson over
    #   (N, 2N) cancels it to ~0.1–0.5% (train/extrapolation.py).
    clamp_smoothing: str = "anchor"  # "hard" | "softplus" | "anchor"
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
    name: str = "Heston"

    @property
    def dim(self) -> int:
        return 2

    @property
    def sigma_kind(self) -> str:
        return "full"

    @property
    def clamp_u(self) -> Optional[float]:
        return 0.0 if self.clamp_output else None

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
        if self.clamp_smoothing != "anchor" or not self.clamp_output:
            return super().transform_u(t, X, u)
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
        row0 = jnp.stack([sig_s, self.rho * sig_v], axis=-1)
        row1 = jnp.stack([self.rho * sig_s, sig_v], axis=-1)
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
