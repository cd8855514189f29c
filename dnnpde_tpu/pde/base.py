"""PDE problem interface for the deep-BSDE solver.

A problem defines the semilinear parabolic PDE

    u_t + ½ Tr[σσᵀ D²u] + μ·Du = φ(t, X, u, σᵀDu),   u(T, X) = g(X)

through four batched pure functions (the reference's abstract methods
``phi_tf/g_tf/mu_tf/sigma_tf``, ``1d_BSPDE_case.py:466-508``). Problems here
are *data + pure functions* (frozen dataclasses), not stateful subclasses —
this removes the 5×-copy-paste drift documented in SURVEY.md §1 and keeps
everything jit-traceable.

Shape conventions (batch M, state dim D, noise dim Dw):
  t: (M, 1)   X: (M, D)   Y: (M, 1)   Z: (M, D)
  mu    → (M, D)
  sigma → (M, D)        when ``sigma_kind == "diag"`` (diagonal diffusion —
                         the common case; avoids materializing M×D×D, per
                         SURVEY.md §7 "diag_embed → elementwise multiply")
        → (M, D, Dw)    when ``sigma_kind == "full"`` (e.g. Heston 2×2 with ρ)
  phi   → (M, 1)
  g     → (M, 1)
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


@dataclasses.dataclass(frozen=True)
class PDEProblem:
    """Base problem. Subclasses override the dynamics/generator methods.

    Attributes:
      dim: state dimension D.
      noise_dim: Brownian dimension Dw (== dim unless overridden).
      T: terminal time.
      x0: initial state, shape (D,).
      sigma_kind: "diag" | "full" — shape contract of :meth:`sigma`.
      clamp_u: if set, network output u is clamped to [clamp_u, ∞) — used by
        the Heston problem (reference ``heston_dnnpde.py:568``).
      z_penalty_mask: optional (D,) 0/1 mask selecting which components of Z
        enter the terminal gradient penalty (Heston penalizes only Z_S,
        reference ``heston_dnnpde.py:654``). None → all components.
    """

    T: float = 1.0
    name: str = "pde"

    # --- static problem metadata (overridden per subclass) -----------------
    @property
    def dim(self) -> int:
        raise NotImplementedError

    @property
    def noise_dim(self) -> int:
        return self.dim

    @property
    def sigma_kind(self) -> str:
        return "diag"

    @property
    def clamp_u(self) -> Optional[float]:
        return None

    @property
    def clamp_mode(self) -> str:
        """How :attr:`clamp_u` is applied: "hard" = max(u, clamp_u)
        (reference semantics, zero gradient below the clamp — an absorbing
        state under training); "softplus" = clamp_u + softplus(β(u−c))/β
        (smooth positivity, nonzero gradient everywhere; β =
        :attr:`clamp_beta`)."""
        return "hard"

    @property
    def clamp_beta(self) -> float:
        """Sharpness β of the softplus clamp (bias at the floor ≈ ln2/β)."""
        return 50.0

    @property
    def z_penalty_mask(self) -> Optional[Array]:
        return None

    @property
    def has_post_step(self) -> bool:
        """True when :meth:`post_step` is not the identity."""
        return False

    def post_step(self, t: Array, X: Array) -> Array:
        """Post-transition state map applied after EVERY Euler step — in
        the training rollout (``solver/bsde.py::em_step``) and in the
        discrete-BSDE oracle chain (``numerics/discrete_bsde.py``), so the
        two transition kernels can never diverge. Identity by default.
        Path-dependent payoffs ride on it: e.g. the discretely-monitored
        barrier problems decay an ALIVE indicator coordinate at each
        monitoring date (:class:`~dnnpde_tpu.pde.UpAndOutCall`). Must be
        jit-traceable and differentiable if training should see barrier
        gradients (use a smoothed indicator)."""
        return X

    @property
    def early_exercise(self) -> bool:
        """True for optimal-stopping (American/Bermudan) problems. The
        local objective then clamps every per-step regression target at the
        payoff — the discrete reflected-BSDE / Snell-envelope recursion
        V_k = max(g(X_k), E_k[V_{k+1}] − φΔt) — so the net learns the
        CONTINUATION value and the served value is :meth:`value_u`.
        Requires ``objective="local"`` (the global summed-residual rollout
        has no per-step regression to reflect). Beyond-reference: the
        reference has no early-exercise support anywhere."""
        return False

    @property
    def exercise_every(self) -> int:
        """Exercise-date spacing IN SOLVER STEPS for early-exercise
        problems: exercise is allowed at grid indices n = k, 2k, …, N
        (maturity always included; immediate exercise at t=0 is the
        outer ``max(g(x0), ·)`` read). 1 (default) = Bermudan-N with a
        date at every step; k > 1 prices a Bermudan contract with N/k
        dates on an N-step chain (e.g. the Broadie–Glasserman max-call
        benchmark: 9 dates on a 45-step grid). The solver requires
        N % exercise_every == 0."""
        return 1

    def value_u(self, X: Array, u: Array) -> Array:
        """Served VALUE given the net's output u at (t, X): identity for
        European-style problems; the Snell-envelope read max(g(X), u) for
        early-exercise problems (u is the learned continuation)."""
        return jnp.maximum(self.g(X), u) if self.early_exercise else u

    @property
    def x0(self) -> Array:
        raise NotImplementedError

    # --- output transform ----------------------------------------------------
    @property
    def has_output_transform(self) -> bool:
        """True when :meth:`transform_u` is not the identity."""
        return self.clamp_u is not None

    def transform_u(self, t: Array, X: Array, u: Array) -> Array:
        """Map the RAW network output to the solution value u(t, X).

        Single source of truth for the output parametrization — applied
        identically in training (``solver.bsde.make_net_u``), serving
        (``serve.export``) and greeks, so the served u/Z can never disagree
        with the training-side net_u. Default: the :attr:`clamp_u` /
        :attr:`clamp_mode` clamp (reference ``heston_dnnpde.py:568``);
        problems may override for richer parametrizations (e.g. the
        payoff-anchored Heston head, :class:`~dnnpde_tpu.pde.HestonPDE`).
        Must stay differentiable-through: Z = ∇ₓ(transform_u∘net)."""
        c = self.clamp_u
        if c is None:
            return u
        mode = self.clamp_mode
        if mode == "softplus":
            return c + jax.nn.softplus(self.clamp_beta * (u - c)) / self.clamp_beta
        if mode == "hard":
            return jnp.maximum(u, c)
        raise ValueError(f"unknown clamp_mode {mode!r}")

    # --- dynamics / generator ----------------------------------------------
    def mu(self, t: Array, X: Array, Y: Array, Z: Array) -> Array:
        """SDE drift, (M, D)."""
        raise NotImplementedError

    def sigma(self, t: Array, X: Array, Y: Array) -> Array:
        """SDE diffusion, (M, D) diag or (M, D, Dw) full."""
        raise NotImplementedError

    def phi(self, t: Array, X: Array, Y: Array, Z: Array) -> Array:
        """BSDE generator (driver), (M, 1)."""
        raise NotImplementedError

    def g(self, X: Array) -> Array:
        """Terminal condition, (M, 1)."""
        raise NotImplementedError

    def Dg(self, X: Array) -> Array:
        """Gradient of the terminal condition w.r.t. X, (M, D).

        Default: autodiff of :meth:`g` (reference ``Dg_tf``,
        ``1d_BSPDE_case.py:231-243``). Since g is applied per-sample, the
        grad-of-sum trick yields the batched Jacobian in one reverse pass.
        """
        return jax.grad(lambda x: jnp.sum(self.g(x)))(X)

    # --- optional oracle -----------------------------------------------------
    def exact_solution(self, t: Array, X: Array) -> Optional[Array]:
        """Closed-form u(t, X) when known, else None."""
        return None

    @property
    def has_exact_solution(self) -> bool:
        z = jnp.zeros((1, self.dim))
        return self.exact_solution(jnp.zeros((1, 1)), z) is not None

    # --- diffusion application helpers (used by the solver & simulators) ----
    def sigma_dw(self, sig: Array, dW: Array) -> Array:
        """Apply diffusion to a Brownian increment: σ·ΔW, (M, D)."""
        if self.sigma_kind == "diag":
            return sig * dW
        return jnp.einsum("mij,mj->mi", sig, dW)

    def z_sigma_dw(self, Z: Array, sig: Array, dW: Array) -> Array:
        """BSDE martingale term Zᵀ(σ·ΔW) summed over dims, (M, 1)."""
        return jnp.sum(Z * self.sigma_dw(sig, dW), axis=-1, keepdims=True)


@dataclasses.dataclass(frozen=True)
class CallableProblem(PDEProblem):
    """Problem assembled from plain functions (user extension / tests).

    The dynamics fields use ``_fn`` suffixes so they cannot shadow the
    :class:`PDEProblem` methods they implement.
    """

    dim_: int = 1
    sigma_kind_: str = "diag"
    x0_: tuple = (1.0,)
    mu_fn: Optional[Callable] = None
    sigma_fn: Optional[Callable] = None
    phi_fn: Optional[Callable] = None
    g_fn: Optional[Callable] = None
    exact_fn: Optional[Callable] = None

    @property
    def dim(self) -> int:
        return self.dim_

    @property
    def sigma_kind(self) -> str:
        return self.sigma_kind_

    @property
    def x0(self) -> Array:
        return jnp.asarray(self.x0_, jnp.float32).reshape(self.dim_)

    def mu(self, t, X, Y, Z):
        return self.mu_fn(t, X, Y, Z)

    def sigma(self, t, X, Y):
        return self.sigma_fn(t, X, Y)

    def phi(self, t, X, Y, Z):
        return self.phi_fn(t, X, Y, Z)

    def g(self, X):
        return self.g_fn(X)

    def exact_solution(self, t, X):
        return self.exact_fn(t, X) if self.exact_fn is not None else None


def as_callable_problem(
    *,
    dim: int,
    T: float,
    x0,
    mu: Callable,
    sigma: Callable,
    phi: Callable,
    g: Callable,
    sigma_kind: str = "diag",
    name: str = "custom",
    exact: Optional[Callable] = None,
) -> PDEProblem:
    """Build an ad-hoc problem from plain functions (for user extension/tests)."""
    return CallableProblem(
        T=T, name=name, dim_=dim, sigma_kind_=sigma_kind,
        x0_=tuple(np.asarray(x0, dtype=float).reshape(dim).tolist()),
        mu_fn=mu, sigma_fn=sigma, phi_fn=phi, g_fn=g, exact_fn=exact,
    )
