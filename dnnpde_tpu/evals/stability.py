"""Stability analysis: initial-condition perturbations + spectral radius of
the input Jacobian.

Parity targets (reference ``StabilityCheck``, ``1d_BSPDE_case.py:726-986``,
``hjb_implement.py:777-1038``, ``with_corr_high_dimension_pde.py:790-1051``):

(a) perturb Xi by ε·N(0,1) over a range (default linspace(0, 0.8, 10)) and
    measure the mean relative error of the re-predicted Y paths;
(b) spectral radius of the Jacobian ∂u/∂X at sampled states — the < 1
    criterion the reference uses as a stability proxy. The reference loops
    Python-per-point over ``torch.autograd.functional.jacobian`` and eigvals
    (``:776-807``); here one ``vmap(jacfwd)`` evaluates all points in a
    single XLA call (for the scalar-output net the Jacobian is a row vector,
    so its only nonzero singular/eigen value is ‖∇ₓu‖₂ — computed directly);
(c) Jacobian surfaces over a (t, S) grid (for the surface plots).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class StabilityCheck:
    """Perturbation + spectral-radius stability analysis for a trained model."""

    trainer: "dnnpde_tpu.train.Trainer"  # noqa: F821
    Xi: Optional[np.ndarray] = None
    perturbation_range: Sequence[float] = tuple(np.linspace(0.0, 0.8, 10))
    seed: int = 0
    num_points: int = 100

    def __post_init__(self):
        if self.Xi is None:
            self.Xi = np.asarray(self.trainer.problem.x0)[None, :]
        else:
            self.Xi = np.asarray(self.Xi).reshape(1, -1)

    # ------------------------------------------------------ (a) perturbations
    def generate_perturbations(self) -> list[np.ndarray]:
        """Xi + ε·N(0,1) per ε (reference ``generate_perturbations``,
        ``1d_BSPDE_case.py:736-741``)."""
        rng = np.random.default_rng(self.seed)
        return [
            self.Xi + eps * rng.standard_normal(self.Xi.shape)
            for eps in self.perturbation_range
        ]

    def evaluate_perturbations(
        self, perturbations: Sequence[np.ndarray], t_test, W_test
    ) -> list[tuple[np.ndarray, np.ndarray]]:
        """Re-predict along fixed (t, W) paths from each perturbed start
        (reference ``evaluate_perturbations``, ``1d_BSPDE_case.py:743-751``)."""
        return [
            self.trainer.predict(xi, t_test, W_test) for xi in perturbations
        ]

    def calculate_relative_errors(
        self, predictions, Y_test: np.ndarray
    ) -> list[float]:
        """Mean |Y_pred − Y_test| / |Y_test| per perturbation level
        (reference ``calculate_relative_errors``, ``1d_BSPDE_case.py:753-759``)."""
        Y_test = np.asarray(Y_test).squeeze()
        out = []
        for _, Y_pred in predictions:
            yp = np.asarray(Y_pred).squeeze()
            out.append(float(np.abs((yp - Y_test) / np.maximum(np.abs(Y_test), 1e-12)).mean()))
        return out

    def run_perturbation_analysis(self, t_test=None, W_test=None) -> list[float]:
        """End-to-end (a): returns relative errors per ε."""
        if t_test is None or W_test is None:
            t_test, W_test = self.trainer.fetch_minibatch(
                key=jax.random.PRNGKey(self.seed)
            )
        _, Y_base = self.trainer.predict(self.Xi, t_test, W_test)
        preds = self.evaluate_perturbations(
            self.generate_perturbations(), t_test, W_test
        )
        return self.calculate_relative_errors(preds, Y_base)

    # ---------------------------------------------------- (b) spectral radius
    def spectral_radii(self, X: np.ndarray, t: float = 0.0) -> np.ndarray:
        """Spectral radius of ∂u/∂X at each row of X, one vmapped XLA call.

        For the scalar-valued u the Jacobian is 1×D; its spectral radius (the
        largest singular value, matching the reference's SVD variant at
        ``hjb_implement.py:843-864``) equals ‖∇ₓu‖₂.
        """
        X = jnp.asarray(X, jnp.float32)
        tcol = jnp.full((X.shape[0], 1), t, X.dtype)
        _, Z = self.trainer.net_u(self.trainer.params, tcol, X)
        return np.asarray(jnp.linalg.norm(Z, axis=-1))

    def evaluate_stability(self, t: float = 0.0) -> np.ndarray:
        """Spectral radii at ``num_points`` uniform samples in [−1, 1]^D
        (reference ``evaluate_stability``, ``1d_BSPDE_case.py:801-807``)."""
        key = jax.random.PRNGKey(self.seed)
        X = jax.random.uniform(
            key, (self.num_points, self.trainer.problem.dim), minval=-1.0, maxval=1.0
        )
        return self.spectral_radii(X, t)

    def stable_percentage(self, radii: Optional[np.ndarray] = None) -> float:
        """% of sampled points with spectral radius < 1 (reference ``:871-873``)."""
        if radii is None:
            radii = self.evaluate_stability()
        return float((np.asarray(radii) < 1.0).mean() * 100.0)

    # ---------------------------------------------------- (c) Jacobian surface
    def jacobian_surface(
        self, t_values: np.ndarray, s_values: np.ndarray, dim: int = 0
    ) -> np.ndarray:
        """‖∇ₓu‖ over a (t, S) grid, varying state component ``dim`` with the
        other components held at x0 (reference ``evaluate_jacobian`` surfaces,
        ``1d_BSPDE_case.py:888-986``). Returns (len(t), len(s))."""
        x0 = jnp.asarray(self.trainer.problem.x0)

        def at_point(t, s):
            x = x0.at[dim].set(s)[None, :]
            _, Z = self.trainer.net_u(
                self.trainer.params, jnp.full((1, 1), t), x
            )
            return jnp.linalg.norm(Z)

        grid = jax.vmap(lambda t: jax.vmap(lambda s: at_point(t, s))(
            jnp.asarray(s_values, jnp.float32)
        ))(jnp.asarray(t_values, jnp.float32))
        return np.asarray(grid)

    def smoothed_jacobian_surface(
        self,
        t_values: np.ndarray,
        s_values: np.ndarray,
        dim: int = 0,
        upsample: int = 100,
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """The reference's presentation pipeline for the Jacobian surface
        (``plot_jacobian_3d``, ``1d_BSPDE_case.py:953-969``): Gaussian filter
        (σ=2) → cubic ``griddata`` upsample to ``upsample``² → light Gaussian
        (σ=0.5). Returns (t_new, s_new, Z_new)."""
        from scipy.interpolate import griddata
        from scipy.ndimage import gaussian_filter

        raw = self.jacobian_surface(t_values, s_values, dim=dim)
        smoothed = gaussian_filter(raw, sigma=2)
        S, Tg = np.meshgrid(s_values, t_values)
        s_new = np.linspace(float(s_values[0]), float(s_values[-1]), upsample)
        t_new = np.linspace(float(t_values[0]), float(t_values[-1]), upsample)
        S_new, T_new = np.meshgrid(s_new, t_new)
        Z_new = griddata(
            (S.ravel(), Tg.ravel()), smoothed.ravel(), (S_new, T_new),
            method="cubic",
        )
        Z_new = gaussian_filter(np.nan_to_num(Z_new), sigma=0.5)
        return t_new, s_new, Z_new
