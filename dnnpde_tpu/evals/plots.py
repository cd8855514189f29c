"""Plotting suite (reference ``TrainingPlot``/``StabilityCheck`` plot methods).

Parity targets: golden-ratio figsize from the LaTeX column width 438.17227pt
(``1d_BSPDE_case.py:670-678``), training-loss (log-y), sampled path
predictions, exact-vs-learned overlays, L2-error curve, Y0 evolution
(``1d_BSPDE_case.py:664-724``), Heston price/Δ/Γ surfaces
(``heston_dnnpde.py:977-1120``), stability curves + spectral-radius
histogram/KDE/polar (``1d_BSPDE_case.py:761-875``), and the error heatmap
(``with_corr_high_dimension_pde.py:1520-1537``).

All functions are headless-safe (Agg backend) and save PNGs named with the
reference's ``{problem}{D}D_{mode}_{activation}_{optimizer}`` convention.
"""

from __future__ import annotations

import os
from typing import Sequence

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np


def figsize(scale: float = 1.0, nplots: int = 1) -> list[float]:
    """Golden-ratio figure size from a 438.17227pt LaTeX column
    (reference ``TrainingPlot.figsize``, ``1d_BSPDE_case.py:670-678``)."""
    fig_width_pt = 438.17227
    inches_per_pt = 1.0 / 72.27
    golden_mean = (np.sqrt(5.0) - 1.0) / 2.0
    fig_width = fig_width_pt * inches_per_pt * scale
    return [fig_width, nplots * fig_width * golden_mean]


class TrainingPlot:
    """Mirror of the reference ``TrainingPlot`` API; every method writes a PNG
    under ``save_path`` and returns the path."""

    def __init__(self, save_path: str):
        self.save_path = save_path
        os.makedirs(save_path, exist_ok=True)

    def _save(self, name: str) -> str:
        path = os.path.join(self.save_path, name)
        plt.savefig(path, dpi=150, bbox_inches="tight")
        plt.close()
        return path

    def plot_training_loss(self, graph, mode, activation, optimizer) -> str:
        """Loss vs iteration, log-y (reference ``1d_BSPDE_case.py:680-690``)."""
        plt.figure(figsize=figsize(1.0))
        plt.plot(graph[0], graph[1])
        plt.yscale("log")
        plt.xlabel("Iteration")
        plt.ylabel("Training loss")
        plt.title(f"Training loss — {mode}-{activation}, {optimizer}")
        return self._save(f"TrainingLoss_{mode}_{activation}_{optimizer}.png")

    def plot_prediction(
        self, t_test, Y_pred, mode, activation, optimizer, n_paths: int = 8
    ) -> str:
        """Sampled predicted Y paths (reference ``1d_BSPDE_case.py:692-703``)."""
        plt.figure(figsize=figsize(1.0))
        t = np.asarray(t_test)[:, :, 0]
        y = np.asarray(Y_pred)[:, :, 0]
        for i in range(min(n_paths, y.shape[0])):
            plt.plot(t[i], y[i], lw=0.8)
        plt.xlabel("t")
        plt.ylabel("Y(t)")
        plt.title(f"Predicted paths — {mode}-{activation}")
        return self._save(f"Preds_{mode}_{activation}_{optimizer}.png")

    def plot_exact_vs_learned(
        self, t_test, Y_pred, Y_exact, mode, activation, optimizer, n_paths: int = 5
    ) -> str:
        """Learned vs exact overlays (reference ``1d_BSPDE_case.py:705-716``)."""
        plt.figure(figsize=figsize(1.0))
        t = np.asarray(t_test)[:, :, 0]
        yp = np.asarray(Y_pred)[:, :, 0]
        ye = np.asarray(Y_exact).reshape(yp.shape[0], -1)
        for i in range(min(n_paths, yp.shape[0])):
            plt.plot(t[i], yp[i], "b", lw=0.8, label="learned" if i == 0 else None)
            plt.plot(t[i], ye[i], "r--", lw=0.8, label="exact" if i == 0 else None)
        plt.xlabel("t")
        plt.ylabel("Y(t)")
        plt.legend()
        plt.title(f"Exact vs learned — {mode}-{activation}")
        return self._save(f"ExactVsLearned_{mode}_{activation}_{optimizer}.png")

    def plot_l2_error(self, t_grid, rel_errors, mode, activation, optimizer) -> str:
        """Relative L2 error over time, semilog-y (reference ``:718-724``)."""
        plt.figure(figsize=figsize(1.0))
        plt.semilogy(np.asarray(t_grid), np.asarray(rel_errors))
        plt.xlabel("t")
        plt.ylabel("relative $L_2$ error")
        plt.title(f"L2 error — {mode}-{activation}")
        return self._save(f"L2Error_{mode}_{activation}_{optimizer}.png")

    def plot_y0_evolution(self, iterations, y0_values, exact_y0=None, name="Y0") -> str:
        """Y0 estimate per log point (+ exact line) — Heston L2(Y0) study
        (reference ``heston_dnnpde.py:1005-1019``)."""
        plt.figure(figsize=figsize(1.0))
        plt.plot(np.asarray(iterations), np.asarray(y0_values), label="learned Y0")
        if exact_y0 is not None:
            plt.axhline(exact_y0, color="r", ls="--", label="exact")
        plt.xlabel("Iteration")
        plt.ylabel("$Y_0$")
        plt.legend()
        return self._save(f"{name}_evolution.png")

    def plot_heston_surfaces(
        self, S_values, V_values, price, delta, gamma, name="Heston"
    ) -> str:
        """Price/Δ/Γ 3-D surfaces (reference ``heston_dnnpde.py:1050-1120``,
        ``numerics/sv_heston.py:98-127``)."""
        fig, axs = plt.subplots(
            1, 3, figsize=(18, 6), subplot_kw={"projection": "3d"}
        )
        S, V = np.meshgrid(np.asarray(S_values), np.asarray(V_values))
        for ax, grid, title in zip(
            axs, [price, delta, gamma], ["Price", "Delta", "Gamma"]
        ):
            ax.plot_surface(S, V, np.asarray(grid).T, cmap="viridis")
            ax.set_xlabel("S")
            ax.set_ylabel("v")
            ax.set_title(title)
            ax.view_init(elev=30, azim=130)
        return self._save(f"{name}_surfaces.png")

    def plot_iv_smile(
        self, strikes, model_iv, oracle_iv, discrete_iv=None, name="Heston"
    ) -> str:
        """Implied-volatility smile: model vs the Heston closed form (and,
        optionally, the exact discrete-N BSDE oracle). Beyond-reference —
        the reference plots price surfaces without ever scoring them
        (``heston_dnnpde.py:977-1120``); the smile is the market-standard
        score for a trained option-price surface."""
        strikes = np.asarray(strikes)
        plt.figure(figsize=figsize(1.0))
        plt.plot(strikes, 100 * np.asarray(oracle_iv), "k-", lw=2,
                 label="closed form")
        if discrete_iv is not None:
            plt.plot(strikes, 100 * np.asarray(discrete_iv), "k--", lw=1,
                     label="discrete-N oracle")
        plt.plot(strikes, 100 * np.asarray(model_iv), "o-", ms=4,
                 label="model")
        plt.xlabel("Strike K (S0 = 1)")
        plt.ylabel("Implied vol (%)")
        plt.title("IV smile — model vs oracle")
        plt.legend()
        plt.grid(alpha=0.3)
        return self._save(f"{name}_iv_smile.png")

    def plot_jacobian_surface(
        self, t_values, s_values, Z, name="Jacobian", title="‖∇ₓu‖"
    ) -> str:
        """3-D Jacobian-norm surface with base contours (reference
        ``plot_jacobian_3d``, ``1d_BSPDE_case.py:943-986``; feed it the
        smoothed/upsampled grid from
        ``StabilityCheck.smoothed_jacobian_surface``)."""
        fig = plt.figure(figsize=(8, 6))
        ax = fig.add_subplot(projection="3d")
        S, T = np.meshgrid(np.asarray(s_values), np.asarray(t_values))
        Z = np.asarray(Z)
        ax.plot_surface(S, T, Z, cmap="viridis", linewidth=0,
                        antialiased=True, alpha=0.8)
        ax.contour(S, T, Z, zdir="z", offset=float(Z.min()),
                   cmap="coolwarm", alpha=0.5)
        ax.set_xlabel("S")
        ax.set_ylabel("t")
        ax.set_title(title)
        ax.view_init(elev=30, azim=130)
        return self._save(f"{name}_surface.png")

    def plot_stability(
        self, perturbation_range, errors_dict: dict[str, Sequence[float]], optimizer
    ) -> str:
        """Relative error vs perturbation size per (mode, activation)
        (reference ``plot_stability``, ``1d_BSPDE_case.py:761-773``)."""
        plt.figure(figsize=(10, 6))
        for key, errors in errors_dict.items():
            plt.plot(perturbation_range, np.asarray(errors), marker="o", ls="--", label=key)
        plt.xlabel("Relative distance to the training initial condition")
        plt.ylabel("Relative error")
        plt.legend()
        return self._save(f"Stability_{optimizer}.png")

    def plot_spectral_radius(
        self, radius_dict: dict[str, np.ndarray], optimizer
    ) -> str:
        """Histogram + KDE + polar panels with the <1 stability threshold
        (reference ``plot_spectral_radius``, ``1d_BSPDE_case.py:809-875``)."""
        fig = plt.figure(figsize=(18, 5))
        ax1 = fig.add_subplot(131)
        for key, r in radius_dict.items():
            ax1.hist(np.asarray(r), bins=30, alpha=0.6, label=key, edgecolor="black")
        ax1.axvline(1.0, color="r", ls="--", label="stability threshold")
        ax1.set_xlabel("Spectral radius")
        ax1.set_ylabel("Frequency")
        ax1.legend()

        ax2 = fig.add_subplot(132)
        for key, r in radius_dict.items():
            r = np.asarray(r)
            xs = np.linspace(r.min() - 0.1, r.max() + 0.1, 200)
            bw = 1.06 * r.std() * len(r) ** (-1 / 5) + 1e-6  # Silverman KDE
            dens = np.exp(-0.5 * ((xs[:, None] - r[None, :]) / bw) ** 2).mean(1) / (
                bw * np.sqrt(2 * np.pi)
            )
            ax2.fill_between(xs, dens, alpha=0.4, label=key)
        ax2.axvline(1.0, color="r", ls="--")
        ax2.set_xlabel("Spectral radius")
        ax2.set_ylabel("Density")
        ax2.legend()

        ax3 = fig.add_subplot(133, projection="polar")
        for key, r in radius_dict.items():
            r = np.asarray(r)
            theta = np.linspace(0, 2 * np.pi, len(r))
            ax3.plot(theta, r, "o", ms=4, label=key)
        ax3.plot(np.linspace(0, 2 * np.pi, 100), [1.0] * 100, "r--")
        ax3.set_rmax(max(1.5, max(np.asarray(r).max() for r in radius_dict.values())))
        ax3.legend(loc="upper right", bbox_to_anchor=(1.3, 1.0))
        return self._save(f"SpectralRadius_{optimizer}.png")

    def plot_error_heatmap(
        self, errors: np.ndarray, row_labels, col_labels, name="ErrorHeatmap"
    ) -> str:
        """Config-sweep error heatmap (reference ``generate_error_heatmap``,
        ``with_corr_high_dimension_pde.py:1520-1537``)."""
        plt.figure(figsize=(10, 6))
        im = plt.imshow(np.asarray(errors), cmap="coolwarm", aspect="auto")
        plt.colorbar(im)
        plt.xticks(range(len(col_labels)), col_labels, rotation=45)
        plt.yticks(range(len(row_labels)), row_labels)
        plt.title("Error heatmap")
        return self._save(f"{name}.png")

    def plot_spherical_surface(
        self, radius_dict: dict[str, np.ndarray], optimizer, name="SpectralRadiusSphere"
    ) -> str:
        """Spectral radii mapped onto a spherical scatter (reference
        ``plot_spherical_surface`` + ``cartesian_to_spherical``,
        ``1d_BSPDE_case.py:877-986``): points distributed on the unit sphere,
        radial coordinate = spectral radius."""
        fig = plt.figure(figsize=(10, 8))
        ax = fig.add_subplot(111, projection="3d")
        for key, r in radius_dict.items():
            r = np.asarray(r)
            n = len(r)
            # golden-spiral point distribution on the sphere
            idx = np.arange(n) + 0.5
            phi = np.arccos(1 - 2 * idx / n)
            theta = np.pi * (1 + 5**0.5) * idx
            x = r * np.sin(phi) * np.cos(theta)
            y = r * np.sin(phi) * np.sin(theta)
            z = r * np.cos(phi)
            ax.scatter(x, y, z, s=12, label=key, alpha=0.7)
        # unit (stability-threshold) sphere wireframe
        u, v = np.mgrid[0 : 2 * np.pi : 24j, 0 : np.pi : 12j]
        ax.plot_wireframe(
            np.cos(u) * np.sin(v), np.sin(u) * np.sin(v), np.cos(v),
            color="r", alpha=0.2, linewidth=0.5,
        )
        ax.set_title(f"Spectral radii (r=1 sphere = stability threshold)\n{optimizer}")
        ax.legend()
        return self._save(f"{name}_{optimizer}.png")

    def plot_convergence(self, errors: dict[str, np.ndarray], name="Convergence") -> str:
        """L1/L2/L∞ vs epoch, semilog (reference ``ConvergenceAnalysis.plot_errors``,
        ``with_corr_high_dimension_pde.py:1085-1100``)."""
        plt.figure(figsize=figsize(1.0))
        for label, vals in errors.items():
            plt.semilogy(np.asarray(vals), label=label)
        plt.xlabel("Epoch")
        plt.ylabel("Error")
        plt.legend()
        return self._save(f"{name}.png")
