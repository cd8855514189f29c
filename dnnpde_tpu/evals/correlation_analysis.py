"""Correlation-sensitivity analysis for basket options.

Parity with the reference ``basket_pricer.py``:
- :class:`RandomCorrelationSensitivityAnalysis` (``basket_pricer.py:99-165``):
  price the basket under many random correlation matrices, then PCA the
  flattened matrices against the prices.
- ``OptionPricingAnalysis.sensitivity_analysis`` (``basket_pricer.py:211-227``):
  equicorrelation sweep ρ ∈ range → price curve.

TPU-native twist: all sampled correlation scenarios are priced in ONE
vmapped MC evaluation (common random numbers across scenarios — the
reference loops per scenario with fresh randomness, confounding the
correlation effect with MC noise).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from dnnpde_tpu.sim.correlation import cholesky_factor, generate_correlation_matrix

Array = jnp.ndarray


def _priced_under_chol(key, S0, K, T, r, sigma, chols, num_paths: int) -> Array:
    """(num_scenarios,) basket-call prices with shared normals across
    scenarios (one vmapped XLA program)."""
    S0 = jnp.atleast_1d(jnp.asarray(S0, jnp.float32))
    D = S0.shape[0]
    z = jax.random.normal(key, (num_paths, D))

    def price_one(L):
        zc = z @ L.T
        sig = jnp.broadcast_to(jnp.asarray(sigma, jnp.float32), (D,))
        ST = S0 * jnp.exp((r - 0.5 * sig**2) * T + sig * jnp.sqrt(T) * zc)
        pay = jnp.maximum(jnp.mean(ST, axis=-1) - K, 0.0)
        return jnp.exp(-r * T) * jnp.mean(pay)

    return jax.vmap(price_one)(chols)


@dataclasses.dataclass
class RandomCorrelationSensitivityAnalysis:
    """Price dispersion over random correlation matrices + PCA structure
    (reference ``basket_pricer.py:99-165``)."""

    n: int
    r: float = 0.05
    sigma: float = 0.2
    T: float = 1.0
    K: float = 1.0
    S0: Optional[np.ndarray] = None

    def run_analysis(
        self,
        correlation_type: str = "random_correlation",
        num_simulations: int = 10_000,
        num_samples: int = 100,
        seed: int = 0,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Returns (option_prices (num_samples,), flattened correlation
        matrices (num_samples, n²))."""
        S0 = self.S0 if self.S0 is not None else np.ones(self.n)
        mats, chols = [], []
        for i in range(num_samples):
            C = generate_correlation_matrix(
                self.n, correlation_type, seed=seed + i
            )
            mats.append(C.flatten())
            chols.append(cholesky_factor(C))
        prices = _priced_under_chol(
            jax.random.PRNGKey(seed), S0, self.K, self.T, self.r, self.sigma,
            jnp.asarray(np.stack(chols)), num_simulations,
        )
        return np.asarray(prices), np.stack(mats)

    def pca_components(
        self,
        correlation_matrices: np.ndarray,
        n_components: int = 2,
    ) -> tuple[np.ndarray, np.ndarray]:
        """PCA of the flattened correlation matrices (reference
        ``plot_pca_results``, ``basket_pricer.py:149-165``).
        Returns (principal components (num_samples, k), explained variance)."""
        from sklearn.decomposition import PCA

        pca = PCA(n_components=n_components)
        comps = pca.fit_transform(correlation_matrices)
        return comps, pca.explained_variance_ratio_

    def plot_pca_results(
        self, option_prices, correlation_matrices, save_path: str,
        n_components: int = 2,
    ) -> str:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        comps, _ = self.pca_components(correlation_matrices, n_components)
        plt.figure(figsize=(10, 6))
        if n_components == 1:
            plt.scatter(comps[:, 0], option_prices, c="blue", edgecolor="black")
            plt.xlabel("Principal Component 1")
            plt.ylabel("Option Price")
        else:
            sc = plt.scatter(
                comps[:, 0], comps[:, 1], c=option_prices, cmap="viridis",
                edgecolor="black",
            )
            plt.colorbar(sc, label="Option Price")
            plt.xlabel("Principal Component 1")
            plt.ylabel("Principal Component 2")
        plt.title(f"PCA: option prices vs correlation structure (n={self.n})")
        plt.grid(True)
        plt.savefig(save_path, dpi=150, bbox_inches="tight")
        plt.close()
        return save_path


def equicorrelation_sensitivity(
    S0,
    K: float,
    T: float,
    r: float,
    sigma: float,
    correlation_range: Sequence[float],
    num_simulations: int = 10_000,
    seed: int = 0,
) -> np.ndarray:
    """Basket price vs uniform pairwise correlation ρ (reference
    ``sensitivity_analysis``, ``basket_pricer.py:211-227``), one vmapped call
    with common random numbers."""
    S0 = np.atleast_1d(np.asarray(S0, np.float32))
    D = S0.shape[0]
    chols = []
    for rho in correlation_range:
        C = np.full((D, D), float(rho))
        np.fill_diagonal(C, 1.0)
        chols.append(cholesky_factor(C))
    prices = _priced_under_chol(
        jax.random.PRNGKey(seed), S0, K, T, r, sigma,
        jnp.asarray(np.stack(chols)), num_simulations,
    )
    return np.asarray(prices)
