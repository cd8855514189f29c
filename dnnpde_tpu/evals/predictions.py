"""Prediction sampling (reference ``PredictionGenerator``,
``1d_BSPDE_case.py:562-603``; Heston variant ``heston_dnnpde.py:778-827``).

Draws ``num_samples`` fresh Brownian minibatches, runs the trained model on
each and concatenates along the batch axis. Differences by design: the
reference reseeds the *global* NumPy RNG (seed 37/42) and round-trips
host↔device per sample; here sampling is keyed (deterministic per ``seed``)
and stays on device until the final concatenation.
"""

from __future__ import annotations

import dataclasses
import jax
import numpy as np


@dataclasses.dataclass
class PredictionResult:
    t_test: np.ndarray  # (num_samples·M, N+1, 1)
    W_test: np.ndarray  # (M, N+1, D) — last drawn batch (reference returns this)
    X_pred: np.ndarray  # (num_samples·M, N+1, D)
    Y_pred: np.ndarray  # (num_samples·M, N+1, 1)


class PredictionGenerator:
    """Mirror of the reference API: ``generate_predictions() → (t, W, X, Y)``."""

    def __init__(self, trainer, Xi=None, num_samples: int = 16, seed: int = 37,
                 use_ema: bool = False):
        self.trainer = trainer
        # evaluate the Polyak/EMA shadow instead of the raw last iterate
        # (requires Trainer(ema_decay=...); measured tighter on wobbly
        # late-phase snapshots)
        self.use_ema = use_ema
        self.Xi = (
            np.asarray(Xi).reshape(-1, trainer.problem.dim)
            if Xi is not None
            else np.asarray(trainer.problem.x0)[None, :]
        )
        self.num_samples = num_samples
        self.seed = seed

    def generate_predictions(self) -> PredictionResult:
        key = jax.random.PRNGKey(self.seed)
        ts, Xs, Ys = [], [], []
        W_last = None
        for i in range(self.num_samples):
            sub = jax.random.fold_in(key, i)
            t, W = self.trainer.fetch_minibatch(key=sub)
            X_pred, Y_pred = self.trainer.predict(
                self.Xi, t, W, use_ema=self.use_ema
            )
            ts.append(np.asarray(t))
            Xs.append(X_pred)
            Ys.append(Y_pred)
            W_last = np.asarray(W)
        return PredictionResult(
            t_test=np.concatenate(ts, axis=0),
            W_test=W_last,
            X_pred=np.concatenate(Xs, axis=0),
            Y_pred=np.concatenate(Ys, axis=0),
        )
