"""Composition-style API (reference ``refactor_blackpde_dnn.py:144-265``,
``new_dnnpde_code.py:157-290``).

The reference's "refactor" scripts split the FBSNN monolith into
``EulerMaruyamaScheme`` / ``LossFunction`` / ``NeuralNetworkTraining``
composed objects — the design seed this framework follows throughout
(``sim`` / ``solver`` / ``train``). This module provides the same three-class
composition surface on top of the TPU-native internals, for users migrating
code written against that API.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np

from dnnpde_tpu.pde.base import PDEProblem
from dnnpde_tpu.sim.brownian import brownian_paths
from dnnpde_tpu.solver.bsde import SolverConfig, make_path_loss_fn
from dnnpde_tpu.train.trainer import Trainer


class EulerMaruyamaScheme:
    """Path simulator with the reference constructor/simulate surface
    (``refactor_blackpde_dnn.py:144-168``) — on-device keyed RNG instead of
    host NumPy."""

    def __init__(self, Xi, T: float, M: int, N: int, D: int, seed: int = 0):
        self.Xi = np.asarray(Xi, np.float32).reshape(-1, D)
        self.T, self.M, self.N, self.D = T, M, N, D
        self._key = jax.random.PRNGKey(seed)

    def simulate(self):
        """→ (t (M, N+1, 1), W (M, N+1, D))."""
        self._key, sub = jax.random.split(self._key)
        return brownian_paths(sub, self.M, self.N, self.D, self.T)


class LossFunction:
    """Deep-BSDE objective with the reference ``compute(t, W, Xi)`` surface
    (``refactor_blackpde_dnn.py:171-219``) — one jitted scan underneath."""

    def __init__(self, problem: PDEProblem, net, params,
                 config: Optional[SolverConfig] = None):
        self.problem = problem
        self.net = net
        self.params = params
        self._fn = jax.jit(make_path_loss_fn(problem, net, config or SolverConfig()))

    def compute(self, t, W, Xi):
        """→ (loss, X (M, N+1, D), Y (M, N+1, 1), Y0 scalar)."""
        res = self._fn(self.params, t, W, Xi)
        return (
            float(res.loss),
            np.asarray(res.X),
            np.asarray(res.Y),
            float(res.Y0),
        )


class NeuralNetworkTraining:
    """Trainer with the reference train/predict surface
    (``refactor_blackpde_dnn.py:222-265``). Composes a :class:`Trainer`."""

    def __init__(self, problem: PDEProblem, simulator: EulerMaruyamaScheme,
                 layers=None, mode: str = "FC", activation: str = "Sine",
                 seed: int = 42):
        self.simulator = simulator
        self.trainer = Trainer(
            problem, M=simulator.M, N=simulator.N, layers=layers,
            mode=mode, activation=activation, seed=seed,
        )

    def train(self, N_Iter: int, learning_rate: float):
        """→ np.stack((iterations, training_loss)) (reference ``:229-259``)."""
        result = self.trainer.train(N_Iter, learning_rate, verbose=False)
        return result.graph

    def predict(self, Xi_star, t_star, W_star):
        return self.trainer.predict(Xi_star, t_star, W_star)

    @property
    def model(self):
        return self.trainer


def heston_predict(trainer, Xi_star, t_star, W_star):
    """Heston-layout predict: → (S paths, v paths, Y paths), the reference's
    ``HestonFBSNN.predict`` return shape (``heston_dnnpde.py:661-683``)."""
    X, Y = trainer.predict(Xi_star, t_star, W_star)
    return X[:, :, 0:1], X[:, :, 1:2], Y
