"""Vmapped ensemble-training tests."""

import numpy as np
import pytest

from dnnpde_tpu.pde import BlackScholesBarenblatt
from dnnpde_tpu.train.ensemble import train_ensemble


def test_ensemble_shapes_and_training():
    prob = BlackScholesBarenblatt(D=4)
    res = train_ensemble(
        prob, n_members=4, n_iter=40, M=16, N=4,
        layers=[5, 16, 16, 16, 16, 1], learning_rates=1e-3,
    )
    assert res.losses.shape == (4, 40)
    assert res.y0s.shape == (4, 40)
    assert np.isfinite(res.losses).all()
    # members are independently initialized → different trajectories
    assert not np.allclose(res.losses[0], res.losses[1])
    # training works: mean loss over members decreases
    assert res.losses[:, -5:].mean() < res.losses[:, :5].mean()


def test_ensemble_lr_sweep_orders_convergence():
    """A per-member lr sweep must show faster early convergence for larger
    (reasonable) lrs — the vmapped equivalent of the reference's
    ProcessPoolExecutor hyperparameter fan-out."""
    prob = BlackScholesBarenblatt(D=4)
    lrs = [1e-5, 1e-3]
    res = train_ensemble(
        prob, n_members=2, n_iter=60, M=16, N=4,
        layers=[5, 16, 16, 16, 16, 1], learning_rates=lrs,
    )
    assert res.final_loss[1] < res.final_loss[0]


def test_ensemble_rejects_unknown_optimizer():
    with pytest.raises(ValueError):
        train_ensemble(
            BlackScholesBarenblatt(D=2), 2, 2, M=4, N=2,
            layers=[3, 8, 8, 8, 8, 1], optimizer_type="LBFGS",
        )
