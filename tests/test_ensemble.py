"""Vmapped ensemble-training tests."""

import numpy as np
import pytest

from dnnpde_tpu.pde import BlackScholesBarenblatt
from dnnpde_tpu.train.ensemble import train_ensemble


@pytest.mark.slow  # heaviest ensemble path; lr-sweep/mesh/sensitivity tests stay fast
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


def test_sensitivity_ensemble_two_phase_masking():
    """Heterogeneous (n1, n2) budgets in one program: every member reports a
    finite min loss taken only over its own active window, and a member
    given a sane lr beats one given a junk lr."""
    from dnnpde_tpu.train.ensemble import train_sensitivity_ensemble

    prob = BlackScholesBarenblatt(D=4)
    hps = [
        {"initial_lr": 1e-3, "fine_tuning_lr": 1e-4,
         "initial_n_iter": 60, "fine_tuning_n_iter": 20},
        {"initial_lr": 1e-7, "fine_tuning_lr": 1e-8,
         "initial_n_iter": 10, "fine_tuning_n_iter": 5},
        {"initial_lr": 3e-3, "fine_tuning_lr": 1e-5,
         "initial_n_iter": 30, "fine_tuning_n_iter": 40},
    ]
    perfs = train_sensitivity_ensemble(
        prob, hps, M=16, N=4, layers=[5, 16, 16, 16, 16, 1], seed=0
    )
    assert perfs.shape == (3,)
    assert np.isfinite(perfs).all()
    # min loss can only improve with a longer budget at a working lr
    assert perfs[0] < perfs[1]


def test_sensitivity_executor_uses_ensemble(monkeypatch):
    """The executor must fan ALL real samples into ONE ensemble call."""
    from dnnpde_tpu.experiments import SensitivityExecutor
    from dnnpde_tpu.pde import CallOption1D
    import dnnpde_tpu.train.ensemble as ens

    calls = []
    orig = ens.train_sensitivity_ensemble

    def spy(problem, hyperparams, **kw):
        calls.append(len(hyperparams))
        return orig(problem, hyperparams, **kw)

    monkeypatch.setattr(ens, "train_sensitivity_ensemble", spy)
    scores = SensitivityExecutor(
        CallOption1D(D=1), M=4, N=3, iter_scale=2e-4,
    ).execute(num_real_samples=3, num_simulated_samples=50)
    assert calls == [3]  # one call, three members
    assert all(np.isfinite(v) for v in scores.values())


def test_ensemble_mesh_sharded_matches_unsharded():
    """Member axis sharded over dp: same keys, same math — population
    training scales across chips with zero collectives."""
    from dnnpde_tpu.parallel import make_mesh

    prob = BlackScholesBarenblatt(D=4)
    kw = dict(n_members=8, n_iter=20, M=16, N=4,
              layers=[5, 16, 16, 16, 16, 1], learning_rates=1e-3, seed=2)
    plain = train_ensemble(prob, **kw)
    sharded = train_ensemble(prob, mesh=make_mesh(8), **kw)
    np.testing.assert_allclose(plain.losses, sharded.losses, rtol=1e-4)


def test_ensemble_mesh_divisibility_error():
    from dnnpde_tpu.parallel import make_mesh

    prob = BlackScholesBarenblatt(D=4)
    with pytest.raises(ValueError, match="divisible"):
        train_ensemble(prob, n_members=3, n_iter=2, M=8, N=2,
                       layers=[5, 8, 8, 1], mesh=make_mesh(8))
