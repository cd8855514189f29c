"""Tensor-parallel (model-axis) sharding tests on the virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dnnpde_tpu.nets import MLP
from dnnpde_tpu.parallel import (
    make_mesh_2d,
    shard_params_tp,
    tp_sharding_summary,
)
from dnnpde_tpu.pde import BlackScholesBarenblatt
from dnnpde_tpu.train import Trainer


@pytest.fixture(scope="module")
def mesh_2d():
    return make_mesh_2d(4, 2)


def test_mesh_2d_shape(mesh_2d):
    assert mesh_2d.shape == {"dp": 4, "tp": 2}


def test_mesh_2d_too_many_devices():
    with pytest.raises(ValueError):
        make_mesh_2d(8, 2)


def test_wide_kernels_get_tp_sharded(mesh_2d, rng_key):
    net = MLP(layers=(9, 512, 512, 1), activation="sine")
    params = net.init(rng_key, jnp.ones((1, 9)))
    sharded = shard_params_tp(params, mesh_2d)
    summary = tp_sharding_summary(sharded)
    assert any("'tp'" in s for s in summary.values()), summary
    # forward pass still correct under sharding
    x = jnp.ones((4, 9))
    np.testing.assert_allclose(
        np.asarray(net.apply(params, x)),
        np.asarray(net.apply(sharded, x)),
        rtol=1e-5,
    )


def test_narrow_kernels_stay_replicated(mesh_2d, rng_key):
    net = MLP(layers=(9, 32, 32, 1), activation="sine")
    params = net.init(rng_key, jnp.ones((1, 9)))
    sharded = shard_params_tp(params, mesh_2d)
    summary = tp_sharding_summary(sharded)
    assert all("'tp'" not in s for s in summary.values()), summary


def test_tp_training_matches_replicated(mesh_2d):
    """dp×tp training must agree with single-device training (same keys)."""
    prob = BlackScholesBarenblatt(D=8)
    kw = dict(M=8, N=3, layers=[9, 512, 512, 1], seed=5)
    tr_plain = Trainer(prob, **kw)
    tr_tp = Trainer(prob, mesh=mesh_2d, **kw)
    r1 = tr_plain.train(4, 1e-3, log_every=2, verbose=False)
    r2 = tr_tp.train(4, 1e-3, log_every=2, verbose=False)
    np.testing.assert_allclose(r1.graph[1], r2.graph[1], rtol=1e-3)


def test_tp_alternates_column_and_row(mesh_2d, rng_key):
    """Regression: the plan must alternate column/row in forward layer order
    (Megatron pairing), independent of how module names parse."""
    net = MLP(layers=(9, 512, 512, 512, 1), activation="sine")
    params = net.init(rng_key, jnp.ones((1, 9)))
    summary = tp_sharding_summary(shard_params_tp(params, mesh_2d))
    kernel_specs = [v for k, v in sorted(summary.items()) if k.endswith("kernel")]
    col = [s for s in kernel_specs if "None, 'tp'" in s]
    row = [s for s in kernel_specs if "'tp'," in s and not "None, 'tp'" in s]
    assert col and row, kernel_specs


def test_plan_alternation_skips_narrow_layers(rng_key):
    """A too-narrow middle layer must not flip the col/row phase: the
    alternation index advances only on kernels that actually shard."""
    from dnnpde_tpu.parallel import plan_tp_specs

    net = MLP(layers=(9, 512, 32, 32, 512, 1), activation="sine")
    params = net.init(rng_key, jnp.ones((1, 9)))
    from jax.sharding import PartitionSpec as P

    plan = plan_tp_specs(params, min_shard_dim=512)
    # forward order: (9,512)->col, (512,32)->row (contracting dim wide
    # enough), (32,32)->replicated WITHOUT advancing the phase, (32,512)->col
    # (still column's turn), (512,1)->row.
    specs = [s for _, s in sorted(plan.items())]
    assert specs == [
        P(None, "tp"), P("tp", None), P(), P(None, "tp"), P("tp", None)
    ], plan


@pytest.mark.parametrize("mode,extra", [("NAIS-Net", "_StableBlockDense"),
                                        ("SDEnet", "brownian_kernel")])
def test_tp_irregular_nets_step(mesh_2d, mode, extra):
    """NaisNet/SDENet param trees contain non-Dense_k names; TP placement
    must stay structural (no string-parsed depth) and the full dp x tp
    training step must run to a finite loss."""
    prob = BlackScholesBarenblatt(D=8)
    tr = Trainer(
        prob, M=8, N=3, layers=[9, 512, 512, 1], mode=mode,
        activation="Sine", mesh=mesh_2d, seed=3,
    )
    summary = tp_sharding_summary(tr.params)
    assert any(extra in k for k in summary), summary.keys()
    assert any("'tp'" in s for s in summary.values()), summary
    res = tr.train(2, 1e-3, log_every=2, verbose=False)
    assert np.isfinite(res.graph[1]).all()
