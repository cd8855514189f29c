"""Data-parallel sharding tests on the virtual 8-device CPU mesh.

Validates SURVEY.md §7 build-plan step 2: sharded training must (a) actually
distribute the path axis, and (b) agree with the unsharded computation (same
keys → same loss trajectory up to float reassociation).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dnnpde_tpu.parallel import DP_AXIS, batch_sharding, check_divisible, make_mesh
from dnnpde_tpu.pde import BlackScholesBarenblatt
from dnnpde_tpu.train import Trainer


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8)


def test_make_mesh_shape(mesh):
    assert mesh.shape[DP_AXIS] == 8


def test_check_divisible(mesh):
    check_divisible(16, mesh)
    with pytest.raises(ValueError):
        check_divisible(12, mesh)


def test_batch_sharding_places_shards(mesh):
    x = jnp.zeros((16, 4))
    xs = jax.device_put(x, batch_sharding(mesh))
    # each of the 8 devices holds a (2, 4) shard
    shard_shapes = {s.data.shape for s in xs.addressable_shards}
    assert shard_shapes == {(2, 4)}
    assert len(xs.addressable_shards) == 8


def test_sharded_training_matches_unsharded(mesh):
    """Same seed → same loss trajectory with and without the mesh (up to
    float32 reduction reassociation)."""
    prob = BlackScholesBarenblatt(D=4)
    kw = dict(M=16, N=4, layers=[5, 16, 16, 16, 16, 1], mode="FC",
              activation="Sine", seed=3)
    tr_single = Trainer(prob, **kw)
    tr_mesh = Trainer(prob, mesh=mesh, **kw)
    r1 = tr_single.train(6, 1e-3, log_every=3, verbose=False)
    r2 = tr_mesh.train(6, 1e-3, log_every=3, verbose=False)
    np.testing.assert_allclose(r1.graph[1], r2.graph[1], rtol=5e-4)
    # params agree after identical updates
    for a, b in zip(
        jax.tree_util.tree_leaves(tr_single.params),
        jax.tree_util.tree_leaves(tr_mesh.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5)


def test_sharded_step_compiles_with_collectives(mesh):
    """The jitted chunk under the mesh must produce a program whose loss is
    replicated (i.e. the cross-device reduction happened)."""
    prob = BlackScholesBarenblatt(D=4)
    tr = Trainer(prob, M=16, N=4, layers=[5, 16, 16, 16, 16, 1], mesh=mesh, seed=0)
    res = tr.train(2, 1e-3, log_every=2, verbose=False)
    assert np.isfinite(res.graph[1]).all()


@pytest.mark.slow  # ~9 min under xdist load; the driver runs the dryrun every round
def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_trainer_rejects_indivisible_batch(mesh):
    from dnnpde_tpu.pde import BlackScholesBarenblatt

    with pytest.raises(ValueError):
        Trainer(BlackScholesBarenblatt(D=3), M=12, N=4,
                layers=[4, 16, 16, 16, 16, 1], mesh=mesh)


def test_distributed_helpers_single_host():
    from dnnpde_tpu.parallel.distributed import global_device_summary, is_multi_host

    assert not is_multi_host()
    info = global_device_summary()
    assert info["process_count"] == 1 and info["global_devices"] >= 8
