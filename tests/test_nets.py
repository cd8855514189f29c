"""Network zoo unit tests: shapes, determinism, NAIS-Net stability projection."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dnnpde_tpu.nets import MLP, NaisNet, ResNet, SDENet, VerletNet, build_network
from dnnpde_tpu.nets.networks import _nais_project

LAYERS = [11, 32, 32, 32, 32, 1]


@pytest.mark.parametrize("mode", ["FC", "Naisnet", "Resnet", "Verlet", "SDEnet"])
@pytest.mark.parametrize("activation", ["Sine", "ReLU", "Tanh"])
def test_build_and_forward_shapes(mode, activation, rng_key):
    net = build_network(mode, LAYERS, activation)
    x = jnp.ones((7, LAYERS[0]))
    rngs = {"params": rng_key}
    if mode == "SDEnet":
        rngs["sde"] = jax.random.PRNGKey(1)
    params = net.init(rngs, x)
    if mode == "SDEnet":
        y = net.apply(params, x, rngs={"sde": jax.random.PRNGKey(2)})
    else:
        y = net.apply(params, x)
    assert y.shape == (7, 1)
    assert bool(jnp.all(jnp.isfinite(y)))


def test_mlp_depths(rng_key):
    for layers in ([3, 16, 1], [3, 16, 16, 1], [3, 16, 16, 16, 16, 16, 1]):
        net = MLP(layers=tuple(layers), activation="sine")
        p = net.init(rng_key, jnp.ones((2, layers[0])))
        assert net.apply(p, jnp.ones((2, layers[0]))).shape == (2, 1)


def test_nais_projection_sqrt_step():
    """The reference's 'clip' is a square-root step: when ‖RtR‖_F > δ the
    rescale gives ‖RtR_new‖_F = √(δ·‖RtR‖_F) (Functions/naisnet.py:30-39 —
    replicated faithfully, including this quirk). A must stay symmetric with
    eigenvalues ≥ ε (RtR is PSD)."""
    key = jax.random.PRNGKey(0)
    k = jax.random.normal(key, (32, 32)) * 2.0  # big → triggers the rescale
    a = np.asarray(_nais_project(k))
    assert np.allclose(a, a.T, atol=1e-5)
    delta = 1 - 2 * 0.01
    rtr_old = np.asarray(k @ k.T)
    norm_old = np.linalg.norm(rtr_old)
    assert norm_old > delta  # the branch is exercised
    rtr_new = a - 0.01 * np.eye(32)
    np.testing.assert_allclose(
        np.linalg.norm(rtr_new), np.sqrt(delta * norm_old), rtol=1e-5
    )
    eigs = np.linalg.eigvalsh(a)
    assert eigs.min() >= 0.01 - 1e-4


def test_nais_projection_no_clip_small_weights():
    k = jax.random.normal(jax.random.PRNGKey(1), (8, 8)) * 0.01
    a = np.asarray(_nais_project(k))
    rtr = np.asarray(k @ k.T)
    assert np.allclose(a, rtr + 0.01 * np.eye(8), atol=1e-6)


def test_naisnet_equals_stable_resnet(rng_key):
    """NaisNet is ResNet(stable=True) — one implementation, two names."""
    x = jnp.ones((3, LAYERS[0]))
    n1 = NaisNet(layers=tuple(LAYERS), activation="sine")
    n2 = ResNet(layers=tuple(LAYERS), stable=True, activation="sine")
    p1 = n1.init(rng_key, x)
    p2 = n2.init(rng_key, x)
    assert np.allclose(np.asarray(n1.apply(p1, x)), np.asarray(n2.apply(p2, x)))


def test_sdenet_stochastic_and_deterministic(rng_key):
    x = jnp.ones((4, LAYERS[0]))
    net = SDENet(layers=tuple(LAYERS), activation="relu")
    params = net.init({"params": rng_key, "sde": jax.random.PRNGKey(1)}, x)
    y1 = net.apply(params, x, rngs={"sde": jax.random.PRNGKey(2)})
    y2 = net.apply(params, x, rngs={"sde": jax.random.PRNGKey(3)})
    assert not np.allclose(np.asarray(y1), np.asarray(y2))  # noise differs
    det = SDENet(layers=tuple(LAYERS), activation="relu", deterministic=True)
    d1 = det.apply(params, x)
    d2 = det.apply(params, x)
    assert np.allclose(np.asarray(d1), np.asarray(d2))


def test_verletnet_requires_uniform_width(rng_key):
    with pytest.raises(ValueError):
        VerletNet(layers=(3, 16, 32, 1), activation="sine").init(
            rng_key, jnp.ones((2, 3))
        )


def test_xavier_init_scale(rng_key):
    """Xavier-uniform bound = sqrt(6/(fan_in+fan_out)) (torch parity)."""
    net = MLP(layers=(100, 100, 1), activation="relu")
    params = net.init(rng_key, jnp.ones((1, 100)))
    k = jax.tree_util.tree_leaves(params)[1]  # first kernel (bias sorts first)
    kernels = [x for x in jax.tree_util.tree_leaves(params) if x.ndim == 2]
    for k in kernels:
        fan_in, fan_out = k.shape
        bound = np.sqrt(6 / (fan_in + fan_out))
        assert np.abs(np.asarray(k)).max() <= bound + 1e-6
        # uniform on [-b, b] has std b/sqrt(3); check within 15%
        std = np.asarray(k).std()
        assert abs(std - bound / np.sqrt(3)) / (bound / np.sqrt(3)) < 0.2


@pytest.mark.parametrize("mode", ["FC", "Naisnet", "Resnet", "Verlet", "SDEnet"])
def test_compute_dtype_bf16_hidden_f32_boundary(mode, rng_key):
    """compute_dtype='bfloat16' runs hidden matmuls in bf16 but keeps params
    and the output head f32, and tracks the f32 net within bf16 noise."""
    from dnnpde_tpu.nets import build_network

    layers = [11, 32, 32, 32, 32, 1]
    kwargs = dict(deterministic=True) if mode == "SDEnet" else {}
    net16 = build_network(mode, layers, "Sine", compute_dtype="bfloat16", **kwargs)
    net32 = build_network(mode, layers, "Sine", **kwargs)
    rngs = {"params": rng_key}
    if mode == "SDEnet":
        rngs["sde"] = jax.random.PRNGKey(1)
    x = jax.random.normal(jax.random.PRNGKey(2), (8, 11))
    p = net16.init(rngs, x)
    assert all(leaf.dtype == jnp.float32 for leaf in jax.tree_util.tree_leaves(p))
    y16 = net16.apply(p, x)
    y32 = net32.apply(p, x)
    assert y16.dtype == jnp.float32
    # bf16 hidden noise is ~0.4% relative per activation; outputs stay close
    np.testing.assert_allclose(np.asarray(y16), np.asarray(y32), rtol=0.05, atol=0.05)


def test_trainer_bf16_compute_dtype_trains(rng_key):
    """Trainer(net_kwargs={'compute_dtype': 'bfloat16'}) steps to finite loss."""
    from dnnpde_tpu.pde import BlackScholesBarenblatt
    from dnnpde_tpu.train import Trainer

    prob = BlackScholesBarenblatt(D=4)
    tr = Trainer(
        prob, M=8, N=4, layers=[5, 16, 16, 16, 16, 1], mode="FC", seed=0,
        net_kwargs={"compute_dtype": "bfloat16"},
    )
    res = tr.train(6, 1e-3, log_every=3, verbose=False)
    assert np.isfinite(res.graph[1]).all()
