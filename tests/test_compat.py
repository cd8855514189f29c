"""Compat-API tests: the reference's composition surface must work end-to-end
and agree with the Trainer internals."""

import numpy as np

from dnnpde_tpu.compat import EulerMaruyamaScheme, LossFunction, NeuralNetworkTraining
from dnnpde_tpu.nets import build_network
from dnnpde_tpu.pde import BlackScholesBarenblatt


def test_scheme_simulate_shapes():
    sim = EulerMaruyamaScheme(np.ones((1, 3)), T=1.0, M=8, N=4, D=3, seed=0)
    t, W = sim.simulate()
    assert t.shape == (8, 5, 1) and W.shape == (8, 5, 3)
    t2, W2 = sim.simulate()
    assert not np.allclose(np.asarray(W), np.asarray(W2))  # key advances


def test_loss_function_compute():
    import jax, jax.numpy as jnp

    prob = BlackScholesBarenblatt(D=3)
    net = build_network("FC", [4, 16, 16, 16, 16, 1], "Sine")
    params = net.init(jax.random.PRNGKey(0), jnp.ones((1, 4)))
    lf = LossFunction(prob, net, params)
    sim = EulerMaruyamaScheme(np.ones((1, 3)), 1.0, 8, 4, 3)
    t, W = sim.simulate()
    loss, X, Y, Y0 = lf.compute(t, W, sim.Xi)
    assert np.isfinite(loss)
    assert X.shape == (8, 5, 3) and Y.shape == (8, 5, 1)
    assert Y0 == float(Y[0, 0, 0])


def test_neural_network_training_end_to_end():
    prob = BlackScholesBarenblatt(D=3)
    sim = EulerMaruyamaScheme(np.asarray(prob.x0)[None, :], 1.0, 8, 4, 3)
    nnt = NeuralNetworkTraining(
        prob, sim, layers=[4, 16, 16, 16, 16, 1], seed=0
    )
    graph = nnt.train(6, 1e-3)
    assert graph.shape[0] == 2
    assert np.isfinite(graph[1]).all()
    t, W = sim.simulate()
    X, Y = nnt.predict(sim.Xi, t, W)
    assert X.shape == (8, 5, 3)


def test_heston_predict_layout():
    from dnnpde_tpu.compat import heston_predict
    from dnnpde_tpu.pde import HestonPDE
    from dnnpde_tpu.train import Trainer

    tr = Trainer(HestonPDE(), M=6, N=3, layers=[3, 16, 16, 16, 16, 1], seed=0)
    t, W = tr.fetch_minibatch()
    S, v, Y = heston_predict(tr, np.asarray(tr.problem.x0)[None, :], t, W)
    assert S.shape == (6, 4, 1) and v.shape == (6, 4, 1) and Y.shape == (6, 4, 1)
    assert (S > 0).all()
