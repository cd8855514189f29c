"""Solver tests: rollout correctness vs a hand-rolled reference loop, loss
semantics, gradient flow, terminal penalties, Heston 2-factor contract."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dnnpde_tpu.nets import build_network
from dnnpde_tpu.pde import BlackScholesBarenblatt, CallOption1D, HestonPDE
from dnnpde_tpu.sim import brownian_paths
from dnnpde_tpu.solver import SolverConfig, make_loss_fn, make_net_u, make_path_loss_fn


def _setup(problem, M=8, N=6, width=16, seed=0):
    layers = [problem.dim + 1] + [width] * 4 + [1]
    net = build_network("FC", layers, "Sine")
    params = net.init(jax.random.PRNGKey(seed), jnp.ones((1, problem.dim + 1)))
    return net, params


def _reference_loop_loss(problem, net, params, t, W, X0):
    """Direct port of the reference's Python loop semantics
    (1d_BSPDE_case.py:246-289) used as a golden model for the scan."""
    net_u = make_net_u(net, transform=problem.transform_u)

    t0, W0 = t[:, 0, :], W[:, 0, :]
    Y0, Z0 = net_u(params, t0, X0)
    loss = 0.0
    Xs, Ys = [X0], [Y0]
    N = t.shape[1] - 1
    for n in range(N):
        t1, W1 = t[:, n + 1, :], W[:, n + 1, :]
        dW = W1 - W0
        sig = problem.sigma(t0, X0, Y0)
        sdw = problem.sigma_dw(sig, dW)
        X1 = X0 + problem.mu(t0, X0, Y0, Z0) * (t1 - t0) + sdw
        Y1_tilde = (
            Y0
            + problem.phi(t0, X0, Y0, Z0) * (t1 - t0)
            + jnp.sum(Z0 * sdw, axis=-1, keepdims=True)
        )
        Y1, Z1 = net_u(params, t1, X1)
        loss = loss + jnp.sum((Y1 - Y1_tilde) ** 2)
        t0, W0, X0, Y0, Z0 = t1, W1, X1, Y1, Z1
        Xs.append(X0)
        Ys.append(Y0)
    loss = loss + jnp.sum((Y0 - problem.g(X0)) ** 2)
    dz = Z0 - problem.Dg(X0)
    if problem.z_penalty_mask is not None:
        dz = dz * problem.z_penalty_mask
    loss = loss + jnp.sum(dz**2)
    return loss, jnp.stack(Xs, 1), jnp.stack(Ys, 1)


@pytest.mark.parametrize("problem", [
    BlackScholesBarenblatt(D=5),
    CallOption1D(D=1),
    HestonPDE(),  # default since r4: BS control-variate head, Cholesky
    HestonPDE(clamp_output=False),  # r3 plain output
    HestonPDE(diffusion="reference"),  # reference sigma matrix (bug #4 parity)
    HestonPDE(clamp_output=True, clamp_smoothing="anchor"),  # payoff anchor
    HestonPDE(clamp_output=True, clamp_smoothing="hard"),  # reference max(u, 0)
])
def test_scan_matches_reference_loop(problem, rng_key):
    net, params = _setup(problem)
    M, N = 8, 6
    t, W = brownian_paths(rng_key, M, N, problem.noise_dim, problem.T)
    X0 = jnp.broadcast_to(problem.x0, (M, problem.dim))

    path_loss = make_path_loss_fn(problem, net, SolverConfig(remat=False))
    res = path_loss(params, t, W, X0)
    ref_loss, ref_X, ref_Y = _reference_loop_loss(problem, net, params, t, W, X0)

    np.testing.assert_allclose(float(res.loss), float(ref_loss), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(res.X), np.asarray(ref_X), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(res.Y), np.asarray(ref_Y), rtol=1e-4, atol=1e-5)
    assert float(res.Y0) == pytest.approx(float(ref_Y[0, 0, 0]), rel=1e-5)


def test_remat_matches_no_remat(rng_key):
    problem = BlackScholesBarenblatt(D=4)
    net, params = _setup(problem)
    t, W = brownian_paths(rng_key, 4, 5, problem.dim, problem.T)
    X0 = jnp.broadcast_to(problem.x0, (4, problem.dim))
    l1 = make_path_loss_fn(problem, net, SolverConfig(remat=False))(params, t, W, X0)
    l2 = make_path_loss_fn(problem, net, SolverConfig(remat=True))(params, t, W, X0)
    np.testing.assert_allclose(float(l1.loss), float(l2.loss), rtol=1e-6)
    # gradients agree too
    g1 = jax.grad(lambda p: make_path_loss_fn(problem, net, SolverConfig(remat=False))(p, t, W, X0).loss)(params)
    g2 = jax.grad(lambda p: make_path_loss_fn(problem, net, SolverConfig(remat=True))(p, t, W, X0).loss)(params)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_net_u_gradient_is_batched_jacobian(rng_key):
    """Z from the VJP trick must equal per-sample jacfwd of u wrt X."""
    problem = BlackScholesBarenblatt(D=3)
    net, params = _setup(problem)
    net_u = make_net_u(net)
    t = jnp.full((5, 1), 0.3)
    X = jax.random.normal(rng_key, (5, 3))
    u, Z = net_u(params, t, X)

    def u_single(x):
        inp = jnp.concatenate([jnp.array([0.3]), x])[None, :]
        return net.apply(params, inp)[0, 0]

    for i in range(5):
        ji = jax.grad(u_single)(X[i])
        np.testing.assert_allclose(np.asarray(Z[i]), np.asarray(ji), rtol=1e-4, atol=1e-6)


def test_clamped_net_u_zero_gradient_region(rng_key):
    """With clamp_u=0, Z must vanish where the raw net output is negative
    (Heston clamp semantics, heston_dnnpde.py:568)."""
    problem = HestonPDE()
    net, params = _setup(problem)
    # shift final bias very negative so u_raw < 0 everywhere
    flat = jax.tree_util.tree_map(lambda x: x, params)
    net_u = make_net_u(net, clamp_u=0.0)
    t = jnp.zeros((4, 1))
    X = jnp.abs(jax.random.normal(rng_key, (4, 2))) + 0.5
    # force raw output negative by subtracting a large constant via params:
    leaves, treedef = jax.tree_util.tree_flatten(params)
    # last bias is the output bias (shape (1,))
    idx = [i for i, l in enumerate(leaves) if l.shape == (1,)][-1]
    leaves[idx] = leaves[idx] - 1e3
    params_neg = jax.tree_util.tree_unflatten(treedef, leaves)
    u, Z = net_u(params_neg, t, X)
    assert np.allclose(np.asarray(u), 0.0)
    assert np.allclose(np.asarray(Z), 0.0)


def test_heston_clamp_output_opt_out(rng_key):
    """clamp_output=False removes the training-time clamp: u can be negative
    and gradients do NOT vanish in the region where the clamped problem's
    u≡0 absorbing state lives (the measured ~1/3 collapse mode of long
    anneals — see heston.py docstring)."""
    p_off = HestonPDE(clamp_output=False)  # r3 plain output
    assert p_off.clamp_u is None
    assert HestonPDE().clamp_u is None  # r4 bs default: a head, not a clamp
    assert HestonPDE(clamp_output=True, clamp_smoothing="anchor").clamp_u == 0.0
    net, params = _setup(p_off)
    net_u = make_net_u(net, p_off.clamp_u)
    leaves, treedef = jax.tree_util.tree_flatten(params)
    idx = [i for i, l in enumerate(leaves) if l.shape == (1,)][-1]
    leaves[idx] = leaves[idx] - 1e3
    params_neg = jax.tree_util.tree_unflatten(treedef, leaves)
    t = jnp.zeros((4, 1))
    X = jnp.abs(jax.random.normal(rng_key, (4, 2))) + 0.5
    u, Z = net_u(params_neg, t, X)
    assert (np.asarray(u) < 0.0).all()  # no clamp
    assert np.abs(np.asarray(Z)).max() > 0.0  # gradients alive


def test_loss_gradient_nonzero(rng_key):
    problem = CallOption1D()
    net, params = _setup(problem)
    t, W = brownian_paths(rng_key, 8, 5, 1, problem.T)
    X0 = jnp.ones((8, 1))
    g = jax.grad(lambda p: make_path_loss_fn(problem, net)(p, t, W, X0).loss)(params)
    total = sum(float(jnp.sum(jnp.abs(x))) for x in jax.tree_util.tree_leaves(g))
    assert total > 0


def test_heston_z_mask_applied(rng_key):
    """Terminal Z-penalty must only see Z_S for Heston (mask [1,0])."""
    problem = HestonPDE()
    mask = np.asarray(problem.z_penalty_mask)
    assert mask.tolist() == [1.0, 0.0]


def test_xi_broadcast_single_initial_state(rng_key):
    problem = BlackScholesBarenblatt(D=3)
    net, params = _setup(problem)
    t, W = brownian_paths(rng_key, 6, 4, 3, problem.T)
    loss_fn = make_path_loss_fn(problem, net)
    r1 = loss_fn(params, t, W, problem.x0[None, :])  # Xi (1, D) broadcast
    r2 = loss_fn(params, t, W, jnp.broadcast_to(problem.x0, (6, 3)))
    np.testing.assert_allclose(float(r1.loss), float(r2.loss), rtol=1e-6)


def test_as_callable_problem_trains(rng_key):
    """Custom-problem extension API: plain functions → trainable problem."""
    from dnnpde_tpu.pde import as_callable_problem
    from dnnpde_tpu.train import Trainer

    prob = as_callable_problem(
        dim=2, T=1.0, x0=[1.0, 1.0],
        mu=lambda t, X, Y, Z: 0.05 * X,
        sigma=lambda t, X, Y: 0.2 * X,
        phi=lambda t, X, Y, Z: 0.05 * Y,
        g=lambda X: jnp.sum(X**2, axis=-1, keepdims=True),
        name="custom-test",
    )
    assert prob.dim == 2 and prob.sigma_kind == "diag"
    tr = Trainer(prob, M=8, N=3, layers=[3, 16, 16, 16, 16, 1], seed=0)
    res = tr.train(4, 1e-3, log_every=2, verbose=False)
    assert np.isfinite(res.graph[1]).all()


def test_time_major_batch_layout(rng_key):
    from dnnpde_tpu.sim import time_major_batch

    ts, dWs = time_major_batch(rng_key, M=6, N=4, D=3, T=2.0)
    assert ts.shape == (5, 6, 1) and dWs.shape == (4, 6, 3)
    np.testing.assert_allclose(np.asarray(ts[:, 0, 0]), [0, 0.5, 1.0, 1.5, 2.0])


def test_path_loss_sensitive_to_start_time(rng_key):
    """loss must honor the given t grid's start (reference predict allows
    arbitrary t*; a t0-shift changes the net inputs)."""
    problem = BlackScholesBarenblatt(D=3)
    net, params = _setup(problem)
    t, W = brownian_paths(rng_key, 6, 4, 3, problem.T)
    loss_fn = make_path_loss_fn(problem, net)
    r1 = loss_fn(params, t, W, problem.x0[None, :])
    r2 = loss_fn(params, t + 0.3, W, problem.x0[None, :])
    assert float(r1.loss) != pytest.approx(float(r2.loss), rel=1e-6)


def test_heston_smoothed_payoff():
    """payoff_type='continuous' must be smooth at the strike and agree with
    the hard payoff away from it (reference heston_dnnpde.py:551-556)."""
    hard = HestonPDE(payoff_type="discontinuous")
    soft = HestonPDE(payoff_type="continuous")
    S = jnp.linspace(0.5, 1.5, 101)[:, None]
    X = jnp.concatenate([S, jnp.full_like(S, 0.2)], axis=1)
    gh = np.asarray(hard.g(X))[:, 0]
    gs = np.asarray(soft.g(X))[:, 0]
    # agree in the wings (the reference's sigmoid form yields small negative
    # values below the strike — ~-(K-S)·sigmoid(-alpha(K-S)); tolerate it)
    np.testing.assert_allclose(gs[:10], gh[:10], atol=1e-2)
    np.testing.assert_allclose(gs[-10:], gh[-10:], atol=1e-2)
    # smoothed at the kink: value at S=K is (S-K)/2 = 0 but with finite slope
    dgs = np.gradient(gs, np.asarray(S[:, 0]))
    assert np.abs(np.diff(dgs)).max() < 0.2  # no jump in slope
    dgh = np.gradient(gh, np.asarray(S[:, 0]))
    assert np.abs(np.diff(dgh)).max() > 0.2  # hard payoff has the kink

    with pytest.raises(ValueError):
        HestonPDE(payoff_type="banana").g(X)


def test_smoothed_payoff_gradient_stable_at_extremes():
    """The sigmoid-smoothed payoff must have finite value AND gradient far
    from the strike (the naive z/(1+exp(-az)) form NaNs in the VJP)."""
    p = HestonPDE(payoff_type="continuous")
    X = jnp.asarray([[200.0, 0.2], [-200.0, 0.2], [1.0, 0.2]])
    g = p.g(X)
    assert np.isfinite(np.asarray(g)).all()
    dg = p.Dg(X)
    assert np.isfinite(np.asarray(dg)).all()
    # far ITM: payoff ≈ S-K, delta ≈ 1
    assert float(g[0, 0]) == pytest.approx(199.0, rel=1e-3)
    assert float(dg[0, 0]) == pytest.approx(1.0, abs=1e-3)


def test_softplus_clamp_no_absorbing_state(rng_key):
    """clamp_smoothing="softplus" keeps u >= 0 with a NONZERO gradient where
    the hard clamp's gradient is identically zero (the absorbing state)."""
    problem_hard = HestonPDE(clamp_output=True, clamp_smoothing="hard")
    problem_soft = HestonPDE(clamp_output=True, clamp_smoothing="softplus",
                             smooth_beta=50.0)
    net, params = _setup(problem_hard)
    # Bias the net so u is strongly negative everywhere → hard clamp floor
    neg = jax.tree_util.tree_map(lambda x: x, params)
    import flax
    neg = flax.core.unfreeze(neg) if hasattr(flax.core, "unfreeze") else dict(neg)
    from dnnpde_tpu.solver import make_net_u

    t = jnp.zeros((4, 1))
    X = jnp.broadcast_to(problem_hard.x0, (4, 2)) * 0.5

    def u_and_grad(problem):
        nu = make_net_u(net, problem.clamp_u, False,
                        problem.clamp_mode, problem.clamp_beta)
        # shift params output bias far negative via a wrapper
        def shifted_apply(p, inp, **kw):
            # u - c ~ -0.3: the regime a collapsing run actually traverses
            # (softplus(-250) would underflow f32; the protection matters on
            # the way down, not at the bottom)
            return net.apply(p, inp, **kw) - 0.3
        class _N:  # minimal shim with .apply
            apply = staticmethod(shifted_apply)
        nu2 = make_net_u(_N, problem.clamp_u, False,
                         problem.clamp_mode, problem.clamp_beta)
        return nu2(params, t, X)

    u_h, Z_h = u_and_grad(problem_hard)
    u_s, Z_s = u_and_grad(problem_soft)
    # hard: clamped to exactly 0 with zero gradient (absorbing)
    np.testing.assert_allclose(np.asarray(u_h), 0.0, atol=1e-7)
    np.testing.assert_allclose(np.asarray(Z_h), 0.0, atol=1e-7)
    # softplus: floor near 0 but strictly positive, gradient NONZERO
    assert float(jnp.min(u_s)) > 0.0
    assert float(jnp.max(jnp.abs(Z_s))) > 0.0
    # and in the interior (u >> 0) the two agree
    def pos_apply(p, inp, **kw):
        return net.apply(p, inp, **kw) + 5.0
    class _P:
        apply = staticmethod(pos_apply)
    u_hp, _ = make_net_u(_P, 0.0, False, "hard")(params, t, X)
    u_sp, _ = make_net_u(_P, 0.0, False, "softplus", 50.0)(params, t, X)
    np.testing.assert_allclose(np.asarray(u_hp), np.asarray(u_sp), rtol=1e-5)


def test_clamp_mode_validation():
    from dnnpde_tpu.nets import build_network
    from dnnpde_tpu.solver import make_net_u

    net = build_network("FC", [3, 8, 1], "Sine")
    with pytest.raises(ValueError):
        make_net_u(net, 0.0, False, "banana")


# --------------------------- payoff-anchored Heston parametrization ----------

def test_anchor_terminal_condition_exact():
    """At t=T the anchor head vanishes (√τ factor), so u(T,·) = floor(T,·)
    = g EXACTLY for ANY raw net output — both terminal penalties are zero by
    construction."""
    p = HestonPDE(clamp_output=True, clamp_smoothing="anchor")
    assert p.clamp_mode == "anchor"
    S = jnp.linspace(0.3, 2.0, 9)[:, None]
    X = jnp.concatenate([S, jnp.full_like(S, 0.2)], axis=1)
    tT = jnp.full((9, 1), p.T)
    for raw_val in (-5.0, 0.0, 7.0):
        u = p.transform_u(tT, X, jnp.full((9, 1), raw_val))
        np.testing.assert_allclose(np.asarray(u), np.asarray(p.g(X)), atol=1e-7)


def test_anchor_floor_is_call_lower_bound():
    p = HestonPDE(clamp_output=True, clamp_smoothing="anchor")
    t = jnp.full((5, 1), 0.25)
    S = jnp.asarray([0.5, 0.9, 1.0, 1.2, 2.0])[:, None]
    X = jnp.concatenate([S, jnp.full_like(S, 0.2)], axis=1)
    tau = p.T - 0.25
    expected = np.maximum(np.asarray(S) - p.strike * np.exp(-p.r * tau), 0.0)
    np.testing.assert_allclose(
        np.asarray(p.intrinsic_floor(t, X)), expected, rtol=1e-6
    )
    # u >= floor for any raw output (head is strictly positive before T)
    u = p.transform_u(t, X, jnp.full((5, 1), -30.0))
    assert (np.asarray(u) >= expected - 1e-7).all()


def test_anchor_no_absorbing_state(rng_key):
    """The collapse mode (u pinned at 0 at the money with zero gradient) is
    structurally impossible: at (S0, v0, t=0) u >= floor > 0, and ∂u/∂raw =
    √τ·sigmoid(raw+shift) > 0 for t < T — gradients NEVER all vanish."""
    p = HestonPDE(clamp_output=True, clamp_smoothing="anchor")
    net, params = _setup(p)
    net_u = make_net_u(net, transform=p.transform_u)
    # drive the raw output far negative — the hard clamp's collapse regime
    leaves, treedef = jax.tree_util.tree_flatten(params)
    idx = [i for i, l in enumerate(leaves) if l.shape == (1,)][-1]
    leaves[idx] = leaves[idx] - 30.0
    params_neg = jax.tree_util.tree_unflatten(treedef, leaves)
    t = jnp.zeros((4, 1))
    X = jnp.broadcast_to(p.x0, (4, 2))
    u, Z = net_u(params_neg, t, X)
    floor0 = float(p.S0 - p.strike * np.exp(-p.r * p.T))
    assert (np.asarray(u)[:, 0] >= floor0 - 1e-6).all()  # never 0
    # parameter gradient of u is nonzero (training can always recover)
    g = jax.grad(
        lambda pr: jnp.sum(net_u(pr, t, X)[0])
    )(params_neg)
    total = sum(float(jnp.sum(jnp.abs(x))) for x in jax.tree_util.tree_leaves(g))
    assert total > 0.0


def test_anchor_z_includes_floor_delta():
    """Z_S through the anchor = ∂floor/∂S + head term: deep ITM with a
    saturated head, delta → 1 (the floor's delta), not 0."""
    p = HestonPDE(clamp_output=True, clamp_smoothing="anchor")
    net, params = _setup(p)
    net_u = make_net_u(net, transform=p.transform_u)
    leaves, treedef = jax.tree_util.tree_flatten(params)
    idx = [i for i, l in enumerate(leaves) if l.shape == (1,)][-1]
    leaves[idx] = leaves[idx] - 30.0  # saturate the head
    params_neg = jax.tree_util.tree_unflatten(treedef, leaves)
    t = jnp.zeros((1, 1))
    X = jnp.asarray([[1.8, 0.2]])  # deep ITM
    _, Z = net_u(params_neg, t, X)
    assert float(Z[0, 0]) == pytest.approx(1.0, abs=1e-3)


def test_scan_unroll_preserves_loss(rng_key):
    """SolverConfig.unroll is a pure scheduling knob: the rollout loss must
    be identical (to float assoc tolerance) for any unroll factor."""
    from dnnpde_tpu.solver.bsde import SolverConfig, make_loss_fn
    from dnnpde_tpu.sim.brownian import time_grid

    problem = BlackScholesBarenblatt(D=4)
    net, params = _setup(problem)
    M, N = 8, 9
    ts = jnp.swapaxes(time_grid(M, N, problem.T, jnp.float32), 0, 1)
    dWs = 0.1 * jax.random.normal(rng_key, (N, M, problem.dim))
    X0 = jnp.broadcast_to(jnp.asarray(problem.x0, jnp.float32), (M, problem.dim))
    losses = []
    for unroll in (1, 2, 4):
        loss_fn = make_loss_fn(problem, net,
                               SolverConfig(remat=False, unroll=unroll))
        losses.append(float(loss_fn(params, ts, dWs, X0, rng_key).loss))
    np.testing.assert_allclose(losses[1:], losses[0], rtol=1e-6)


def test_bs_anchor_terminal_condition_exact():
    """BS control-variate mode: at t=T, BS(τ=0) = g exactly and the √τ
    factor kills the head — u(T,·) = g for ANY raw output, so both terminal
    penalties vanish by construction (same property as the payoff anchor,
    without its kink at t < T)."""
    p = HestonPDE(clamp_output=True, clamp_smoothing="bs")
    S = jnp.linspace(0.3, 2.0, 9)[:, None]
    X = jnp.concatenate([S, jnp.full_like(S, 0.2)], axis=1)
    tT = jnp.full((9, 1), p.T)
    for raw in (jnp.full((9, 1), -7.0), jnp.zeros((9, 1)), jnp.full((9, 1), 4.0)):
        u = p.transform_u(tT, X, raw)
        np.testing.assert_allclose(np.asarray(u), np.asarray(p.g(X)),
                                   rtol=1e-6, atol=1e-7)


def test_bs_anchor_smooth_at_the_forward_strike():
    """Unlike the intrinsic-value anchor (kinked at S = K·e^{−rτ} for all
    t < T — the measured +8–10% bias mechanism), the BS base is C∞ in S for
    τ > 0: the second derivative of the transform (raw held fixed) must be
    finite and CONTINUOUS across the forward strike."""
    p = HestonPDE(clamp_output=True, clamp_smoothing="bs")
    t = jnp.full((1, 1), 0.5)
    Kf = float(p.strike * np.exp(-p.r * (p.T - 0.5)))

    def u_of_S(s):
        X = jnp.asarray([[s, 0.2]])
        return p.transform_u(t, X, jnp.zeros((1, 1)))[0, 0]

    gamma = jax.grad(jax.grad(u_of_S))
    eps = 1e-3
    g_lo, g_at, g_hi = (float(gamma(jnp.asarray(s)))
                        for s in (Kf - eps, Kf, Kf + eps))
    assert np.isfinite([g_lo, g_at, g_hi]).all()
    assert abs(g_hi - g_lo) < 0.05 * abs(g_at)  # continuous, no kink jump

    # the anchor mode's floor, by contrast, jumps by ~1 unit of delta there
    pa = HestonPDE(clamp_output=True, clamp_smoothing="anchor")

    def floor_delta(s):
        X = jnp.asarray([[s, 0.2]])
        return jax.grad(
            lambda ss: pa.intrinsic_floor(t, jnp.asarray([[ss, 0.2]]))[0, 0]
        )(s)

    assert float(floor_delta(Kf + 1e-3)) - float(floor_delta(Kf - 1e-3)) > 0.9


def test_bs_anchor_base_is_bs_price():
    """raw = 0 at t < T gives exactly the BS price at σ = √v (the control
    variate itself)."""
    from dnnpde_tpu.numerics import black_scholes_call

    t = jnp.full((3, 1), 0.25)
    S = jnp.asarray([0.8, 1.0, 1.3])[:, None]
    v = jnp.asarray([0.1, 0.2, 0.3])[:, None]
    X = jnp.concatenate([S, v], axis=1)
    tau = p0.T - 0.25 if (p0 := HestonPDE(bs_cdf="erf")) else None
    # exact-CDF variant: base == erf BS price to float tolerance
    u = p0.transform_u(t, X, jnp.zeros((3, 1)))
    for i in range(3):
        bs = float(black_scholes_call(float(S[i, 0]), p0.strike, tau, p0.r,
                                      float(jnp.sqrt(v[i, 0]))))
        assert float(u[i, 0]) == pytest.approx(bs, rel=1e-5)
    # default tanh-CDF variant: within the documented ~3e-4 CDF accuracy
    # (the compile-time trade, numerics.black_scholes._cdf_tanh)
    p1 = HestonPDE()  # bs + tanh is the r4 default
    u1 = p1.transform_u(t, X, jnp.zeros((3, 1)))
    for i in range(3):
        bs = float(black_scholes_call(float(S[i, 0]), p1.strike, tau, p1.r,
                                      float(jnp.sqrt(v[i, 0]))))
        assert abs(float(u1[i, 0]) - bs) < 6e-4


# --------------------------------------------------- local (backward) objective
def _grid(M, N, T=1.0):
    ts = jnp.broadcast_to(
        jnp.linspace(0.0, T, N + 1)[:, None, None], (N + 1, M, 1)
    )
    dWs = 0.1 * jax.random.normal(jax.random.PRNGKey(3), (N, M, 1))
    return ts, dWs


def test_local_objective_stopgrad_equals_frozen_target():
    """The same-params local objective detaches its targets: its gradient
    must EQUAL the gradient of the two-tree form evaluated with the target
    tree frozen at the same values (and the target tree's own gradient
    must be exactly zero)."""
    p = CallOption1D(D=1)
    net, params = _setup(p)
    loss_fn = make_loss_fn(p, net, SolverConfig(remat=False, objective="local"))
    M, N = 8, 6
    ts, dWs = _grid(M, N, p.T)
    X0 = jnp.broadcast_to(p.x0, (M, 1))

    g_same = jax.grad(lambda q: loss_fn(q, ts, dWs, X0).loss)(params)
    g_two = jax.grad(
        lambda q: loss_fn(q, ts, dWs, X0, target_params=params).loss
    )(params)
    for a, b in zip(jax.tree.leaves(g_same), jax.tree.leaves(g_two)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)

    g_tgt = jax.grad(
        lambda q: loss_fn(params, ts, dWs, X0, target_params=q).loss
    )(params)
    assert all(
        float(jnp.abs(leaf).max()) == 0.0 for leaf in jax.tree.leaves(g_tgt)
    )


def test_local_objective_loss_value_matches_global_residuals():
    """Primal VALUES agree between objectives on the same inputs: both sum
    (Y_n − Ỹ_n)² over interior steps — only the final-step target differs
    (u(T, X_N) vs g(X_N)) and the gradient routing. Compare after removing
    that one term."""
    p = CallOption1D(D=1)
    net, params = _setup(p)
    M, N = 8, 6
    ts, dWs = _grid(M, N, p.T)
    X0 = jnp.broadcast_to(p.x0, (M, 1))
    parts = {}
    for obj in ("global", "local"):
        loss_fn = make_loss_fn(
            p, net, SolverConfig(remat=False, objective=obj)
        )
        res = loss_fn(params, ts, dWs, X0)
        parts[obj] = res
        assert np.isfinite(float(res.loss))
        np.testing.assert_allclose(
            np.asarray(res.Y0), np.asarray(parts["global"].Y0)
        )
    # reconstruct: global − (Y_N − Ỹ_N)² + (g(X_N) − Ỹ_N)² == local.
    # Recover Ỹ_N from the rollout the result exposes.
    net_u = make_net_u(net, transform=p.transform_u)
    X = parts["global"].X
    Y = parts["global"].Y
    # replay the last EM step to get Ỹ_N exactly as the scan produced it
    t_prev = ts[N - 1]
    X_prev = X[:, N - 1, :]
    Yp, Zp = net_u(params, t_prev, X_prev)
    sig = p.sigma(t_prev, X_prev, Yp)
    sdw = p.sigma_dw(sig, dWs[N - 1])
    Ytilde_N = (
        Yp + p.phi(t_prev, X_prev, Yp, Zp) * (ts[N] - t_prev)
        + jnp.sum(Zp * sdw, axis=-1, keepdims=True)
    )
    XN, YN = X[:, N, :], Y[:, N, :]
    delta = float(
        jnp.sum((p.g(XN) - Ytilde_N) ** 2) - jnp.sum((YN - Ytilde_N) ** 2)
    )
    np.testing.assert_allclose(
        float(parts["local"].loss), float(parts["global"].loss) + delta,
        rtol=1e-5,
    )


def test_path_weights_scale_loss_exactly():
    """w ≡ 1 reproduces the unweighted loss bit-for-bit; w ≡ 2 doubles it
    (every residual and both terminal penalties scale per path)."""
    p = CallOption1D(D=1)
    net, params = _setup(p)
    M, N = 8, 6
    ts, dWs = _grid(M, N, p.T)
    X0 = jnp.broadcast_to(p.x0, (M, 1))
    base = make_loss_fn(p, net, SolverConfig(remat=False))(
        params, ts, dWs, X0
    ).loss
    for c in (1.0, 2.0):
        w_fn = lambda X0, c=c: jnp.full((X0.shape[0],), c)
        got = make_loss_fn(
            p, net, SolverConfig(remat=False, path_weight_fn=w_fn)
        )(params, ts, dWs, X0).loss
        np.testing.assert_allclose(float(got), c * float(base), rtol=1e-6)


def test_local_objective_trains_call_option():
    """End-to-end sanity on CPU: the local objective (both same-params and
    EMA-target variants) trains the 1D call toward the BS oracle."""
    from dnnpde_tpu.numerics import black_scholes_call
    from dnnpde_tpu.train import Trainer

    p = CallOption1D(D=1)
    bs = float(black_scholes_call(1.0, p.K, p.T, p.r, p.sigma_bar))
    # local_ema's frozen targets lag the params by ~1/(1−decay) iterations,
    # so the backward value propagation needs a larger budget (measured:
    # 0.99/2400 → 2.7%; 0.99/1200 → 20%).
    for obj, iters, kw in (
        ("local", 1200, {}),
        ("local_ema", 2400, {"ema_decay": 0.99}),
    ):
        tr = Trainer(p, M=64, N=8, layers=[2, 32, 32, 1], seed=0,
                     objective=obj, **kw)
        tr.train(iters, 1e-3, log_every=400, verbose=False)
        u, _ = tr.net_u(tr.params, jnp.zeros((1, 1)),
                        jnp.asarray([[1.0]], jnp.float32))
        err = abs(float(u[0, 0]) - bs) / bs
        assert err < 0.05, (obj, float(u[0, 0]), bs)


def test_local_ema_requires_ema_decay():
    from dnnpde_tpu.train import Trainer

    with pytest.raises(ValueError, match="local_ema"):
        Trainer(CallOption1D(D=1), M=8, N=4, layers=[2, 8, 8, 1],
                objective="local_ema")
    with pytest.raises(ValueError, match="objective"):
        Trainer(CallOption1D(D=1), M=8, N=4, layers=[2, 8, 8, 1],
                objective="banana")


# --- z-matching auxiliary loss (round 5, VERDICT r4 #5) --------------------


class _LinearNet:
    """Exactly-linear 'net' u(t, x) = w_t·t + w·x + b — make_loss_fn only
    needs ``.apply(params, inp)``, so the z-matching algebra can be tested
    against a model whose gradient is KNOWN in closed form."""

    def apply(self, params, inp):
        return inp @ params["w"] + params["b"]


def _linear_params(wt, w1, w2):
    return {
        "w": jnp.asarray([[wt], [w1], [w2]], jnp.float32),
        "b": jnp.zeros((1,), jnp.float32),
    }


def _linmart_problem(a=0.7, b=0.3, s=(1.0, 0.4), g_coeffs=None):
    """2-D synthetic: mu = 0, phi = 0, constant diagonal sigma, linear
    payoff g = a·x1 + b·x2 — the true solution is the martingale
    u(t, x) = a·x1 + b·x2 with constant gradient (a, b)."""
    from dnnpde_tpu.pde import as_callable_problem

    ga, gb = g_coeffs if g_coeffs is not None else (a, b)
    s_arr = jnp.asarray(s, jnp.float32)
    return as_callable_problem(
        dim=2, T=1.0, x0=(1.0, 1.0),
        mu=lambda t, X, Y, Z: jnp.zeros_like(X),
        sigma=lambda t, X, Y: jnp.broadcast_to(s_arr, X.shape),
        phi=lambda t, X, Y, Z: jnp.zeros_like(Y),
        g=lambda X: ga * X[..., 0:1] + gb * X[..., 1:2],
        name="linmart",
    )


def _zmatch_extra(problem, params, M=4096, N=4, weight=1.0, mask=(0.0, 1.0),
                  seed=11):
    """z-matching loss component = loss(z_match on) − loss(z_match off)
    on identical inputs."""
    net = _LinearNet()
    base = SolverConfig(remat=False, objective="local")
    zcfg = SolverConfig(remat=False, objective="local",
                        z_match_weight=weight, z_match_mask=mask)
    ts = jnp.broadcast_to(
        jnp.linspace(0.0, problem.T, N + 1)[:, None, None], (N + 1, M, 1)
    )
    dWs = jnp.sqrt(problem.T / N) * jax.random.normal(
        jax.random.PRNGKey(seed), (N, M, 2)
    )
    X0 = jnp.broadcast_to(problem.x0, (M, 2))
    l0 = float(make_loss_fn(problem, net, base)(params, ts, dWs, X0).loss)
    l1 = float(make_loss_fn(problem, net, zcfg)(params, ts, dWs, X0).loss)
    return l1 - l0


def test_z_match_requires_local_objective():
    p = CallOption1D(D=1)
    net, params = _setup(p)
    with pytest.raises(ValueError, match="z_match"):
        make_loss_fn(p, net, SolverConfig(objective="global",
                                          z_match_weight=1.0))


def test_z_match_self_consistent_model_has_zero_residual():
    """Control-variate exactness: when the target payoff is generated by
    the SAME (wrong) linear model the net implements, B = (σᵀZ)·∆W exactly
    and the z-matching residual collapses to 0 for ANY weights — the
    auxiliary loss penalizes only genuine martingale-representation
    mismatch, never self-consistent value functions."""
    for w2 in (0.3, 1.3, -0.5):
        p = _linmart_problem(a=0.7, b=w2, g_coeffs=(0.7, w2))
        extra = _zmatch_extra(p, _linear_params(0.0, 0.7, w2), M=512,
                              mask=(1.0, 1.0))
        assert abs(extra) < 1e-3, (w2, extra)


def test_z_match_identifies_the_masked_gradient_component():
    """The z-matching term is minimized (over the v-like coefficient w2)
    at the TRUE gradient b — the martingale-representation regression
    target E[B·∆W_j]/∆t = (σᵀ∇u)_j identifies the component the mask
    selects."""
    a, b = 0.7, 0.3
    p = _linmart_problem(a=a, b=b)
    at_truth = _zmatch_extra(p, _linear_params(0.0, a, b))
    lo = _zmatch_extra(p, _linear_params(0.0, a, b - 1.0))
    hi = _zmatch_extra(p, _linear_params(0.0, a, b + 1.0))
    assert at_truth < lo and at_truth < hi, (at_truth, lo, hi)
    # measured: the term is an exact quadratic with its minimum AT the true
    # coefficient (0.0 at w2=b for the linear model; 479.7 at b±0.3, 5330
    # at b±1.0 with M=4096) — assert the symmetric quadratic shape too
    mid = _zmatch_extra(p, _linear_params(0.0, a, b + 0.3))
    assert at_truth < 1e-3 and mid < 0.2 * hi, (at_truth, mid, hi)


def test_z_match_mask_is_additive_per_component():
    """Exact algebra of the mask: the z-matching term decomposes per
    Brownian component, so extra(mask=(1,0)) + extra(mask=(0,1)) ==
    extra(mask=(1,1)) and an all-zero mask contributes nothing — the mask
    only routes which components are scored."""
    p = _linmart_problem(a=0.7, b=0.3)
    params = _linear_params(0.0, 0.7, 1.1)  # deliberately WRONG w2
    kw = dict(M=512, seed=5)
    e10 = _zmatch_extra(p, params, mask=(1.0, 0.0), **kw)
    e01 = _zmatch_extra(p, params, mask=(0.0, 1.0), **kw)
    e11 = _zmatch_extra(p, params, mask=(1.0, 1.0), **kw)
    e00 = _zmatch_extra(p, params, mask=(0.0, 0.0), **kw)
    np.testing.assert_allclose(e10 + e01, e11, rtol=1e-4)
    assert abs(e00) < 1e-4 * abs(e11), (e00, e11)


def test_z_match_target_params_get_zero_gradient():
    """z-matching keeps the local objective's stop-gradient contract: the
    frozen target tree receives EXACTLY zero gradient."""
    p = HestonPDE()
    net, params = _setup(p)
    loss_fn = make_loss_fn(p, net, SolverConfig(
        remat=False, objective="local", z_match_weight=1.0,
        z_match_mask=(0.0, 1.0)))
    M, N = 8, 6
    ts = jnp.broadcast_to(
        jnp.linspace(0.0, p.T, N + 1)[:, None, None], (N + 1, M, 1)
    )
    dWs = 0.1 * jax.random.normal(jax.random.PRNGKey(3), (N, M, 2))
    X0 = jnp.broadcast_to(p.x0, (M, 2))
    res = loss_fn(params, ts, dWs, X0, target_params=params)
    assert np.isfinite(float(res.loss))
    g_tgt = jax.grad(
        lambda q: loss_fn(params, ts, dWs, X0, target_params=q).loss
    )(params)
    assert all(
        float(jnp.abs(leaf).max()) == 0.0 for leaf in jax.tree.leaves(g_tgt)
    )


def test_z_match_trainer_integration():
    """Trainer threads z_match_weight/mask into the solver config and a
    short Heston run stays finite (full-matrix sigma branch)."""
    from dnnpde_tpu.train import Trainer

    tr = Trainer(HestonPDE(), M=16, N=8, layers=[3, 16, 16, 1], seed=0,
                 objective="local", z_match_weight=0.5,
                 z_match_mask=(0.0, 1.0))
    assert tr.config.z_match_weight == 0.5
    assert tr.config.z_match_mask == (0.0, 1.0)
    tr.train(30, 1e-3, log_every=30, verbose=False)
    assert np.isfinite(tr.training_loss[-1])
