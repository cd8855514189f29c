"""Training-layer tests: optimizer factory, schedules, refinement bucketing,
LBFGS, NaN guard, checkpointing, SDENet training, diagnostics."""

import math
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from dnnpde_tpu.pde import BlackScholesBarenblatt, CallOption1D
from dnnpde_tpu.solver import SolverConfig
from dnnpde_tpu.train import (
    OPTIMIZER_NAMES,
    StepTimer,
    TimeStepRefinement,
    Trainer,
    build_optimizer,
    detect_anomalies,
    two_phase,
)


# ------------------------------------------------------------- optimizers
@pytest.mark.parametrize("name", OPTIMIZER_NAMES)
def test_optimizer_factory_builds_and_steps(name):
    tx = build_optimizer(name, 1e-3)
    params = {"w": jnp.ones((4, 4)), "b": jnp.zeros(4)}
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    if name == "LBFGS":
        value_fn = lambda p: jnp.sum(p["w"] ** 2) + jnp.sum(p["b"] ** 2)
        updates, state = tx.update(
            grads, state, params, value=value_fn(params), grad=grads, value_fn=value_fn
        )
    else:
        updates, state = tx.update(grads, state, params)
    new = optax.apply_updates(params, updates)
    # first Adadelta step is ~lr·√eps — tiny but nonzero
    assert float(np.abs(np.asarray(new["w"]) - np.asarray(params["w"])).max()) > 0


def test_unknown_optimizer_raises():
    with pytest.raises(ValueError):
        build_optimizer("Yogi", 1e-3)


def test_gradient_clipping_in_chain():
    tx = build_optimizer("SGD", 1.0, clip_norm=1.0)
    params = {"w": jnp.zeros(3)}
    state = tx.init(params)
    big = {"w": jnp.full(3, 100.0)}
    updates, _ = tx.update(big, state, params)
    assert np.linalg.norm(np.asarray(updates["w"])) <= 1.0 + 1e-5


# -------------------------------------------------------------- schedules
def test_refinement_formula_matches_reference():
    """N = ceil(Mm^(it//4000 + 1)) for 4000 <= it < 20000; past 20000 the
    reference stops updating self.N, so the last ramp value persists
    (1d_BSPDE_case.py:371-375)."""
    Mm = 50 ** (1 / 5)
    ref = TimeStepRefinement(Mm=Mm)
    assert ref.n_at(0) == math.ceil(Mm)
    assert ref.n_at(3999) == math.ceil(Mm)
    assert ref.n_at(4000) == math.ceil(Mm**2)
    assert ref.n_at(8000) == math.ceil(Mm**3)
    # ceil((50^(1/5))^5) = ceil(50.00000000000001) = 51 — float round-trip,
    # identical in the reference's own formula
    assert ref.n_at(16000) == math.ceil(Mm**5) == 51
    # persist-last-N semantics: a 30k-iter run stays at the fine grid
    assert ref.n_at(20000) == math.ceil(Mm**5)
    assert ref.n_at(30000) == math.ceil(Mm**5)
    # n_cap still applies past the ramp
    assert TimeStepRefinement(Mm=Mm, n_cap=40).n_at(25000) == 40


def test_refinement_buckets_contiguous():
    ref = TimeStepRefinement(Mm=2.0)
    buckets = list(ref.buckets(3900, 300))
    # [3900, 4000) at N=2, [4000, 4200) at N=4
    assert buckets == [(3900, 100, 2), (4000, 200, 4)]


def test_two_phase_spec():
    p1, p2 = two_phase()
    assert (p1.n_iter, p1.learning_rate) == (2000, 1e-3)
    assert (p2.n_iter, p2.learning_rate) == (500, 1e-5)


def test_trainer_applies_refinement():
    prob = BlackScholesBarenblatt(D=3)
    tr = Trainer(prob, M=8, N=32, layers=[4, 16, 16, 16, 16, 1], Mm=2.0, seed=0)
    res = tr.train(4, 1e-3, log_every=2, verbose=False)
    # below it=4000 the schedule forces N=ceil(Mm)=2
    assert np.isfinite(res.graph[1]).all()


# ------------------------------------------------------------------ LBFGS
def test_lbfgs_training_reduces_loss():
    prob = CallOption1D(D=1)
    tr = Trainer(prob, M=16, N=4, layers=[2, 16, 16, 16, 16, 1], seed=0)
    res = tr.train(10, 1.0, "LBFGS", log_every=5, verbose=False)
    assert np.isfinite(res.graph[1]).all()
    assert res.graph[1][-1] < res.graph[1][0]


# -------------------------------------------------------------- NaN guard
def test_nan_guard_keeps_params_finite():
    prob = BlackScholesBarenblatt(D=3)
    tr = Trainer(
        prob, M=8, N=4, layers=[4, 16, 16, 16, 16, 1], seed=0, nan_guard=True
    )
    # absurd LR would normally blow up; guard must keep params finite
    tr.train(20, 1e6, log_every=10, verbose=False)
    for leaf in jax.tree_util.tree_leaves(tr.params):
        assert np.isfinite(np.asarray(leaf)).all()


# ------------------------------------------------------------ checkpoints
def test_checkpoint_roundtrip_with_optimizer_state(tmp_path):
    prob = BlackScholesBarenblatt(D=3)
    tr = Trainer(prob, M=8, N=4, layers=[4, 16, 16, 16, 16, 1], seed=0)
    tr.train(6, 1e-3, log_every=3, verbose=False)
    f = str(tmp_path / "ckpt.bin")
    tr.save_model(f)

    tr2 = Trainer(prob, M=8, N=4, layers=[4, 16, 16, 16, 16, 1], seed=99)
    tr2.train(2, 1e-3, log_every=2, verbose=False)  # materialize opt state
    tr2.load_model(f)
    assert tr2.iteration == tr.iteration
    assert tr2.training_loss == tr.training_loss
    for a, b in zip(
        jax.tree_util.tree_leaves(tr.params), jax.tree_util.tree_leaves(tr2.params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # resuming continues the iteration counter (reference train():333-335)
    tr2.train(2, 1e-3, log_every=2, verbose=False)
    assert tr2.iteration[-1] >= tr.iteration[-1]


def test_orbax_checkpoint_roundtrip(tmp_path):
    from dnnpde_tpu.train import restore_checkpoint_orbax, save_checkpoint_orbax

    state = {"w": jnp.arange(4.0), "step": jnp.asarray(3)}
    path = str(tmp_path / "orbax_ckpt")
    save_checkpoint_orbax(path, state)
    restored = restore_checkpoint_orbax(path, state)
    np.testing.assert_array_equal(np.asarray(restored["w"]), np.arange(4.0))


# ----------------------------------------------------------------- sdenet
def test_sdenet_training_runs():
    prob = BlackScholesBarenblatt(D=3)
    tr = Trainer(
        prob, M=8, N=4, layers=[4, 16, 16, 16, 16, 1], mode="SDEnet", seed=0
    )
    assert tr.config.stochastic_net
    res = tr.train(6, 1e-3, log_every=3, verbose=False)
    assert np.isfinite(res.graph[1]).all()


# ------------------------------------------------------------ diagnostics
def test_detect_anomalies_raises_on_nan():
    with pytest.raises(FloatingPointError):
        with detect_anomalies():
            jax.jit(lambda x: jnp.log(x))(jnp.asarray(-1.0)).block_until_ready()


def test_step_timer():
    t = StepTimer()
    t.lap()
    t.lap()
    assert len(t.laps) == 2
    assert t.cumulative[-1] >= t.cumulative[0]


def test_auto_remat_policy():
    prob = BlackScholesBarenblatt(D=3)
    small = Trainer(prob, M=8, N=4, layers=[4, 16, 16, 16, 16, 1])
    assert not small.config.remat  # tiny footprint → no remat
    big = Trainer(prob, M=4096, N=512, layers=[4, 512, 512, 512, 512, 1])
    assert big.config.remat


def test_track_best_state():
    """track_best=True must return the min-loss (X, Y) rollout (reference
    min_loss_state, 1d_BSPDE_case.py:396-399); off by default for speed."""
    prob = BlackScholesBarenblatt(D=3)
    tr = Trainer(prob, M=8, N=4, layers=[4, 16, 16, 16, 16, 1],
                 seed=0, track_best=True)
    res = tr.train(6, 1e-3, log_every=3, verbose=False)
    assert res.min_loss_state is not None
    X, Y = res.min_loss_state
    assert X.shape == (8, 5, 3) and Y.shape == (8, 5, 1)
    assert np.isfinite(res.min_loss)

    tr2 = Trainer(prob, M=8, N=4, layers=[4, 16, 16, 16, 16, 1], seed=0)
    res2 = tr2.train(6, 1e-3, log_every=3, verbose=False)
    assert res2.min_loss_state is None
    assert np.isfinite(res2.min_loss)


def test_load_model_preserves_optimizer_state(tmp_path):
    """Regression: restored Adam moments must survive the next train() call
    (previously _opt_sig stayed None and train() re-initialized)."""
    prob = BlackScholesBarenblatt(D=3)
    tr = Trainer(prob, M=8, N=4, layers=[4, 16, 16, 16, 16, 1], seed=0)
    tr.train(6, 1e-3, log_every=3, verbose=False)
    f = str(tmp_path / "ckpt.bin")
    tr.save_model(f)

    tr2 = Trainer(prob, M=8, N=4, layers=[4, 16, 16, 16, 16, 1], seed=99)
    tr2.load_model(f)  # fresh trainer, never trained
    assert tr2._opt_state is not None
    assert tr2._opt_sig == ("Adam", 1e-3)
    # second-moment accumulators are non-zero after restore
    leaves = jax.tree_util.tree_leaves(tr2._opt_state)
    assert any(float(np.abs(np.asarray(l)).max()) > 0 for l in leaves if hasattr(l, "shape"))
    # training with the same signature must NOT re-init (moments kept)
    before = [np.asarray(l).copy() for l in jax.tree_util.tree_leaves(tr2._opt_state) if hasattr(l, "shape")]
    tr2.train(2, 1e-3, log_every=2, verbose=False)
    after = [np.asarray(l) for l in jax.tree_util.tree_leaves(tr2._opt_state) if hasattr(l, "shape")]
    assert any(not np.array_equal(a, b) for a, b in zip(before, after))


def test_iteration_labels_cumulative_no_overlap():
    """Regression: successive train() calls must not relabel already-run
    iterations (the reference resumes from the last LOGGED index)."""
    prob = BlackScholesBarenblatt(D=3)
    tr = Trainer(prob, M=8, N=4, layers=[4, 16, 16, 16, 16, 1], seed=0)
    tr.train(4, 1e-3, log_every=2, verbose=False)
    tr.train(4, 1e-5, log_every=2, verbose=False)
    assert tr.iteration == [0, 2, 4, 6]


def test_nan_guard_protects_optimizer_state():
    """Regression: a non-finite loss must not poison the Adam moments."""
    prob = BlackScholesBarenblatt(D=3)
    tr = Trainer(prob, M=8, N=4, layers=[4, 16, 16, 16, 16, 1], seed=0,
                 nan_guard=True)
    tr.train(20, 1e6, log_every=10, verbose=False)
    for leaf in jax.tree_util.tree_leaves(tr._opt_state):
        if hasattr(leaf, "shape"):
            assert np.isfinite(np.asarray(leaf)).all()


def test_metrics_jsonl_stream(tmp_path):
    import json

    prob = BlackScholesBarenblatt(D=3)
    f = str(tmp_path / "metrics.jsonl")
    tr = Trainer(prob, M=8, N=4, layers=[4, 16, 16, 16, 16, 1], seed=0,
                 metrics_file=f)
    tr.train(4, 1e-3, log_every=2, verbose=False)
    rows = [json.loads(l) for l in open(f)]
    assert len(rows) == 2
    assert rows[0]["it"] == 0 and rows[1]["it"] == 2
    assert all(np.isfinite(r["loss"]) for r in rows)
    assert rows[0]["optimizer"] == "Adam" and rows[0]["N"] == 4


def test_evaluate_u_shapes():
    prob = BlackScholesBarenblatt(D=3)
    tr = Trainer(prob, M=8, N=4, layers=[4, 16, 16, 16, 16, 1], seed=0)
    u, Z = tr.evaluate_u(np.zeros((5, 1)), np.ones((5, 3)))
    assert u.shape == (5, 1) and Z.shape == (5, 3)
    assert np.isfinite(u).all() and np.isfinite(Z).all()


def test_optimizer_accepts_schedule():
    """build_optimizer accepts an optax schedule callable as learning rate."""
    import optax

    sched = optax.cosine_decay_schedule(1e-3, decay_steps=100)
    tx = build_optimizer("Adam", sched)
    params = {"w": jnp.ones(3)}
    state = tx.init(params)
    for _ in range(3):
        updates, state = tx.update({"w": jnp.ones(3)}, state, params)
    assert np.isfinite(np.asarray(updates["w"])).all()


def test_trainer_with_schedule_lr():
    import optax

    prob = BlackScholesBarenblatt(D=3)
    tr = Trainer(prob, M=8, N=4, layers=[4, 16, 16, 16, 16, 1], seed=0)
    sched = optax.cosine_decay_schedule(1e-3, decay_steps=6)
    res = tr.train(6, sched, log_every=3, verbose=False)
    assert np.isfinite(res.graph[1]).all()


def test_lr_change_reuses_compiled_chunk():
    """Regression: the two-phase protocol must not recompile on lr change
    (lr lives in the optimizer state via inject_hyperparams)."""
    prob = BlackScholesBarenblatt(D=3)
    tr = Trainer(prob, M=8, N=4, layers=[4, 16, 16, 16, 16, 1], seed=0)
    tr.train(4, 1e-3, log_every=4, verbose=False)
    chunk_before = next(iter(tr._chunk_cache.values()))
    tr.train(4, 1e-5, log_every=4, verbose=False)  # lr change only
    assert next(iter(tr._chunk_cache.values())) is chunk_before
    tr.train(4, 1e-3, "SGD", log_every=4, verbose=False)  # optimizer switch
    assert next(iter(tr._chunk_cache.values())) is not chunk_before


def test_schedule_then_float_lr_is_safe():
    """Regression: switching between schedule and float lrs must reset the
    optimizer state AND the compiled chunks (a cached chunk closing over the
    other lr kind silently freezes or crashes)."""
    import optax

    prob = BlackScholesBarenblatt(D=3)
    tr = Trainer(prob, M=8, N=4, layers=[4, 16, 16, 16, 16, 1], seed=0)
    sched = optax.cosine_decay_schedule(1e-3, decay_steps=8)
    tr.train(4, 1e-3, log_every=4, verbose=False)
    chunk_float = next(iter(tr._chunk_cache.values()))
    tr.train(4, sched, log_every=4, verbose=False)   # float -> schedule
    # the float-lr chunk must NOT be reused by the schedule run
    assert next(iter(tr._chunk_cache.values())) is not chunk_float
    chunk_sched = next(iter(tr._chunk_cache.values()))
    tr.train(4, 1e-5, log_every=4, verbose=False)    # schedule -> float
    assert next(iter(tr._chunk_cache.values())) is not chunk_sched
    tr.train(4, sched, log_every=4, verbose=False)   # and back
    assert all(np.isfinite(v) for v in tr.training_loss)


def test_lbfgs_lr_change_recompiles():
    """Regression: LBFGS bakes lr into the transform, so an lr change must
    not reuse the old chunk."""
    prob = CallOption1D(D=1)
    tr = Trainer(prob, M=8, N=3, layers=[2, 16, 16, 16, 16, 1], seed=0)
    tr.train(3, 1.0, "LBFGS", log_every=3, verbose=False)
    keys_before = set(tr._chunk_cache)
    tr.train(3, 0.5, "LBFGS", log_every=3, verbose=False)
    assert set(tr._chunk_cache) != keys_before  # new (lr-keyed) chunk


def test_trainer_net_kwargs_gain():
    """net_kwargs reaches the network factory — e.g. the reference's Heston
    init gain=0.5 (heston_dnnpde.py:580-585) halves the Xavier bound."""
    p = BlackScholesBarenblatt(D=3, T=1.0)
    kwargs = dict(M=4, N=2, layers=[4, 64, 64, 1], mode="FC",
                  activation="Sine", seed=0)
    t1 = Trainer(p, **kwargs)
    t05 = Trainer(p, net_kwargs={"gain": 0.5}, **kwargs)
    k1 = [x for x in jax.tree_util.tree_leaves(t1.params) if x.ndim == 2][0]
    k05 = [x for x in jax.tree_util.tree_leaves(t05.params) if x.ndim == 2][0]
    assert np.abs(np.asarray(k05)).max() <= 0.55 * np.abs(np.asarray(k1)).max()
    res = t05.train(2, 1e-3, "Adam", log_every=2, verbose=False)
    assert np.isfinite(res.graph[1]).all()


def test_basket_weights_length_validated():
    from dnnpde_tpu.pde import BasketCallOption

    with pytest.raises(ValueError):
        BasketCallOption(D=3, weights=(0.5,))


def test_auto_remat_policy_is_dtype_aware():
    """bf16 hidden compute halves the activation stash, so the auto-remat
    crossover moves out 2x (measured: M=2048 f32 wants remat, bf16 does not)."""
    from dnnpde_tpu.pde import BlackScholesBarenblatt

    prob = BlackScholesBarenblatt(D=100)
    layers = [101, 256, 256, 256, 256, 1]
    f32 = Trainer(prob, M=2048, N=50, layers=layers, mode="FC", seed=0)
    bf16 = Trainer(prob, M=2048, N=50, layers=layers, mode="FC", seed=0,
                   net_kwargs={"compute_dtype": "bfloat16"})
    small = Trainer(prob, M=100, N=50, layers=layers, mode="FC", seed=0)
    assert f32.config.remat
    assert not bf16.config.remat
    assert not small.config.remat


def test_ema_params_track_and_average():
    """ema_decay maintains an on-device Polyak shadow: differs from the raw
    params after training, matches them at decay→ the first-chunk copy, and
    evaluates finitely."""
    from dnnpde_tpu.pde import BlackScholesBarenblatt

    prob = BlackScholesBarenblatt(D=4)
    tr = Trainer(prob, M=8, N=4, layers=[5, 16, 16, 16, 16, 1], mode="FC",
                 seed=0, ema_decay=0.9)
    res = tr.train(20, 1e-3, log_every=10, verbose=False)
    assert np.isfinite(res.graph[1]).all()
    raw = jax.tree_util.tree_leaves(tr.params)
    ema = jax.tree_util.tree_leaves(tr.ema_params)
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(raw, ema)
    )
    # EMA evaluates through the same net_u
    t0 = jnp.zeros((1, 1)); x0 = jnp.asarray(prob.x0)[None, :]
    u, Z = tr.net_u(tr.ema_params, t0, x0)
    assert np.isfinite(float(u[0, 0])) and np.isfinite(np.asarray(Z)).all()
    with pytest.raises(ValueError):
        Trainer(prob, M=8, N=4, layers=[5, 16, 16, 16, 16, 1], ema_decay=1.5)
    with pytest.raises(ValueError):
        _ = Trainer(prob, M=8, N=4, layers=[5, 16, 16, 16, 16, 1]).ema_params


def test_checkpoint_roundtrips_ema(tmp_path):
    """save_model/load_model carry the EMA shadow when ema_decay is set."""
    from dnnpde_tpu.pde import BlackScholesBarenblatt

    prob = BlackScholesBarenblatt(D=4)
    layers = [5, 16, 16, 16, 16, 1]
    tr = Trainer(prob, M=8, N=4, layers=layers, mode="FC", seed=0,
                 ema_decay=0.9)
    tr.train(10, 1e-3, log_every=5, verbose=False)
    f = str(tmp_path / "ema.msgpack")
    tr.save_model(f)
    tr2 = Trainer(prob, M=8, N=4, layers=layers, mode="FC", seed=0,
                  ema_decay=0.9)
    tr2.load_model(f)
    for a, b in zip(jax.tree_util.tree_leaves(tr.ema_params),
                    jax.tree_util.tree_leaves(tr2.ema_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_predict_use_ema():
    """predict(use_ema=True) evaluates the EMA shadow (differs from the raw
    prediction after training; requires ema_decay)."""
    from dnnpde_tpu.pde import BlackScholesBarenblatt

    prob = BlackScholesBarenblatt(D=4)
    tr = Trainer(prob, M=8, N=4, layers=[5, 16, 16, 16, 16, 1], mode="FC",
                 seed=0, ema_decay=0.9)
    tr.train(20, 1e-3, log_every=10, verbose=False)
    t, W = tr.fetch_minibatch()
    X_raw, Y_raw = tr.predict(prob.x0[None, :], t, W)
    X_ema, Y_ema = tr.predict(prob.x0[None, :], t, W, use_ema=True)
    np.testing.assert_allclose(X_raw, X_ema)  # same paths (X is net-free here)
    assert not np.allclose(Y_raw, Y_ema)
    with pytest.raises(ValueError):
        tr2 = Trainer(prob, M=8, N=4, layers=[5, 16, 16, 16, 16, 1], seed=0)
        tr2.predict(prob.x0[None, :], t, W, use_ema=True)


# ------------------------------------------------- collapse auto-restart
def _poison_output_bias(params, shift):
    leaves, treedef = jax.tree_util.tree_flatten(params)
    idx = [i for i, l in enumerate(leaves) if l.shape == (1,)][-1]
    leaves[idx] = leaves[idx] + shift
    return jax.tree_util.tree_unflatten(treedef, leaves)


def test_collapse_restart_rolls_back_and_rerolls():
    """A chunk that ends with Y0 pinned at the hard clamp (the absorbing
    state) must be rolled back: params restored to the pre-chunk snapshot,
    the failed chunk not logged, and the RNG stream re-rolled — up to
    collapse_max_restarts (VERDICT r2 #7)."""
    from dnnpde_tpu.pde import HestonPDE

    p = HestonPDE(clamp_output=True, clamp_smoothing="hard")  # reference max(u, 0)
    tr = Trainer(p, M=8, N=4, layers=[3, 16, 16, 1], seed=0,
                 collapse_restart=True, collapse_max_restarts=2)
    # poison the output bias so u <= 0 everywhere -> Y0 == 0 immediately
    tr.params = _poison_output_bias(tr.params, -1e3)
    before = [np.asarray(l) for l in jax.tree_util.tree_leaves(tr.params)]
    res = tr.train(9, 1e-3, log_every=3, verbose=False)
    # both restarts consumed (initial state itself is degenerate here), then
    # training proceeds (bounded — no infinite retry loop)
    assert len(tr.collapse_restarts) == 2
    assert tr.iteration[-1] < 9  # failed chunks did not advance the counter
    assert np.isfinite(res.graph[1]).all()
    # the rollback restored the exact pre-chunk params for retried chunks;
    # in the absorbing state gradients are 0, so params stayed at the snapshot
    after = jax.tree_util.tree_leaves(tr.params)
    for a, b in zip(before, after):
        np.testing.assert_array_equal(a, np.asarray(b))


def test_collapse_restart_noop_on_healthy_run():
    """With no collapse the guard must not perturb training: same seed ->
    identical history with and without the guard."""
    from dnnpde_tpu.pde import BlackScholesBarenblatt

    prob = BlackScholesBarenblatt(D=3)
    kw = dict(M=8, N=4, layers=[4, 16, 16, 1], seed=0)
    tr1 = Trainer(prob, **kw)
    tr2 = Trainer(prob, **kw, collapse_restart=True)
    tr1.train(6, 1e-3, log_every=3, verbose=False)
    tr2.train(6, 1e-3, log_every=3, verbose=False)
    assert tr2.collapse_restarts == []
    np.testing.assert_allclose(tr1.training_loss, tr2.training_loss)
    for a, b in zip(jax.tree_util.tree_leaves(tr1.params),
                    jax.tree_util.tree_leaves(tr2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_ema_shadow_frozen_on_guarded_skip():
    """ADVICE r2: when the NaN guard skips an update, the EMA shadow must
    stay EXACTLY unchanged (not blended toward the unchanged params)."""
    from dnnpde_tpu.pde import BlackScholesBarenblatt

    prob = BlackScholesBarenblatt(D=3)
    tr = Trainer(prob, M=8, N=4, layers=[4, 16, 16, 1], seed=0,
                 nan_guard=True, ema_decay=0.5)
    tr.train(4, 1e-3, log_every=2, verbose=False)  # healthy warmup
    shadow_before = [np.asarray(l) for l in
                     jax.tree_util.tree_leaves(tr.ema_params)]
    params_before = [np.asarray(l) for l in
                     jax.tree_util.tree_leaves(tr.params)]
    # every iteration of this phase produces a non-finite loss -> all skipped
    tr.params = jax.tree.map(
        lambda x: jnp.where(jnp.zeros_like(x) == 0, jnp.nan, x), tr.params
    )
    tr.params = jax.tree.map(lambda x: x * jnp.nan, tr.params)
    tr.train(4, 1e-3, log_every=2, verbose=False)
    # guard skipped every update: params still NaN-poisoned is fine, but the
    # shadow must be exactly the pre-phase shadow
    shadow_after = jax.tree_util.tree_leaves(tr.ema_params)
    for a, b in zip(shadow_before, shadow_after):
        np.testing.assert_array_equal(a, np.asarray(b))


def test_reset_keeps_compiled_chunks_and_reinitializes():
    """Trainer.reset(seed): fresh params/opt/history for multi-seed studies
    WITHOUT re-paying the XLA chunk compile (the chunk cache is keyed on
    shapes/optimizer, not parameters)."""
    from dnnpde_tpu.pde import BlackScholesBarenblatt

    prob = BlackScholesBarenblatt(D=3)
    tr = Trainer(prob, M=8, N=3, layers=[4, 16, 1], seed=0, ema_decay=0.9)
    tr.train(4, 1e-3, log_every=2, verbose=False)
    chunks = len(tr._chunk_cache)
    p_before = [np.asarray(l) for l in jax.tree_util.tree_leaves(tr.params)]
    tr.reset(7)
    assert len(tr._chunk_cache) == chunks
    assert tr.training_loss == [] and tr._next_it == 0 and tr._ema is None
    # new seed -> new init
    p_after = jax.tree_util.tree_leaves(tr.params)
    assert any(
        not np.allclose(a, np.asarray(b)) for a, b in zip(p_before, p_after)
    )
    tr.train(4, 1e-3, log_every=2, verbose=False)
    assert len(tr._chunk_cache) == chunks  # still no recompile
    assert np.isfinite(tr.training_loss).all()
    # reset(same seed) reproduces the original trajectory exactly
    tr.reset(7)
    l1 = list(tr.train(4, 1e-3, log_every=2, verbose=False).graph[1])
    tr.reset(7)
    l2 = list(tr.train(4, 1e-3, log_every=2, verbose=False).graph[1])
    np.testing.assert_array_equal(l1, l2)


def test_richardson_extrapolation_combines_two_resolutions():
    """train.richardson_y0: trains at N and 2N, returns 2*y(2N) - y(N) (the
    first-order-in-dt cancellation; measured to collapse the Heston BSDE
    discretization bias from 4.3% to ~0.3% — BENCH_REPORT_r3 heston_anchor)."""
    from dnnpde_tpu.pde import BlackScholesBarenblatt
    from dnnpde_tpu.train import richardson_y0

    prob = BlackScholesBarenblatt(D=3)
    out = richardson_y0(
        prob, M=8, N=2, phases=((4, 1e-3),), seed=0, warmup=0,
        layers=[4, 16, 1], mode="FC", activation="Sine",
    )
    assert set(out) == {"y0_N", "y0_2N", "y0_richardson"}
    np.testing.assert_allclose(
        out["y0_richardson"], 2 * out["y0_2N"] - out["y0_N"], rtol=1e-6
    )
    for v in out.values():
        assert np.isfinite(v)


# ------------------------------------------------------- x0 surface training
def test_x0_sampler_helpers():
    """lognormal_x0 is mean-preserving and strictly positive; gaussian_x0 is
    mean-preserving around any x0 (incl. HJB's zeros)."""
    from dnnpde_tpu.sim import gaussian_x0, lognormal_x0

    key = jax.random.PRNGKey(0)
    ln = lognormal_x0([1.0, 0.2], scale=0.3)
    X = np.asarray(ln(key, 20_000))
    assert X.shape == (20_000, 2) and (X > 0).all()
    np.testing.assert_allclose(X.mean(axis=0), [1.0, 0.2], rtol=0.02)

    ga = gaussian_x0(np.zeros(3), scale=0.5)
    Xg = np.asarray(ga(key, 20_000))
    assert Xg.shape == (20_000, 3)
    np.testing.assert_allclose(Xg.mean(axis=0), 0.0, atol=0.02)
    np.testing.assert_allclose(Xg.std(axis=0), 0.5, rtol=0.05)

    with pytest.raises(ValueError):
        lognormal_x0([1.0], scale=0.0)
    with pytest.raises(ValueError):
        gaussian_x0([1.0], scale=-1.0)


def test_lognormal_x0_per_coordinate_scale():
    """Vector scale: each coordinate keeps its mean but gets its own
    log-space spread (the vega-direction widening, VERDICT r4 #5)."""
    from dnnpde_tpu.sim import lognormal_x0

    key = jax.random.PRNGKey(1)
    ln = lognormal_x0([1.0, 0.09], scale=[0.3, 0.8])
    X = np.asarray(ln(key, 40_000))
    assert (X > 0).all()
    np.testing.assert_allclose(X.mean(axis=0), [1.0, 0.09], rtol=0.03)
    np.testing.assert_allclose(np.log(X).std(axis=0), [0.3, 0.8], rtol=0.05)
    # scalar path unchanged; bad lengths and non-positive entries rejected
    with pytest.raises(ValueError):
        lognormal_x0([1.0, 0.2], scale=[0.3, 0.4, 0.5])
    with pytest.raises(ValueError):
        lognormal_x0([1.0, 0.2], scale=[0.3, 0.0])


def test_warm_start_from():
    """warm_start_from: params/EMA/RNG/history carry into a trainer built
    on a MODIFIED problem (the β-anneal mechanism, VERDICT r4 #6); the
    iteration counter continues and mismatched nets are rejected."""
    from dnnpde_tpu.pde import UpAndOutCall
    from dnnpde_tpu.train import Trainer

    kw = dict(M=16, N=5, layers=[3, 16, 16, 1], mode="FC",
              activation="Sine", ema_decay=0.99)
    tr1 = Trainer(UpAndOutCall(smooth_beta=50.0), seed=0, **kw)
    tr1.train(20, 1e-3, log_every=10, verbose=False)
    tr2 = Trainer(UpAndOutCall(smooth_beta=None), seed=123, **kw)
    tr2.warm_start_from(tr1)
    for a, b in zip(jax.tree.leaves(tr2.params), jax.tree.leaves(tr1.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(tr2.ema_params),
                    jax.tree.leaves(tr1.ema_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    tr2.train(10, 1e-4, log_every=10, verbose=False)
    # chunk logs record the chunk START index: [0, 10] from tr1, then the
    # continued phase's chunk at 20 — the counter ran on across the swap
    assert tr2.iteration == [0, 10, 20]
    assert np.isfinite(tr2.training_loss[-1])

    tr3 = Trainer(UpAndOutCall(), seed=0, M=16, N=5, layers=[3, 8, 8, 1],
                  mode="FC", activation="Sine")
    with pytest.raises(ValueError, match="identical network"):
        tr3.warm_start_from(tr1)


def test_x0_sampler_global_objective_warns():
    """VERDICT r4 weak #7: the exact configuration round 3 proved biased
    (sampled X0 + global objective, ~2-volpt smile lift) must warn; the
    recommended local objective must not."""
    import warnings

    from dnnpde_tpu.sim import lognormal_x0

    p = CallOption1D()
    sampler = lognormal_x0(p.x0, 0.3)
    with pytest.warns(UserWarning, match="objective='local'"):
        Trainer(p, M=8, N=4, layers=[2, 8, 1], x0_sampler=sampler,
                objective="global")
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        Trainer(p, M=8, N=4, layers=[2, 8, 1], x0_sampler=sampler,
                objective="local")


def test_x0_sampler_varies_initial_states_across_iterations():
    """With x0_sampler set, training runs finitely and the rollout actually
    starts from varied states (min-loss best_X snapshot is non-degenerate
    at t=0, unlike the broadcast-x0 default)."""
    from dnnpde_tpu.sim import lognormal_x0

    p = CallOption1D(D=1)
    tr = Trainer(p, M=16, N=4, layers=[2, 16, 16, 1], seed=0,
                 track_best=True, x0_sampler=lognormal_x0(p.x0, 0.3))
    res = tr.train(6, 1e-3, log_every=3, verbose=False)
    assert np.isfinite(res.graph[1]).all()
    best_X, _ = res.min_loss_state
    x0_col = np.asarray(best_X)[:, 0, 0]  # batch of initial states
    assert np.std(x0_col) > 0.05  # sampled, not broadcast


@pytest.mark.slow  # surface-mode A/B; massively evidenced on TPU (results_r3/r4 smile rows)
def test_x0_surface_training_learns_off_x0_prices():
    """The surface claim end-to-end (CPU budget): with lognormal X0 jitter,
    u(0, S) at the wings S ∈ {0.85, 1.15} — states a broadcast-x0 run never
    trains at t=0 — must beat the broadcast baseline trained with the SAME
    budget/seed at BOTH wings, summed-error margin ≥ 2×, plus an absolute
    sanity bound."""
    from dnnpde_tpu.numerics import black_scholes_call
    from dnnpde_tpu.sim import lognormal_x0

    p = CallOption1D(D=1)

    def wing_errors(sampler):
        tr = Trainer(p, M=96, N=8, layers=[2, 32, 32, 32, 1], seed=0,
                     ema_decay=0.995, x0_sampler=sampler)
        tr.train(1500, 1e-3, log_every=500, verbose=False)
        tr.train(500, 1e-4, log_every=250, verbose=False)
        errs = []
        for s in (0.85, 1.15):
            bs = float(black_scholes_call(s, p.K, p.T, p.r, p.sigma_bar))
            u, _ = tr.net_u(tr.ema_params, jnp.zeros((1, 1)),
                            jnp.asarray([[s]], jnp.float32))
            errs.append(abs(float(u[0, 0]) - bs))
        return np.asarray(errs)

    err_surface = wing_errors(lognormal_x0(p.x0, 0.25))
    err_point = wing_errors(None)
    assert (err_surface < err_point).all(), (err_surface, err_point)
    assert err_surface.sum() * 2 < err_point.sum(), (err_surface, err_point)
    # absolute sanity at this deliberately tiny CPU budget (N=8, 2k iters):
    # measured [0.009, 0.021] vs broadcast [0.029, 0.067]
    assert (err_surface < 0.03).all(), err_surface


def test_x0_sampler_antithetic_pairs_share_start_state():
    """ADVICE r3: antithetic dW pairs are (i, i+M/2); with x0_sampler both
    halves must share the SAME start states (M/2 draws tiled) or the
    pairing silently degrades to i.i.d. sampling."""
    from dnnpde_tpu.sim import lognormal_x0

    p = CallOption1D(D=1)
    tr = Trainer(p, M=16, N=4, layers=[2, 16, 16, 1], seed=0,
                 track_best=True, antithetic=True,
                 x0_sampler=lognormal_x0(p.x0, 0.3))
    res = tr.train(2, 1e-3, log_every=2, verbose=False)
    best_X, _ = res.min_loss_state
    x0_col = np.asarray(best_X)[:, 0, :]  # (M, D) start states
    np.testing.assert_array_equal(x0_col[:8], x0_col[8:])
    assert np.std(x0_col[:8, 0]) > 0.05  # still sampled, not broadcast


# ------------------------------------------------------ multi-seed replicas
def test_train_replicas_matches_solo_trainer_stream():
    """K-replica training mirrors the Trainer's per-seed key discipline:
    replica k's trajectory must track a solo Trainer(seed=k) run (same
    phases, same shapes) to float tolerance — one program, K runs."""
    from dnnpde_tpu.train import train_replicas

    p = CallOption1D(D=1)
    res = train_replicas(p, seeds=(0, 3), phases=[(60, 1e-3)], M=16, N=4,
                         layers=[2, 16, 16, 1], log_every=30)
    assert res.losses.shape == (2, 2) and res.y0s.shape == (2, 2)

    for i, seed in enumerate((0, 3)):
        tr = Trainer(p, M=16, N=4, layers=[2, 16, 16, 1], seed=seed)
        tr.train(60, 1e-3, log_every=30, verbose=False)
        np.testing.assert_allclose(
            res.y0s[i], np.asarray(tr.y0_log), rtol=2e-3, atol=2e-4
        )
    # independent seeds actually differ
    assert abs(res.y0s[0, -1] - res.y0s[1, -1]) > 1e-6


def test_train_replicas_features_compose():
    """EMA + antithetic + x0_sampler + local objective all ride the
    replica program; ema read differs from the raw params read."""
    from dnnpde_tpu.sim import lognormal_x0
    from dnnpde_tpu.train import replica_values_at, train_replicas

    p = CallOption1D(D=1)
    res = train_replicas(
        p, seeds=(0, 1), phases=[(40, 1e-3)], M=16, N=4,
        layers=[2, 16, 16, 1], ema_decay=0.9, antithetic=True,
        x0_sampler=lognormal_x0(p.x0, 0.3), objective="local",
        log_every=20,
    )
    u_ema = replica_values_at(p, res, layers=[2, 16, 16, 1])
    u_raw = replica_values_at(p, res, layers=[2, 16, 16, 1], use_ema=False)
    assert u_ema.shape == (2, 1) and np.isfinite(u_ema).all()
    assert not np.allclose(u_ema, u_raw)

    with pytest.raises(ValueError, match="ema_decay"):
        train_replicas(p, seeds=(0,), phases=[(2, 1e-3)], M=8, N=2,
                       layers=[2, 8, 8, 1], objective="local_ema")


def test_train_replicas_local_ema_matches_solo_trainer():
    """objective='local_ema' rides the replica program (round 5 — the
    d>=3 max-call recipe needs 3-seed local_ema runs): replica k's
    trajectory matches a solo Trainer(objective='local_ema', seed=k) to
    float tolerance, frozen-EMA-target semantics included."""
    from dnnpde_tpu.train import train_replicas

    p = CallOption1D(D=1)
    res = train_replicas(p, seeds=(0, 3), phases=[(60, 1e-3)], M=16, N=4,
                         layers=[2, 16, 16, 1], ema_decay=0.95,
                         objective="local_ema", log_every=30)
    for i, seed in enumerate((0, 3)):
        tr = Trainer(p, M=16, N=4, layers=[2, 16, 16, 1], seed=seed,
                     ema_decay=0.95, objective="local_ema")
        tr.train(60, 1e-3, log_every=30, verbose=False)
        np.testing.assert_allclose(
            res.y0s[i], np.asarray(tr.y0_log), rtol=2e-3, atol=2e-4
        )
    # the frozen-target objective actually differs from plain local
    res_local = train_replicas(p, seeds=(0,), phases=[(60, 1e-3)], M=16,
                               N=4, layers=[2, 16, 16, 1], ema_decay=0.95,
                               objective="local", log_every=30)
    assert abs(res.y0s[0, -1] - res_local.y0s[0, -1]) > 1e-7


def test_heston_bs_default_composes_with_surface_features():
    """The r4 Heston default (bs control-variate head) composes with the
    full surface recipe — local objective + x0 sampler + antithetic + EMA
    — in one Trainer; training stays finite and the EMA read sits on the
    BS-base scale (the head perturbs a ~0.2 base, not a raw net output)."""
    from dnnpde_tpu.pde import HestonPDE
    from dnnpde_tpu.sim import lognormal_x0

    p = HestonPDE()
    assert p.clamp_output and p.clamp_smoothing == "bs"
    tr = Trainer(p, M=16, N=4, layers=[3, 16, 16, 1], seed=0,
                 objective="local", ema_decay=0.99, antithetic=True,
                 x0_sampler=lognormal_x0(p.x0, 0.3))
    res = tr.train(30, 1e-3, log_every=15, verbose=False)
    assert np.isfinite(res.graph[1]).all()
    u, Z = tr.net_u(tr.ema_params, jnp.zeros((1, 1)),
                    jnp.asarray(p.x0)[None, :])
    # 30 iterations is a smoke budget: the unconstrained head is still in
    # its early transient (measured u(x0) ≈ −0.2 here; the 20k protocol
    # lands 0.25% of the oracle — results_r4/bs_anchor_matrix.log). Gate
    # on sanity, not convergence.
    assert -1.0 < float(u[0, 0]) < 1.0
    assert np.isfinite(np.asarray(Z)).all()


def test_polish_is_deterministic_and_reduces_frozen_loss():
    """Trainer.polish freezes one antithetic batch and runs LBFGS under
    one jitted scan: same seed → bitwise-identical polished params, and
    the frozen-batch loss must strictly decrease."""
    p = CallOption1D(D=1)

    def run():
        tr = Trainer(p, M=32, N=4, layers=[2, 16, 16, 1], seed=0)
        tr.train(60, 1e-3, log_every=30, verbose=False)
        losses = tr.polish(n_iter=12, M=128, seed=7)
        return tr.params, losses

    p1, l1 = run()
    p2, l2 = run()
    assert float(l1[-1]) < float(l1[0])
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # history bookkeeping: one polish appends one log point
    tr = Trainer(p, M=32, N=4, layers=[2, 16, 16, 1], seed=0)
    tr.train(30, 1e-3, log_every=30, verbose=False)
    n = len(tr.y0_log)
    tr.polish(n_iter=4, M=64, seed=7)
    assert len(tr.y0_log) == n + 1 and np.isfinite(tr.y0_log[-1])
