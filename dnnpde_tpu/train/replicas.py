"""Multi-seed replica training: K independent seeds as ONE jitted program.

Round-4 (VERDICT r3 #4). Every round-3 evidence row is a 3-seed matrix run
serially through ``Trainer.reset(seed)`` — K full training runs, K× the
wall time, even though the flagship geometries (M=100–512, 256-wide nets)
leave most of the MXU idle. ``train_replicas`` advances K complete training
runs — independent inits, independent Brownian streams, per-replica EMA
shadows, the multi-phase lr protocol — in lockstep under ``jax.vmap``
inside the same chunked ``lax.scan`` structure as the Trainer: one compile,
one program, one host round-trip per chunk.

This is the TPU-native replacement for the reference's process-pool
fan-out (``sensitivity_analysis_trun.py:1122-1136``) applied to the
multi-seed acceptance protocol, and the honest fix for the flagship-MFU
story (ARCHITECTURE.md §3): instead of widening the net (which trains
worse), batch more *useful* work — replicas — per step.

Features mirrored from the Trainer (same key discipline per replica:
``PRNGKey(seed) → split(3)``, per-iteration ``split`` → (kw, kn, kx), so a
replica's stream matches a solo ``Trainer(seed=...)`` run):
multi-phase lr schedules, EMA shadows, antithetic pairing, x0 samplers
(with the antithetic tiling), local/global objectives.
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dnnpde_tpu.nets import build_network
from dnnpde_tpu.pde.base import PDEProblem
from dnnpde_tpu.sim.brownian import brownian_increments, time_grid
from dnnpde_tpu.solver.bsde import SolverConfig, make_loss_fn, make_net_u


@dataclasses.dataclass
class ReplicaResult:
    """K training runs' worth of artifacts, replica axis leading."""

    params: object  # pytree, leaves (K, ...)
    ema_params: object  # pytree, leaves (K, ...); == params when no EMA
    losses: np.ndarray  # (K, n_logs) per-log-point losses
    y0s: np.ndarray  # (K, n_logs)
    seeds: tuple
    wall_time: float
    compile_time: float


def train_replicas(
    problem: PDEProblem,
    seeds: Sequence[int],
    phases: Sequence[tuple[int, float]],
    M: int = 100,
    N: int = 50,
    layers: Optional[Sequence[int]] = None,
    mode: str = "FC",
    activation: str = "Sine",
    optimizer_type: str = "Adam",
    clip_norm: float = 1.0,
    ema_decay: Optional[float] = None,
    x0_sampler=None,
    antithetic: bool = False,
    objective: str = "global",
    config: Optional[SolverConfig] = None,
    log_every: int = 2000,
    dtype=jnp.float32,
    net_kwargs: Optional[dict] = None,
) -> ReplicaResult:
    """Train ``len(seeds)`` replicas of the same config in one program.

    ``phases``: the (n_iter, lr) anneal, e.g. the round-3 protocol
    ``[(10000, 1e-3), (5000, 1e-4), (5000, 1e-5)]``. The optimizer state is
    re-initialized at each phase boundary, matching ``Trainer.train``'s
    fresh-optimizer-per-call semantics (itself reference behavior,
    ``1d_BSPDE_case.py:338-357``). The lr rides the chunk as a traced
    scalar, so ALL phases share one compiled chunk program.
    """
    if objective not in ("global", "local", "local_ema"):
        raise ValueError(
            "train_replicas supports objective 'global', 'local' or "
            f"'local_ema' (got {objective!r})"
        )
    local_ema = objective == "local_ema"
    if local_ema and ema_decay is None:
        raise ValueError("objective='local_ema' requires ema_decay")
    if local_ema:
        # local with the per-replica EMA shadow as the frozen TARGET
        # network (same semantics as Trainer(objective='local_ema'):
        # targets from the pre-update shadow, which then absorbs the step)
        objective = "local"
    if antithetic and M % 2:
        raise ValueError(f"antithetic requires even M, got {M}")
    seeds = tuple(int(s) for s in seeds)
    K = len(seeds)
    D, Dw, T = problem.dim, problem.noise_dim, problem.T
    layers = (
        list(layers) if layers is not None
        else [D + 1, 256, 256, 256, 256, 1]
    )
    net = build_network(mode, layers, activation, **(net_kwargs or {}))
    cfg = config or SolverConfig(remat=False, objective=objective)
    if cfg.objective != objective:
        cfg = dataclasses.replace(cfg, objective=objective)
    loss_fn = make_loss_fn(problem, net, cfg)

    tx = optax.chain(
        optax.clip_by_global_norm(clip_norm),
        {
            "adam": optax.scale_by_adam,
            "rmsprop": optax.scale_by_rms,
            "sgd": optax.identity,
            "adamax": optax.scale_by_adamax,
        }[optimizer_type.lower()](),
    )

    x0 = jnp.asarray(problem.x0, dtype)
    ts = jnp.swapaxes(time_grid(M, N, T, dtype), 0, 1)
    dt = T / N

    # Per-replica key chains mirroring Trainer.__init__/train exactly.
    keys0 = jnp.stack([
        jax.random.PRNGKey(s) for s in seeds
    ])
    chains = jax.vmap(lambda k: jax.random.split(k, 3))(keys0)
    run_keys, init_keys = chains[:, 0], chains[:, 1]
    dummy = jnp.zeros((1, D + 1), dtype)
    params0 = jax.vmap(lambda k: net.init({"params": k}, dummy))(init_keys)

    def member_iter(params, opt_state, ema, lr, key):
        kw, kn, kx = jax.random.split(key, 3)
        dW = brownian_increments(
            kw, M, N, Dw, dt, None, dtype, antithetic=antithetic
        )
        dWs = jnp.swapaxes(dW, 0, 1)
        if x0_sampler is not None:
            if antithetic:
                X0h = x0_sampler(kx, M // 2).astype(dtype)
                X0 = jnp.concatenate([X0h, X0h], axis=0)
            else:
                X0 = x0_sampler(kx, M).astype(dtype)
        else:
            X0 = jnp.broadcast_to(x0, (M, D))
        target = ema if local_ema else None
        (loss, y0), grads = jax.value_and_grad(
            lambda p: (lambda r: (r.loss, r.Y0))(
                loss_fn(p, ts, dWs, X0, kn, target_params=target)
            ),
            has_aux=True,
        )(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        updates = jax.tree.map(lambda u: -lr * u, updates)
        params = optax.apply_updates(params, updates)
        if ema_decay is not None:
            ema = jax.tree.map(
                lambda e, p: e + (1.0 - ema_decay) * (p - e), ema, params
            )
        return params, opt_state, ema, loss, y0

    @partial(jax.jit, donate_argnums=(0, 1, 2), static_argnums=(5,))
    def chunk(params, opt_states, emas, run_keys, lr, k):
        # Per-chunk per-replica key split, mirroring Trainer.train.
        chains = jax.vmap(lambda key: jax.random.split(key))(run_keys)
        run_keys, subs = chains[:, 0], chains[:, 1]
        iter_keys = jax.vmap(lambda s: jax.random.split(s, k))(subs)

        def one_iter(carry, keys_i):
            params, opt_states, emas = carry
            params, opt_states, emas, losses, y0s = jax.vmap(
                member_iter, in_axes=(0, 0, 0, None, 0)
            )(params, opt_states, emas, lr, keys_i)
            return (params, opt_states, emas), (losses, y0s)

        (params, opt_states, emas), (losses, y0s) = jax.lax.scan(
            one_iter, (params, opt_states, emas),
            jnp.swapaxes(iter_keys, 0, 1),
        )
        return params, opt_states, emas, run_keys, losses[-1], y0s[-1]

    params = params0
    emas = (
        jax.tree.map(jnp.array, params) if ema_decay is not None else ()
    )
    losses_log, y0s_log = [], []
    t_start = time.perf_counter()
    compile_time = 0.0
    first = True
    for n_iter, lr in phases:
        opt_states = jax.vmap(tx.init)(params)
        done = 0
        while done < n_iter:
            k = min(log_every, n_iter - done)
            if first:
                t0 = time.perf_counter()
            params, opt_states, emas, run_keys, ls, y0 = chunk(
                params, opt_states, emas, run_keys,
                jnp.asarray(lr, dtype), k,
            )
            if first:
                jax.block_until_ready(ls)
                compile_time = time.perf_counter() - t0
                first = False
            losses_log.append(np.asarray(ls))
            y0s_log.append(np.asarray(y0))
            done += k
    return ReplicaResult(
        params=params,
        ema_params=emas if ema_decay is not None else params,
        losses=np.stack(losses_log, axis=1),
        y0s=np.stack(y0s_log, axis=1),
        seeds=seeds,
        wall_time=time.perf_counter() - t_start,
        compile_time=compile_time,
    )


def replica_values_at(
    problem: PDEProblem,
    result: ReplicaResult,
    t: float = 0.0,
    X=None,
    mode: str = "FC",
    activation: str = "Sine",
    layers: Optional[Sequence[int]] = None,
    use_ema: bool = True,
    net_kwargs: Optional[dict] = None,
) -> np.ndarray:
    """u(t, X) per replica — the per-seed headline read (EMA by default).

    Returns (K, B) values for X of shape (B, D) (default: the problem's x0).
    """
    layers = (
        list(layers) if layers is not None
        else [problem.dim + 1, 256, 256, 256, 256, 1]
    )
    net = build_network(mode, layers, activation, **(net_kwargs or {}))
    net_u = make_net_u(net, transform=problem.transform_u)
    if X is None:
        X = np.asarray(problem.x0, np.float32)[None, :]
    X = jnp.asarray(X, jnp.float32)
    tt = jnp.full((X.shape[0], 1), t, jnp.float32)
    tree = result.ema_params if use_ema else result.params
    u = jax.vmap(lambda p: net_u(p, tt, X)[0])(tree)
    return np.asarray(u[..., 0])
