"""Trainer: the user-facing deep-BSDE solver driver.

Capability parity with ``FBSNN.__init__/train/predict/save_model/load_model``
(``1d_BSPDE_case.py:126-464``) and ``TrainingPhases``
(``1d_BSPDE_case.py:639-661``), redesigned for TPU:

- The training loop runs in *chunks*: ``log_every`` iterations are one jitted
  ``lax.scan`` over per-iteration RNG keys, so there is zero per-step Python
  dispatch and zero host↔device traffic between logging points. (The
  reference pays a host NumPy minibatch + device copy + ``loss.item()`` sync
  every iteration.)
- Brownian increments are drawn on device inside the scan from folded keys.
- Min-loss state (best X/Y paths, reference ``1d_BSPDE_case.py:396-399``) is
  tracked *on device* inside the chunk and compared across chunks on host.
- The time-step refinement schedule (``1d_BSPDE_case.py:371-375``) is
  bucketed: each distinct N compiles once (SURVEY.md §7).
- ``predict`` does NOT mutate the batch size (the reference mutates ``self.M``,
  ``1d_BSPDE_case.py:437`` — a documented quirk, fixed here).
- Checkpoints include optimizer state and RNG key (the reference loses
  optimizer state on save, ``1d_BSPDE_case.py:453-464``).
- Optional NaN guard: skip a parameter update when the loss is non-finite
  (reference ``heston_dnnpde.py:409-411``), implemented branchlessly with
  ``jnp.where`` so it stays jittable.
- Optional data-parallel mesh: the path/batch axis is sharded over a
  ``jax.sharding.Mesh`` axis ("dp"); XLA inserts the psum for the summed loss
  and the gradient reduction automatically.
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dnnpde_tpu.nets import build_network
from dnnpde_tpu.pde.base import PDEProblem
from dnnpde_tpu.sim.brownian import brownian_increments, brownian_paths, time_grid
from dnnpde_tpu.sim.correlation import cholesky_factor, generate_correlation_matrix
from dnnpde_tpu.solver.bsde import (
    RolloutResult,
    SolverConfig,
    make_loss_fn,
    make_net_u,
    make_path_loss_fn,
)
from dnnpde_tpu.train.optimizers import build_optimizer, is_lbfgs
from dnnpde_tpu.train.schedules import TimeStepRefinement

Array = jnp.ndarray


@dataclasses.dataclass
class TrainResult:
    """Mirror of the reference ``train`` return: (graph, min_loss, min_loss_state)."""

    graph: np.ndarray  # (2, num_logs): iterations; mean losses
    min_loss: float
    min_loss_state: Optional[tuple[np.ndarray, np.ndarray]]  # best (X, Y)
    y0_history: np.ndarray  # Y0 at each log point
    wall_time: float


def default_layers(dim: int, width: int = 256, depth: int = 4) -> list[int]:
    """Reference default architecture [D+1, 256×4, 1] (``DeepBSDE.py:434``).

    When widening past 256, scale the learning rate down with
    :func:`scaled_lr` — at the reference lr 1e-3, width 1024 trains WORSE
    than 512 (4.2% vs 2.3% on D=1000 BSB), while at ``scaled_lr(1024)``
    it wins outright (0.84%; results_r4/dim1000_lr_width.log).
    """
    return [dim + 1] + [width] * depth + [1]


def scaled_lr(width: int, base_lr: float = 1e-3, base_width: int = 256) -> float:
    """Learning rate for a net of hidden width ``width``: lr ∝ 1/width.

    Measured rule (results_r4/dim1000_lr_width.log, D=1000 BSB @ 20k iters):
    the round-3 "width-1024 regression" (4.22% vs width-512's 2.28% at the
    shared lr 1e-3) was an lr artifact — at 0.25×lr width 1024 lands 0.84%,
    beating width 512 at its own best reduced lr (1.12%). Controls at w512
    with the same reduced lrs separate the lr effect from the width effect.
    The reference sweeps width with a fixed lr and never corrects for it
    (``nd_BSPDE_case.py:750-801``).
    """
    return base_lr * base_width / float(width)


class Trainer:
    """Deep-BSDE trainer for one :class:`PDEProblem`.

    Args:
      problem: the PDE.
      M: number of simulated paths (batch).
      N: number of time steps.
      layers: net widths incl. input/output; default ``[D+1, 256×4, 1]``.
      mode / activation: network selection strings (reference spellings ok).
      Mm: refinement base; if set, the reference's coarse-to-fine N schedule
        is applied (``1d_BSPDE_case.py:371-375``).
      correlation_type: "no_correlation" | "random_correlation" |
        "restricted_random_correlation" — builds the Cholesky factor used to
        correlate increments (``with_corr_high_dimension_pde.py:316-353``).
      mesh: optional ``jax.sharding.Mesh`` with a "dp" axis to shard paths.
      nan_guard: skip updates on non-finite loss.
      track_best: carry the min-loss (X, Y) paths through the training scan
        (the reference's ``min_loss_state``, ``1d_BSPDE_case.py:396-399``).
        Off by default: the carry defeats XLA's dead-code elimination of the
        per-step path stacking and costs ~3× throughput (measured on 100D
        BSB); the scalar ``min_loss`` is tracked either way.
      x0_sampler: optional ``(key, M) -> (M, D)`` callable (jit-traceable;
        see ``sim.lognormal_x0`` / ``sim.gaussian_x0``). When set, each
        iteration draws a fresh batch of initial states on device instead of
        broadcasting ``problem.x0`` — SURFACE-training mode: u(0, ·) is
        constrained on the sampled region, not just at x0 (the reference
        trains from a single Xi only; beyond-parity). Note ``y0_log`` then
        logs the batch-mean Y0 over the X0 cloud — read the point value
        u(0, x0) via ``net_u``/``predict``.
    """

    def __init__(
        self,
        problem: PDEProblem,
        M: int = 100,
        N: int = 50,
        layers: Optional[Sequence[int]] = None,
        mode: str = "FC",
        activation: str = "Sine",
        Mm: Optional[float] = None,
        correlation_type: str = "no_correlation",
        correlation_seed: Optional[int] = 0,
        solver_config: Optional[SolverConfig] = None,
        seed: int = 42,
        mesh: Optional[Mesh] = None,
        nan_guard: bool = False,
        track_best: bool = False,
        metrics_file: Optional[str] = None,
        dtype=jnp.float32,
        net_kwargs: Optional[dict] = None,
        antithetic: bool = False,
        ema_decay: Optional[float] = None,
        collapse_restart: bool = False,
        collapse_tol: float = 1e-5,
        collapse_max_restarts: int = 3,
        x0_sampler=None,
        objective: str = "global",
        path_weight_fn=None,
        z_match_weight: float = 0.0,
        z_match_mask=None,
    ):
        self.problem = problem
        self.M = int(M)
        self.N = int(N)
        n_samples = getattr(problem, "N_samples", None)
        if n_samples is not None and int(n_samples) != self.N:
            raise ValueError(
                f"{problem.name}: problem.N_samples={n_samples} must equal "
                f"the Trainer's N={self.N} (the per-step accumulation weight "
                "in post_step depends on it — construct the problem with "
                f"N_samples={self.N})"
            )
        self.dtype = dtype
        self.mesh = mesh
        self.nan_guard = nan_guard
        # Antithetic minibatches (dW, −dW pairs): variance reduction on the
        # stochastic loss/gradient estimator (sim/brownian.py). Training only
        # — prediction/eval paths stay i.i.d.
        if antithetic and self.M % 2:
            raise ValueError(f"antithetic sampling requires even M, got {M}")
        self.antithetic = antithetic
        self.x0_sampler = x0_sampler
        # Polyak/EMA averaging of the parameters (beyond-reference option):
        # the shadow tree updates on device inside the chunk; read it back
        # via ``ema_params`` for evaluation/serving.
        if ema_decay is not None and not (0.0 < ema_decay < 1.0):
            raise ValueError(f"ema_decay must be in (0, 1), got {ema_decay}")
        self.ema_decay = ema_decay
        self._ema = None
        # Collapse-aware auto-restart (failure detection / elastic recovery,
        # SURVEY.md §5): problems with a hard output clamp have an ABSORBING
        # state — once u ≡ clamp on every path, every gradient is zero and
        # training is dead (measured on Heston hard-clamp: ~1/3 of 20k-iter
        # anneals; the same mode as the reference's degenerate M=2 run,
        # ``heston_dnnpde.py:1123-1277``). With ``collapse_restart`` the
        # trainer snapshots (params, opt state, EMA) at each healthy log
        # boundary; when a chunk ends with Y0 pinned at the clamp (or
        # non-finite), it rolls back to the last healthy snapshot, re-rolls
        # the RNG stream, and retries — up to ``collapse_max_restarts`` times.
        self.collapse_restart = collapse_restart
        self.collapse_tol = collapse_tol
        self.collapse_max_restarts = collapse_max_restarts
        self.collapse_restarts: list[int] = []  # iteration index per restart
        self.track_best = track_best
        self.metrics_file = metrics_file
        self.mode = mode
        self.activation = activation

        self.layers = list(layers) if layers is not None else default_layers(problem.dim)
        if self.layers[0] != problem.dim + 1:
            raise ValueError(
                f"layers[0] must be dim+1={problem.dim + 1}, got {self.layers[0]}"
            )

        # Training objective (VERDICT r3 #1): "global" = the reference's
        # summed telescoping residual; "local" = backward-induction
        # (Huré–Pham–Warin) per-step residuals with detached same-params
        # targets; "local_ema" = local with targets evaluated under the
        # Polyak/EMA shadow (a frozen target network — requires ema_decay).
        # See SolverConfig.objective for the measured rationale.
        if objective not in ("global", "local", "local_ema"):
            raise ValueError(
                "objective must be 'global', 'local' or 'local_ema', "
                f"got {objective!r}"
            )
        self._local_ema = objective == "local_ema"
        if self._local_ema and ema_decay is None:
            raise ValueError("objective='local_ema' requires ema_decay")
        if x0_sampler is not None and objective == "global":
            # Measured (round 3/4 smile studies): the global telescoping
            # residual under a sampled X0 is systematically biased — the
            # Y0 anchor averages over the X0 distribution and lifts the IV
            # smile ~2 volpts; the local objective removes the floor
            # (results_r4/smile_objectives.log: 3.51 -> 0.97 volpts).
            import warnings

            warnings.warn(
                "x0_sampler with objective='global' is systematically "
                "biased for surface training (~2-volpt IV lift, "
                "results_r4/smile_objectives.log); use objective='local'",
                UserWarning,
                stacklevel=2,
            )
        cfg_objective = "local" if self._local_ema else objective

        stochastic = mode.lower() == "sdenet"
        if solver_config is None:
            # Auto remat policy: rematerializing the scan body costs ~35%
            # throughput at small batch (M=100: 1341 no-remat vs 840 remat
            # it/s, 100D BSB on v5e) but WINS once the no-remat activation
            # stash makes the step bandwidth-bound (M=2048 f32: 91.9 remat vs
            # 88.5 no-remat with the slim scan carry). Rough footprint:
            # N steps × M paths × width × (#activation arrays) × itemsize;
            # the measured f32 crossover neighborhood is ~1 GB. Under bf16
            # hidden compute, remat additionally re-pays the per-step
            # f32→bf16 weight casts, so no-remat stays ahead far longer
            # (measured: 102.2 vs 86.4 it/s at a 0.63 GB stash, 28.2 vs
            # 22.1 at 2.5 GB) — threshold 6 GB, i.e. remat only when the
            # stash genuinely threatens the v5e's 16 GB HBM.
            width = max(self.layers)
            act_itemsize = jnp.dtype(
                (net_kwargs or {}).get("compute_dtype") or self.dtype
            ).itemsize
            act_bytes = (
                self.N * self.M * width * (2 * len(self.layers)) * act_itemsize
            )
            threshold = 1e9 if act_itemsize >= 4 else 6e9
            solver_config = SolverConfig(
                remat=act_bytes > threshold, stochastic_net=stochastic,
                objective=cfg_objective, path_weight_fn=path_weight_fn,
                z_match_weight=float(z_match_weight),
                z_match_mask=(
                    None if z_match_mask is None else tuple(z_match_mask)
                ),
            )
        else:
            if cfg_objective != "global" and solver_config.objective != cfg_objective:
                solver_config = dataclasses.replace(
                    solver_config, objective=cfg_objective
                )
            if path_weight_fn is not None:
                solver_config = dataclasses.replace(
                    solver_config, path_weight_fn=path_weight_fn
                )
            if z_match_weight:
                solver_config = dataclasses.replace(
                    solver_config, z_match_weight=float(z_match_weight),
                    z_match_mask=(
                        None if z_match_mask is None else tuple(z_match_mask)
                    ),
                )
        self.config = solver_config
        # net_kwargs passes init policies through to the network factory —
        # e.g. the reference's Heston init gain=0.5 (heston_dnnpde.py:580-585)
        # via net_kwargs={"gain": 0.5}.
        self.net = build_network(mode, self.layers, activation, **(net_kwargs or {}))

        if correlation_type == "no_correlation":
            self.chol = None
            self.correlation = np.eye(problem.noise_dim)
        else:
            self.correlation = generate_correlation_matrix(
                problem.noise_dim, correlation_type, seed=correlation_seed
            )
            self.chol = jnp.asarray(cholesky_factor(self.correlation))

        self.key = jax.random.PRNGKey(seed)
        self.key, init_key, sde_key = jax.random.split(self.key, 3)
        dummy = jnp.zeros((1, problem.dim + 1), dtype)
        rngs = {"params": init_key}
        if stochastic:
            rngs["sde"] = sde_key
        self.params = self.net.init(rngs, dummy)

        self.loss_fn = make_loss_fn(problem, self.net, self.config)
        self.path_loss_fn = jax.jit(make_path_loss_fn(problem, self.net, self.config))
        self.net_u = make_net_u(
            self.net, stochastic=self.config.stochastic_net,
            transform=problem.transform_u,
        )

        self.refinement = (
            TimeStepRefinement(Mm=Mm, n_cap=None) if Mm is not None else None
        )

        # Mutable training history (reference: lists on the model,
        # ``1d_BSPDE_case.py:190-192``).
        self.training_loss: list[float] = []
        self.iteration: list[int] = []
        self.y0_log: list[float] = []
        self._opt_state = None
        self._opt_sig: Optional[tuple] = None
        self._next_it = 0
        self._chunk_cache: dict[tuple, Any] = {}

        if mesh is not None:
            n_dp = mesh.shape.get("dp", 1)
            if self.M % max(n_dp, 1) != 0:
                raise ValueError(
                    f"batch size M={self.M} must be divisible by the dp mesh "
                    f"axis size {n_dp}"
                )
            self._replicate = NamedSharding(mesh, P())
            self._shard_batch = NamedSharding(mesh, P("dp"))
            if "tp" in mesh.axis_names:
                # 2-D (dp × tp) mesh: shard wide kernels over the tp axis
                # (Megatron-style column/row alternation; see
                # parallel/model_sharding.py). Narrow layers stay replicated.
                from dnnpde_tpu.parallel.model_sharding import shard_params_tp

                self.params = shard_params_tp(self.params, mesh)
            else:
                self.params = jax.device_put(self.params, self._replicate)
        else:
            self._replicate = None
            self._shard_batch = None

    def reset(self, seed: int) -> "Trainer":
        """Re-initialize parameters, optimizer state, RNG stream, EMA shadow
        and history for a fresh run — KEEPING the compiled training chunks.

        Multi-seed studies that construct a fresh Trainer per seed pay the
        full XLA compile again for identical shapes (60 s – 6 min per
        program through a tunneled runtime); ``trainer.reset(seed)`` makes
        the marginal seed cost pure train time. Returns self for chaining."""
        self.key = jax.random.PRNGKey(seed)
        self.key, init_key, sde_key = jax.random.split(self.key, 3)
        dummy = jnp.zeros((1, self.problem.dim + 1), self.dtype)
        rngs = {"params": init_key}
        if self.config.stochastic_net:
            rngs["sde"] = sde_key
        self.params = self.net.init(rngs, dummy)
        if self.mesh is not None:
            if "tp" in self.mesh.axis_names:
                from dnnpde_tpu.parallel.model_sharding import shard_params_tp

                self.params = shard_params_tp(self.params, self.mesh)
            else:
                self.params = jax.device_put(self.params, self._replicate)
        self._opt_state = None  # re-init on next train(); chunks are kept
        self._ema = None
        self._next_it = 0
        self.training_loss, self.iteration, self.y0_log = [], [], []
        self.collapse_restarts = []
        return self

    def warm_start_from(self, other: "Trainer") -> "Trainer":
        """Adopt another trainer's learned state — params, EMA shadow, RNG
        key, iteration counter and history — and continue training HERE.

        This is the continuation mechanism for phase-wise PROBLEM changes:
        the problem is baked into the compiled chunk as constants, so e.g.
        annealing a barrier monitor's smoothing β toward the hard contract
        (``UpAndOutCall(smooth_beta=...)`` → ``smooth_beta=None``) means
        constructing a new Trainer on the modified problem and warm-starting
        it from the trained one. The optimizer state is NOT carried — the
        next ``train()`` call re-initializes it, matching the reference's
        fresh-optimizer-per-phase protocol (``1d_BSPDE_case.py:639-661``) —
        and chunks recompile for the new problem's program. Returns self.
        """
        if (self.layers != other.layers or self.mode != other.mode
                or self.activation != other.activation):
            raise ValueError(
                "warm_start_from requires an identical network: "
                f"{self.mode}/{self.activation}/{self.layers} vs "
                f"{other.mode}/{other.activation}/{other.layers}"
            )
        self.params = other.params
        self._ema = other._ema
        if self._replicate is not None:
            self.params = jax.device_put(self.params, self._replicate)
            if self._ema is not None:
                self._ema = jax.device_put(self._ema, self._replicate)
        self.key = other.key
        self._opt_state = None
        self._next_it = other._next_it
        self.training_loss = list(other.training_loss)
        self.iteration = list(other.iteration)
        self.y0_log = list(other.y0_log)
        return self

    @property
    def ema_params(self):
        """Polyak/EMA-averaged parameters (``ema_decay`` must be set).

        The shadow average typically evaluates tighter than the raw last
        iterate on wobbly late-phase snapshots; use for evaluation/serving:
        ``trainer.net_u(trainer.ema_params, t, X)``.
        """
        if self.ema_decay is None:
            raise ValueError("Trainer was constructed without ema_decay")
        return self._ema if self._ema is not None else self.params

    # ------------------------------------------------------------------ paths
    def fetch_minibatch(
        self, key: Optional[jax.Array] = None, M: Optional[int] = None, N: Optional[int] = None
    ) -> tuple[Array, Array]:
        """Sample (t, W) with reference shapes (M, N+1, 1), (M, N+1, D)
        (``fetch_minibatch``, ``1d_BSPDE_case.py:291-321``) — on device."""
        if key is None:
            self.key, key = jax.random.split(self.key)
        return brownian_paths(
            key,
            M or self.M,
            N or self.N,
            self.problem.noise_dim,
            self.problem.T,
            self.chol,
            self.dtype,
        )

    # ------------------------------------------------------------- train step
    def _loss_and_aux(self, params, ts, dWs, X0, key, target=None):
        res: RolloutResult = self.loss_fn(
            params, ts, dWs, X0, key, target_params=target
        )
        return res.loss, res

    def _make_chunk(self, N: int, M: int, optimizer_type: str, tx) -> Any:
        """Build the jitted K-iteration training scan for a fixed (N, M)."""
        problem = self.problem
        D, Dw, T = problem.dim, problem.noise_dim, problem.T
        dt = T / N
        chol = self.chol
        dtype = self.dtype
        lbfgs = is_lbfgs(optimizer_type)
        nan_guard = self.nan_guard
        shard_batch = self._shard_batch
        antithetic = self.antithetic

        x0 = jnp.asarray(problem.x0, dtype)
        ts = jnp.swapaxes(time_grid(M, N, T, dtype), 0, 1)  # (N+1, M, 1)

        track_best = self.track_best

        ema_decay = self.ema_decay
        x0_sampler = self.x0_sampler
        local_ema = self._local_ema

        def one_iter(carry, key):
            if track_best:
                params, opt_state, ema, best_loss, best_X, best_Y = carry
            else:
                params, opt_state, ema = carry
            kw, kn, kx = jax.random.split(key, 3)
            dW = brownian_increments(
                kw, M, N, Dw, dt, chol, dtype, antithetic=antithetic
            )
            if shard_batch is not None:
                dW = jax.lax.with_sharding_constraint(dW, shard_batch)
            dWs = jnp.swapaxes(dW, 0, 1)  # (N, M, D) time-major
            if x0_sampler is not None:
                # Surface-training mode: fresh on-device X0 batch per
                # iteration (sim/x0_samplers.py) — same key stream
                # discipline as the increments.
                if antithetic:
                    # The mirrored dW pairs are (i, i + M/2); each pair
                    # must share a start state or the pairing (and its
                    # variance reduction) silently degrades to i.i.d.
                    # sampling — draw M/2 states and tile across halves.
                    X0h = x0_sampler(kx, M // 2).astype(dtype)
                    X0 = jnp.concatenate([X0h, X0h], axis=0)
                else:
                    X0 = x0_sampler(kx, M).astype(dtype)
                if shard_batch is not None:
                    X0 = jax.lax.with_sharding_constraint(X0, shard_batch)
            else:
                X0 = jnp.broadcast_to(x0, (M, D))

            # local_ema: the EMA shadow is the frozen TARGET NETWORK of the
            # local objective — targets come from the pre-update shadow,
            # which then absorbs the new params after the step.
            target = ema if local_ema else None
            (loss, res), grads = jax.value_and_grad(
                self._loss_and_aux, has_aux=True
            )(params, ts, dWs, X0, kn, target)

            if lbfgs:
                value_fn = lambda p: self.loss_fn(
                    p, ts, dWs, X0, kn, target_params=target
                ).loss
                updates, new_opt_state = tx.update(
                    grads, opt_state, params,
                    value=loss, grad=grads, value_fn=value_fn,
                )
            else:
                updates, new_opt_state = tx.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            if nan_guard:
                # Skip the WHOLE update on non-finite loss — optimizer state
                # included, else NaN grads poison the Adam moments and the
                # very next (finite-loss) step re-applies NaN updates.
                ok = jnp.isfinite(loss)
                new_params = jax.tree.map(
                    lambda new, old: jnp.where(ok, new, old), new_params, params
                )
                new_opt_state = jax.tree.map(
                    lambda new, old: jnp.where(ok, new, old)
                    if hasattr(new, "dtype") else new,
                    new_opt_state, opt_state,
                )
            params = new_params
            opt_state = new_opt_state
            if ema_decay is not None:
                # Polyak/EMA shadow of the params. Gated on the same accept
                # mask as the guard: a skipped update leaves the shadow
                # untouched too (not merely blended toward unchanged params,
                # which would still shift the average toward the last
                # iterate on every skipped step).
                if nan_guard:
                    ema = jax.tree.map(
                        lambda e, p: jnp.where(
                            ok, e + (1.0 - ema_decay) * (p - e), e
                        ),
                        ema, params,
                    )
                else:
                    ema = jax.tree.map(
                        lambda e, p: e + (1.0 - ema_decay) * (p - e), ema, params
                    )

            if not track_best:
                # res.X / res.Y are unused → XLA dead-code-eliminates the
                # path stacking entirely (measured 3× on 100D BSB).
                return (params, opt_state, ema), (loss, res.Y0)
            better = loss < best_loss
            best_loss = jnp.where(better, loss, best_loss)
            best_X = jnp.where(better, res.X, best_X)
            best_Y = jnp.where(better, res.Y, best_Y)
            return (params, opt_state, ema, best_loss, best_X, best_Y), (loss, res.Y0)

        # optax.lbfgs keeps the params inside its state — donating both would
        # donate the same buffer twice. ``ema`` is an empty pytree when EMA is
        # off, so donating it is free.
        donate = () if lbfgs else (0, 1, 2)

        @partial(jax.jit, donate_argnums=donate)
        def chunk(params, opt_state, ema, keys):
            if track_best:
                best_loss = jnp.asarray(jnp.inf, dtype)
                best_X = jnp.zeros((M, N + 1, D), dtype)
                best_Y = jnp.zeros((M, N + 1, 1), dtype)
                carry = (params, opt_state, ema, best_loss, best_X, best_Y)
            else:
                carry = (params, opt_state, ema)
            carry, (losses, y0s) = jax.lax.scan(one_iter, carry, keys)
            if track_best:
                params, opt_state, ema, best_loss, best_X, best_Y = carry
                return params, opt_state, ema, (losses, y0s, best_loss, best_X, best_Y)
            params, opt_state, ema = carry
            return params, opt_state, ema, (losses, y0s, None, None, None)

        return chunk

    def _get_chunk(self, N: int, optimizer_type: str, tx, lr_token=None):
        # lr_token: None when lr is carried in the optimizer state
        # (inject_hyperparams); the concrete lr for LBFGS (baked into tx).
        sig = (N, self.M, optimizer_type, lr_token)
        if sig not in self._chunk_cache:
            self._chunk_cache[sig] = self._make_chunk(N, self.M, optimizer_type, tx)
        return self._chunk_cache[sig]

    # ------------------------------------------------------------------ train
    def train(
        self,
        n_iter: int,
        learning_rate: float,
        optimizer_type: str = "Adam",
        log_every: int = 100,
        verbose: bool = True,
    ) -> TrainResult:
        """Train for ``n_iter`` iterations (reference ``FBSNN.train``,
        ``1d_BSPDE_case.py:323-416``). Successive calls continue the iteration
        counter (two-phase protocol); changing the learning rate or optimizer
        resets the optimizer state, matching the reference (which constructs a
        fresh optimizer every ``train`` call)."""
        tx = build_optimizer(optimizer_type, learning_rate)
        lr_is_schedule = callable(learning_rate)
        # Chunk-reuse rules (the compiled chunk closes over tx):
        # - float lr, non-LBFGS: lr lives in the optimizer state
        #   (inject_hyperparams) → float→float lr changes reuse the chunk.
        # - schedules: the schedule function is baked into tx → every train()
        #   call with a schedule gets a fresh optimizer state AND fresh
        #   chunks (also matches the reference: new optimizer per call).
        # - LBFGS: lr is baked into optax.lbfgs → chunk keyed on lr too.
        if lr_is_schedule:
            opt_sig = None  # never matches → always reset below
        else:
            opt_sig = (optimizer_type, float(learning_rate))
        if self._opt_state is None or self._opt_sig != opt_sig or opt_sig is None:
            self._opt_state = tx.init(self.params)
            prev = self._opt_sig
            if (
                lr_is_schedule
                or prev is None
                or prev[0] != optimizer_type
            ):
                self._chunk_cache.clear()
            else:
                # same optimizer, new float lr: evict lr-keyed chunks (LBFGS
                # bakes lr into the transform) so stale programs don't pile up
                stale = [
                    sig for sig in self._chunk_cache
                    if sig[3] is not None and sig[3] != float(learning_rate)
                ]
                for sig in stale:
                    del self._chunk_cache[sig]
            self._opt_sig = opt_sig

        # Exact cumulative iteration count — the reference resumes from its
        # last *logged* index (1d_BSPDE_case.py:333-335), which relabels up
        # to log_every-1 already-run iterations; not replicated.
        previous_it = self._next_it
        start = time.time()
        tick = start
        min_loss = float("inf")
        min_state: Optional[tuple[np.ndarray, np.ndarray]] = None

        # One-chunk-deep log pipeline: the host-side reads of a chunk's log
        # outputs (losses, y0, best-state) each cost a blocking device
        # roundtrip (~40 ms through the axon tunnel), during which the
        # device idles. Deferring them until AFTER the next chunk has been
        # dispatched overlaps the reads with device compute — measured
        # worth ~8% on the flagship bench protocol. The deferral changes
        # nothing observable: log entries are appended in order, and the
        # collapse-restart path (which must read y0 before deciding to
        # roll back) keeps the immediate read.
        pending: list[tuple] = []
        lr_str = (
            f"{learning_rate:.3e}" if not callable(learning_rate)
            else "schedule"
        )
        lr_logged = (
            learning_rate if not callable(learning_rate) else "schedule"
        )

        def _drain(keep: int = 0):
            nonlocal min_loss, min_state, tick
            while len(pending) > keep:
                it, b_N_live, losses_d, y0s_d, b_loss_d, b_X_d, b_Y_d = (
                    pending.pop(0)
                )
                losses = np.asarray(losses_d)
                self.training_loss.append(float(losses.mean()))
                self.iteration.append(it)
                y0_last = float(np.asarray(y0s_d)[-1])
                self.y0_log.append(y0_last)
                if self.track_best:
                    b_loss_f = float(b_loss_d)
                    if b_loss_f < min_loss:
                        min_loss = b_loss_f
                        min_state = (np.asarray(b_X_d), np.asarray(b_Y_d))
                else:
                    min_loss = min(min_loss, float(losses.min()))
                if self.metrics_file is not None:
                    self._write_metrics(
                        it=it, loss=float(losses[-1]),
                        mean_loss=float(losses.mean()), y0=y0_last,
                        lr=lr_logged, N=b_N_live,
                        optimizer=optimizer_type,
                        elapsed_s=time.time() - start,
                    )
                if verbose:
                    now = time.time()
                    print(
                        f"It: {it}, Loss: {losses[-1]:.3e}, "
                        f"Y0: {y0_last:.3f}, "
                        f"Time: {now - tick:.2f}, Learning Rate: {lr_str}, "
                        f"N: {b_N_live}"
                    )
                    tick = now

        if self.refinement is not None:
            buckets = list(self.refinement.buckets(previous_it, n_iter))
        else:
            buckets = [(previous_it, n_iter, self.N)]

        lr_token = (
            float(learning_rate)
            if is_lbfgs(optimizer_type) and not lr_is_schedule
            else None
        )
        for b_start, b_len, b_N in buckets:
            chunk_fn = self._get_chunk(b_N, optimizer_type, tx, lr_token)
            done = 0
            while done < b_len:
                k = min(log_every, b_len - done)
                self.key, sub = jax.random.split(self.key)
                keys = jax.random.split(sub, k)
                if self.ema_decay is not None and self._ema is None:
                    # fresh copy — params are donated alongside, and a shared
                    # buffer may not be donated twice
                    self._ema = jax.tree.map(jnp.array, self.params)
                ema_in = self._ema if self.ema_decay is not None else ()
                retry_allowed = (
                    self.collapse_restart
                    and len(self.collapse_restarts) < self.collapse_max_restarts
                )
                if retry_allowed:
                    # Healthy-state snapshot (device copies: the chunk call
                    # donates its input buffers, so references alone would
                    # be invalidated). ~1 MB at the flagship size.
                    snap = jax.tree.map(
                        jnp.array, (self.params, self._opt_state, ema_in)
                    )
                (
                    self.params, self._opt_state, ema_out,
                    (losses, y0s, b_loss, b_X, b_Y),
                ) = chunk_fn(self.params, self._opt_state, ema_in, keys)
                if self.ema_decay is not None:
                    self._ema = ema_out
                if retry_allowed and self._collapsed_y0(float(y0s[-1])):
                    # Roll back to the pre-chunk (healthy) state and retry
                    # with a re-rolled RNG stream; the failed chunk is not
                    # logged and does not advance the iteration counter.
                    self.params, self._opt_state, ema_snap = snap
                    if self.ema_decay is not None:
                        self._ema = ema_snap
                    self.key = jax.random.fold_in(
                        self.key, 7919 + len(self.collapse_restarts)
                    )
                    self.collapse_restarts.append(b_start + done)
                    if verbose:
                        print(
                            f"It: {b_start + done}, collapse detected "
                            f"(Y0 pinned) — rolled back, restart "
                            f"{len(self.collapse_restarts)}/"
                            f"{self.collapse_max_restarts}"
                        )
                    continue
                pending.append(
                    (b_start + done, b_N, losses, y0s, b_loss, b_X, b_Y)
                )
                # Process the PREVIOUS chunk's logs while this chunk runs
                # on device (async dispatch). With collapse-restart on,
                # the y0 read above already synced, so drain fully.
                _drain(keep=0 if retry_allowed else 1)
                done += k

        _drain(keep=0)
        self._next_it = previous_it + n_iter
        graph = np.stack(
            (np.asarray(self.iteration), np.asarray(self.training_loss))
        )
        return TrainResult(
            graph=graph,
            min_loss=min_loss,
            min_loss_state=min_state,
            y0_history=np.asarray(self.y0_log),
            wall_time=time.time() - start,
        )

    def polish(
        self,
        n_iter: int = 400,
        learning_rate: Optional[float] = None,
        M: Optional[int] = None,
        seed: Optional[int] = None,
        from_ema: bool = False,
        antithetic: Optional[bool] = None,
    ) -> np.ndarray:
        """Deterministic LBFGS polish phase (round-4, VERDICT r3 #7).

        Stochastic-minibatch LBFGS cannot settle: each step re-solves its
        quasi-Newton model on a FRESH minibatch, so the iterates orbit the
        optimum inside the gradient-noise ball (measured 6.9–9.0% tail-mean
        on the 1D call; ``tests/test_convergence.py``). This phase freezes
        ONE batch — (dW, X0) drawn once, antithetic-paired when the trainer
        is — and runs ``n_iter`` LBFGS steps with zoom linesearch on that
        now-deterministic objective, all inside one jitted ``lax.scan``.

        The frozen batch is ANTITHETIC by default (independent of the
        trainer's training-time setting): with a frozen batch the MC error
        of the batch itself floors the reachable accuracy — measured on
        the 1D call at M=8192: plain batch floors Y0 at ~1.5%, antithetic
        pairs reach 0.1% vs the closed form. Prefer a large ``M`` here
        (the phase runs once; the default uses the trainer's M but 8192+
        is recommended on TPU).

        Updates ``self.params`` in place (the EMA shadow is left untouched
        — after a polish, read the raw params). ``from_ema=True`` starts
        the polish from the EMA shadow instead of the last iterate.
        ``learning_rate=None`` (default) uses optax.lbfgs' zoom linesearch
        step sizes unscaled. Returns the (n_iter,) per-step losses.
        """
        import optax as _optax

        M = int(M or self.M)
        anti = True if antithetic is None else bool(antithetic)
        if anti and M % 2:
            M += 1
        problem = self.problem
        N, D, Dw, T = self.N, problem.dim, problem.noise_dim, problem.T
        if seed is None:
            self.key, key = jax.random.split(self.key)
        else:
            key = jax.random.PRNGKey(seed)
        kw, kn, kx = jax.random.split(key, 3)
        dW = brownian_increments(
            kw, M, N, Dw, T / N, self.chol, self.dtype, antithetic=anti,
        )
        dWs = jnp.swapaxes(dW, 0, 1)
        ts = jnp.swapaxes(time_grid(M, N, T, self.dtype), 0, 1)
        if self.x0_sampler is not None:
            if anti:
                X0h = self.x0_sampler(kx, M // 2).astype(self.dtype)
                X0 = jnp.concatenate([X0h, X0h], axis=0)
            else:
                X0 = self.x0_sampler(kx, M).astype(self.dtype)
        else:
            X0 = jnp.broadcast_to(jnp.asarray(problem.x0, self.dtype), (M, D))
        if self._shard_batch is not None:
            dWs = jax.lax.with_sharding_constraint(
                dWs, NamedSharding(self.mesh, P(None, "dp"))
            )

        tx = build_optimizer("LBFGS", learning_rate)
        value_fn = lambda p: self.loss_fn(p, ts, dWs, X0, kn).loss

        @jax.jit
        def run(params):
            opt_state = tx.init(params)

            def body(carry, _):
                params, opt_state = carry
                loss, grads = jax.value_and_grad(value_fn)(params)
                updates, opt_state = tx.update(
                    grads, opt_state, params,
                    value=loss, grad=grads, value_fn=value_fn,
                )
                params = _optax.apply_updates(params, updates)
                return (params, opt_state), loss

            (params, _), losses = jax.lax.scan(
                body, (params, opt_state), None, length=n_iter
            )
            return params, losses

        start = self.ema_params if from_ema else self.params
        # Full-precision matmuls for the quasi-Newton phase: the TPU's
        # default f32 dots run through bf16 MXU passes, and the resulting
        # gradient noise corrupts LBFGS's curvature pairs/linesearch —
        # measured on v5e: the identical 1500-step polish stalls (loss
        # 203→149, Y0 degrades) at default precision where the CPU run
        # converges (159→22, Y0 to ~1%). The phase runs once; exactness
        # beats MXU speed here.
        with jax.default_matmul_precision("highest"):
            self.params, losses = run(jax.tree.map(jnp.array, start))
        losses = np.asarray(losses)
        it = self._next_it
        self._next_it = it + n_iter
        self.training_loss.append(float(losses[-1]))
        self.iteration.append(it)
        u, _ = self.net_u(
            self.params,
            jnp.zeros((1, 1), self.dtype),
            jnp.asarray(problem.x0, self.dtype)[None, :],
        )
        self.y0_log.append(float(u[0, 0]))
        return losses

    def _collapsed_y0(self, y0: float) -> bool:
        """Degenerate-trajectory predicate: Y0 pinned at the problem's
        output clamp (the absorbing state) or non-finite."""
        if not np.isfinite(y0):
            return True
        c = self.problem.clamp_u
        return c is not None and abs(y0 - c) <= self.collapse_tol

    def _write_metrics(self, **row) -> None:
        """Append one JSON line per log point (observability aux — the
        reference only prints; SURVEY.md §5 metrics/logging row)."""
        import json
        from pathlib import Path

        path = Path(self.metrics_file)
        path.parent.mkdir(parents=True, exist_ok=True)
        with open(path, "a") as f:
            f.write(json.dumps(row) + "\n")

    # ---------------------------------------------------------------- predict
    def predict(
        self, Xi_star, t_star, W_star, use_ema: bool = False
    ) -> tuple[np.ndarray, np.ndarray]:
        """Run the trained model along given paths (reference ``predict``,
        ``1d_BSPDE_case.py:420-451``) → (X_star, Y_star). Does not mutate M.
        ``use_ema=True`` evaluates the Polyak/EMA shadow instead of the raw
        last iterate (requires ``ema_decay``)."""
        t_star = jnp.asarray(t_star, self.dtype)
        W_star = jnp.asarray(W_star, self.dtype)
        Xi_star = jnp.asarray(Xi_star, self.dtype).reshape(-1, self.problem.dim)
        M = max(Xi_star.shape[0], t_star.shape[0], W_star.shape[0])
        if t_star.shape[0] == 1:
            t_star = jnp.broadcast_to(t_star, (M,) + t_star.shape[1:])
        if W_star.shape[0] == 1:
            W_star = jnp.broadcast_to(W_star, (M,) + W_star.shape[1:])
        self.key, sub = jax.random.split(self.key)
        params = self.ema_params if use_ema else self.params
        res = self.path_loss_fn(params, t_star, W_star, Xi_star, sub)
        return np.asarray(res.X), np.asarray(res.Y)

    def evaluate_u(self, t, X) -> tuple[np.ndarray, np.ndarray]:
        """(u, Z) at arbitrary (t, X) batches — for stability/greeks analyses."""
        self.key, sub = jax.random.split(self.key)
        u, Z = self.net_u(
            self.params,
            jnp.asarray(t, self.dtype).reshape(-1, 1),
            jnp.asarray(X, self.dtype).reshape(-1, self.problem.dim),
            sub,
        )
        return np.asarray(u), np.asarray(Z)

    # ------------------------------------------------------------- checkpoint
    def save_model(self, file_name: str) -> None:
        """Persist params + optimizer state + history + RNG key
        (richer than the reference's ``save_model``, ``1d_BSPDE_case.py:453-458``,
        which drops optimizer state)."""
        from dnnpde_tpu.train.checkpoint import save_checkpoint

        # schedule-lr runs have opt_sig=None: their optimizer state is not
        # restorable across processes (the schedule fn cannot be persisted)
        save_checkpoint(
            file_name,
            params=self.params,
            opt_state=self._opt_state if self._opt_sig is not None else None,
            opt_sig=self._opt_sig,
            next_it=self._next_it,
            training_loss=self.training_loss,
            iteration=self.iteration,
            y0_log=self.y0_log,
            key=self.key,
            ema=self._ema if self.ema_decay is not None else None,
        )

    def load_model(self, file_name: str) -> None:
        from dnnpde_tpu.train.checkpoint import restore_checkpoint

        # Build the optimizer-state template from the saved signature so the
        # restored moments survive the next train() call (which only re-inits
        # when the signature changes).
        state = restore_checkpoint(file_name, params_template=self.params)
        self.params = state["params"]
        saved_sig = state.get("opt_sig")
        if saved_sig is not None:
            saved_sig = tuple(saved_sig)
            tx = build_optimizer(saved_sig[0], saved_sig[1])
            state = restore_checkpoint(
                file_name,
                params_template=self.params,
                opt_state_template=tx.init(self.params),
            )
            if state.get("opt_state") is not None:
                self._opt_state = state["opt_state"]
                self._opt_sig = saved_sig
        self.training_loss = list(state["training_loss"])
        self.iteration = list(state["iteration"])
        self.y0_log = list(state.get("y0_log", []))
        self._next_it = int(state.get("next_it", self.iteration[-1] if self.iteration else 0))
        if state.get("key") is not None:
            self.key = state["key"]
        if state.get("ema") is not None:
            self._ema = jax.tree.map(jnp.asarray, state["ema"])


class TrainingPhases:
    """Two-phase protocol driver (reference ``TrainingPhases``,
    ``1d_BSPDE_case.py:639-661``)."""

    def __init__(self, trainer: Trainer, optimizer_type: str = "Adam"):
        self.trainer = trainer
        self.optimizer_type = optimizer_type

    def train_initial_phase(
        self, n_iter: int = 2000, learning_rate: float = 1e-3
    ) -> TrainResult:
        tic = time.time()
        out = self.trainer.train(n_iter, learning_rate, self.optimizer_type)
        print(f"initial phase: {time.time() - tic:.2f}s")
        return out

    def fine_tuning_phase(
        self, n_iter: int = 500, learning_rate: float = 1e-5
    ) -> TrainResult:
        tic = time.time()
        out = self.trainer.train(n_iter, learning_rate, self.optimizer_type)
        print(f"fine-tuning phase: {time.time() - tic:.2f}s")
        return out
