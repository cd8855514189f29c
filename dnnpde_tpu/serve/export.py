"""AOT export / load of trained solutions via ``jax.export`` (StableHLO).

What gets exported is the *solution function*, not the model: one traced
program ``(t, X) → (u, Z)`` with

- the trained parameters baked in as constants (a self-contained artifact —
  no flax module, no parameter pytree, no framework import needed to serve),
- a **symbolic batch dimension** (``jax.export.symbolic_shape``), so one
  artifact serves any batch size without retracing,
- multi-platform lowering (default ``("cpu", "tpu")``): the same bytes run
  on a CPU box or a TPU chip,
- Z = ∇ₓu computed inside the exported program (one VJP — the same
  ``make_net_u`` semantics as training, ``solver/bsde.py:66``), so greeks
  ship with the price.

The reference's deployment story requires the full training codebase to
re-instantiate the model before ``load_model`` (``1d_BSPDE_case.py:459-464``).
Here the serving side needs only jax: ``load_solution(path).u_and_grad(t, X)``.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

Array = jnp.ndarray

_DEFAULT_PLATFORMS = ("cpu", "tpu")


def _solution_fn(net, params, transform, stochastic: bool = False):
    """(t, X) → (u, Z) with params closed over (baked as constants).

    ``transform`` is the problem's output parametrization (t, X, raw) → u —
    the SAME callable training's ``make_net_u`` differentiates through
    (``problem.transform_u``), so the served u and Z (greeks) can never
    disagree with the training-side net near clamps/floors. Stochastic nets
    (SDEnet) are served with a FIXED noise key, mirroring ``make_net_u``'s
    eval path (``solver/bsde.py``)."""
    rngs = {"sde": jax.random.PRNGKey(0)} if stochastic else None

    def fn(t: Array, X: Array):
        def u_fn(x):
            raw = net.apply(params, jnp.concatenate([t, x], axis=-1), rngs=rngs)
            return transform(t, x, raw) if transform is not None else raw

        u, vjp = jax.vjp(u_fn, X)
        (Z,) = vjp(jnp.ones_like(u))
        return u, Z

    return fn


def export_solution(
    net,
    params: Any,
    dim: int,
    clamp_u: Optional[float] = None,
    platforms: Sequence[str] = _DEFAULT_PLATFORMS,
    transform=None,
    stochastic: bool = False,
) -> bytes:
    """Serialize the trained solution to portable StableHLO bytes.

    Args:
      net: the flax network (used only at trace time; not part of the artifact).
      params: trained parameters (baked into the artifact as constants).
      dim: state dimension D (the artifact's X input is ``(b, D)``).
      clamp_u: optional hard output clamp (Heston reference ``max(u, 0)``,
        ``heston_dnnpde.py:568``) — applied before the gradient, as in
        training. Ignored when ``transform`` is given.
      transform: the problem's full output parametrization (t, X, raw) → u
        (pass ``problem.transform_u`` — covers softplus clamps and the
        payoff-anchored Heston head, not just the hard clamp).
      stochastic: net draws an "sde" rng (SDEnet) — served with a fixed key.
      platforms: lowering targets; the default makes one artifact that runs
        on both CPU and TPU.
    """
    if transform is None and clamp_u is not None:
        c = clamp_u
        transform = lambda t, x, u: jnp.maximum(u, c)  # noqa: E731
    fn = _solution_fn(net, params, transform, stochastic)
    (b,) = jax_export.symbolic_shape("b")
    exported = jax_export.export(jax.jit(fn), platforms=list(platforms))(
        jax.ShapeDtypeStruct((b, 1), jnp.float32),
        jax.ShapeDtypeStruct((b, dim), jnp.float32),
    )
    return exported.serialize()


def export_trainer(
    trainer,
    platforms: Sequence[str] = _DEFAULT_PLATFORMS,
    use_ema: bool = False,
) -> bytes:
    """Export a :class:`~dnnpde_tpu.train.Trainer`'s current solution.

    ``use_ema=True`` bakes the Polyak/EMA shadow parameters (the
    measured-better evaluation point; requires ``Trainer(ema_decay=...)``)
    instead of the raw last iterate."""
    problem = trainer.problem
    return export_solution(
        trainer.net,
        trainer.ema_params if use_ema else trainer.params,
        problem.dim,
        platforms=platforms,
        transform=problem.transform_u if problem.has_output_transform else None,
        stochastic=bool(getattr(trainer.config, "stochastic_net", False)),
    )


def save_solution(path: str, *args, **kwargs) -> None:
    """``export_solution`` (or, given a Trainer, ``export_trainer``) to a file."""
    if args and hasattr(args[0], "problem"):  # Trainer duck-type
        blob = export_trainer(*args, **kwargs)
    else:
        blob = export_solution(*args, **kwargs)
    with open(path, "wb") as f:
        f.write(blob)


@dataclasses.dataclass(frozen=True)
class ServedSolution:
    """A loaded solution artifact: evaluate u and ∇ₓu at any (t, X) batch.

    Wraps a deserialized ``jax.export.Exported``; everything here is plain
    jax — no framework modules are imported to serve.
    """

    exported: Any  # jax.export.Exported

    @functools.cached_property
    def _call(self):
        # jit-wrap the exported computation ONCE: a bare
        # ``exported.call`` re-dispatches through the export machinery
        # every call (~2.6-3.7 ms/call fixed overhead, batch-independent
        # — measured in results_r5/serve_reconcile.log); under jit the
        # lowered program is cached and dispatch matches a native jitted
        # function.
        return jax.jit(self.exported.call)

    @property
    def dim(self) -> int:
        return int(self.exported.in_avals[1].shape[1])

    @property
    def platforms(self) -> tuple[str, ...]:
        return tuple(self.exported.platforms)

    def u_and_grad(self, t, X) -> tuple[np.ndarray, np.ndarray]:
        """(u, Z) at a batch: t (b, 1) or scalar-broadcastable, X (b, D).

        Blocks and returns host numpy. For latency-sensitive serving use
        ``u_and_grad_device`` — each blocking read costs a full runtime
        round-trip (~80 ms through a tunneled TPU runtime; µs locally).
        """
        u, Z = self.u_and_grad_device(t, X)
        return np.asarray(u), np.asarray(Z)

    def u_and_grad_device(self, t, X) -> tuple[jnp.ndarray, jnp.ndarray]:
        """(u, Z) as DEVICE arrays — no host sync, so back-to-back calls
        pipeline on the accelerator (the serving hot path)."""
        X = jnp.asarray(X, jnp.float32).reshape(-1, self.dim)
        t = jnp.broadcast_to(
            jnp.asarray(t, jnp.float32).reshape(-1, 1), (X.shape[0], 1)
        )
        return self._call(t, X)

    def u(self, t, X) -> np.ndarray:
        return self.u_and_grad(t, X)[0]

    def surface(
        self, t_values, x_points
    ) -> np.ndarray:
        """u on the (t, x) product grid: t_values (nt,), x_points (nx, D)
        → (nt, nx). One batched call — the grid is flattened through the
        artifact's symbolic batch dimension."""
        t_values = np.asarray(t_values, np.float32).reshape(-1)
        x_points = np.asarray(x_points, np.float32).reshape(-1, self.dim)
        nt, nx = len(t_values), len(x_points)
        t = np.repeat(t_values, nx)[:, None]
        X = np.tile(x_points, (nt, 1))
        u, _ = self.u_and_grad(t, X)
        return u.reshape(nt, nx)


def load_solution(path: str) -> ServedSolution:
    with open(path, "rb") as f:
        blob = f.read()
    return ServedSolution(jax_export.deserialize(blob))
