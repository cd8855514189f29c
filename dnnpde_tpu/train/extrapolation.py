"""Time-step Richardson extrapolation of the deep-BSDE value.

Measured motivation (round-3 heston_diag study): with the payoff-anchored
Heston parametrization the trained Y0 converges to the EXACT solution of the
N-step discrete BSDE — seed/batch spread ~0.3% — whose distance from the
continuous PDE value is first-order in dt (measured +7.9% at N=25, +4.3% at
N=50, +2.1% at N=100: halves as N doubles). The reference's scheme is the
same Euler BSDE recursion (``1d_BSPDE_case.py:246-289``), so it carries the
same bias; it just never resolved it because the hard-clamp runs were
unstable (chaotic collapse) and underconverged.

When the per-N optimum is hit this reliably, the classical fix applies:
train at N and 2N and combine

    Y0* = 2·Y0(2N) − Y0(N)    (cancels the O(dt) term)

Measured on Heston (BENCH_REPORT_r3.jsonl "heston_anchor" matrix): the
combination lands within ~0.1–0.5% of the closed form where the raw N=50
value is 4.3% off. This is a *framework* capability, not Heston-specific —
it applies to any problem whose trained Y0 is optimization-converged.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from dnnpde_tpu.train.trainer import Trainer


def train_y0(
    problem,
    M: int,
    N: int,
    phases: Sequence[tuple[int, float]],
    seed: int = 0,
    warmup: int = 250,
    optimizer: str = "Adam",
    tail: int = 5,
    trainer: Optional[Trainer] = None,
    use_ema: bool = False,
    **trainer_kwargs,
) -> float:
    """Train and return the tail-mean Y0 (the repo's standard read).

    Pass ``trainer`` to reuse compiled chunks across seeds
    (``trainer.reset(seed)`` is applied); otherwise one is built."""
    if trainer is None:
        trainer = Trainer(problem, M=M, N=N, **trainer_kwargs)
    trainer.reset(seed)
    if warmup:
        trainer.train(warmup, phases[0][1], optimizer, log_every=warmup,
                      verbose=False)
    for n_it, lr in phases:
        trainer.train(n_it, lr, optimizer, log_every=500, verbose=False)
    if use_ema:
        import jax.numpy as jnp

        u, _ = trainer.net_u(
            trainer.ema_params, jnp.zeros((1, 1)),
            jnp.asarray(problem.x0)[None, :],
        )
        return float(u[0, 0])
    return float(np.mean(trainer.y0_log[-tail:]))


def richardson_y0(
    problem,
    M: int = 128,
    N: int = 50,
    phases: Sequence[tuple[int, float]] = (
        (10000, 1e-3), (5000, 1e-4), (5000, 1e-5),
    ),
    seed: int = 0,
    trainers: Optional[tuple[Trainer, Trainer]] = None,
    **trainer_kwargs,
) -> dict[str, float]:
    """Two-resolution training + first-order Richardson combination.

    Returns {"y0_N": ..., "y0_2N": ..., "y0_richardson": 2·y0_2N − y0_N}.
    ``trainers`` (one at N, one at 2N) may be supplied to amortize compiles
    over multi-seed studies."""
    tr_n = trainers[0] if trainers else None
    tr_2n = trainers[1] if trainers else None
    y_n = train_y0(problem, M, N, phases, seed, trainer=tr_n,
                   **trainer_kwargs)
    y_2n = train_y0(problem, M, 2 * N, phases, seed, trainer=tr_2n,
                    **trainer_kwargs)
    return {
        "y0_N": y_n,
        "y0_2N": y_2n,
        "y0_richardson": 2.0 * y_2n - y_n,
    }
