"""Time-step Richardson extrapolation of the deep-BSDE value.

Train at resolutions N and 2N and combine

    Y0* = 2·Y0(2N) − Y0(N)    (cancels the O(dt) term of the Euler
                               BSDE recursion's weak bias)

Validity is measured training-free on the exact discrete-N value D(N)
(``numerics/discrete_bsde.py``; BENCH_REPORT_r3.jsonl
"heston_discrete_value_richardson" rows): for the corrected Heston model
the (N, 2N) combination lands 0.02–0.1% off the closed form at every pair
tried. The reference's scheme is the same recursion
(``1d_BSPDE_case.py:246-289``), so the capability applies to it verbatim.

History note (the round-3 diagnosis chain, ARCHITECTURE.md §6b): this
module was first built when anchored Heston runs appeared to converge to a
+7.9/+4.3/+2.1% bias curve at N=25/50/100. The discrete-BSDE oracle later
showed that curve was mostly the anchor's own floor-kink bias stacked on
the reference diffusion's −3.6% model error (bug #4) — the true scheme
bias at N=50 is only +0.26%, so the benchmarked Heston protocol no longer
needs an extrapolation pass. The combination itself remains correct and
measured, and pays whenever a problem IS run at bias-visible resolutions
(e.g. coarse-N training for speed: D(25) is +0.50% off, and the (25, 50)
combination recovers +0.04%).
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
