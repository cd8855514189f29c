"""Training schedules: time-step refinement and the two-phase LR protocol.

- Time-step refinement (coarse→fine N): reference formula
  ``N = ceil(Mm^(int(it/4000)+1))`` for 4000 ≤ it < 20000; past 20000 the
  reference simply stops updating ``self.N``, so the *last ramp value*
  (≈ ``ceil(Mm^5)``, the original fine N) persists
  (``1d_BSPDE_case.py:371-375``; the base ``Mm`` is typically ``N^(1/5)``).
  Dynamic N changes array shapes → under jit each distinct N is its own
  compilation; the schedule is therefore exposed as *buckets* of contiguous
  iterations sharing one N, so the trainer compiles at most
  ``len(distinct N)`` programs instead of recompiling per iteration
  (SURVEY.md §7 "hard parts": bucket N values).

- Two-phase protocol: initial phase at lr≈1e-3 then fine-tune at lr≈1e-5
  (reference ``TrainingPhases``, ``1d_BSPDE_case.py:639-661``), expressed here
  as data driving ``Trainer.train`` calls.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Iterator, Optional


@dataclasses.dataclass(frozen=True)
class TimeStepRefinement:
    """The reference's coarse-to-fine N schedule.

    Mm: refinement base (reference passes ``Mm ≈ N**(1/5)``).
    ramp_start, ramp_period, ramp_end: iteration breakpoints (4000 / 4000 /
      20000 in the reference).
    n_cap: optional upper bound on N (the reference has none; the formula
      reaches Mm^5 ≈ the original N by it=16000).
    """

    Mm: float
    ramp_start: int = 4000
    ramp_period: int = 4000
    ramp_end: int = 20000
    n_cap: Optional[int] = None

    def n_at(self, it: int) -> int:
        if it < self.ramp_start:
            n = math.ceil(self.Mm)
        elif it < self.ramp_end:
            n = math.ceil(self.Mm ** (it // self.ramp_period + 1))
        else:
            # The reference's loop stops touching self.N past ramp_end, so the
            # last ramp value persists — a long run must NOT collapse back to
            # the coarsest grid (1d_BSPDE_case.py:371-375 has no else-branch).
            n = math.ceil(self.Mm ** ((self.ramp_end - 1) // self.ramp_period + 1))
        if self.n_cap is not None:
            n = min(n, self.n_cap)
        return max(n, 1)

    def buckets(self, start_it: int, n_iter: int) -> Iterator[tuple[int, int, int]]:
        """Yield (start, length, N) runs of contiguous iterations with equal N."""
        it = start_it
        end = start_it + n_iter
        while it < end:
            n = self.n_at(it)
            j = it
            while j < end and self.n_at(j) == n:
                j += 1
            yield it, j - it, n
            it = j


@dataclasses.dataclass(frozen=True)
class PhaseSpec:
    """One phase of the two-phase protocol."""

    n_iter: int
    learning_rate: float
    optimizer_type: str = "Adam"


def two_phase(
    initial_iters: int = 2000,
    initial_lr: float = 1e-3,
    fine_iters: int = 500,
    fine_lr: float = 1e-5,
    optimizer_type: str = "Adam",
) -> tuple[PhaseSpec, PhaseSpec]:
    """The reference's canonical two-phase schedule
    (``nd_BSPDE_case.py:750-801``: 2000 @ 1e-3 + 500 @ 1e-5)."""
    return (
        PhaseSpec(initial_iters, initial_lr, optimizer_type),
        PhaseSpec(fine_iters, fine_lr, optimizer_type),
    )
