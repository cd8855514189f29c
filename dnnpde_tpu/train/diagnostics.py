"""Tracing / profiling / anomaly-detection hooks (SURVEY.md §5 aux subsystems).

TPU-native replacements for the reference's instrumentation:
- ``torch.autograd.set_detect_anomaly(True)`` (``DeepBSDE.py:11``) →
  :func:`detect_anomalies` (jax_debug_nans/jax_debug_infs context).
- wall-clock ``time.time()`` deltas printed every 100 iters
  (``1d_BSPDE_case.py:402-405``) → :class:`StepTimer` (the Trainer already
  prints per-chunk wall clock; this gives cumulative logs like
  ``hjb_implement.py:388-439``'s ``time_logs``).
- no profiler in the reference → :func:`profile_trace` wraps
  ``jax.profiler`` for TensorBoard-compatible traces of the jitted step.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def detect_anomalies(nans: bool = True, infs: bool = True) -> Iterator[None]:
    """Raise on the first NaN/Inf produced inside jitted code (per-primitive
    re-execution under the hood — debug only, large slowdown)."""
    prev_nan = jax.config.jax_debug_nans
    prev_inf = jax.config.jax_debug_infs
    try:
        jax.config.update("jax_debug_nans", nans)
        jax.config.update("jax_debug_infs", infs)
        yield
    finally:
        jax.config.update("jax_debug_nans", prev_nan)
        jax.config.update("jax_debug_infs", prev_inf)


@contextlib.contextmanager
def profile_trace(log_dir: str, host_tracer_level: int = 2) -> Iterator[None]:
    """Capture a ``jax.profiler`` trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(log_dir, create_perfetto_link=False)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Cumulative wall-clock logger (reference ``time_logs``,
    ``hjb_implement.py:388-439``). Call :meth:`lap` at each log point."""

    def __init__(self):
        self.start = time.time()
        self.laps: list[float] = []
        self.cumulative: list[float] = []
        self._last = self.start

    def lap(self) -> float:
        now = time.time()
        lap = now - self._last
        self._last = now
        self.laps.append(lap)
        self.cumulative.append(now - self.start)
        return lap


def device_memory_stats(device: Optional[jax.Device] = None) -> dict:
    """Live/peak HBM usage of a device (no reference equivalent — the
    reference never measures memory)."""
    dev = device or jax.devices()[0]
    stats = dev.memory_stats() or {}
    return {
        "bytes_in_use": stats.get("bytes_in_use"),
        "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
        "bytes_limit": stats.get("bytes_limit"),
    }
