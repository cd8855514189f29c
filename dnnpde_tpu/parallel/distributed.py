"""Multi-host initialization (slices beyond one host).

The reference has no distributed runtime (SURVEY.md §2.6). On TPU pods the
only extra step beyond this framework's mesh-based sharding is process-level
initialization: every host calls :func:`init_distributed` first, after which
``jax.devices()`` spans the whole slice and the existing ``make_mesh`` /
``Trainer(mesh=...)`` paths work unchanged (collectives ride ICI within the
slice, DCN across slices — laid out by the mesh device order).

Exercised for real by ``tests/test_distributed.py``: two worker processes
(2 virtual CPU devices each) initialize a 4-device global mesh, train in
lockstep through cross-process gloo collectives, and match a single-process
run of the same seed to float tolerance.
"""

from __future__ import annotations

from typing import Optional

import jax


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize jax.distributed for a multi-host slice.

    With no arguments, TPU pod environments auto-discover the coordinator
    from the runtime metadata; arguments are for manual/GPU-style setups.
    Safe to call once per process, before any backend use.
    """
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def is_multi_host() -> bool:
    return jax.process_count() > 1


def global_device_summary() -> dict:
    """Process/device topology snapshot for logs."""
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": jax.device_count(),
    }
