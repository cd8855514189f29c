"""Checkpointing: params + optimizer state + history + RNG key.

The reference persists only ``model_state_dict`` + loss history
(``1d_BSPDE_case.py:453-464``), silently dropping optimizer state — resuming
an Adam run restarts its moments. Here the full training state round-trips.

Format: a single msgpack file, msgpack at BOTH levels — params/opt_state as
``flax.serialization.to_bytes`` blobs nested inside an outer
``msgpack_serialize`` container (no pickle anywhere, so restoring an
untrusted checkpoint cannot execute code). An Orbax-based variant is
provided for large/multi-host checkpoints.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Optional

import jax
import numpy as np
from flax import serialization


def _msgpackable(v: Any) -> Any:
    """Canonicalize metadata for msgpack: tuples→lists (recursively), jax
    arrays→numpy, numpy scalars→python scalars."""
    if isinstance(v, (tuple, list)):
        return [_msgpackable(x) for x in v]
    if isinstance(v, dict):
        return {k: _msgpackable(x) for k, x in v.items()}
    if isinstance(v, jax.Array):
        return np.asarray(v)
    if isinstance(v, np.generic):
        return v.item()
    return v


def save_checkpoint(
    file_name: str,
    params: Any,
    opt_state: Any = None,
    **metadata: Any,
) -> None:
    """Serialize params (+ optional opt_state, + JSON-able metadata)."""
    payload = {
        "params": serialization.to_bytes(params),
        "opt_state": (
            serialization.to_bytes(opt_state) if opt_state is not None else None
        ),
        "metadata": {k: _msgpackable(v) for k, v in metadata.items()},
    }
    Path(file_name).parent.mkdir(parents=True, exist_ok=True)
    with open(file_name, "wb") as f:
        f.write(serialization.msgpack_serialize(payload))


def restore_checkpoint(
    file_name: str,
    params_template: Any,
    opt_state_template: Any = None,
) -> dict[str, Any]:
    """Restore into the given pytree templates. Returns a dict with ``params``,
    ``opt_state`` (or None) and all saved metadata keys."""
    with open(file_name, "rb") as f:
        blob = f.read()
    try:
        payload = serialization.msgpack_restore(blob)
    except Exception as e:
        if blob[:1] == b"\x80":  # pickle protocol-2+ magic
            raise ValueError(
                f"{file_name} is a legacy pickle checkpoint; the format is "
                "now msgpack-only (pickle.load executes arbitrary code). "
                "Re-save it from a trusted session: "
                "pickle.load it yourself, then save_checkpoint(...)"
            ) from e
        raise
    out: dict[str, Any] = dict(payload["metadata"])
    out["params"] = serialization.from_bytes(params_template, payload["params"])
    if payload.get("opt_state") is not None and opt_state_template is not None:
        out["opt_state"] = serialization.from_bytes(
            opt_state_template, payload["opt_state"]
        )
    else:
        out["opt_state"] = None
    if "key" in out and out["key"] is not None:
        out["key"] = jax.numpy.asarray(out["key"])
    return out


def save_checkpoint_orbax(directory: str, state: Any) -> None:
    """Orbax checkpoint (sharding-aware; for multi-host / large states)."""
    import orbax.checkpoint as ocp

    path = Path(directory).absolute()
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()


def restore_checkpoint_orbax(directory: str, template: Optional[Any] = None) -> Any:
    import orbax.checkpoint as ocp

    path = Path(directory).absolute()
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, template)
