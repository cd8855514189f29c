"""Serving: portable compiled artifacts of a trained solution.

The reference's only deployment story is re-loading a torch pickle into the
full model class (``1d_BSPDE_case.py:453-464``) — serving requires the whole
training codebase. Here a trained solution exports to a single StableHLO
artifact (weights baked in, batch dimension symbolic, lowered for CPU+TPU)
that any JAX process can load and evaluate WITHOUT the network/model code.
"""

from dnnpde_tpu.serve.export import (
    ServedSolution,
    export_solution,
    export_trainer,
    load_solution,
    save_solution,
)

__all__ = [
    "ServedSolution",
    "export_solution",
    "export_trainer",
    "load_solution",
    "save_solution",
]
