"""Alias module: the long-form import name for :mod:`dnnpde_tpu`.

``import deep_neural_network_solutions_for_partial_differential_equations_tpu``
re-exports the whole framework under the upstream-derived name.
"""

from dnnpde_tpu import *  # noqa: F401,F403
from dnnpde_tpu import (  # noqa: F401
    __version__,
    nets,
    numerics,
    parallel,
    pde,
    sim,
    solver,
    train,
)
import dnnpde_tpu.evals as evals  # noqa: F401
import dnnpde_tpu.experiments as experiments  # noqa: F401
import dnnpde_tpu.ops as ops  # noqa: F401
