"""PDE problem definitions (the reference's phi/g/mu/sigma zoo, SURVEY.md §2.3)."""

from dnnpde_tpu.pde.base import CallableProblem, PDEProblem, as_callable_problem
from dnnpde_tpu.pde.heston import HestonAmericanPut, HestonPDE
from dnnpde_tpu.pde.problems import (
    AmericanPutOption,
    AsianCallOption,
    BSPDETestCase,
    BasketCallOption,
    BermudanMaxCall,
    BlackScholesBarenblatt,
    CallOption1D,
    CallOptionND,
    HamiltonJacobiBellman,
    LookbackCallOption,
    UpAndOutCall,
)

__all__ = [
    "PDEProblem",
    "as_callable_problem",
    "CallableProblem",
    "AmericanPutOption",
    "AsianCallOption",
    "BermudanMaxCall",
    "BlackScholesBarenblatt",
    "CallOption1D",
    "CallOptionND",
    "BasketCallOption",
    "BSPDETestCase",
    "HamiltonJacobiBellman",
    "LookbackCallOption",
    "UpAndOutCall",
    "HestonPDE",
    "HestonAmericanPut",
]
