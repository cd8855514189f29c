"""dnnpde_tpu — a TPU-native deep-BSDE framework for high-dimensional parabolic PDEs.

A ground-up JAX/XLA/Pallas re-design of the capability surface of
``timothykski/Deep-neural-network-solutions-for-partial-differential-equations``
(the FBSNN / deep-BSDE method of Raissi et al.), built TPU-first:

- the full N-step Euler–Maruyama rollout + BSDE residual is a single
  ``lax.scan`` inside one jitted train step (reference: a Python loop building
  an autograd graph per step, ``1d_BSPDE_case.py:246-289``);
- Brownian increments are generated **on device** inside the jitted step
  (reference: host NumPy + host→device copy every iteration,
  ``1d_BSPDE_case.py:291-321``);
- the path/batch axis is data-parallel over a ``jax.sharding.Mesh`` with XLA
  collectives (reference: single device only);
- hot path-generation ops have Pallas TPU kernels (``dnnpde_tpu.ops``);
- classical pricers (Black–Scholes, Heston closed form, Crank–Nicolson,
  Monte-Carlo, FFT, moment matching, Variance-Gamma) are JAX-native oracles.

Layout (mirrors SURVEY.md §7):

- ``pde``      — PDE problem definitions (mu/sigma/phi/g + exact solutions)
- ``nets``     — network zoo (MLP, NAIS-Net, ResNet, SDENet, VerletNet)
- ``sim``      — Brownian path engine (correlated increments, Euler–Maruyama)
- ``ops``      — Pallas TPU kernels
- ``solver``   — deep-BSDE objective (scan rollout, Z via autodiff, penalties)
- ``train``    — optimizers, schedules, trainer, checkpointing
- ``parallel`` — mesh construction + data-parallel sharding of the path axis
- ``numerics`` — classical pricers / ground-truth oracles
- ``evals``    — prediction sampling, metrics, stability, sensitivity, plots
- ``bench``    — tolerance-gated benchmark harness
- ``serve``    — portable StableHLO serving artifacts (jax.export)
- ``runtime``  — persistent compilation cache helpers
"""

__version__ = "0.1.0"

from dnnpde_tpu import nets, pde, sim, solver, train, parallel, numerics

__all__ = [
    "nets",
    "pde",
    "sim",
    "solver",
    "train",
    "parallel",
    "numerics",
    "__version__",
]
