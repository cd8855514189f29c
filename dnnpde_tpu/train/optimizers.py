"""Optimizer factory: the reference's 9 string-selected optimizers, via optax.

Reference factory: ``FBSNN.train`` (``1d_BSPDE_case.py:338-357``) supports
Adam, SGD, RMSprop, AdamW, Adadelta, Adagrad, Adamax, ASGD, LBFGS. Gradient
clipping (global norm 1.0, reference ``clip_grad_norm_`` at
``1d_BSPDE_case.py:390``) is composed into the chain for all but LBFGS
(the reference skips clipping on the LBFGS branch, ``:387-388``).

Notes on mappings:
- ASGD: optax has no averaged-SGD; during *training* torch's ASGD takes plain
  SGD steps and only maintains a side average (used if you explicitly swap
  parameters in). The training dynamics therefore ARE plain SGD, which is how
  we map it; the side average is not maintained.
- LBFGS: ``optax.lbfgs`` with zoom linesearch; it needs the loss closure at
  update time — the trainer handles that branch (the reference's LBFGS path
  has a double-backward quirk, ``1d_BSPDE_case.py:385-388``, not replicated).
"""

from __future__ import annotations

from typing import Callable, Optional

import optax

OPTIMIZER_NAMES = (
    "Adam",
    "SGD",
    "RMSprop",
    "AdamW",
    "Adadelta",
    "Adagrad",
    "Adamax",
    "ASGD",
    "LBFGS",
)


def is_lbfgs(optimizer_type: str) -> bool:
    return optimizer_type.lower() == "lbfgs"


def build_optimizer(
    optimizer_type: str,
    learning_rate: float | Callable[[int], float],
    clip_norm: Optional[float] = 1.0,
) -> optax.GradientTransformation:
    """Build an optax chain by the reference's optimizer_type string."""
    key = optimizer_type.lower()
    factories = {
        "adam": optax.adam,
        "sgd": optax.sgd,
        "rmsprop": optax.rmsprop,
        "adamw": optax.adamw,
        "adadelta": optax.adadelta,
        "adagrad": optax.adagrad,
        "adamax": optax.adamax,
        "asgd": optax.sgd,
    }
    if key == "lbfgs":
        # No clipping for LBFGS (parity with the reference branch).
        return optax.lbfgs(learning_rate)
    if key not in factories:
        raise ValueError(
            f"Optimizer type {optimizer_type!r} is not recognized; "
            f"expected one of {OPTIMIZER_NAMES}"
        )
    # inject_hyperparams turns the learning rate into a runtime value carried
    # in the optimizer state — a jitted train step compiled against one lr
    # keeps working (no recompile) when a later phase re-inits with another,
    # which makes the reference's two-phase protocol recompile-free.
    tx = optax.inject_hyperparams(factories[key])(learning_rate=learning_rate)
    if clip_norm is not None:
        tx = optax.chain(optax.clip_by_global_norm(clip_norm), tx)
    return tx
