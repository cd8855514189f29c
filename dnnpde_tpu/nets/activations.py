"""Activation functions for the network zoo.

Capability parity with the reference's string-selected activations
(``Sine`` module at ``Functions/Sine.py:6-12``; selection logic at
``1d_BSPDE_case.py:164-169``): ``{"Sine", "ReLU", "Tanh"}``.

Activations here are plain ``jnp``-level functions (not modules) — they fuse
into the surrounding matmuls under XLA, so there is nothing to gain from
making them stateful.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

Activation = Callable[[jnp.ndarray], jnp.ndarray]


def sine(x: jnp.ndarray) -> jnp.ndarray:
    """Sine activation (SIREN-style), reference ``Functions/Sine.py:6-12``."""
    return jnp.sin(x)


def relu(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.maximum(x, 0.0)


def tanh(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.tanh(x)


_ACTIVATIONS: dict[str, Activation] = {
    "sine": sine,
    "relu": relu,
    "tanh": tanh,
}


def get_activation(name: str | Activation) -> Activation:
    """Resolve an activation by (case-insensitive) name or pass through a callable.

    Accepts the reference's spellings ("Sine", "ReLU", "Tanh").
    """
    if callable(name):
        return name
    key = name.lower()
    if key not in _ACTIVATIONS:
        raise ValueError(
            f"Unknown activation {name!r}; expected one of {sorted(_ACTIVATIONS)}"
        )
    return _ACTIVATIONS[key]
