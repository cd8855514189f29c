"""Network zoo (flax.linen modules) + activations + init policies."""

from dnnpde_tpu.nets.activations import get_activation, relu, sine, tanh
from dnnpde_tpu.nets.initializers import xavier_uniform
from dnnpde_tpu.nets.networks import (
    MLP,
    Dense,
    NaisNet,
    ResNet,
    SDENet,
    VerletNet,
    build_network,
)

__all__ = [
    "MLP",
    "Dense",
    "NaisNet",
    "ResNet",
    "SDENet",
    "VerletNet",
    "build_network",
    "get_activation",
    "sine",
    "relu",
    "tanh",
    "xavier_uniform",
]
