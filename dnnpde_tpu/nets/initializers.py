"""Weight-initialization policies.

Parity targets:
- Xavier-uniform on all linear weights (reference ``weights_init``,
  ``1d_BSPDE_case.py:194-201``).
- Gained Xavier-uniform (gain=0.5) + zero biases for the Heston variant
  (reference ``initialize_weights``, ``heston_dnnpde.py:580-585``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.nn.initializers import Initializer


def xavier_uniform(gain: float = 1.0) -> Initializer:
    """Xavier/Glorot uniform with an explicit gain.

    Matches ``torch.nn.init.xavier_uniform_``: bound = gain * sqrt(6/(fan_in+fan_out)).
    """

    def init(key: jax.Array, shape, dtype=jnp.float32) -> jnp.ndarray:
        if len(shape) < 2:
            raise ValueError("xavier_uniform requires >=2D shapes")
        fan_in, fan_out = shape[-2], shape[-1]
        bound = gain * jnp.sqrt(6.0 / (fan_in + fan_out))
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init

