"""Network zoo: MLP, NAIS-Net / ResNet, SDENet, VerletNet (flax.linen).

Capability parity with the reference's architectures, selected by ``mode``
string (``DeepBSDE.py:166-178``):

- ``MLP``        ↔ the inline ``nn.Sequential`` FC net (``1d_BSPDE_case.py:172-179``)
- ``ResNet``     ↔ ``Resnet`` loop form (``Functions/networks.py:8-50``)
- ``NaisNet``    ↔ ``Naisnet`` (``Functions/naisnet.py:6-96``) — identical math to
  ``ResNet(stable=True)``; the reference's fixed-depth net (4/5/6 layer lists)
  is a special case of the loop form.
- ``SDENet``     ↔ ``SDEnet`` stochastic-depth net (``Functions/networks.py:54-91``)
  (the reference hard-codes ``.cuda()`` in ``product``; here it is device-neutral)
- ``VerletNet``  ↔ ``VerletNet`` leapfrog net (``Functions/networks.py:94-125``)

TPU notes: hidden widths of 256 map cleanly onto MXU tiles; all blocks are
pure matmul+elementwise chains that XLA fuses. The NAIS-Net projection builds
``A = clip_fro(KᵀK) + εI`` from the 256×256 kernel each call — one extra
256×256×256 matmul per block, negligible next to the batch matmuls, and it
keeps the parametrization identical to the reference (projection applied to
the *current* weights, not a reparametrized copy).
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from dnnpde_tpu.nets.activations import Activation, get_activation
from dnnpde_tpu.nets.initializers import xavier_uniform

_EPSILON = 0.01  # NAIS-Net stability margin (reference Functions/naisnet.py:27)


class Dense(nn.Module):
    """Linear layer with Xavier-uniform weights (reference ``weights_init``).

    ``dtype`` is the *compute* dtype (params stay float32): bf16 here runs
    the matmul at the MXU's double rate on TPU. Hidden activations are O(1)
    (sine/tanh), so bf16's ~3 significant digits cost ≈0.2% relative noise
    per value that averages out across the 256-wide head reduction — the
    output head must stay f32 (see ``MLP.compute_dtype``).
    """

    features: int
    use_bias: bool = True
    gain: float = 1.0
    bias_init: Callable = nn.initializers.zeros_init()
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.Dense(
            self.features,
            use_bias=self.use_bias,
            kernel_init=xavier_uniform(self.gain),
            bias_init=self.bias_init,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)


class MLP(nn.Module):
    """Plain fully-connected net: Dense+act repeated, final Dense linear.

    ``layers`` includes input and output widths, e.g. ``[D+1, 256, 256, 256, 256, 1]``
    (reference config ``DeepBSDE.py:434``).
    """

    layers: Sequence[int]
    activation: str | Activation = "sine"
    gain: float = 1.0
    # Compute dtype of the HIDDEN matmuls (params and the output head stay
    # f32). "bfloat16" doubles the MXU rate on TPU; u ≈ O(10-100) for the
    # finance problems, so the head's wide f32 reduction keeps the output's
    # absolute error small while hidden bf16 noise (~0.2% on O(1)
    # activations) averages out. Measured accuracy/throughput tradeoff:
    # BENCH_REPORT_r2.jsonl "mixed_precision".
    compute_dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        act = get_activation(self.activation)
        dt = jnp.dtype(self.compute_dtype) if self.compute_dtype else None
        for width in self.layers[1:-1]:
            x = act(Dense(width, gain=self.gain, dtype=dt)(x))
        if dt is not None:
            x = x.astype(jnp.float32)
        return Dense(self.layers[-1], gain=self.gain)(x)


def _nais_project(kernel: jnp.ndarray, eps: float = _EPSILON) -> jnp.ndarray:
    """NAIS-Net stability projection of a square kernel.

    Builds ``A = RtR_clipped + eps*I`` where ``RtR = KKᵀ`` (the flax kernel is
    the transpose of a torch weight, so this equals the reference's ``WᵀW``)
    and the clip rescales by Frobenius norm: if ``‖RtR‖_F > δ`` then
    ``RtR ← √δ · RtR / √‖RtR‖_F`` with ``δ = 1 − 2ε``
    (reference ``Functions/naisnet.py:30-39``; note the reference clips by the
    Frobenius norm of the *matrix*, not the spectral norm — replicated here).
    The block then applies ``h ↦ −h·A + b``, guaranteeing a contractive
    residual update.
    """
    delta = 1.0 - 2.0 * eps
    rtr = kernel @ kernel.T
    norm = jnp.linalg.norm(rtr)
    scale = jnp.where(norm > delta, jnp.sqrt(delta) / jnp.sqrt(norm), 1.0)
    rtr = rtr * scale
    return rtr + eps * jnp.eye(rtr.shape[0], dtype=rtr.dtype)


class _StableBlockDense(nn.Module):
    """Dense layer whose weight is replaced by the NAIS-Net projection ``−A``."""

    features: int
    gain: float = 1.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if x.shape[-1] != self.features:
            raise ValueError("NAIS-Net stable blocks require square hidden layers")
        kernel = self.param(
            "kernel", xavier_uniform(self.gain), (x.shape[-1], self.features)
        )
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        # The projection itself stays f32 (one small 256³ matmul + norm);
        # only the batch matmul drops to the compute dtype.
        a = _nais_project(kernel)
        if self.dtype is not None:
            x = x.astype(self.dtype)
            a = a.astype(self.dtype)
        return -(x @ a) + bias


class ResNet(nn.Module):
    """Residual net; ``stable=True`` gives the NAIS-Net (input-aware stable) form.

    Structure (reference ``Functions/networks.py:34-50``):
      out = act(W_in x);  u = x
      for each hidden layer:  out = act(block(out) [+ U_i u]) + out
      return W_out out
    where ``block`` is a plain Dense (stable=False) or the projected ``−A``
    Dense plus an input-injection ``U_i u`` (stable=True).
    """

    layers: Sequence[int]
    stable: bool = True
    activation: str | Activation = "sine"
    gain: float = 1.0
    compute_dtype: Any = None  # hidden-matmul dtype; see MLP.compute_dtype

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        act = get_activation(self.activation)
        dt = jnp.dtype(self.compute_dtype) if self.compute_dtype else None
        u = x
        out = act(Dense(self.layers[1], gain=self.gain, dtype=dt)(x))
        for width in self.layers[2:-1]:
            shortcut = out
            if self.stable:
                out = _StableBlockDense(width, gain=self.gain, dtype=dt)(out)
                out = out + Dense(width, gain=self.gain, dtype=dt)(u)
            else:
                out = Dense(width, gain=self.gain, dtype=dt)(out)
            out = act(out) + shortcut
        if dt is not None:
            out = out.astype(jnp.float32)
        return Dense(self.layers[-1], gain=self.gain)(out)


class NaisNet(ResNet):
    """NAIS-Net: ``ResNet`` with the stability projection + input injection.

    Matches the reference's fixed-depth ``Naisnet`` (``Functions/naisnet.py:41-96``)
    for 4/5/6-entry layer lists and generalizes to any depth.
    """

    stable: bool = True


class SDENet(nn.Module):
    """Stochastic-depth residual net (neural-SDE flavour).

    Per hidden block (reference ``Functions/networks.py:78-91``):
      out ← out + h·act(W out) + √h · (AᵀA + εI applied via rank-1 brownian layer) · U[0,1)-noise
    where the noise enters through a bias-free width→1 "brownian" layer whose
    kernel product ``KKᵀ + εI`` scales uniform noise (reference ``product``,
    ``Functions/networks.py:71-76`` — which hard-codes ``.cuda()``; this
    implementation is device-neutral).

    Noise is drawn from the ``"sde"`` RNG collection; pass
    ``rngs={"sde": key}`` to ``apply`` (or ``deterministic=True`` to disable).
    """

    layers: Sequence[int]
    activation: str | Activation = "sine"
    gain: float = 1.0
    h: float = 0.1
    eps: float = 1e-4
    deterministic: bool = False
    compute_dtype: Any = None  # hidden-matmul dtype; see MLP.compute_dtype

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        act = get_activation(self.activation)
        dt = jnp.dtype(self.compute_dtype) if self.compute_dtype else None
        out = act(Dense(self.layers[1], gain=self.gain, dtype=dt)(x))
        for i, width in enumerate(self.layers[2:-1]):
            shortcut = out
            out = Dense(width, gain=self.gain, dtype=dt)(out)
            # Brownian scaling: bias-free (width, 1) kernel K; A = KKᵀ + εI.
            bk = self.param(
                f"brownian_kernel_{i}",
                xavier_uniform(self.gain),
                (shortcut.shape[-1], 1),
            )
            a = bk @ bk.T + self.eps * jnp.eye(bk.shape[0], dtype=bk.dtype)
            if self.deterministic:
                noise = jnp.full_like(shortcut, 0.5)
            else:
                noise = jax.random.uniform(self.make_rng("sde"), shortcut.shape)
            out = shortcut + self.h * act(out) + jnp.sqrt(self.h) * (noise @ a)
        if dt is not None:
            out = out.astype(jnp.float32)
        return Dense(self.layers[-1], gain=self.gain)(out)


class VerletNet(nn.Module):
    """Verlet/leapfrog two-variable residual net.

    Per hidden block with step ``h`` (reference ``Functions/networks.py:110-125``;
    the reference fixes ``h=0.5`` but then applies unscaled updates — replicated):
      z ← z − act(Wᵀ out + b);  out ← out + act(W z + b)
    """

    layers: Sequence[int]
    activation: str | Activation = "sine"
    gain: float = 1.0
    compute_dtype: Any = None  # hidden-matmul dtype; see MLP.compute_dtype

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        act = get_activation(self.activation)
        dt = jnp.dtype(self.compute_dtype) if self.compute_dtype else None
        out = act(Dense(self.layers[1], gain=self.gain, dtype=dt)(x))
        z = jnp.zeros_like(out)
        for i, width in enumerate(self.layers[2:-1]):
            if width != out.shape[-1]:
                raise ValueError("VerletNet requires uniform hidden widths")
            kernel = self.param(
                f"verlet_kernel_{i}",
                xavier_uniform(self.gain),
                (out.shape[-1], width),
            )
            bias = self.param(
                f"verlet_bias_{i}",
                nn.initializers.zeros_init(),
                (width,),
            )
            k = kernel.astype(dt) if dt is not None else kernel
            shortcut = out
            out = (out.astype(dt) if dt is not None else out) @ k.T + bias
            z = z - act(out)
            out = (z.astype(dt) if dt is not None else z) @ k + bias
            out = shortcut + act(out)
        if dt is not None:
            out = out.astype(jnp.float32)
        return Dense(self.layers[-1], gain=self.gain)(out)


_MODES = {
    "fc": MLP,
    "mlp": MLP,
    "naisnet": NaisNet,
    "nais-net": NaisNet,
    "resnet": ResNet,
    "verlet": VerletNet,
    "verletnet": VerletNet,
    "sdenet": SDENet,
}


def build_network(
    mode: str,
    layers: Sequence[int],
    activation: str | Activation = "sine",
    gain: float = 1.0,
    **kwargs,
) -> nn.Module:
    """Factory: network by ``mode`` string (reference ``DeepBSDE.py:166-178``).

    Accepts the reference's spellings: "FC", "Naisnet"/"NAIS-Net", "Resnet",
    "Verlet", "SDEnet".
    """
    key = mode.lower()
    if key not in _MODES:
        raise ValueError(f"Unknown network mode {mode!r}; expected one of {sorted(set(_MODES))}")
    get_activation(activation)  # validate eagerly, not at first apply
    cls = _MODES[key]
    if cls is ResNet and key == "resnet":
        kwargs.setdefault("stable", False)
    return cls(layers=tuple(layers), activation=activation, gain=gain, **kwargs)
