"""Fused bias + activation (+gain, +clamp).

TPU-native equivalent of the reference CUDA op
(/root/reference/PanoHead/torch_utils/ops/bias_act.py:54, bias_act.cu).
On TPU there is nothing to hand-fuse: XLA fuses the bias add, the
activation, the gain multiply and the clamp into the producing matmul/conv.
This module only has to pin down the exact *semantics* (default alphas and
gains per activation) so weight-ported StyleGAN checkpoints reproduce.

Every activation below matches the reference's ``activation_funcs`` table
(bias_act.py:25-37): the value is ``clamp(act(x + b) * def_gain * gain)``.
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Callable, Optional

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class _Act:
    fn: Callable
    def_alpha: float
    def_gain: float


activation_funcs = {
    "linear": _Act(lambda x, alpha: x, 0.0, 1.0),
    "relu": _Act(lambda x, alpha: jax.nn.relu(x), 0.0, math.sqrt(2)),
    "lrelu": _Act(lambda x, alpha: jax.nn.leaky_relu(x, alpha), 0.2, math.sqrt(2)),
    "tanh": _Act(lambda x, alpha: jnp.tanh(x), 0.0, 1.0),
    "sigmoid": _Act(lambda x, alpha: jax.nn.sigmoid(x), 0.0, 1.0),
    "elu": _Act(lambda x, alpha: jax.nn.elu(x), 0.0, 1.0),
    "selu": _Act(lambda x, alpha: jax.nn.selu(x), 0.0, 1.0),
    "softplus": _Act(lambda x, alpha: jax.nn.softplus(x), 0.0, 1.0),
    "swish": _Act(lambda x, alpha: jax.nn.sigmoid(x) * x, 0.0, math.sqrt(2)),
    "gelu": _Act(lambda x, alpha: jax.nn.gelu(x, approximate=False), 0.0, 1.0),
}


def bias_act(
    x: jax.Array,
    b: Optional[jax.Array] = None,
    dim: int = 1,
    act: str = "linear",
    alpha: Optional[float] = None,
    gain: Optional[float] = None,
    clamp: Optional[float] = None,
) -> jax.Array:
    """y = clamp(act(x + b) * gain), with per-activation default gain.

    Args:
      x: input of any rank.
      b: optional bias broadcast along axis `dim`.
      dim: axis of x that b aligns with (channel axis).
      act: key into `activation_funcs`.
      alpha: activation shape parameter (lrelu slope); None = default.
      gain: extra scaling on top of the activation's default gain;
        None = def_gain, otherwise def_gain is REPLACED by `gain`
        (matching the reference: gain = float(gain if gain is not None
        else spec.def_gain)).
      clamp: clamp output to [-clamp, clamp]; None/negative = no clamp.
    """
    spec = activation_funcs[act]
    alpha = float(alpha if alpha is not None else spec.def_alpha)
    gain = float(gain if gain is not None else spec.def_gain)
    clamp = float(clamp if clamp is not None else -1.0)

    if b is not None:
        shape = [1] * x.ndim
        shape[dim] = -1
        x = x + b.astype(x.dtype).reshape(shape)
    x = spec.fn(x, alpha)
    if gain != 1.0:
        x = x * jnp.asarray(gain, dtype=x.dtype)
    if clamp >= 0.0:
        x = jnp.clip(x, -clamp, clamp)
    return x
