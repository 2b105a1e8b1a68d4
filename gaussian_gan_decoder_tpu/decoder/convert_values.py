"""Density/color -> 3DGS attribute converters.

Equivalent of /root/reference/main/decoder_utils/convert_values.py:5-16
(kept for API parity; the reference never imports it — SURVEY D17)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..gaussians.model import inverse_sigmoid


def sigma2opacity(sigma: jax.Array) -> jax.Array:
    """NeRF density -> raw (logit) 3DGS opacity."""
    s = jax.nn.softplus(sigma - 1) / 512.0
    alpha = 1 - jnp.exp(-s)
    logit = inverse_sigmoid(alpha)
    return jnp.clip(jnp.nan_to_num(logit, neginf=-100.0, posinf=100.0), -100.0, 100.0)


def rgb2gaussiancolor(rgb: jax.Array) -> jax.Array:
    return jnp.clip(rgb[..., :3], 0, 1)
