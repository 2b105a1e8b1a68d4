"""StyleGAN3 filtered leaky-ReLU, composed from XLA ops.

TPU-native equivalent of the 1.8k-line CUDA kernel family
(/root/reference/PanoHead/torch_utils/ops/filtered_lrelu.{cu,py}). The
reference keeps a pure composition path as its oracle
(filtered_lrelu.py:123-156); on TPU that composition IS the fast path:
both FIR resamples are single dilated/strided convs (ops/upfirdn2d.py)
and XLA fuses the pointwise lrelu between them. The CUDA sign-buffer
backward trick is unnecessary — JAX autodiff of this composition yields
the same recomputation-free gradient structure.
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import numpy as np

from .bias_act import bias_act
from .upfirdn2d import upfirdn2d


def filtered_lrelu(
    x: jax.Array,
    fu: Optional[np.ndarray] = None,
    fd: Optional[np.ndarray] = None,
    b: Optional[jax.Array] = None,
    up: int = 1,
    down: int = 1,
    padding=0,
    gain: float = math.sqrt(2),
    slope: float = 0.2,
    clamp: Optional[float] = None,
    flip_filter: bool = False,
) -> jax.Array:
    """bias -> FIR upsample -> lrelu(*gain, clamp) -> FIR downsample."""
    if b is not None:
        x = bias_act(x, b, dim=1)
    x = upfirdn2d(x, fu, up=up, padding=padding, gain=up ** 2, flip_filter=flip_filter)
    x = bias_act(x, act="lrelu", alpha=slope, gain=gain, clamp=clamp)
    x = upfirdn2d(x, fd, down=down, flip_filter=flip_filter)
    return x
