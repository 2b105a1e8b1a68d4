"""Conv2d with fused FIR up/downsampling + StyleGAN2 modulated conv.

TPU-native equivalents of
  /root/reference/PanoHead/torch_utils/ops/conv2d_resample.py:48 and
  /root/reference/PanoHead/training/networks_stylegan2.py:34-91.

Design notes (deviations from the CUDA/torch strategy, same math):

* `conv2d_resample`: the reference picks among five torch execution
  strategies (strided conv, transpose conv, ...). All compute the same
  function: zero-insert -> FIR filter -> conv(w) -> FIR filter ->
  decimate, with all padding folded up front. Here the zero-insertion +
  FIR collapse into ONE `lax.conv_general_dilated` (see ops/upfirdn2d.py)
  and the weight conv is a second one; XLA fuses/tiles both onto the MXU.

* `modulated_conv2d`: the reference's "fused" path builds a per-sample
  weight tensor and runs a grouped conv with batch-as-groups — a CUDA
  trick that starves a systolic array (tiny per-group contractions).
  Since conv is linear, modulation/demodulation commute with it:
      conv(x * s, W) * d  ==  conv(x, W * s) * d
  so we always scale activations (one big batched conv on the MXU,
  identical math to the reference's non-fused path, equal in exact
  arithmetic to its fused path). The fp16 overflow pre-normalisation
  (networks_stylegan2.py:53-56) is unnecessary in bf16 (same exponent
  range as f32) and is omitted — documented deviation.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .upfirdn2d import (
    _get_filter_size,
    _parse_padding,
    upfirdn2d,
)


def _conv2d(x, w, stride=1, padding=((0, 0), (0, 0)), groups=1, flip_weight=True):
    """Plain NCHW conv. flip_weight=True = correlation (torch conv2d)."""
    if not flip_weight and (w.shape[2] > 1 or w.shape[3] > 1):
        w = jnp.flip(w, axis=(2, 3))
    return jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=padding,
        feature_group_count=groups,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32 if x.dtype == jnp.float32 else None,
    ).astype(x.dtype)


def conv2d_resample(
    x: jax.Array,
    w: jax.Array,
    f: Optional[np.ndarray] = None,
    up: int = 1,
    down: int = 1,
    padding=0,
    groups: int = 1,
    flip_weight: bool = True,
    flip_filter: bool = False,
) -> jax.Array:
    """2D conv with optional FIR up/downsampling (ref conv2d_resample.py:48).

    Padding is specified w.r.t. the upsampled image, applied once up front.
    """
    out_channels, in_per_group, kh, kw = w.shape
    fw, fh = _get_filter_size(f)
    px0, px1, py0, py1 = _parse_padding(padding)

    # Fold filter support into the padding (ref :83-93).
    if up > 1:
        px0 += (fw + up - 1) // 2
        px1 += (fw - up) // 2
        py0 += (fh + up - 1) // 2
        py1 += (fh - up) // 2
    if down > 1:
        px0 += (fw - down + 1) // 2
        px1 += (fw - down) // 2
        py0 += (fh - down + 1) // 2
        py1 += (fh - down) // 2

    if up > 1:
        # zero-insert + FIR + pad in one dilated conv, then the weight conv.
        x = upfirdn2d(
            x, f, up=up, padding=[px0, px1, py0, py1],
            gain=up ** 2, flip_filter=flip_filter,
        )
        x = _conv2d(x, w, groups=groups, flip_weight=flip_weight)
        if down > 1:
            x = upfirdn2d(x, f, down=down, flip_filter=flip_filter)
        return x

    if down > 1:
        # FIR + pad, then strided weight conv (= conv + decimate).
        x = upfirdn2d(x, f, padding=[px0, px1, py0, py1], flip_filter=flip_filter)
        return _conv2d(x, w, stride=down, groups=groups, flip_weight=flip_weight)

    # No resampling: one conv with (possibly negative) padding.
    if px0 < 0 or px1 < 0 or py0 < 0 or py1 < 0:
        x = x[:, :, max(-py0, 0): x.shape[2] - max(-py1, 0),
              max(-px0, 0): x.shape[3] - max(-px1, 0)]
        px0, px1, py0, py1 = max(px0, 0), max(px1, 0), max(py0, 0), max(py1, 0)
    return _conv2d(
        x, w, padding=((py0, py1), (px0, px1)), groups=groups,
        flip_weight=flip_weight,
    )


def modulated_conv2d(
    x: jax.Array,                 # (N, C_in, H, W)
    weight: jax.Array,            # (C_out, C_in, kh, kw)
    styles: jax.Array,            # (N, C_in)
    noise: Optional[jax.Array] = None,
    up: int = 1,
    down: int = 1,
    padding: int = 0,
    resample_filter: Optional[np.ndarray] = None,
    demodulate: bool = True,
    flip_weight: bool = True,
) -> jax.Array:
    """StyleGAN2 modulated conv (ref networks_stylegan2.py:34-91).

    Always executes via activation scaling (see module docstring), which
    keeps a single large conv on the MXU for any batch size.
    """
    N, in_channels, _, _ = x.shape
    out_channels = weight.shape[0]

    dcoefs = None
    if demodulate:
        # demod statistics at >= f32 (matches ref, which keeps w/styles f32)
        acc_dtype = jnp.promote_types(weight.dtype, jnp.float32)
        w = weight[None].astype(acc_dtype) * styles.astype(acc_dtype)[
            :, None, :, None, None
        ]  # (N, O, I, kh, kw)
        dcoefs = jax.lax.rsqrt(jnp.sum(jnp.square(w), axis=(2, 3, 4)) + 1e-8)  # (N, O)

    x = x * styles.astype(x.dtype)[:, :, None, None]
    x = conv2d_resample(
        x, weight.astype(x.dtype), f=resample_filter, up=up, down=down,
        padding=padding, flip_weight=flip_weight,
    )
    if demodulate and noise is not None:
        x = x * dcoefs.astype(x.dtype)[:, :, None, None] + noise.astype(x.dtype)
    elif demodulate:
        x = x * dcoefs.astype(x.dtype)[:, :, None, None]
    elif noise is not None:
        x = x + noise.astype(x.dtype)
    return x
