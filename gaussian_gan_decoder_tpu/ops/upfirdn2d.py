"""Pad → upsample → FIR filter → downsample, as ONE XLA convolution.

TPU-native equivalent of the reference CUDA op
(/root/reference/PanoHead/torch_utils/ops/upfirdn2d.py:120 and upfirdn2d.cu).
The whole pipeline maps exactly onto `lax.conv_general_dilated`:

  * zero-insertion upsampling  -> lhs_dilation=(upy, upx)
  * pad/crop of the upsampled image -> conv `padding` pairs (negative = crop)
  * FIR filtering              -> depthwise conv (feature_group_count=C)
  * keep-every-Nth downsampling -> window_strides=(downy, downx)

which XLA tiles onto the MXU/VPU directly; no custom kernel needed.
Separable filters run as two rank-1 convs, mirroring the reference's
separable path (upfirdn2d.py:205-210).

Sign convention: torch/lax convs are cross-correlations, so (exactly like
the reference ref-impl, upfirdn2d.py:203) the filter is flipped when
flip_filter=False.
"""
from __future__ import annotations

from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np


def _parse_scaling(scaling):
    if isinstance(scaling, int):
        scaling = [scaling, scaling]
    sx, sy = scaling
    assert sx >= 1 and sy >= 1
    return int(sx), int(sy)


def _parse_padding(padding):
    if isinstance(padding, int):
        padding = [padding, padding]
    padding = list(padding)
    if len(padding) == 2:
        padx, pady = padding
        padding = [padx, padx, pady, pady]
    padx0, padx1, pady0, pady1 = padding
    return int(padx0), int(padx1), int(pady0), int(pady1)


def _get_filter_size(f: Optional[np.ndarray]):
    if f is None:
        return 1, 1
    assert f.ndim in (1, 2)
    fw = f.shape[-1]
    fh = f.shape[0]
    return int(fw), int(fh)


def setup_filter(
    f: Union[None, int, float, Sequence],
    normalize: bool = True,
    flip_filter: bool = False,
    gain: float = 1.0,
    separable: Optional[bool] = None,
) -> np.ndarray:
    """Prepare a FIR filter constant for upfirdn2d (host-side, numpy).

    Same contract as the reference setup_filter (upfirdn2d.py:72-117):
    normalize to unit sum, optional flip, fold `gain ** (ndim/2)` in, and
    auto-promote 1D taps to an outer-product 2D filter unless separable.
    """
    if f is None:
        f = 1
    f = np.asarray(f, dtype=np.float32)
    assert f.ndim in (0, 1, 2) and f.size > 0
    if f.ndim == 0:
        f = f[np.newaxis]

    if separable is None:
        separable = f.ndim == 1 and f.size >= 8
    if f.ndim == 1 and not separable:
        f = np.outer(f, f)
    assert f.ndim == (1 if separable else 2)

    if normalize:
        f = f / f.sum()
    if flip_filter:
        f = np.flip(f, axis=tuple(range(f.ndim)))
    f = f * (gain ** (f.ndim / 2))
    return np.ascontiguousarray(f, dtype=np.float32)


def _depthwise_conv(x, f2d, padding, lhs_dilation, strides):
    """Depthwise NCHW conv; f2d is (kh, kw) replicated across channels."""
    c = x.shape[1]
    w = jnp.broadcast_to(f2d[None, None], (c, 1, f2d.shape[0], f2d.shape[1]))
    w = w.astype(x.dtype)
    return jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=strides,
        padding=padding,
        lhs_dilation=lhs_dilation,
        feature_group_count=c,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=jax.lax.Precision.HIGHEST,
    )


def upfirdn2d(
    x: jax.Array,
    f: Optional[np.ndarray],
    up: Union[int, Sequence[int]] = 1,
    down: Union[int, Sequence[int]] = 1,
    padding: Union[int, Sequence[int]] = 0,
    flip_filter: bool = False,
    gain: float = 1.0,
) -> jax.Array:
    """upfirdn2d with the reference's exact semantics on NCHW input.

    `padding` is expressed w.r.t. the *upsampled* image, negative = crop —
    both map directly onto `lax.conv_general_dilated` padding pairs.
    """
    assert x.ndim == 4, "expected NCHW"
    upx, upy = _parse_scaling(up)
    downx, downy = _parse_scaling(down)
    padx0, padx1, pady0, pady1 = _parse_padding(padding)

    if f is None:
        f = np.ones([1, 1], dtype=np.float32)
    f = np.asarray(f, dtype=np.float32)
    assert f.ndim in (1, 2)

    # Fold gain into the filter (matches ref: f = f * gain ** (f.ndim/2)
    # applied once per separable pass).
    f = f * (float(gain) ** (f.ndim / 2))
    if not flip_filter:
        f = np.flip(f, axis=tuple(range(f.ndim)))

    # lhs_dilation drops the (up-1) trailing zeros the reference's
    # zero-insertion keeps (it pads [0, up-1] after EVERY pixel incl. the
    # last, upfirdn2d.py:196-198); fold them into the hi padding.
    pad = ((pady0, pady1 + upy - 1), (padx0, padx1 + upx - 1))
    lhs_dil = (upy, upx)
    strides = (downy, downx)

    if f.ndim == 2:
        fj = jnp.asarray(f)
        return _depthwise_conv(x, fj, pad, lhs_dil, strides)

    # Separable: vertical pass then horizontal pass (ref splits the same way).
    fj = jnp.asarray(f)
    x = _depthwise_conv(
        x, fj[:, None], ((pady0, pady1 + upy - 1), (0, 0)), (upy, 1), (downy, 1)
    )
    x = _depthwise_conv(
        x, fj[None, :], ((0, 0), (padx0, padx1 + upx - 1)), (1, upx), (1, downx)
    )
    return x


def filter2d(x, f, padding=0, flip_filter=False, gain=1.0):
    """Shape-preserving FIR filter (ref upfirdn2d.py:279-313)."""
    padx0, padx1, pady0, pady1 = _parse_padding(padding)
    fw, fh = _get_filter_size(f)
    p = [
        padx0 + fw // 2,
        padx1 + (fw - 1) // 2,
        pady0 + fh // 2,
        pady1 + (fh - 1) // 2,
    ]
    return upfirdn2d(x, f, padding=p, flip_filter=flip_filter, gain=gain)


def upsample2d(x, f, up=2, padding=0, flip_filter=False, gain=1.0):
    """FIR upsample by `up` (ref upfirdn2d.py:315-352)."""
    upx, upy = _parse_scaling(up)
    padx0, padx1, pady0, pady1 = _parse_padding(padding)
    fw, fh = _get_filter_size(f)
    p = [
        padx0 + (fw + upx - 1) // 2,
        padx1 + (fw - upx) // 2,
        pady0 + (fh + upy - 1) // 2,
        pady1 + (fh - upy) // 2,
    ]
    return upfirdn2d(
        x, f, up=up, padding=p, flip_filter=flip_filter, gain=gain * upx * upy
    )


def downsample2d(x, f, down=2, padding=0, flip_filter=False, gain=1.0):
    """FIR downsample by `down` (ref upfirdn2d.py:354-391)."""
    downx, downy = _parse_scaling(down)
    padx0, padx1, pady0, pady1 = _parse_padding(padding)
    fw, fh = _get_filter_size(f)
    p = [
        padx0 + (fw - downx + 1) // 2,
        padx1 + (fw - downx) // 2,
        pady0 + (fh - downy + 1) // 2,
        pady1 + (fh - downy) // 2,
    ]
    return upfirdn2d(x, f, down=down, padding=p, flip_filter=flip_filter, gain=gain)
