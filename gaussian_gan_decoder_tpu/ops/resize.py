"""Bilinear image resize with torch `F.interpolate` conventions.

Used where the reference calls torch.nn.functional.interpolate:
  * SR input resize (/root/reference/PanoHead/training/superresolution.py:49-52)
  * background blend (/root/reference/PanoHead/training/triplane.py:185-191)
  * LPIPS 256x downsample (/root/reference/main/loss_utils/lpips.py)

align_corners=False half-pixel mapping. `antialias=True` applies a
triangle (tent) filter scaled by the downsampling factor — the same
kernel torch uses — implemented as a separable weight-matrix product
(dense matmul on the MXU rather than a gather, since resize matrices are
small and static).
"""
from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=None)
def _resize_matrix(in_size: int, out_size: int, antialias: bool) -> np.ndarray:
    """(out_size, in_size) row-stochastic bilinear resize matrix."""
    scale = in_size / out_size
    # antialias only matters when downsampling
    support_scale = max(scale, 1.0) if antialias else 1.0
    # half-pixel source coordinate for each output pixel
    out_coord = (np.arange(out_size, dtype=np.float64) + 0.5) * scale - 0.5
    support = support_scale  # triangle filter half-width
    lo = np.floor(out_coord - support).astype(int)
    hi = np.ceil(out_coord + support).astype(int)
    m = np.zeros((out_size, in_size), dtype=np.float64)
    for i in range(out_size):
        idx = np.arange(lo[i], hi[i] + 1)
        w = 1.0 - np.abs(idx - out_coord[i]) / support_scale
        w = np.clip(w, 0.0, None)
        if antialias:
            # torch's antialias path DROPS out-of-bounds taps, then
            # renormalises over the surviving ones
            keep = (idx >= 0) & (idx < in_size)
            idx, w = idx[keep], w[keep]
        else:
            idx = np.clip(idx, 0, in_size - 1)  # replicate edge
        for j, ww in zip(idx, w):
            m[i, j] += ww
    m /= m.sum(axis=1, keepdims=True)
    return m.astype(np.float32)


def resize_bilinear(x, out_h: int, out_w: int, antialias: bool = False):
    """Resize (..., H, W) to (..., out_h, out_w), torch-compatible."""
    in_h, in_w = x.shape[-2], x.shape[-1]
    if (in_h, in_w) == (out_h, out_w):
        return x
    mh = jnp.asarray(_resize_matrix(in_h, out_h, antialias), dtype=x.dtype)
    mw = jnp.asarray(_resize_matrix(in_w, out_w, antialias), dtype=x.dtype)
    x = jnp.einsum("oh,...hw->...ow", mh, x)
    x = jnp.einsum("pw,...hw->...hp", mw, x)
    return x
