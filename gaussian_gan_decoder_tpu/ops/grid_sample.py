"""Bilinear/trilinear grid sampling with torch `grid_sample` conventions.

TPU-native replacement for the reference's feature probes:
  * 2D: EG3D tri-plane sampling (/root/reference/eg3d/training/
    volumetric_rendering/renderer.py:55-64)
  * 3D: PanoHead tri-grid sampling (/root/reference/PanoHead/training/
    volumetric_rendering/renderer.py:47-58)

Conventions replicated exactly: `align_corners=False` (grid -1..1 maps to
the *edges* of the corner texels, i.e. pixel centers at
(g+1)/2 * size - 0.5), `padding_mode='zeros'` (out-of-range taps read 0).

Implemented as explicit gather + lerp: `jnp.take` along flattened spatial
dims lowers to efficient XLA dynamic-gathers, and the lerp fuses into the
surrounding computation. jax.scipy.ndimage.map_coordinates is NOT used —
its half-pixel convention differs from torch.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _unnormalize(g, size):
    # align_corners=False: x = ((g + 1) * size - 1) / 2
    return ((g + 1.0) * size - 1.0) * 0.5


def _gather_2d(img_cl, iy, ix, valid, H, W):
    """img_cl: (H*W, C) channels-last; iy/ix/valid: (...,) -> (..., C).

    Channels-last rows make every gathered element a contiguous C-vector
    on the lane dimension — the layout TPU gathers want (a (C, HW) gather
    strides each tap across the whole plane and is ~100x slower at 500k
    taps)."""
    idx = jnp.clip(iy, 0, H - 1) * W + jnp.clip(ix, 0, W - 1)
    out = jnp.take(img_cl, idx, axis=0)  # (..., C)
    return out * valid[..., None].astype(out.dtype)


def grid_sample_2d(input: jax.Array, grid: jax.Array) -> jax.Array:
    """torch.nn.functional.grid_sample for 4D input.

    Args:
      input: (N, C, H, W)
      grid: (N, Ho, Wo, 2), last dim = (x, y) in [-1, 1]
    Returns:
      (N, C, Ho, Wo)
    """
    N, C, H, W = input.shape
    input_cl = jnp.transpose(input, (0, 2, 3, 1)).reshape(N, H * W, C)

    def one(img_cl, g):
        gx = _unnormalize(g[..., 0], W)
        gy = _unnormalize(g[..., 1], H)
        x0 = jnp.floor(gx).astype(jnp.int32)
        y0 = jnp.floor(gy).astype(jnp.int32)
        x1 = x0 + 1
        y1 = y0 + 1
        wx = gx - x0
        wy = gy - y0

        def val(iy, ix):
            valid = (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
            return _gather_2d(img_cl, iy, ix, valid, H, W)

        v00 = val(y0, x0)
        v01 = val(y0, x1)
        v10 = val(y1, x0)
        v11 = val(y1, x1)
        wx = wx[..., None].astype(v00.dtype)
        wy = wy[..., None].astype(v00.dtype)
        out = (
            v00 * (1 - wx) * (1 - wy)
            + v01 * wx * (1 - wy)
            + v10 * (1 - wx) * wy
            + v11 * wx * wy
        )
        return jnp.moveaxis(out, -1, 0)  # (C, Ho, Wo)

    return jax.vmap(one)(input_cl, grid)


def _gather_3d(vol_cl, iz, iy, ix, valid, D, H, W):
    """vol_cl: (D*H*W, C) channels-last -> (..., C). See _gather_2d."""
    idx = (
        jnp.clip(iz, 0, D - 1) * (H * W)
        + jnp.clip(iy, 0, H - 1) * W
        + jnp.clip(ix, 0, W - 1)
    )
    out = jnp.take(vol_cl, idx, axis=0)
    return out * valid[..., None].astype(out.dtype)


def grid_sample_3d(input: jax.Array, grid: jax.Array) -> jax.Array:
    """torch.nn.functional.grid_sample for 5D input.

    Args:
      input: (N, C, D, H, W)
      grid: (N, Do, Ho, Wo, 3), last dim = (x, y, z) in [-1, 1];
        x indexes W, y indexes H, z indexes D (torch convention).
    Returns:
      (N, C, Do, Ho, Wo)
    """
    N, C, D, H, W = input.shape
    input_cl = jnp.transpose(input, (0, 2, 3, 4, 1)).reshape(N, D * H * W, C)

    def one(vol_cl, g):
        gx = _unnormalize(g[..., 0], W)
        gy = _unnormalize(g[..., 1], H)
        gz = _unnormalize(g[..., 2], D)
        x0 = jnp.floor(gx).astype(jnp.int32)
        y0 = jnp.floor(gy).astype(jnp.int32)
        z0 = jnp.floor(gz).astype(jnp.int32)
        wx = (gx - x0)[..., None]
        wy = (gy - y0)[..., None]
        wz = (gz - z0)[..., None]

        def val(iz, iy, ix):
            valid = (
                (ix >= 0)
                & (ix < W)
                & (iy >= 0)
                & (iy < H)
                & (iz >= 0)
                & (iz < D)
            )
            return _gather_3d(vol_cl, iz, iy, ix, valid, D, H, W)

        c00 = val(z0, y0, x0) * (1 - wx) + val(z0, y0, x0 + 1) * wx
        c01 = val(z0, y0 + 1, x0) * (1 - wx) + val(z0, y0 + 1, x0 + 1) * wx
        c10 = val(z0 + 1, y0, x0) * (1 - wx) + val(z0 + 1, y0, x0 + 1) * wx
        c11 = val(z0 + 1, y0 + 1, x0) * (1 - wx) + val(z0 + 1, y0 + 1, x0 + 1) * wx
        c0 = c00 * (1 - wy) + c01 * wy
        c1 = c10 * (1 - wy) + c11 * wy
        out = c0 * (1 - wz) + c1 * wz
        return jnp.moveaxis(out, -1, 0)  # (C, Do, Ho, Wo)

    return jax.vmap(one)(input_cl, grid)
