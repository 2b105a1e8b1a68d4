"""Pixel-center ray generation from cam2world + normalized intrinsics.

Re-design of /root/reference/PanoHead/training/volumetric_rendering/
ray_sampler.py:24-62 (OpenCV camera conventions, uv at pixel centers of a
unit image plane, rays normalized in world space).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .math_utils import normalize_vecs


def sample_rays(cam2world: jax.Array, intrinsics: jax.Array, resolution: int):
    """Args: cam2world (N,4,4), intrinsics (N,3,3) normalized, resolution int.

    Returns (ray_origins (N,M,3), ray_dirs (N,M,3)), M = resolution^2,
    pixel order row-major (y outer, x inner) matching the reference's
    meshgrid(ij) + flip construction.
    """
    N = cam2world.shape[0]
    cam_pos = cam2world[:, :3, 3]
    fx = intrinsics[:, 0, 0][:, None]
    fy = intrinsics[:, 1, 1][:, None]
    cx = intrinsics[:, 0, 2][:, None]
    cy = intrinsics[:, 1, 2][:, None]
    sk = intrinsics[:, 0, 1][:, None]

    # uv grid: the reference builds meshgrid(ij), flips the stacked axes and
    # reshapes — yielding x = col index fastest, y = row index.
    coords = (jnp.arange(resolution, dtype=cam2world.dtype) + 0.5) / resolution
    yy, xx = jnp.meshgrid(coords, coords, indexing="ij")
    x_cam = xx.reshape(-1)[None, :]  # (1, M)
    y_cam = yy.reshape(-1)[None, :]
    z_cam = jnp.ones_like(x_cam)

    x_lift = (x_cam - cx + cy * sk / fy - sk * y_cam / fy) / fx * z_cam
    y_lift = (y_cam - cy) / fy * z_cam

    cam_rel = jnp.stack(
        [x_lift * jnp.ones((N, 1)), y_lift * jnp.ones((N, 1)),
         jnp.broadcast_to(z_cam, (N, x_cam.shape[1])),
         jnp.ones((N, x_cam.shape[1]), cam2world.dtype)],
        axis=-1,
    )  # (N, M, 4)
    world = jnp.einsum("nij,nmj->nmi", cam2world, cam_rel)[:, :, :3]
    ray_dirs = normalize_vecs(world - cam_pos[:, None, :])
    ray_origins = jnp.broadcast_to(cam_pos[:, None, :], ray_dirs.shape)
    return ray_origins, ray_dirs
