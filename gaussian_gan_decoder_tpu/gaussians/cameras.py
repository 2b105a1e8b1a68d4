"""3DGS camera model (EG3D -> 3DGS adapter).

Replicates the reference's CustomCam / getProjectionMatrix math exactly
(/root/reference/gaussian_splatting/scene/cameras.py:75-92,
 utils/graphics_utils.py:52-74):

  world_view_transform = inverse(cam2world^T)         (row-vector form)
  projection = OpenGL-style perspective, transposed
  full_proj  = world_view @ projection
  camera_center = world_view_transform[3, :3]         (ref quirk, kept)

All matrices are stored in the same row-vector ("pre-transposed")
convention the CUDA rasterizer consumes: clip = p_hom @ full_proj.
"""
from __future__ import annotations

import math
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class Camera:
    """Camera pytree; image size is static metadata (jit shape input)."""

    world_view_transform: jax.Array  # (4, 4) row-vector convention
    full_proj_transform: jax.Array   # (4, 4)
    camera_center: jax.Array         # (3,)
    tanfovx: jax.Array               # scalar
    tanfovy: jax.Array               # scalar
    image_width: int = field(metadata=dict(static=True), default=512)
    image_height: int = field(metadata=dict(static=True), default=512)


def projection_matrix(znear: float, zfar: float, fovx, fovy) -> jax.Array:
    """OpenGL-style perspective (ref graphics_utils.py:52-74), NOT transposed."""
    tan_x = jnp.tan(jnp.asarray(fovx) / 2)
    tan_y = jnp.tan(jnp.asarray(fovy) / 2)
    top = tan_y * znear
    right = tan_x * znear
    z = jnp.zeros(())
    p = jnp.array(
        [
            [znear / right, 0.0, 0.0, 0.0],
            [0.0, znear / top, 0.0, 0.0],
            [0.0, 0.0, (zfar + znear) / (zfar - znear), -(zfar * znear) / (zfar - znear)],
            [0.0, 0.0, 1.0, 0.0],
        ],
        dtype=jnp.result_type(tan_x, jnp.float32),
    )
    # the (0,0)/(1,1) entries depend on the traced fov:
    p = p.at[0, 0].set(znear / right)
    p = p.at[1, 1].set(znear / top)
    return p


def make_camera(
    size: int,
    fov,                      # radians (FoVx == FoVy, ref CustomCam)
    cam2world: jax.Array,     # (4, 4) EG3D extrinsics
    znear: float = 0.01,
    zfar: float = 10.0,
) -> Camera:
    """CustomCam equivalent (ref scene/cameras.py:75-92)."""
    extr = jnp.asarray(cam2world)
    world_view = jnp.linalg.inv(extr.T)
    proj = projection_matrix(znear, zfar, fov, fov).T
    full_proj = world_view @ proj
    return Camera(
        world_view_transform=world_view,
        full_proj_transform=full_proj,
        camera_center=world_view[3, :3],
        tanfovx=jnp.tan(jnp.asarray(fov) * 0.5),
        tanfovy=jnp.tan(jnp.asarray(fov) * 0.5),
        image_width=size,
        image_height=size,
    )
