"""Ray/box math (re-design of /root/reference/PanoHead/training/
volumetric_rendering/math_utils.py — MIT, Petr Kellnhofer)."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def normalize_vecs(v: jax.Array, eps: float = 0.0) -> jax.Array:
    return v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + eps)


def get_ray_limits_box(rays_o: jax.Array, rays_d: jax.Array, box_side_length: float):
    """Entry/exit distances of rays vs the centered cube (ref math_utils.py:46-98).

    Returns (tmin, tmax) with trailing dim 1; invalid rays get (-1, -2),
    matching the reference's sentinel convention.
    """
    half = box_side_length / 2
    invdir = 1.0 / rays_d
    # per-axis slab entry/exit
    t0 = (-half - rays_o) * invdir
    t1 = (half - rays_o) * invdir
    tmin_ax = jnp.minimum(t0, t1)
    tmax_ax = jnp.maximum(t0, t1)
    tmin = jnp.max(tmin_ax, axis=-1)
    tmax = jnp.min(tmax_ax, axis=-1)
    is_valid = tmin <= tmax
    tmin = jnp.where(is_valid, tmin, -1.0)
    tmax = jnp.where(is_valid, tmax, -2.0)
    return tmin[..., None], tmax[..., None]


def linspace_batch(start: jax.Array, stop: jax.Array, num: int) -> jax.Array:
    """[num, *start.shape] evenly spaced start..stop inclusive (ref :101-118)."""
    steps = jnp.arange(num, dtype=start.dtype) / (num - 1)
    steps = steps.reshape((num,) + (1,) * start.ndim)
    return start[None] + steps * (stop - start)[None]
