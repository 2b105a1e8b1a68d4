"""Midpoint alpha-compositing ray marcher.

Re-design of /root/reference/PanoHead/training/volumetric_rendering/
ray_marcher.py:27-63 (MipRayMarcher2). The eg3d fork additionally maps
composited rgb to (-1, 1) — exposed via `rgb_to_minus1_1`
(/root/reference/eg3d/.../ray_marcher.py:54).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def mip_ray_march(
    colors: jax.Array,     # (N, R, S, C)
    densities: jax.Array,  # (N, R, S, 1)
    depths: jax.Array,     # (N, R, S, 1)
    clamp_mode: str = "softplus",
    white_back: bool = False,
    rgb_to_minus1_1: bool = False,
):
    """Returns (composite_rgb (N,R,C), composite_depth (N,R,1), weights (N,R,S-1,1))."""
    assert clamp_mode == "softplus", "MipRayMarcher only supports softplus"
    deltas = depths[:, :, 1:] - depths[:, :, :-1]
    colors_mid = (colors[:, :, :-1] + colors[:, :, 1:]) / 2
    densities_mid = (densities[:, :, :-1] + densities[:, :, 1:]) / 2
    depths_mid = (depths[:, :, :-1] + depths[:, :, 1:]) / 2

    # activation bias of -1 for better initialisation (ref :36)
    densities_mid = jax.nn.softplus(densities_mid - 1)

    density_delta = densities_mid * deltas
    alpha = 1 - jnp.exp(-density_delta)

    alpha_shifted = jnp.concatenate(
        [jnp.ones_like(alpha[:, :, :1]), 1 - alpha + 1e-10], axis=-2
    )
    weights = alpha * jnp.cumprod(alpha_shifted, axis=-2)[:, :, :-1]

    composite_rgb = jnp.sum(weights * colors_mid, axis=-2)
    weight_total = jnp.sum(weights, axis=2)
    composite_depth = jnp.sum(weights * depths_mid, axis=-2) / weight_total

    composite_depth = jnp.nan_to_num(composite_depth, nan=jnp.inf)
    composite_depth = jnp.clip(composite_depth, jnp.min(depths), jnp.max(depths))

    if white_back:
        composite_rgb = composite_rgb + 1 - weight_total
    if rgb_to_minus1_1:
        composite_rgb = composite_rgb * 2 - 1
    return composite_rgb, composite_depth, weights
