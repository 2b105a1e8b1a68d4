"""Differentiable tile rasterizer for 3D Gaussian Splatting, TPU-native.

Replaces the `diff-gaussian-rasterization` CUDA extension (ref N1 in
SURVEY.md §2.4; consumed at /root/reference/gaussian_splatting/
gaussian_renderer/__init__.py:19,105). Same pipeline, re-architected for
XLA/TPU with static shapes:

  1. project+cull    — dense vmapped math over N (projection.py)
  2. global depth sort — ONE `argsort` over N (the CUDA original radix-
     sorts (tile|depth) keys; a single depth sort + stable tile sort is
     equivalent and maps to XLA's variadic sort)
  3. duplication     — gaussian i -> one pair per touched tile, built with
     `jnp.repeat(..., total_repeat_length=P)` into a FIXED pair budget
  4. tile binning    — stable sort of pair tile-ids; per-tile segments
     become rows of a (tiles, capacity) index matrix
  5. blending        — front-to-back alpha compositing, vectorised over
     (tile, pixel) and scanned over the capacity axis in chunks; exact
     same saturation math as the CUDA kernel (alpha clamp 0.99, 1/255
     cutoff, power>0 cutoff), minus the per-pixel early-exit, which only
     skips work whose contribution is < 1e-4 of transmittance.

Everything differentiates by JAX autodiff: the index plumbing is integer
(no gradient), the gathered float path (means/conics/colors/opacities)
gets exact adjoints, with scan-level rematerialisation bounding memory.

Static capacities (pair budget, tile capacity) trade exactness for
shape-stability; both are config and the forward reports `n_dropped`
so callers can detect undersized budgets.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..gaussians.cameras import Camera
from ..gaussians.sh import sh_to_color
from .projection import project_gaussians


@dataclass(frozen=True)
class RasterizeConfig:
    tile_size: int = 16
    max_pairs: int = 2 ** 21      # gaussian->tile duplication budget
    tile_capacity: int = 1024     # per-tile depth-ordered blend budget
    chunk: int = 64               # capacity-axis chunk in the blender
    static_copies: int = 4        # fast path: structural tile duplicates
    overflow_budget: int = 2 ** 17  # fast path: dynamic lane for big rects
    bf16_colors: bool = False     # fast path: pack (r,g) and (b,opacity)
    # as bf16 pairs in the sort payload (9 -> 7 operands, 8-row blend DMA;
    # ~0.2% color/opacity rounding, conics and pixel coords stay f32)
    packed_payloads: bool = False  # fast path: pack EVERYTHING — tile-
    # local int16 pixel coords (1/32 px), f16 conics, bf16 colors — into 5
    # payload words (2 keys + 5 payloads to sort, and pair replication
    # streams 5 channels instead of 9). Supersedes bf16_colors.
    fused_sort_key: bool = False   # fast path (with packed_payloads): ONE
    # uint32 sort key = tile(11b) | depth-bits>>11 (21b) instead of the
    # (tile, depth) pair — 6 sort operands instead of 7. Depth resolution
    # drops to 2^-12 relative; near-coincident gaussians may swap blend
    # order (the CUDA key keeps all 32 depth bits in its 64-bit key).
    blend_mxu_power: bool = False  # fast path (with packed_payloads):
    # compute the per-pair Gaussian falloff power as ONE quadratic-basis
    # (P, 6) @ (6, CHUNK) MXU dot per blend chunk instead of ~8 (P, CHUNK)
    # VPU passes. Needs tile-local coords (packed formats) — at global
    # 512-px coords the basis cancellation costs ~4 digits of precision.
    rgb10_payloads: bool = False   # fast path (with packed_payloads):
    # narrow the 5 payload words to 4 — cc rides as an f16 pair with
    # opacity, and rgb packs into ONE 10-bit-per-channel fixed-point word
    # (step 1/256 over [0, 4): equal to the 8-bit output quantization).
    # Sorts move each operand at streaming bandwidth, so one fewer word
    # trims sort + replication + overflow-gather traffic ~20%.


def _tile_rects(pix_xy, radius, grid_x, grid_y, tile_size):
    """CUDA getRect: inclusive-exclusive tile spans, clamped to the grid."""
    x0 = jnp.clip(((pix_xy[:, 0] - radius) / tile_size).astype(jnp.int32), 0, grid_x)
    y0 = jnp.clip(((pix_xy[:, 1] - radius) / tile_size).astype(jnp.int32), 0, grid_y)
    x1 = jnp.clip(
        ((pix_xy[:, 0] + radius + tile_size - 1) / tile_size).astype(jnp.int32), 0, grid_x
    )
    y1 = jnp.clip(
        ((pix_xy[:, 1] + radius + tile_size - 1) / tile_size).astype(jnp.int32), 0, grid_y
    )
    return x0, y0, jnp.maximum(x1 - x0, 0), jnp.maximum(y1 - y0, 0)


def _blend_tiles(
    idx_mat,        # (T, K) int32 depth-ordered gaussian ids per tile, -1 pad
    pix_xy,         # (N, 2)
    conic,          # (N, 3)
    colors,         # (N, 3)
    opacities,      # (N,)
    grid_x, grid_y, tile_size, chunk,
):
    """Front-to-back alpha blend, scanned over the capacity axis."""
    T, K = idx_mat.shape
    P = tile_size * tile_size
    dtype = jnp.result_type(pix_xy, conic, colors, opacities, jnp.float32)
    pix_xy = pix_xy.astype(dtype)
    conic = conic.astype(dtype)
    colors = colors.astype(dtype)
    opacities = opacities.astype(dtype)

    # pixel centers per tile: CUDA uses integer pixel coords as floats
    tix = jnp.arange(T, dtype=jnp.int32) % grid_x
    tiy = jnp.arange(T, dtype=jnp.int32) // grid_x
    ox = jnp.arange(tile_size, dtype=dtype)
    py_in, px_in = jnp.meshgrid(ox, ox, indexing="ij")
    pixx = tix[:, None].astype(dtype) * tile_size + px_in.reshape(-1)[None, :]
    pixy = tiy[:, None].astype(dtype) * tile_size + py_in.reshape(-1)[None, :]
    # (T, P)

    n_chunks = K // chunk
    assert n_chunks * chunk == K, "tile_capacity must be a multiple of chunk"
    idx_c = idx_mat.reshape(T, n_chunks, chunk)

    def step(carry, ids):
        accum, trans = carry          # (T, P, 3), (T, P)
        g = jnp.maximum(ids, 0)       # (T, chunk)
        valid = ids >= 0
        cx = pix_xy[g, 0]             # (T, chunk)
        cy = pix_xy[g, 1]
        con = conic[g]                # (T, chunk, 3)
        col = colors[g]               # (T, chunk, 3)
        op = opacities[g]             # (T, chunk)

        dx = cx[:, :, None] - pixx[:, None, :]   # (T, chunk, P)
        dy = cy[:, :, None] - pixy[:, None, :]
        power = (
            -0.5 * (con[:, :, 0:1] * dx * dx + con[:, :, 2:3] * dy * dy)
            - con[:, :, 1:2] * dx * dy
        )
        alpha = jnp.minimum(0.99, op[:, :, None] * jnp.exp(power))
        alpha = jnp.where(power > 0.0, 0.0, alpha)          # CUDA skip
        alpha = jnp.where(alpha < (1.0 / 255.0), 0.0, alpha)  # CUDA skip
        alpha = jnp.where(valid[:, :, None], alpha, 0.0)

        one_minus = 1.0 - alpha                      # (T, chunk, P)
        # exclusive cumprod along the chunk axis
        cp = jnp.cumprod(one_minus, axis=1)
        t_within = jnp.concatenate(
            [jnp.ones_like(cp[:, :1]), cp[:, :-1]], axis=1
        )
        w = alpha * t_within * trans[:, None, :]     # (T, chunk, P)
        accum = accum + jnp.einsum("tkp,tkc->tpc", w, col)
        trans = trans * cp[:, -1]
        return (accum, trans), None

    accum0 = jnp.zeros((T, P, 3), dtype)
    trans0 = jnp.ones((T, P), dtype)
    (accum, trans), _ = jax.lax.scan(
        step, (accum0, trans0), jnp.moveaxis(idx_c, 1, 0)
    )
    return accum, trans  # (T, P, 3), (T, P)


def rasterize(
    cam: Camera,
    means3d: jax.Array,                 # (N, 3)
    scales: jax.Array,                  # (N, 3) activated
    rotations: jax.Array,               # (N, 4)
    opacities: jax.Array,               # (N,) or (N, 1) activated
    colors_precomp: Optional[jax.Array] = None,  # (N, 3)
    shs: Optional[jax.Array] = None,    # (N, K_sh, 3) features
    sh_degree: int = 0,
    bg: Optional[jax.Array] = None,     # (3,)
    scale_modifier: float = 1.0,
    cov3d_precomp: Optional[jax.Array] = None,
    config: RasterizeConfig = RasterizeConfig(),
    means2d_offset: Optional[jax.Array] = None,  # (N,2) zeros; its gradient
    # is the screen-space mean gradient the densifier thresholds on (the
    # CUDA wrapper's `screenspace_points` trick, ref gaussian_renderer/
    # __init__.py:28-33)
) -> Dict[str, jax.Array]:
    """Render Gaussians -> {'render' (3,H,W), 'radii' (N,), 'alpha' (1,H,W),
    'depth' (1,H,W), 'n_dropped' scalar}."""
    N = means3d.shape[0]
    H, W = cam.image_height, cam.image_width
    ts = config.tile_size
    assert H % ts == 0 and W % ts == 0
    grid_x, grid_y = W // ts, H // ts
    T = grid_x * grid_y
    K = config.tile_capacity
    Pmax = config.max_pairs

    if opacities.ndim == 2:
        opacities = opacities[:, 0]
    if bg is None:
        bg = jnp.zeros((3,), jnp.float32)

    proj = project_gaussians(
        cam, means3d, scales, rotations, scale_modifier, cov3d_precomp
    )
    if means2d_offset is not None:
        proj = proj._replace(pix_xy=proj.pix_xy + means2d_offset)

    if colors_precomp is None:
        # shs: (N, K_sh, 3) feature layout (ref get_features) -> (N, 3, K_sh)
        sh_coeffs = jnp.swapaxes(shs, 1, 2)
        colors = sh_to_color(sh_degree, sh_coeffs, means3d, cam.camera_center)
    else:
        colors = colors_precomp

    # ---- global depth sort (invisible -> +inf, sorted to the back) --------
    sort_key = jnp.where(proj.visible, proj.depth, jnp.inf)
    order = jnp.argsort(sort_key)
    pix_s = proj.pix_xy[order]
    conic_s = proj.conic[order]
    radius_s = proj.radius[order]
    vis_s = proj.visible[order]
    col_s = colors[order]
    op_s = opacities[order]
    depth_s = proj.depth[order]

    # ---- duplication into (tile, gaussian) pairs ---------------------------
    x0, y0, rw, rh = _tile_rects(pix_s, radius_s.astype(jnp.float32), grid_x, grid_y, ts)
    counts = jnp.where(vis_s, rw * rh, 0)
    offsets = jnp.cumsum(counts) - counts
    total = offsets[-1] + counts[-1]
    n_dropped = jnp.maximum(0, total - Pmax)

    pair_g = jnp.repeat(
        jnp.arange(N, dtype=jnp.int32), counts, total_repeat_length=Pmax
    )
    pair_pos = jnp.arange(Pmax, dtype=jnp.int32)
    pair_valid = pair_pos < total
    local = pair_pos - offsets[pair_g].astype(jnp.int32)
    rw_g = jnp.maximum(rw[pair_g], 1)
    tile_x = x0[pair_g] + local % rw_g
    tile_y = y0[pair_g] + local // rw_g
    tile_id = jnp.where(pair_valid, tile_y * grid_x + tile_x, T).astype(jnp.int32)

    # ---- per-tile segments (stable sort keeps depth order) -----------------
    pair_order = jnp.argsort(tile_id, stable=True)
    sorted_tile = tile_id[pair_order]
    sorted_g = pair_g[pair_order]

    tile_start = jnp.searchsorted(sorted_tile, jnp.arange(T, dtype=jnp.int32))
    rank = pair_pos - tile_start[jnp.minimum(sorted_tile, T - 1)]
    keep = (sorted_tile < T) & (rank < K)
    scatter_idx = jnp.where(keep, sorted_tile * K + rank, T * K)
    idx_flat = jnp.full((T * K + 1,), -1, jnp.int32).at[scatter_idx].set(sorted_g)
    idx_mat = idx_flat[: T * K].reshape(T, K)

    # ---- blend --------------------------------------------------------------
    accum, trans = _blend_tiles(
        idx_mat, pix_s, conic_s, col_s, op_s, grid_x, grid_y, ts, config.chunk
    )
    # also composite depth for parity with render_simple outputs
    img = accum + trans[:, :, None] * bg[None, None, :]

    # (T, P, 3) -> (H, W, 3)
    img = img.reshape(grid_y, grid_x, ts, ts, 3)
    img = jnp.transpose(img, (0, 2, 1, 3, 4)).reshape(H, W, 3)
    alpha_img = (1.0 - trans).reshape(grid_y, grid_x, ts, ts)
    alpha_img = jnp.transpose(alpha_img, (0, 2, 1, 3)).reshape(H, W)

    # radii in original (unsorted) order, like the CUDA forward
    inv_order = jnp.argsort(order)
    radii = radius_s[inv_order]

    return {
        "render": jnp.transpose(img, (2, 0, 1)),
        "alpha": alpha_img[None],
        "radii": radii,
        "n_dropped": n_dropped,
        "visibility_filter": radii > 0,
    }


def render_simple(
    cam: Camera,
    decoded: Dict[str, jax.Array],
    bg: jax.Array,
    xyz_offset: Optional[jax.Array] = None,
    scale_modifier: float = 1.0,
    config: RasterizeConfig = RasterizeConfig(),
    backend: str = "xla",
) -> Dict[str, jax.Array]:
    """Decoder-path renderer (ref gaussian_renderer/__init__.py:105-186).

    `decoded` carries RAW decoder outputs {xyz, scale, rotation, opacity,
    color}; activations applied here exactly like GaussianModel properties
    (exp / normalize / sigmoid; color is the degree-0 SH feature).

    backend: 'xla' (differentiable, any platform), 'pallas' (fast
    forward-only TPU path, splat/fast_raster.py), or 'pallas_diff'
    (fast path with the custom-VJP Pallas blend backward — the
    CUDA-rasterizer-backward analogue; training on TPU).
    """
    means = decoded["xyz"]
    if xyz_offset is not None:
        means = means + xyz_offset
    scales = jnp.exp(decoded["scale"])
    rotations = decoded["rotation"]  # normalized inside projection
    opacity = jax.nn.sigmoid(decoded["opacity"])
    shs = decoded["color"][:, None, :]  # (N, 1, 3) degree-0 feature
    if backend in ("pallas", "pallas_diff"):
        from .fast_raster import rasterize_fast

        return rasterize_fast(
            cam, means, scales, rotations, opacity,
            shs=shs, sh_degree=0, bg=bg, scale_modifier=scale_modifier,
            config=config, differentiable=(backend == "pallas_diff"),
        )
    return rasterize(
        cam, means, scales, rotations, opacity,
        shs=shs, sh_degree=0, bg=bg, scale_modifier=scale_modifier,
        config=config,
    )


def reference_rasterize(
    cam: Camera,
    means3d, scales, rotations, opacities, colors,
    bg=None,
    scale_modifier: float = 1.0,
) -> jax.Array:
    """Exact all-pairs oracle (no tiles, no capacity) for small scenes.

    Mirrors the CUDA per-pixel loop: full depth sort, front-to-back blend
    over EVERY gaussian for EVERY pixel. O(N * H * W) — test use only.
    """
    H, W = cam.image_height, cam.image_width
    if opacities.ndim == 2:
        opacities = opacities[:, 0]
    if bg is None:
        bg = jnp.zeros((3,), jnp.float32)
    proj = project_gaussians(cam, means3d, scales, rotations, scale_modifier)

    sort_key = jnp.where(proj.visible, proj.depth, jnp.inf)
    order = jnp.argsort(sort_key)
    pix = proj.pix_xy[order]
    con = proj.conic[order]
    vis = proj.visible[order]
    col = colors[order]
    op = opacities[order]
    rad = proj.radius[order].astype(jnp.float32)

    ys, xs = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32), jnp.arange(W, dtype=jnp.float32),
        indexing="ij",
    )
    dx = pix[:, 0][:, None, None] - xs[None]
    dy = pix[:, 1][:, None, None] - ys[None]
    power = (
        -0.5 * (con[:, 0][:, None, None] * dx * dx + con[:, 2][:, None, None] * dy * dy)
        - con[:, 1][:, None, None] * dx * dy
    )
    alpha = jnp.minimum(0.99, op[:, None, None] * jnp.exp(power))
    alpha = jnp.where(power > 0.0, 0.0, alpha)
    alpha = jnp.where(alpha < (1.0 / 255.0), 0.0, alpha)
    # CUDA processes a gaussian only on pixels whose 16px tile overlaps its
    # [pix - r, pix + r] rect — replicate that tile-aligned footprint exactly
    ts = 16.0
    tpx = jnp.floor(xs / ts)[None]
    tpy = jnp.floor(ys / ts)[None]
    gx0 = jnp.floor((pix[:, 0] - rad) / ts)[:, None, None]
    gx1 = jnp.floor((pix[:, 0] + rad + ts - 1) / ts)[:, None, None]
    gy0 = jnp.floor((pix[:, 1] - rad) / ts)[:, None, None]
    gy1 = jnp.floor((pix[:, 1] + rad + ts - 1) / ts)[:, None, None]
    inside = (tpx >= gx0) & (tpx < gx1) & (tpy >= gy0) & (tpy < gy1)
    alpha = jnp.where(vis[:, None, None] & inside, alpha, 0.0)

    one_minus = 1.0 - alpha
    t_excl = jnp.concatenate(
        [jnp.ones_like(one_minus[:1]), jnp.cumprod(one_minus, axis=0)[:-1]], axis=0
    )
    wgt = alpha * t_excl  # (N, H, W)
    img = jnp.einsum("nhw,nc->chw", wgt, col)
    t_final = jnp.prod(one_minus, axis=0)
    return img + t_final[None] * bg[:, None, None]
