"""Fast TPU rasterization path: gather-free binning + Pallas blend.

The generic path (rasterize.py) builds a dense (tiles, capacity) index
matrix and blends with an XLA scan — fully differentiable, runs anywhere,
but pays for index gathers and HBM round-trips of (tiles x chunk x pixels)
intermediates. This module is the speed-of-light forward for inference /
real-time editing (BASELINE config #5):

  * duplication by STATIC COPIES: gaussian attributes are replicated
    `static_copies` times structurally (concat — streams, no gather), one
    copy per potential rect cell; rare large gaussians (rect area >
    static_copies) spill into a dynamic `jnp.repeat` overflow lane;
  * ONE lexicographic `lax.sort` by (tile, depth-bits) carries the packed
    attribute payload into per-tile depth order — TPU variadic sorts move
    payloads at streaming bandwidth (~3.5ms/M rows) where index gathers
    cost ~23ns/row;
  * depth ordering uses the IEEE-754 trick: positive f32 depths compare
    identically as int32 bit patterns (the CUDA rasterizer's 64-bit
    tile|depth radix key, ref N1);
  * per-tile segment blending happens in VMEM (pallas_blend.py).
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..gaussians.cameras import Camera
from ..gaussians.sh import sh_to_color
from .pallas_blend import CHUNK, ROW, pallas_blend
from .projection import project_gaussians
from .rasterize import RasterizeConfig, _tile_rects


def _pack_attrs(proj, colors, opacities):
    n = colors.shape[0]
    cols = [
        proj.pix_xy[:, 0], proj.pix_xy[:, 1],
        proj.conic[:, 0], proj.conic[:, 1], proj.conic[:, 2],
        opacities,
        colors[:, 0], colors[:, 1], colors[:, 2],
    ]
    # NOTE: only the 9 live fields — the kernel's ROW=16 zero padding is
    # appended AFTER the lexsort (bin_pairs_lexsort) so the sort never
    # moves dead columns
    return jnp.stack(cols, axis=1).astype(jnp.float32)


def bin_pairs_lexsort(
    proj, attrs, grid_x: int, grid_y: int, tile_size: int,
    static_copies: int = 4, overflow_budget: int = 2 ** 17,
):
    """-> (tile_starts (T+2,), sorted_attrs (Ptot, ROW), n_dropped)."""
    N = attrs.shape[0]
    T = grid_x * grid_y
    x0, y0, rw, rh = _tile_rects(
        proj.pix_xy, proj.radius.astype(jnp.float32), grid_x, grid_y, tile_size
    )
    area = rw * rh
    vis = proj.visible & (area > 0)
    # positive f32 bit pattern sorts like the float (depth > 0.2 after cull)
    qdepth = jax.lax.bitcast_convert_type(
        jnp.maximum(proj.depth, 1e-6).astype(jnp.float32), jnp.int32
    )

    # -- static copies: copy k covers rect cell (k // rw, k % rw) ------------
    tiles = []
    for k in range(static_copies):
        cy = k // jnp.maximum(rw, 1)
        cx = k % jnp.maximum(rw, 1)
        tile_k = (y0 + cy) * grid_x + (x0 + cx)
        valid_k = vis & (k < area)
        tiles.append(jnp.where(valid_k, tile_k, T))
    tile_key = jnp.concatenate(tiles)                        # (C*N,)
    qd = jnp.tile(qdepth, (static_copies,))
    attrs_rep = jnp.tile(attrs, (static_copies, 1))          # (C*N, ROW)

    # -- overflow lane for rect area > static_copies --------------------------
    # ONE packed gather for all per-gaussian fields (separate scalar gathers
    # each pay the full ~13ns/row cost; rows <=128 elems cost the same)
    counts_over = jnp.where(vis, jnp.maximum(area - static_copies, 0), 0)
    over_total = jnp.sum(counts_over)
    n_dropped = jnp.maximum(0, over_total - overflow_budget)
    offs = jnp.cumsum(counts_over) - counts_over
    ids = jnp.repeat(
        jnp.arange(N, dtype=jnp.int32), counts_over,
        total_repeat_length=overflow_budget,
    )
    # small ints and offsets are exact in f32 (< 2^24); depth rides as f32
    pack = jnp.concatenate(
        [
            x0[:, None].astype(jnp.float32),
            y0[:, None].astype(jnp.float32),
            jnp.maximum(rw, 1)[:, None].astype(jnp.float32),
            offs[:, None].astype(jnp.float32),
            jax.lax.bitcast_convert_type(qdepth, jnp.float32)[:, None],
            attrs,
        ],
        axis=1,
    )  # (N, 14)
    rows = jnp.take(pack, ids, axis=0)  # (overflow_budget, 14)
    pos = jnp.arange(overflow_budget, dtype=jnp.int32)
    lo = pos - rows[:, 3].astype(jnp.int32)
    cell = static_copies + lo
    rw_o = rows[:, 2].astype(jnp.int32)
    tile_o = (rows[:, 1].astype(jnp.int32) + cell // rw_o) * grid_x + (
        rows[:, 0].astype(jnp.int32) + cell % rw_o
    )
    valid_o = pos < over_total
    tile_key = jnp.concatenate([tile_key, jnp.where(valid_o, tile_o, T)])
    qd = jnp.concatenate([qd, jax.lax.bitcast_convert_type(rows[:, 4], jnp.int32)])
    attrs_rep = jnp.concatenate([attrs_rep, rows[:, 5:14]], axis=0)

    # -- one lexicographic sort: (tile, depth-bits) + the 9 live payloads -----
    n_fields = attrs_rep.shape[1]
    operands = [tile_key, qd] + [attrs_rep[:, i] for i in range(n_fields)]
    sorted_ops = jax.lax.sort(operands, num_keys=2)
    sorted_tile = sorted_ops[0]
    # field-major directly (the blend kernel's DMA layout) — no transpose;
    # dead ROW padding appended post-sort
    ptot = sorted_tile.shape[0]
    sorted_attrs_t = jnp.concatenate(
        [jnp.stack(sorted_ops[2:], axis=0),
         jnp.zeros((ROW - n_fields, ptot), jnp.float32)],
        axis=0,
    )  # (ROW, Ptot)

    tile_starts = jnp.searchsorted(
        sorted_tile, jnp.arange(T + 1, dtype=jnp.int32)
    ).astype(jnp.int32)
    return tile_starts, sorted_attrs_t, n_dropped


def rasterize_fast(
    cam: Camera,
    means3d: jax.Array,
    scales: jax.Array,
    rotations: jax.Array,
    opacities: jax.Array,
    colors_precomp: Optional[jax.Array] = None,
    shs: Optional[jax.Array] = None,
    sh_degree: int = 0,
    bg: Optional[jax.Array] = None,
    scale_modifier: float = 1.0,
    config: RasterizeConfig = RasterizeConfig(),
    static_copies: Optional[int] = None,
    overflow_budget: Optional[int] = None,
    interpret: bool = False,
) -> Dict[str, jax.Array]:
    """Forward-only fast rasterizer (Pallas blend). Same outputs as
    rasterize(); use rasterize() for the differentiable training path."""
    H, W = cam.image_height, cam.image_width
    ts = config.tile_size
    grid_x, grid_y = W // ts, H // ts
    T = grid_x * grid_y
    P = ts * ts
    if opacities.ndim == 2:
        opacities = opacities[:, 0]
    if bg is None:
        bg = jnp.zeros((3,), jnp.float32)

    proj = project_gaussians(cam, means3d, scales, rotations, scale_modifier)
    if colors_precomp is None:
        colors = sh_to_color(
            sh_degree, jnp.swapaxes(shs, 1, 2), means3d, cam.camera_center
        )
    else:
        colors = colors_precomp

    attrs = _pack_attrs(proj, colors, opacities)
    tile_starts, attrs_t, n_dropped = bin_pairs_lexsort(
        proj, attrs, grid_x, grid_y, ts,
        static_copies if static_copies is not None else config.static_copies,
        overflow_budget if overflow_budget is not None else config.overflow_budget,
    )
    # pad so every segment DMA window stays in bounds
    slack = config.tile_capacity + CHUNK
    attrs_t = jnp.concatenate(
        [attrs_t, jnp.zeros((ROW, slack), jnp.float32)], axis=1
    )

    accum, trans = pallas_blend(
        tile_starts, attrs_t, grid_x, grid_y, ts,
        max_k=config.tile_capacity, interpret=interpret,
    )
    img = accum + trans[:, :, None] * bg[None, None, :]
    img = img.reshape(grid_y, grid_x, ts, ts, 3)
    img = jnp.transpose(img, (0, 2, 1, 3, 4)).reshape(H, W, 3)
    alpha_img = (1.0 - trans).reshape(grid_y, grid_x, ts, ts)
    alpha_img = jnp.transpose(alpha_img, (0, 2, 1, 3)).reshape(H, W)

    return {
        "render": jnp.transpose(img, (2, 0, 1)),
        "alpha": alpha_img[None],
        "radii": proj.radius,
        "visibility_filter": proj.radius > 0,
        "n_dropped": n_dropped,
    }
