"""Multi-chip single-frame (latency) rendering.

PERFORMANCE.md roadmap item 5: the real-time editing path
(flagship.decode_and_render) at 500k gaussians spends most of its frame
on per-point work — tri-grid gather, the fused head+projection kernel,
and the brick staging — all embarrassingly parallel over the point axis.
`render_latency_sharded` runs that slice-parallel over an ICI mesh via
`shard_map` and gathers the channel-major rows (NROWS x M/N per chip,
~2 MB f32 at flagship scale) with ONE all_gather before the replicated
binning/sort/blend tail.

What shards: tri-grid gather + trilinear lerp, the fused Pallas
heads+projection kernel, brick staging reads. What replicates: mapping +
backbone synthesis (batch-1 MXU work — cheap), the brick-table build
(each chip builds from the same planes; sharding it by z-slabs would add
a second all_gather for the halo rows), and the binning sort + blend
(tile-sharding the blend is the noted follow-up — ~7 ms of the frame).

Padding note: the projection kernel masks rows >= its LOCAL n_points
(decoder/pallas_heads.py consts n_points), so the per-chip Mpad padding
blocks concatenated by the all_gather carry visible=0 and bin to zero
tile pairs — the replicated tail needs no compaction.

The reference has no multi-GPU inference at all (the rasterizer and
decoder are strictly single-device, SURVEY §2.6).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..decoder.heads import GaussianDecoder
from ..gaussians.cameras import make_camera
from ..splat.rasterize import RasterizeConfig


def render_latency_sharded(
    mesh: Mesh,
    decoder: GaussianDecoder,
    params,
    z: jax.Array,                 # (1, z_dim)
    camera_params: jax.Array,     # (1, 25)
    cam2world: jax.Array,         # (4, 4)
    init_position: jax.Array,     # (M, 3), M divisible by mesh axis size
    fov,
    image_size: int = 512,
    bg=(0.55717, 0.52256, 0.51045),
    raster_cfg: Optional[RasterizeConfig] = None,
    truncation_psi: float = 1.0,
    axis: str = "points",
    shard_blend: bool = True,
    shard_sort: bool = False,
    bucket_cap: Optional[int] = None,
    return_aux: bool = False,
):
    """One 512^2 frame with the point axis sharded over `axis`.

    -> (3, H, W) image, or (image, n_dropped) when return_aux=True —
    n_dropped aggregates tile pairs lost to overflow_budget exhaustion
    AND (on the shard_sort path) to bucket-capacity overflow across all
    chips; deploy-path callers should watch it like
    flagship.decode_and_render's aux["n_dropped"]. Wrap in jit for the
    fused program; bit-identical to
    flagship.decode_and_render(backend='pallas') up to all_gather
    block concatenation order (none — per-point math is independent and
    binning sorts by tile/depth).

    shard_blend additionally runs the per-tile alpha blend sharded over
    the image's tile ROWS (each chip blends its slice of tiles from the
    replicated sorted pair list and emits its image rows).

    shard_sort shards the BINNING SORT too (the largest replicated cost,
    ~6-10 ms at flagship): pairs stay on the chip that decoded their
    gaussian, ONE local (tile, depth) lexsort doubles as the per-
    destination bucketing (the tile-row owner is monotonic in the tile
    id), fixed-capacity buckets ride ONE all_to_all over ICI, and each
    chip lexsorts only its ~1/n_dev of pairs before blending its tile
    rows. Total sort work ~2/n_dev of the replicated sort. `bucket_cap`
    bounds the per-(source, dest) bucket; pairs beyond it are DROPPED
    (like overflow_budget, counted in n_dropped) — default 4x the
    balanced share P_loc/n_dev. Requires packed or bf16_colors payloads
    with tile-LOCAL coords? No: all payload formats are
    position-independent per pair, so the exchange is format-agnostic
    (fused_sort_key is resolved before this path)."""
    assert decoder.pallas_heads, "sharded latency path uses the fused kernel"
    from ..decoder.pallas_heads import PROJ_ROWS
    from ..splat.fast_raster import (
        _blend_and_assemble,
        _build_pairs_any,
        bin_pairs_lexsort_ch,
        render_rows,
    )

    n_dev = mesh.shape[axis]
    M = init_position.shape[0]
    assert M % n_dev == 0, (M, n_dev)
    cam = make_camera(image_size, jnp.asarray(fov), cam2world)
    if raster_cfg is None:
        from ..flagship import flagship_raster_config

        raster_cfg = flagship_raster_config()
    bgv = jnp.asarray(bg, jnp.float32)

    planes, _ = decoder.synthesize_planes(params, z, camera_params, truncation_psi)

    ts = raster_cfg.tile_size
    grid_x, grid_y = cam.image_width // ts, cam.image_height // ts
    if shard_sort and grid_y % n_dev == 0 and not raster_cfg.fused_sort_key:
        T = grid_x * grid_y
        t_per = T // n_dev
        gy_local = grid_y // n_dev

        def local_frame(params_l, planes_l, pts_l):
            rows, layout = decoder.decode_project(params_l, planes_l, pts_l, cam)
            r = {k: rows[v] for k, v in PROJ_ROWS.items()}
            ch = dict(px=r["px"], py=r["py"], depth=r["depth"],
                      radius_f=r["radius_f"], visible=r["visible"] > 0.5)
            fields = [r["px"], r["py"], r["conic_a"], r["conic_b"],
                      r["conic_c"], r["opac"], r["col_r"], r["col_g"],
                      r["col_b"]]
            ch, fields = jax.lax.optimization_barrier((ch, fields))
            tile_key, qd, frep, n_rows, nd_local = _build_pairs_any(
                ch, fields, grid_x, grid_y, ts,
                raster_cfg.static_copies,
                max(raster_cfg.overflow_budget // n_dev, 8),
                raster_cfg.bf16_colors, raster_cfg.packed_payloads)
            # ONE local (tile, depth) lexsort over this chip's pairs —
            # because the destination chip (= tile-row owner) is monotonic
            # in the tile id, the sorted list IS the per-destination
            # bucketing: bucket d = rows [bounds[d], bounds[d+1])
            ops = jax.lax.sort([tile_key, qd] + list(frep), num_keys=2)
            skey = ops[0]
            P_loc = skey.shape[0]
            cap = bucket_cap or min(P_loc, -(-4 * P_loc // n_dev))
            bounds = jnp.searchsorted(
                skey, jnp.arange(0, T + 1, t_per, dtype=jnp.int32)
            ).astype(jnp.int32)

            def windows(arr, fill):
                arrp = jnp.concatenate(
                    [arr, jnp.full((cap,), fill, arr.dtype)])
                return jnp.stack([
                    jax.lax.dynamic_slice(arrp, (bounds[d],), (cap,))
                    for d in range(n_dev)])
            # rows past a bucket's end carry tiles outside dest d's range
            # (or the pad sentinel): the receiver's searchsorted window
            # excludes them, so no masking is needed
            exchanged = [
                jax.lax.all_to_all(w, axis, split_axis=0, concat_axis=0)
                for w in [windows(skey, T), windows(ops[1], 0)]
                + [windows(o, 0.0) for o in ops[2:]]
            ]
            flat = [e.reshape(-1) for e in exchanged]
            fin = jax.lax.sort(flat, num_keys=2)
            fkey = fin[0]
            ff = list(fin[2:])
            lo = jax.lax.axis_index(axis).astype(jnp.int32) * t_per
            starts = jnp.searchsorted(
                fkey, lo + jnp.arange(t_per + 1, dtype=jnp.int32)
            ).astype(jnp.int32)
            attrs_t = jnp.concatenate(
                [jnp.stack(ff, axis=0),
                 jnp.zeros((n_rows - len(ff), fkey.shape[0]), jnp.float32)],
                axis=0)
            img_l, _ = _blend_and_assemble(
                starts, attrs_t, grid_x, gy_local, ts, bgv, raster_cfg)
            # observable capacity overflow: builder drops + pairs beyond
            # each destination bucket's cap, aggregated over all chips
            bucket_n = bounds[1:] - bounds[:-1]
            nd = nd_local + jnp.sum(jnp.maximum(bucket_n - cap, 0))
            return img_l, jax.lax.psum(nd, axis)

        img, nd = jax.shard_map(
            local_frame, mesh=mesh,
            in_specs=(P(), P(), P(axis)),
            out_specs=(P(axis), P()),
            check_vma=False,
        )(params, planes, init_position)
        img = jnp.transpose(img, (2, 0, 1))
        return (img, nd) if return_aux else img

    layout_box = {}

    def local(params_l, planes_l, pts_l):
        rows, layout = decoder.decode_project(params_l, planes_l, pts_l, cam)
        layout_box.update(layout)   # trace-time static, same on every chip
        return rows

    rows = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(), P(axis)),
        out_specs=P(None, axis),    # (NROWS, n_dev * Mpad_local)
        # pallas_call out_shape carries no vma annotation — disable the
        # varying-across-mesh check (the spec above states the invariant)
        check_vma=False,
    )(params, planes, init_position)

    ts = raster_cfg.tile_size
    grid_x, grid_y = cam.image_width // ts, cam.image_height // ts
    if not shard_blend or grid_y % n_dev != 0:
        out = render_rows(cam, rows, layout_box, rows.shape[1], bg=bgv,
                          config=raster_cfg)
        if return_aux:
            return out["render"][:3], out["n_dropped"]
        return out["render"][:3]

    # replicated binning (ONE lexsort carrying the blend payloads), then
    # tile-row-sharded blend: render_rows' tail, split at the bin/blend
    # boundary (splat/fast_raster.py:578-586)
    r = {k: rows[v] for k, v in PROJ_ROWS.items()}
    ch = dict(px=r["px"], py=r["py"], depth=r["depth"],
              radius_f=r["radius_f"], visible=r["visible"] > 0.5)
    fields = [r["px"], r["py"], r["conic_a"], r["conic_b"], r["conic_c"],
              r["opac"], r["col_r"], r["col_g"], r["col_b"]]
    ch, fields = jax.lax.optimization_barrier((ch, fields))
    tile_starts, attrs_t, nd = bin_pairs_lexsort_ch(
        ch, fields, grid_x, grid_y, ts,
        raster_cfg.static_copies, raster_cfg.overflow_budget,
        bf16_colors=raster_cfg.bf16_colors,
        packed_payloads=raster_cfg.packed_payloads,
        fused_sort_key=raster_cfg.fused_sort_key,
    )
    gy_local = grid_y // n_dev

    def blend_local(starts_full, attrs_full):
        row0 = jax.lax.axis_index(axis) * gy_local * grid_x
        starts_l = jax.lax.dynamic_slice(
            starts_full, (row0,), (gy_local * grid_x + 1,))
        img_l, _ = _blend_and_assemble(
            starts_l, attrs_full, grid_x, gy_local, ts, bgv, raster_cfg)
        return img_l                 # (H/n_dev, W, 3)

    img = jax.shard_map(
        blend_local, mesh=mesh,
        in_specs=(P(), P()),
        out_specs=P(axis),
        check_vma=False,
    )(tile_starts, attrs_t)
    img = jnp.transpose(img, (2, 0, 1))
    return (img, nd) if return_aux else img
