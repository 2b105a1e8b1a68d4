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
):
    """One 512^2 frame with the point axis sharded over `axis`.

    -> (3, H, W) image (replicated). Wrap in jit for the fused program;
    bit-identical to flagship.decode_and_render(backend='pallas') up to
    all_gather block concatenation order (none — per-point math is
    independent and binning sorts by tile/depth)."""
    assert decoder.pallas_heads, "sharded latency path uses the fused kernel"
    from ..splat.fast_raster import render_rows

    n_dev = mesh.shape[axis]
    M = init_position.shape[0]
    assert M % n_dev == 0, (M, n_dev)
    cam = make_camera(image_size, jnp.asarray(fov), cam2world)
    if raster_cfg is None:
        from ..flagship import flagship_raster_config

        raster_cfg = flagship_raster_config()
    bgv = jnp.asarray(bg, jnp.float32)

    planes, _ = decoder.synthesize_planes(params, z, camera_params, truncation_psi)

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

    out = render_rows(cam, rows, layout_box, rows.shape[1], bg=bgv,
                      config=raster_cfg)
    return out["render"][:3]
