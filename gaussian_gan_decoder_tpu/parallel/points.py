"""Point-axis ("sequence") parallelism for the decode path.

SURVEY §5: the reference's closest long-axis scaling is chunking the 2.1M
sigma samples and 500k gaussians on ONE GPU. Here those axes shard across
chips: per-point work (tri-plane sampling + the 5 head MLPs + sigma
probes) is embarrassingly parallel, so a `shard_map` over the `points`
mesh axis runs with ZERO collectives — planes/params are replicated,
each chip decodes its slice of the point cloud. An `all_gather` is only
needed when a downstream consumer (the rasterizer) wants the full set —
and pjit inserts it automatically at that boundary.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..decoder.heads import GaussianDecoder


def decode_points_sharded(
    mesh: Mesh,
    decoder: GaussianDecoder,
    params,
    planes,
    init_position,          # (M, 3), M divisible by mesh axis size
    axis: str = "points",
):
    """decode_from_planes with the M axis sharded over `axis`."""

    def local(params_l, planes_l, pts_l):
        return decoder.decode_from_planes(params_l, planes_l, pts_l)

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(), P(axis)),
        out_specs=P(axis),
    )
    return fn(params, planes, init_position)


def sigma_grid_sharded(mesh: Mesh, generator, gen_params, planes,
                       shape_res: int = 128, axis: str = "points"):
    """Density probe with the R^3 sample axis sharded over `axis`
    (the reference's 1M-point chunk loop, target_dataloader.py:139-168,
    becomes a per-chip slice)."""
    from ..decoder.surface import create_samples

    samples = create_samples(shape_res, generator.rk["box_warp"])[0]  # (R^3, 3)

    def local(gp, pl, pts):
        dirs = jnp.zeros_like(pts).at[..., 2].set(-1.0)
        out = generator.sample_mixed_from_planes(gp, pl, pts[None], dirs[None])
        return out["sigma"][0, :, 0]

    fn = jax.shard_map(
        local, mesh=mesh, in_specs=(P(), P(), P(axis)), out_specs=P(axis)
    )
    sig = fn(gen_params, planes, samples)
    return sig.reshape(shape_res, shape_res, shape_res)
