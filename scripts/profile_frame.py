"""Stage-by-stage frame profiler for the flagship decode+render path.

Each stage runs ITERS times inside ONE jitted fori_loop (per-call tunnel
dispatch is ~51 ms and must not pollute numbers). Stage outputs are
reduced to scalars to force execution; inputs that a stage consumes are
varied per iteration (folded latent / jittered points) so XLA cannot
hoist the body out of the loop.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from gaussian_gan_decoder_tpu.flagship import (
    default_camera_params,
    flagship_decoder,
    flagship_generator,
    flagship_raster_config,
)
from gaussian_gan_decoder_tpu.gaussians.cameras import make_camera
from gaussian_gan_decoder_tpu.neuralfield import sample_from_planes
from gaussian_gan_decoder_tpu.splat.fast_raster import (
    _pack_attrs,
    bin_pairs_lexsort,
)
from gaussian_gan_decoder_tpu.splat.pallas_blend import CHUNK, ROW, pallas_blend
from gaussian_gan_decoder_tpu.splat.projection import project_gaussians
from gaussian_gan_decoder_tpu.gaussians.sh import sh_to_color

ITERS = int(os.environ.get("PROF_ITERS", 10))
N_POINTS = int(os.environ.get("PROF_POINTS", 500_000))


def timed(name, fn, *args):
    f = jax.jit(fn)
    out = f(*args)
    jax.tree_util.tree_map(
        lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x, out
    )
    float(jnp.sum(out)) if hasattr(out, "shape") else None
    t0 = time.perf_counter()
    out = f(*args)
    s = float(jnp.sum(out)) if hasattr(out, "shape") else None
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{name:38s} {dt:8.2f} ms/iter   (checksum {s})")
    return dt


def main():
    dec = flagship_decoder(gen=flagship_generator())
    params = dec.init(
        jax.random.PRNGKey(0),
        generator_params=dec.generator.init(jax.random.PRNGKey(1)),
    )
    cp, cam2world = default_camera_params()
    init_pos = (jax.random.uniform(jax.random.PRNGKey(2), (N_POINTS, 3)) - 0.5) * 0.4
    rcfg = flagship_raster_config()
    cam = make_camera(512, jnp.asarray(0.227), cam2world)
    g = dec.generator

    zs = jax.random.normal(jax.random.PRNGKey(3), (1, 512))

    # ---- stage 1: mapping + plane synthesis --------------------------------
    def planes_stage(params, z0):
        def body(i, acc):
            z = z0 + 1e-6 * i
            planes, _ = dec.synthesize_planes(params, z, cp, 1.0)
            return acc + jnp.sum(planes[0, 0, 0, 0])

        return jax.lax.fori_loop(0, ITERS, body, 0.0)

    timed("mapping+synthesis (planes)", planes_stage, params, zs)

    planes, _ = jax.jit(lambda p, z: dec.synthesize_planes(p, z, cp, 1.0))(params, zs)

    # ---- stage 2: tri-grid sampling (expansion build + gather) -------------
    def sampling_stage(planes, pos):
        def body(i, acc):
            p2 = pos + 1e-7 * i
            feats = sample_from_planes(
                g.renderer.plane_axes, planes + 1e-9 * i, p2[None],
                box_warp=g.rk["box_warp"], triplane_depth=g.triplane_depth,
                brick_dtype=jnp.bfloat16,
            )
            return acc + jnp.sum(feats[0, 0, 0])

        return jax.lax.fori_loop(0, ITERS, body, 0.0)

    timed("tri-grid sampling (build+gather)", sampling_stage, planes, init_pos)

    # sampling with FIXED planes (expansion build hoisted by XLA => gather only)
    def gather_only_stage(planes, pos):
        def body(i, acc):
            p2 = pos + 1e-7 * i
            feats = sample_from_planes(
                g.renderer.plane_axes, planes, p2[None],
                box_warp=g.rk["box_warp"], triplane_depth=g.triplane_depth,
                brick_dtype=jnp.bfloat16,
            )
            return acc + jnp.sum(feats[0, 0, 0])

        return jax.lax.fori_loop(0, ITERS, body, 0.0)

    timed("  gather-only (expansion hoisted)", gather_only_stage, planes, init_pos)

    # ---- stage 3: full decode_from_planes (sampling + 5 heads) -------------
    def decode_stage(params, planes, pos):
        def body(i, acc):
            d = dec.decode_from_planes(params, planes + 1e-9 * i, pos + 1e-7 * i)
            return acc + jnp.sum(d.xyz[0]) + jnp.sum(d.color[0])

        return jax.lax.fori_loop(0, ITERS, body, 0.0)

    timed("decode_from_planes (sample+heads)", decode_stage, params, planes, init_pos)

    # ---- stage 4: rasterizer pieces ----------------------------------------
    decoded = jax.jit(dec.decode_from_planes)(params, planes, init_pos)
    means3d = decoded.xyz
    scales = jnp.exp(decoded.scale)
    rots = decoded.rotation  # normalized inside projection
    opac = jax.nn.sigmoid(decoded.opacity[:, 0])
    cols = jnp.clip(decoded.color * 0.5 + 0.5, 0.0, 1.0)

    ts = rcfg.tile_size
    grid_x = grid_y = 512 // ts

    def project_stage(means3d, scales, rots):
        def body(i, acc):
            proj = project_gaussians(cam, means3d + 1e-7 * i, scales, rots, 1.0)
            return acc + jnp.sum(proj.pix_xy[0]) + jnp.sum(proj.conic[0])

        return jax.lax.fori_loop(0, ITERS, body, 0.0)

    timed("project_gaussians", project_stage, means3d, scales, rots)

    proj = jax.jit(lambda m, s, r: project_gaussians(cam, m, s, r, 1.0))(
        means3d, scales, rots
    )

    def pack_bin_stage(means3d, scales, rots, opac, cols):
        def body(i, acc):
            proj = project_gaussians(cam, means3d + 1e-7 * i, scales, rots, 1.0)
            attrs = _pack_attrs(proj, cols, opac)
            tile_starts, attrs_t, n_drop = bin_pairs_lexsort(
                proj, attrs, grid_x, grid_y, ts,
                rcfg.static_copies, rcfg.overflow_budget,
            )
            return acc + jnp.sum(tile_starts[:4]) + attrs_t[0, 0]

        return jax.lax.fori_loop(0, ITERS, body, 0.0)

    t_projbin = timed("project+pack+bin (lexsort)", pack_bin_stage,
                      means3d, scales, rots, opac, cols)

    def blend_stage(means3d, scales, rots, opac, cols):
        def body(i, acc):
            proj = project_gaussians(cam, means3d + 1e-7 * i, scales, rots, 1.0)
            attrs = _pack_attrs(proj, cols, opac)
            tile_starts, attrs_t, _ = bin_pairs_lexsort(
                proj, attrs, grid_x, grid_y, ts,
                rcfg.static_copies, rcfg.overflow_budget,
            )
            slack = rcfg.tile_capacity + CHUNK
            attrs_t = jnp.concatenate(
                [attrs_t, jnp.zeros((ROW, slack), jnp.float32)], axis=1
            )
            accum, trans = pallas_blend(
                tile_starts, attrs_t, grid_x, grid_y, ts, max_k=rcfg.tile_capacity
            )
            return acc + jnp.sum(accum[0, 0]) + trans[0, 0]

        return jax.lax.fori_loop(0, ITERS, body, 0.0)

    t_full_raster = timed("full raster (proj+bin+blend)", blend_stage,
                          means3d, scales, rots, opac, cols)
    print(f"{'  => blend-only (diff)':38s} {t_full_raster - t_projbin:8.2f} ms/iter")


if __name__ == "__main__":
    main()
