"""Frame-stream ablation profiler: time the flagship frame with the
pipeline truncated after each stage (same fori_loop harness as bench.py,
which is known to compile). Stage costs = successive deltas."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from gaussian_gan_decoder_tpu.flagship import (
    default_camera_params, flagship_decoder, flagship_generator,
    flagship_raster_config,
)
from gaussian_gan_decoder_tpu.gaussians.cameras import make_camera
from gaussian_gan_decoder_tpu.splat.fast_raster import _pack_attrs, bin_pairs_lexsort
from gaussian_gan_decoder_tpu.splat.pallas_blend import CHUNK, ROW, pallas_blend
from gaussian_gan_decoder_tpu.splat.projection import project_gaussians
from gaussian_gan_decoder_tpu.gaussians.sh import sh_to_color
from gaussian_gan_decoder_tpu.splat.rasterize import _tile_rects

ITERS = int(os.environ.get("PROF_ITERS", 10))


def main():
    dec = flagship_decoder(gen=flagship_generator())
    params = dec.init(jax.random.PRNGKey(0),
                      generator_params=dec.generator.init(jax.random.PRNGKey(1)))
    cp, cam2world = default_camera_params()
    init_pos = (jax.random.uniform(jax.random.PRNGKey(2), (500_000, 3)) - 0.5) * 0.4
    rcfg = flagship_raster_config()
    cam = make_camera(512, jnp.asarray(0.227), cam2world)
    ts = rcfg.tile_size
    gx = gy = 512 // ts
    zs = jax.random.normal(jax.random.PRNGKey(3), (ITERS, 1, 512))
    bg = jnp.asarray([0.55717, 0.52256, 0.51045], jnp.float32)

    def frame(params, z, stage):
        d = dec.apply(params, z, cp, init_pos, 1.0)
        if stage == "decode":
            return jnp.sum(d.xyz[:8]) + jnp.sum(d.color[:8])
        means3d = d.xyz
        scales = jnp.exp(d.scale)
        proj = project_gaussians(cam, means3d, scales, d.rotation, 1.0)
        if stage == "project":
            return jnp.sum(proj.pix_xy[:8]) + jnp.sum(proj.conic[:8])
        opac = jax.nn.sigmoid(d.opacity[:, 0])
        cols = jnp.clip(d.color * 0.28209479177387814 + 0.5, 0.0, 1.0)
        attrs = _pack_attrs(proj, cols, opac)
        tile_starts, attrs_t, nd = bin_pairs_lexsort(
            proj, attrs, gx, gy, ts, rcfg.static_copies, rcfg.overflow_budget)
        if stage == "bin":
            return jnp.sum(tile_starts[:8].astype(jnp.float32)) + attrs_t[0, 0]
        slack = rcfg.tile_capacity + CHUNK
        attrs_t = jnp.concatenate([attrs_t, jnp.zeros((ROW, slack), jnp.float32)], axis=1)
        accum, trans = pallas_blend(tile_starts, attrs_t, gx, gy, ts,
                                    max_k=rcfg.tile_capacity)
        img = accum + trans[:, :, None] * bg[None, None, :]
        return jnp.sum(img[:4])

    prev = 0.0
    for stage in ["decode", "project", "bin", "full"]:
        @jax.jit
        def stream(params, zs, stage=stage):
            def body(i, acc):
                return acc + frame(params, zs[i], stage)
            return jax.lax.fori_loop(0, ITERS, body, 0.0)

        float(stream(params, zs))
        t0 = time.perf_counter()
        float(stream(params, zs))
        dt = (time.perf_counter() - t0) / ITERS * 1e3
        print(f"through {stage:8s}: {dt:7.2f} ms/frame   (delta {dt - prev:+7.2f})",
              flush=True)
        prev = dt


if __name__ == "__main__":
    main()
