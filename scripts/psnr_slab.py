"""On-chip slab-vs-oracle PSNR (VERDICT r3 item 7, BASELINE.md acceptance).

Renders the SAME latent + template through
  (a) the slab fast path      (int8 volume + int8 lerp weights + poly6
                               GELU + packed_v2 Pallas raster),
  (b) the non-slab Pallas path (int8 bricks + pallas heads — the r2
                               default; isolates slab-specific error),
  (c) the f32 XLA oracle      (exact-erf GELU, f32 sampling, XLA scan
                               rasterizer — the in-repo stand-in for the
                               CUDA rasterizer, see PERFORMANCE.md
                               'CUDA-rasterizer PSNR caveat'),
and prints PSNR(a,c), PSNR(b,c), PSNR(a,b). Target: >= 39 dB vs the
oracle. Runs wherever jax.devices() points (TPU via the axon tunnel,
or CPU with PSNR_CPU=1 + tiny sizes for plumbing).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

if os.environ.get("PSNR_CPU"):
    jax.config.update("jax_platforms", "cpu")
if not os.environ.get("PSNR_NO_CACHE"):
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_psnr")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    import dataclasses

    from gaussian_gan_decoder_tpu.flagship import (
        decode_and_render, default_camera_params, flagship_decoder,
        flagship_generator, flagship_raster_config)

    n_points = int(os.environ.get("PSNR_POINTS", 500_000))
    image_size = int(os.environ.get("PSNR_IMAGE", 512))

    gen = flagship_generator()
    dec_fast = dataclasses.replace(
        flagship_decoder(gen=gen), slab_sampling=True, gelu="poly6",
        slab_clip_q=float(os.environ.get("PSNR_CLIPQ", "0")))
    # oracle: every approximation off (f32 sampling, exact GELU, XLA heads)
    dec_ref = dataclasses.replace(
        dec_fast, slab_sampling=False, int8_sampling=False,
        bf16_sampling=False, pallas_heads=False, heads_bf16=False,
        pallas_sampling=False, pallas_mapping=False, gelu="exact")
    dec_mid = dataclasses.replace(dec_fast, slab_sampling=False)

    params = dec_fast.init(
        jax.random.PRNGKey(0), generator_params=gen.init(jax.random.PRNGKey(1)))
    cp, cam2world = default_camera_params()
    init_pos = (jax.random.uniform(jax.random.PRNGKey(2), (n_points, 3)) - 0.5) * 0.4
    fov = jnp.asarray(0.227)
    rcfg = flagship_raster_config()
    rcfg_ref = dataclasses.replace(rcfg, packed_payloads=False,
                                   bf16_colors=False, fused_sort_key=False)
    z = jax.random.normal(jax.random.PRNGKey(3), (1, 512))

    ctx = dec_fast.make_slab_context(init_pos, cache_dir="/tmp/slab_ctx_cache")

    from gaussian_gan_decoder_tpu.utils import EasyDict

    def _merge(sa):
        if sa is None:
            return None
        merged = EasyDict(ctx)
        merged.update(sa)
        return merged

    def run(tag, dec, backend, cfg, slab=None):
        t0 = time.perf_counter()
        img, _ = jax.jit(
            lambda p, zz, sa: decode_and_render(
                dec, p, zz, cp, cam2world, init_pos, fov,
                image_size=image_size, raster_cfg=cfg, backend=backend,
                slab_ctx=_merge(sa)),
        )(params, z, slab)
        img = np.asarray(jnp.clip(img, 0.0, 1.0), np.float64)
        print(f"{tag}: {time.perf_counter() - t0:.1f}s", file=sys.stderr)
        return img

    img_slab = run("slab", dec_fast, "pallas", rcfg,
                   slab={k: ctx[k] for k in ("origins", "wzy", "axs", "aux")})
    img_mid = run("pallas non-slab", dec_mid, "pallas", rcfg)
    img_ref = run("f32 XLA oracle", dec_ref, "xla", rcfg_ref)

    # the BASELINE.md acceptance is rasterizer-vs-rasterizer on IDENTICAL
    # gaussian sets: decode once with the exact f32 oracle settings, then
    # render the SAME set through the fast Pallas raster (deployed config)
    # and the XLA reference raster
    from gaussian_gan_decoder_tpu.gaussians.cameras import make_camera
    from gaussian_gan_decoder_tpu.splat.rasterize import render_simple

    t0 = time.perf_counter()
    cam = make_camera(image_size, fov, cam2world)
    bgv = jnp.asarray((0.55717, 0.52256, 0.51045), jnp.float32)

    @jax.jit
    def raster_pair(p, zz):
        d = dec_ref.apply(p, zz, cp, init_pos, 1.0)
        a = render_simple(cam, d, bg=bgv, config=rcfg,
                          backend="pallas")["render"][:3]
        b = render_simple(cam, d, bg=bgv, config=rcfg_ref,
                          backend="xla")["render"][:3]
        return a, b

    ra, rb = raster_pair(params, z)
    ra = np.asarray(jnp.clip(ra, 0, 1), np.float64)
    rb = np.asarray(jnp.clip(rb, 0, 1), np.float64)
    print(f"raster-isolated pair: {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)

    def psnr(a, b):
        mse = np.mean((a - b) ** 2)
        return 10 * np.log10(1.0 / max(mse, 1e-12))

    import json
    print(json.dumps({
        "psnr_raster_identical_sets_db": round(psnr(ra, rb), 2),
        "psnr_slab_vs_oracle_db": round(psnr(img_slab, img_ref), 2),
        "psnr_pallas_vs_oracle_db": round(psnr(img_mid, img_ref), 2),
        "psnr_slab_vs_pallas_db": round(psnr(img_slab, img_mid), 2),
        "image": image_size, "points": n_points,
    }))


if __name__ == "__main__":
    main()
