"""Fast (Pallas) rasterizer parity vs the XLA reference path.

Runs the kernel in interpret mode on CPU; the real Mosaic compile path is
exercised on TPU by bench.py.
"""
import numpy as np
import jax
import jax.numpy as jnp

from gaussian_gan_decoder_tpu.gaussians import make_camera
from gaussian_gan_decoder_tpu.splat import RasterizeConfig, rasterize
from gaussian_gan_decoder_tpu.splat.fast_raster import rasterize_fast
from tests.test_splat import _eg3d_cam2world, _random_scene, psnr


def test_fast_matches_xla_path(rng):
    n = 500
    means, scales, rots, opac, colors = _random_scene(rng, n)
    cam = make_camera(64, 0.4, jnp.asarray(_eg3d_cam2world(), jnp.float32))
    cfg = RasterizeConfig(tile_size=16, max_pairs=2 ** 13, tile_capacity=512, chunk=64)
    bg = jnp.asarray([0.2, 0.4, 0.6], jnp.float32)
    args = (
        cam,
        jnp.asarray(means), jnp.asarray(scales), jnp.asarray(rots), jnp.asarray(opac),
    )
    kw = dict(colors_precomp=jnp.asarray(colors), bg=bg, config=cfg)
    out_ref = rasterize(*args, **kw)
    out_fast = rasterize_fast(*args, **kw, interpret=True, overflow_budget=2 ** 13)
    assert int(out_ref["n_dropped"]) == 0 and int(out_fast["n_dropped"]) == 0
    p = psnr(np.asarray(out_fast["render"]), np.asarray(out_ref["render"]))
    assert p > 45.0, p


def test_fast_segment_alignment_prefix(rng):
    """Segments starting at arbitrary (unaligned) offsets blend correctly:
    many tiny tiles-worth of gaussians force unaligned starts."""
    n = 300
    means, scales, rots, opac, colors = _random_scene(rng, n)
    scales = scales * 0.3  # tiny: 1 tile each, many distinct segments
    cam = make_camera(64, 0.4, jnp.asarray(_eg3d_cam2world(), jnp.float32))
    cfg = RasterizeConfig(tile_size=16, max_pairs=2 ** 12, tile_capacity=256, chunk=64)
    args = (
        cam,
        jnp.asarray(means), jnp.asarray(scales), jnp.asarray(rots), jnp.asarray(opac),
    )
    kw = dict(colors_precomp=jnp.asarray(colors), config=cfg)
    out_ref = rasterize(*args, **kw)
    out_fast = rasterize_fast(*args, **kw, interpret=True, overflow_budget=2 ** 12)
    p = psnr(np.asarray(out_fast["render"]), np.asarray(out_ref["render"]))
    assert p > 45.0, p
