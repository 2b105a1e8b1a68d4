"""Point-axis sharding: sharded decode == single-device decode."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gaussian_gan_decoder_tpu.decoder.heads import GaussianDecoder
from gaussian_gan_decoder_tpu.parallel import make_mesh
from gaussian_gan_decoder_tpu.parallel.points import decode_points_sharded, sigma_grid_sharded
from gaussian_gan_decoder_tpu.decoder.surface import sigma_grid
from tests.test_models_triplane import tiny_generator


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs virtual multi-device")
def test_sharded_decode_matches_single_device():
    n_dev = min(len(jax.devices()), 8)
    mesh = make_mesh(n_dev, ("points",))
    gen = tiny_generator("panohead")
    gp = gen.init(jax.random.PRNGKey(0))
    dec = GaussianDecoder(generator=gen, decoder_type="sequential_reversed", hidden_dim=16)
    params = dec.init(jax.random.PRNGKey(1), generator_params=gp)

    m = 64 * n_dev
    pts = (jax.random.uniform(jax.random.PRNGKey(2), (m, 3)) - 0.5) * 0.5
    ws = gen.mapping(gp, jax.random.normal(jax.random.PRNGKey(3), (1, 32)), jnp.zeros((1, 25)))
    planes = gen.synthesis_planes(gp, ws, noise_mode="const")

    ref = dec.decode_from_planes(params, planes, pts)
    shd = decode_points_sharded(mesh, dec, params, planes, pts)
    for k in ("xyz", "scale", "rotation", "opacity", "color"):
        np.testing.assert_allclose(
            np.asarray(ref[k]), np.asarray(shd[k]), rtol=1e-5, atol=1e-6
        )


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs virtual multi-device")
def test_sharded_sigma_grid_matches():
    n_dev = min(len(jax.devices()), 8)
    mesh = make_mesh(n_dev, ("points",))
    gen = tiny_generator("panohead")
    gp = gen.init(jax.random.PRNGKey(0))
    ws = gen.mapping(gp, jax.random.normal(jax.random.PRNGKey(3), (1, 32)), jnp.zeros((1, 25)))
    planes = gen.synthesis_planes(gp, ws, noise_mode="const")

    ref = sigma_grid(gen, gp, planes, shape_res=16, chunk=2 ** 10)
    shd = sigma_grid_sharded(mesh, gen, gp, planes, shape_res=16)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(shd), rtol=1e-5, atol=1e-6)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs virtual multi-device")
@pytest.mark.parametrize("shard_blend", [False, True])
def test_render_latency_sharded_matches_single_device(shard_blend):
    """Full sharded frame (decode sharded over points; blend optionally
    sharded over tile rows) == flagship.decode_and_render('pallas')."""
    from gaussian_gan_decoder_tpu.flagship import (
        decode_and_render, default_camera_params, flagship_decoder)
    from gaussian_gan_decoder_tpu.parallel import render_latency_sharded
    from gaussian_gan_decoder_tpu.splat.rasterize import RasterizeConfig

    n_dev = min(len(jax.devices()), 8)
    mesh = make_mesh(n_dev, ("points",))
    gen = tiny_generator("panohead")
    dec = flagship_decoder(gen=gen)  # fused kernel path (hidden 128)
    params = dec.init(jax.random.PRNGKey(0),
                      generator_params=gen.init(jax.random.PRNGKey(1)))
    cp, c2w = default_camera_params()
    m = 80 * n_dev
    pts = (jax.random.uniform(jax.random.PRNGKey(2), (m, 3)) - 0.5) * 0.4
    z = jax.random.normal(jax.random.PRNGKey(3), (1, gen.z_dim))
    rcfg = RasterizeConfig(tile_size=16, max_pairs=2 ** 12, tile_capacity=64,
                           chunk=32, static_copies=2, overflow_budget=2 ** 10,
                           packed_payloads=True)
    fov = jnp.asarray(0.227)

    ref, _ = decode_and_render(dec, params, z, cp, c2w, pts, fov,
                               image_size=64, raster_cfg=rcfg,
                               backend="pallas")
    img = render_latency_sharded(mesh, dec, params, z, cp, c2w, pts, fov,
                                 image_size=64, raster_cfg=rcfg,
                                 shard_blend=shard_blend)
    a, b = np.asarray(ref), np.asarray(img)
    assert b.shape == (3, 64, 64)
    mse = ((a - b) ** 2).mean()
    psnr = 10 * np.log10(1.0 / max(mse, 1e-14))
    assert psnr > 60.0, psnr


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs virtual multi-device")
def test_render_latency_shard_sort_matches_single_device():
    """Tile-range-sharded binning sort (local bucket sort + all_to_all +
    per-chip range sort, parallel/render.py shard_sort) == the replicated
    single-device frame. Lossless bucket_cap: no exchange drops."""
    from gaussian_gan_decoder_tpu.flagship import (
        decode_and_render, default_camera_params, flagship_decoder)
    from gaussian_gan_decoder_tpu.parallel import render_latency_sharded
    from gaussian_gan_decoder_tpu.splat.rasterize import RasterizeConfig

    n_dev = min(len(jax.devices()), 8)
    mesh = make_mesh(n_dev, ("points",))
    gen = tiny_generator("panohead")
    dec = flagship_decoder(gen=gen)
    params = dec.init(jax.random.PRNGKey(0),
                      generator_params=gen.init(jax.random.PRNGKey(1)))
    cp, c2w = default_camera_params()
    m = 80 * n_dev
    pts = (jax.random.uniform(jax.random.PRNGKey(2), (m, 3)) - 0.5) * 0.4
    z = jax.random.normal(jax.random.PRNGKey(3), (1, gen.z_dim))
    rcfg = RasterizeConfig(tile_size=16, max_pairs=2 ** 12, tile_capacity=64,
                           chunk=32, static_copies=2, overflow_budget=2 ** 10,
                           packed_payloads=True)
    fov = jnp.asarray(0.227)

    # 128^2 so grid_y (8) is divisible by n_dev — the shard_sort branch
    # requires row-aligned tile ranges (falls back to replicated otherwise)
    size = 128
    assert (size // rcfg.tile_size) % n_dev == 0
    ref, _ = decode_and_render(dec, params, z, cp, c2w, pts, fov,
                               image_size=size, raster_cfg=rcfg,
                               backend="pallas")
    # bucket_cap=None exercises the default heuristic too; the lossless
    # cap (every local pair fits any one bucket) is the parity guarantee
    for cap in (None, 2 * 80 + 2 ** 10 // n_dev):
        img, nd = render_latency_sharded(
            mesh, dec, params, z, cp, c2w, pts, fov, image_size=size,
            raster_cfg=rcfg, shard_sort=True, bucket_cap=cap,
            return_aux=True)
        a, b = np.asarray(ref), np.asarray(img)
        assert b.shape == (3, size, size)
        mse = ((a - b) ** 2).mean()
        psnr = 10 * np.log10(1.0 / max(mse, 1e-14))
        assert psnr > 60.0, (cap, psnr)
        assert int(nd) == 0, cap  # lossless caps: overflow is observable

    # a starved bucket_cap must REPORT its exchange drops, not lose them
    _, nd = render_latency_sharded(
        mesh, dec, params, z, cp, c2w, pts, fov, image_size=size,
        raster_cfg=rcfg, shard_sort=True, bucket_cap=8, return_aux=True)
    assert int(nd) > 0
