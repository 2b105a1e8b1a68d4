"""run_eval harness: one fused jitted step, cached across invocations
(ref main/eval.py:13-106; our fold of the two loops into one program)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def smoke_setup():
    from gaussian_gan_decoder_tpu.decoder.heads import GaussianDecoder
    from gaussian_gan_decoder_tpu.losses import VGG16LPIPS
    from gaussian_gan_decoder_tpu.models.triplane import TriPlaneGenerator

    gen = TriPlaneGenerator(
        z_dim=16, c_dim=25, w_dim=16, img_resolution=16, variant="panohead",
        without_sr=True, channel_base=256, channel_max=16,
        rendering_kwargs=(("triplane_size", 8), ("depth_resolution", 4),
                          ("depth_resolution_importance", 4),
                          ("c_gen_conditioning_zero", True)),
    )
    frozen = gen.init(jax.random.PRNGKey(0))
    dec = GaussianDecoder(generator=gen, decoder_type="sequential_reversed",
                          hidden_dim=16)
    params = dec.init(jax.random.PRNGKey(1), generator_params=frozen)
    vgg = VGG16LPIPS()
    vgg_params = vgg.init(jax.random.PRNGKey(2))
    return dec, params, frozen, vgg, vgg_params


def _cfgs():
    from gaussian_gan_decoder_tpu.decoder.target_pipeline import (
        TargetSamplerConfig)
    from gaussian_gan_decoder_tpu.splat.rasterize import RasterizeConfig
    from gaussian_gan_decoder_tpu.train.distill import DistillConfig

    cfg = DistillConfig(image_size=16)
    tcfg = TargetSamplerConfig(
        shape_res=8, num_points=128, mc_level=0.5,
        sigma_chunk=2 ** 9, face_capacity=2 ** 10,
        neural_rendering_resolution=16)
    return cfg, tcfg, RasterizeConfig(
        tile_size=16, max_pairs=2 ** 12, tile_capacity=64, chunk=32,
        overflow_budget=2 ** 10)


def test_run_eval_metrics_and_cache(smoke_setup):
    from gaussian_gan_decoder_tpu.train.eval import _make_eval_step, run_eval

    dec, params, frozen, vgg, vgg_params = smoke_setup
    cfg, tcfg, rcfg = _cfgs()
    out = run_eval(jax.random.PRNGKey(3), dec, params, frozen, vgg,
                   vgg_params, eval_steps=2, cfg=cfg, target_cfg=tcfg,
                   raster_cfg=rcfg)
    for name in ("L1", "L2", "LPIPS", "DSSIM", "Sobel"):
        key = f"Metrics10k/{name}"
        assert key in out and np.isfinite(out[key]), (key, out)
    assert "Metrics10k/id" not in out  # no IR-SE50 supplied

    # second invocation reuses the SAME compiled step (lru-cached builder)
    before = _make_eval_step.cache_info().hits
    run_eval(jax.random.PRNGKey(4), dec, params, frozen, vgg, vgg_params,
             eval_steps=1, cfg=cfg, target_cfg=tcfg, raster_cfg=rcfg)
    assert _make_eval_step.cache_info().hits > before


def test_run_eval_zero_steps(smoke_setup):
    from gaussian_gan_decoder_tpu.train.eval import run_eval

    dec, params, frozen, vgg, vgg_params = smoke_setup
    cfg, tcfg, rcfg = _cfgs()
    assert run_eval(jax.random.PRNGKey(5), dec, params, frozen, vgg,
                    vgg_params, eval_steps=0, cfg=cfg, target_cfg=tcfg,
                    raster_cfg=rcfg) == {}
