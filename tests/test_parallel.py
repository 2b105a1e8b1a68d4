"""Multi-chip DP training step on the virtual 8-device CPU mesh."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gaussian_gan_decoder_tpu.decoder.heads import GaussianDecoder
from gaussian_gan_decoder_tpu.decoder.target_pipeline import TargetSamplerConfig
from gaussian_gan_decoder_tpu.losses import VGG16LPIPS
from gaussian_gan_decoder_tpu.parallel import make_mesh, make_parallel_train_step
from gaussian_gan_decoder_tpu.splat.rasterize import RasterizeConfig
from gaussian_gan_decoder_tpu.train.distill import DistillConfig, init_train_state
from tests.test_models_triplane import tiny_generator


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs virtual multi-device")
def test_parallel_distill_step_runs_on_mesh():
    n_dev = min(len(jax.devices()), 8)
    mesh = make_mesh(n_dev, ("data",))

    gen = tiny_generator("panohead")
    gen_params = gen.init(jax.random.PRNGKey(0))
    dec = GaussianDecoder(generator=gen, decoder_type="sequential_reversed", hidden_dim=16)
    vgg = VGG16LPIPS()
    vgg_params = vgg.init(jax.random.PRNGKey(4))

    cfg = DistillConfig(image_size=16, id_loss_weight=0.0)
    tcfg = TargetSamplerConfig(
        shape_res=16, num_points=256, face_capacity=2 ** 10, sigma_chunk=2 ** 10,
        neural_rendering_resolution=16, mc_level=0.5,
    )
    rcfg = RasterizeConfig(tile_size=16, max_pairs=2 ** 11, tile_capacity=64, chunk=32)

    state = init_train_state(jax.random.PRNGKey(1), dec, gen_params, cfg)
    step = make_parallel_train_step(
        mesh, dec, gen_params, vgg, vgg_params,
        cfg=cfg, target_cfg=tcfg, raster_cfg=rcfg,
    )
    keys = jax.random.split(jax.random.PRNGKey(2), n_dev)
    zs = jax.random.normal(jax.random.PRNGKey(3), (n_dev, 1, 32))
    p0 = np.asarray(jax.tree.leaves(state.params)[0]).copy()
    state, metrics = step(state, keys, zs, jnp.asarray(0))
    assert np.isfinite(float(metrics["Loss/total"]))
    # params updated and stay replicated (single logical value)
    p1 = np.asarray(jax.tree.leaves(state.params)[0])
    assert not np.allclose(p0, p1)
