"""Classic 3DGS photogrammetric training: fit a tiny synthetic scene."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gaussian_gan_decoder_tpu.gaussians.cameras import make_camera
from gaussian_gan_decoder_tpu.gaussians.densify import (
    densify_and_prune, get_expon_lr_func, reset_opacity,
)
from gaussian_gan_decoder_tpu.splat.rasterize import RasterizeConfig
from gaussian_gan_decoder_tpu.train.gaussian_splatting import (
    GSOptimizationConfig, densify_step, init_gs_state, make_train_step,
)
from tests.test_splat import _eg3d_cam2world


def test_expon_lr_schedule():
    f = get_expon_lr_func(1e-2, 1e-4, max_steps=100)
    np.testing.assert_allclose(float(f(0)), 1e-2, rtol=1e-5)
    np.testing.assert_allclose(float(f(100)), 1e-4, rtol=1e-5)
    np.testing.assert_allclose(float(f(50)), 1e-3, rtol=1e-5)


def test_gs_training_reduces_loss(rng):
    cfg = GSOptimizationConfig(capacity=256, sh_degree=0,
                               densify_grad_threshold=1e-9)
    pts = (rng.rand(128, 3).astype(np.float32) - 0.5) * 0.5
    cols = rng.rand(128, 3).astype(np.float32)
    state = init_gs_state(pts, cols, cfg, spatial_lr_scale=1.0)
    # make them visible
    state = state._replace(scene=state.scene._replace(
        scaling=jnp.full_like(state.scene.scaling, -3.0)))

    rcfg = RasterizeConfig(tile_size=16, max_pairs=2 ** 12, tile_capacity=128, chunk=32)
    cam = make_camera(32, 0.5, jnp.asarray(_eg3d_cam2world(), jnp.float32))
    gt = jnp.asarray(rng.rand(3, 32, 32).astype(np.float32))
    bg = jnp.zeros(3)

    step, tx = make_train_step(cfg, rcfg, 32, spatial_lr_scale=1.0)
    jstep = jax.jit(step, static_argnames=("sh_degree",))

    losses = []
    for i in range(25):
        state, metrics = jstep(state, cam, gt, bg, sh_degree=0)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses[:3] + losses[-3:]

    # densify: thresholds are tiny so clones/splits happen; capacity holds
    n_valid_before = int(jnp.sum(state.scene.valid))
    state2, stats = densify_step(state, jax.random.PRNGKey(0), cfg,
                                 extent=1.0, max_screen_size=None, tx=tx)
    assert state2.scene.num_points == cfg.capacity
    assert int(stats.n_cloned) + int(stats.n_split) > 0
    assert bool(jnp.all(jnp.isfinite(state2.scene.xyz)))

    # opacity reset clamps activated opacity to <= 0.01
    s3 = reset_opacity(state2.scene)
    act = np.asarray(jax.nn.sigmoid(s3.opacity))[np.asarray(s3.valid)]
    assert act.max() <= 0.0101


def test_densify_prunes_transparent(rng):
    cfg = GSOptimizationConfig(capacity=64, sh_degree=0)
    pts = rng.rand(32, 3).astype(np.float32)
    state = init_gs_state(pts, None, cfg, 1.0)
    scene = state.scene._replace(opacity=jnp.full_like(state.scene.opacity, -10.0))
    scene2, stats = densify_and_prune(
        scene, jnp.zeros(64), jnp.ones(64), jnp.zeros(64),
        jax.random.PRNGKey(0), min_opacity=0.005,
    )
    assert int(stats.n_pruned) == 32
    assert int(jnp.sum(scene2.valid)) == 0
