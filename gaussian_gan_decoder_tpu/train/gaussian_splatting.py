"""Classic photogrammetric 3DGS training (the INRIA pipeline), TPU-native.

Re-design of /root/reference/gaussian_splatting/train.py:31-133 +
arguments/__init__.py:47-120 (OptimizationParams defaults): random camera
per step, render through the differentiable rasterizer, loss =
(1-lambda)*L1 + lambda*(1-SSIM), per-attribute Adam learning rates with
log-lerp xyz decay, adaptive densify/clone/split/prune on screen-space
mean gradients, periodic opacity reset — all at FIXED capacity
(gaussians/densify.py).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..gaussians.densify import densify_and_prune, get_expon_lr_func, reset_adam_state
from ..gaussians.model import GaussianScene, create_from_points
from ..losses.image import l1_loss, ssim
from ..splat.rasterize import RasterizeConfig, rasterize


@dataclass(frozen=True)
class GSOptimizationConfig:
    """(ref arguments/__init__.py:71-120 defaults)"""

    iterations: int = 30_000
    position_lr_init: float = 0.00016
    position_lr_final: float = 0.0000016
    position_lr_delay_mult: float = 0.01
    position_lr_max_steps: int = 30_000
    feature_lr: float = 0.0025
    opacity_lr: float = 0.05
    scaling_lr: float = 0.005
    rotation_lr: float = 0.001
    percent_dense: float = 0.01
    lambda_dssim: float = 0.2
    densification_interval: int = 100
    opacity_reset_interval: int = 3_000
    densify_from_iter: int = 500
    densify_until_iter: int = 15_000
    densify_grad_threshold: float = 0.0002
    capacity: int = 2 ** 20
    sh_degree: int = 3


class GSTrainState(NamedTuple):
    scene: GaussianScene
    opt_state: optax.OptState
    grad_accum: jax.Array
    denom: jax.Array
    max_radii2d: jax.Array
    step: jax.Array


def init_scene_at_capacity(points, colors, cfg: GSOptimizationConfig) -> GaussianScene:
    scene = create_from_points(
        jnp.asarray(points),
        jnp.asarray(colors) if colors is not None else None,
        sh_degree=cfg.sh_degree,
    )
    n = scene.num_points
    cap = cfg.capacity
    assert cap >= n, (cap, n)
    pad = cap - n

    def padf(x):
        return jnp.concatenate(
            [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0
        )

    return GaussianScene(
        xyz=padf(scene.xyz), features_dc=padf(scene.features_dc),
        features_rest=padf(scene.features_rest), scaling=padf(scene.scaling),
        rotation=padf(scene.rotation).at[n:, 0].set(1.0),
        opacity=padf(scene.opacity),
        valid=jnp.concatenate([scene.valid, jnp.zeros(pad, bool)]),
        max_sh_degree=cfg.sh_degree, active_sh_degree=0,
    )


def make_optimizer(cfg: GSOptimizationConfig, spatial_lr_scale: float):
    """Per-attribute LRs (ref gaussian_model.py:217-238); xyz LR follows
    the log-lerp schedule scaled by scene extent."""
    xyz_sched = get_expon_lr_func(
        cfg.position_lr_init * spatial_lr_scale,
        cfg.position_lr_final * spatial_lr_scale,
        lr_delay_mult=cfg.position_lr_delay_mult,
        max_steps=cfg.position_lr_max_steps,
    )
    tx = optax.multi_transform(
        {
            "xyz": optax.chain(optax.scale_by_adam(eps=1e-15),
                               optax.scale_by_schedule(lambda s: -xyz_sched(s))),
            "f_dc": optax.adam(cfg.feature_lr, eps=1e-15),
            "f_rest": optax.adam(cfg.feature_lr / 20.0, eps=1e-15),
            "opacity": optax.adam(cfg.opacity_lr, eps=1e-15),
            "scaling": optax.adam(cfg.scaling_lr, eps=1e-15),
            "rotation": optax.adam(cfg.rotation_lr, eps=1e-15),
        },
        {
            "xyz": "xyz", "features_dc": "f_dc", "features_rest": "f_rest",
            "scaling": "scaling", "rotation": "rotation", "opacity": "opacity",
        },
    )
    return tx


def scene_param_dict(scene: GaussianScene):
    return {
        "xyz": scene.xyz, "features_dc": scene.features_dc,
        "features_rest": scene.features_rest, "scaling": scene.scaling,
        "rotation": scene.rotation, "opacity": scene.opacity,
    }


def init_gs_state(points, colors, cfg: GSOptimizationConfig,
                  spatial_lr_scale: float) -> GSTrainState:
    scene = init_scene_at_capacity(points, colors, cfg)
    tx = make_optimizer(cfg, spatial_lr_scale)
    n = scene.num_points
    return GSTrainState(
        scene=scene,
        opt_state=tx.init(scene_param_dict(scene)),
        grad_accum=jnp.zeros(n), denom=jnp.zeros(n), max_radii2d=jnp.zeros(n),
        step=jnp.zeros((), jnp.int32),
    )


def make_train_step(cfg: GSOptimizationConfig, raster_cfg: RasterizeConfig,
                    image_size: int, spatial_lr_scale: float):
    tx = make_optimizer(cfg, spatial_lr_scale)

    def loss_fn(trainable, scene: GaussianScene, off, cam, gt, bg, sh_degree):
        s = scene._replace(**trainable)
        out = rasterize(
            cam, s.get_xyz, s.get_scaling, s.get_rotation, s.get_opacity,
            shs=s.features_dc if sh_degree == 0 else jnp.concatenate(
                [s.features_dc, s.features_rest], axis=1),
            sh_degree=sh_degree, bg=bg, config=raster_cfg,
            means2d_offset=off,
        )
        img = out["render"]
        ll1 = l1_loss(img, gt)
        sv, _ = ssim(img, gt)
        loss = (1.0 - cfg.lambda_dssim) * ll1 + cfg.lambda_dssim * (1.0 - sv)
        return loss, (out["radii"], out["visibility_filter"], ll1)

    def step(state: GSTrainState, cam, gt, bg, sh_degree: int):
        scene = state.scene
        trainable = scene_param_dict(scene)
        off = jnp.zeros((scene.num_points, 2))
        (loss, (radii, vis, ll1)), (grads, off_grads) = jax.value_and_grad(
            loss_fn, argnums=(0, 2), has_aux=True
        )(trainable, scene, off, cam, gt, bg, sh_degree)

        screen_grads = jnp.linalg.norm(off_grads, axis=-1)
        updates, opt_state = tx.update(grads, state.opt_state, trainable)
        new_vals = optax.apply_updates(trainable, updates)
        new_scene = scene._replace(**new_vals)
        ga = state.grad_accum + jnp.where(vis, screen_grads, 0.0)
        dn = state.denom + vis.astype(jnp.float32)
        mr = jnp.maximum(state.max_radii2d, jnp.where(vis, radii.astype(jnp.float32), 0.0))
        return GSTrainState(new_scene, opt_state, ga, dn, mr, state.step + 1), {
            "loss": loss, "l1": ll1,
            "n_valid": jnp.sum(scene.valid.astype(jnp.int32)),
        }

    return step, tx


def densify_step(state: GSTrainState, key, cfg: GSOptimizationConfig,
                 extent: float, max_screen_size: Optional[float], tx):
    scene, stats = densify_and_prune(
        state.scene, state.grad_accum, state.denom, state.max_radii2d, key,
        max_grad=cfg.densify_grad_threshold, extent=extent,
        max_screen_size=max_screen_size, percent_dense=cfg.percent_dense,
    )
    touched = scene.valid != state.scene.valid
    opt_state = reset_adam_state(state.opt_state, touched)
    n = scene.num_points
    return GSTrainState(
        scene, opt_state,
        jnp.zeros(n), jnp.zeros(n), jnp.zeros(n), state.step,
    ), stats
