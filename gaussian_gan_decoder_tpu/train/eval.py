"""Decoder evaluation harness.

Re-design of /root/reference/main/eval.py:13-106 (`run_eval`): two no-grad
loops over fresh samples —
  1. `eval_steps` random-camera samples scoring L1/L2/LPIPS/DSSIM/Sobel,
  2. `eval_steps` near-frontal fov=10 samples scoring ID similarity
     (horizontal/vertical stddev 0.15/0.1 pi, ref eval.py:64-76),
logging `Metrics10k/{L1,L2,LPIPS,DSSIM,Sobel,id}` means.

Reference defect NOT replicated (SURVEY §"known defects"): the reference's
first loop logs raw `ssim` under the name DSSIM (eval.py:50); here DSSIM
is 1 - ssim, consistent with training.
"""
from __future__ import annotations

from dataclasses import replace
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..decoder.heads import GaussianDecoder
from ..decoder.target_pipeline import TargetSamplerConfig, sample_target
from ..gaussians.cameras import make_camera
from ..losses import (
    IRSE50, VGG16LPIPS, id_similarity, l1_loss, l2_loss, lpips_loss,
    sobel_loss, ssim,
)
from ..splat.rasterize import RasterizeConfig, render_simple
from .distill import DistillConfig


def run_eval(
    key,
    decoder: GaussianDecoder,
    decoder_params,
    frozen_generator_params,
    vgg: VGG16LPIPS,
    vgg_params,
    irse: Optional[IRSE50] = None,
    irse_params=None,
    eval_steps: int = 100,
    cfg: DistillConfig = DistillConfig(),
    target_cfg: TargetSamplerConfig = TargetSamplerConfig(),
    raster_cfg: RasterizeConfig = RasterizeConfig(),
) -> Dict[str, float]:
    gen = decoder.generator
    bg = jnp.asarray(cfg.bg_color, jnp.float32)

    @jax.jit
    def eval_one(k, tcfg_iteration_unused=None, *, _tcfg=target_cfg):
        kz, kt = jax.random.split(k)
        z = jax.random.normal(kz, (1, gen.z_dim))
        t = sample_target(kt, gen, frozen_generator_params, z, cfg=_tcfg)
        decoded = decoder.apply(
            decoder_params, t.z, t.gan_camera_params, t.vertices, t.truncation
        )
        fov = t.fov_deg / 360.0 * 2 * jnp.pi
        cam = make_camera(cfg.image_size, fov, t.cam2world_pose[0])
        image = render_simple(cam, decoded, bg=bg, config=raster_cfg)["render"][:3]
        target_img = t.img[0]
        ssim_val, _ = ssim(image, target_img)
        return {
            "L1": l1_loss(image, target_img),
            "L2": l2_loss(image, target_img),
            "LPIPS": lpips_loss(vgg, vgg_params, target_img[None], image[None]),
            "DSSIM": 1.0 - ssim_val,
            "Sobel": sobel_loss(image, target_img)[0],
        }, (image, target_img)

    sums: Dict[str, float] = {}
    k_img, key = jax.random.split(key)
    for i in range(eval_steps):
        key, k = jax.random.split(key)
        metrics, _ = eval_one(k)
        for name, v in metrics.items():
            sums[name] = sums.get(name, 0.0) + float(v)
    out = {f"Metrics10k/{k}": v / max(eval_steps, 1) for k, v in sums.items()}

    # near-frontal identity loop (ref eval.py:64-96): fixed fov 10, narrow pose
    if irse is not None and irse_params is not None:
        frontal_cfg = replace(
            target_cfg,
            fov_offset=10.0, fov_offset_scale=0.0,
            horizontal_stddev=0.15, vertical_stddev=0.1,
            camera_sampling="normal",
        )

        @jax.jit
        def eval_id(k):
            kz, kt = jax.random.split(k)
            z = jax.random.normal(kz, (1, gen.z_dim))
            t = sample_target(kt, gen, frozen_generator_params, z, cfg=frontal_cfg)
            decoded = decoder.apply(
                decoder_params, t.z, t.gan_camera_params, t.vertices, t.truncation
            )
            fov = t.fov_deg / 360.0 * 2 * jnp.pi
            cam = make_camera(cfg.image_size, fov, t.cam2world_pose[0])
            image = render_simple(cam, decoded, bg=bg, config=raster_cfg)["render"][:3]
            return id_similarity(irse, irse_params, image[None], t.img[0][None]).mean()

        sim = 0.0
        for i in range(eval_steps):
            key, k = jax.random.split(key)
            sim += float(eval_id(k))
        out["Metrics10k/id"] = sim / max(eval_steps, 1)
    return out
