"""Decoder evaluation harness.

Re-design of /root/reference/main/eval.py:13-106 (`run_eval`): two no-grad
loops over fresh samples —
  1. `eval_steps` random-camera samples scoring L1/L2/LPIPS/DSSIM/Sobel,
  2. `eval_steps` near-frontal fov=10 samples scoring ID similarity
     (horizontal/vertical stddev 0.15/0.1 pi, ref eval.py:64-76),
logging `Metrics10k/{L1,L2,LPIPS,DSSIM,Sobel,id}` means.

Both loops are folded into ONE jitted step (the reference runs them
sequentially; the metrics are independent means either way) and the jit is
cached across run_eval invocations keyed on the static configs — the
reference re-traces nothing because torch is eager, but a per-invocation
jax.jit closure recompiled the whole eval program at every eval interval.

Reference defect NOT replicated (SURVEY §"known defects"): the reference's
first loop logs raw `ssim` under the name DSSIM (eval.py:50); here DSSIM
is 1 - ssim, consistent with training.
"""
from __future__ import annotations

import functools
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


@functools.lru_cache(maxsize=4)
def _make_eval_step(decoder, vgg, irse, cfg, target_cfg, raster_cfg,
                    n_vertices):
    """ONE jitted eval step: random-camera losses + (optional) frontal ID.

    All args are hashable statics (frozen dataclasses / ints); params flow
    in at call time so the compiled program is reused across invocations.
    """
    gen = decoder.generator
    bg = jnp.asarray(cfg.bg_color, jnp.float32)
    frontal_cfg = replace(
        target_cfg,
        fov_offset=10.0, fov_offset_scale=0.0,
        horizontal_stddev=0.15, vertical_stddev=0.1,
        camera_sampling="normal",
    )

    def render_one(k, tcfg, decoder_params, frozen_generator_params):
        kz, kt = jax.random.split(k)
        z = jax.random.normal(kz, (1, gen.z_dim))
        t = sample_target(kt, gen, frozen_generator_params, z, cfg=tcfg)
        decoded = decoder.apply(
            decoder_params, t.z, t.gan_camera_params, t.vertices, t.truncation
        )
        fov = t.fov_deg / 360.0 * 2 * jnp.pi
        cam = make_camera(cfg.image_size, fov, t.cam2world_pose[0])
        image = render_simple(cam, decoded, bg=bg, config=raster_cfg)["render"][:3]
        return image, t.img[0]

    @jax.jit
    def eval_step(k, decoder_params, frozen_generator_params, vgg_params,
                  irse_params):
        k1, k2 = jax.random.split(k)
        image, target_img = render_one(
            k1, target_cfg, decoder_params, frozen_generator_params)
        ssim_val, _ = ssim(image, target_img)
        metrics = {
            "L1": l1_loss(image, target_img),
            "L2": l2_loss(image, target_img),
            "LPIPS": lpips_loss(vgg, vgg_params, target_img[None], image[None]),
            "DSSIM": 1.0 - ssim_val,
            "Sobel": sobel_loss(image, target_img)[0],
        }
        if irse is not None:
            # near-frontal identity sample (ref eval.py:64-96)
            fimg, ftgt = render_one(
                k2, frontal_cfg, decoder_params, frozen_generator_params)
            metrics["id"] = id_similarity(
                irse, irse_params, fimg[None], ftgt[None]).mean()
        return metrics

    return eval_step


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
    if eval_steps <= 0:
        return {}
    use_id = irse is not None and irse_params is not None
    eval_step = _make_eval_step(
        decoder, vgg, irse if use_id else None, cfg, target_cfg, raster_cfg,
        0)

    sums: Dict[str, float] = {}
    for _ in range(eval_steps):
        key, k = jax.random.split(key)
        metrics = eval_step(k, decoder_params, frozen_generator_params,
                            vgg_params, irse_params if use_id else None)
        for name, v in metrics.items():
            sums[name] = sums.get(name, 0.0) + float(v)
    return {f"Metrics10k/{k}": v / eval_steps for k, v in sums.items()}
