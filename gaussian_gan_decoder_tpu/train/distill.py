"""Distillation training: frozen GAN target -> decoder -> splat -> losses.

Re-design of the reference training loop
(/root/reference/main/train_pano2gaussian_decoder.py:210-307) as ONE jitted
step. Per step (matching ref :217-265):

  1. sample_target on the FROZEN generator (z, camera, truncation ramp,
     512^2 target image, 500k surface points)                      [no grad]
  2. decoder forward on the FINE-TUNABLE generator copy + heads
  3. splat-render through the differentiable rasterizer
  4. loss = 0.2*L1 + 0.1*L2 + 1.0*LPIPS + 0.5*DSSIM + 0.2*Sobel
     (+ 1.0*ID when the view is frontal and fov > 8)
  5. Adam step over heads (+ generator copy when use_gen_finetune)

The ID-loss gate (ref :243-251) is a lax.cond so the IR-SE50 forward is
skipped (not just masked) on non-frontal views.

TPU notes: the whole step is one XLA program — target synthesis, the 2.1M-
point sigma probe, marching tetrahedra, 500k-point decode and the tiled
rasterizer forward/backward fuse into a single launch; there is no
host<->device traffic inside the loop (the reference crosses to CPU every
step for marching cubes).
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..decoder.heads import GaussianDecoder
from ..decoder.target_pipeline import TargetSamplerConfig, sample_target
from ..gaussians.cameras import make_camera
from ..losses import (
    IRSE50,
    VGG16LPIPS,
    id_loss as id_loss_fn,
    l1_loss,
    l2_loss,
    lpips_loss,
    sobel_loss,
    ssim,
)
from ..ops import resize_bilinear
from ..splat.rasterize import RasterizeConfig, render_simple


@dataclass(frozen=True)
class DistillConfig:
    """CLI-parity knobs (ref train_pano2gaussian_decoder.py:29-65)."""

    lr: float = 9e-5
    l1_weight: float = 0.2
    l2_weight: float = 0.1
    lpips_weight: float = 1.0
    ssim_weight: float = 0.5
    sobel_weight: float = 0.2
    id_loss_weight: float = 1.0
    image_size: int = 512
    apply_mask_to_rendering: bool = False
    bg_color: Tuple[float, float, float] = (0.55717, 0.52256, 0.51045)
    id_cam_threshold: float = math.pi * 0.2
    id_min_fov: float = 8.0
    raster_backend: str = "xla"   # 'xla' (any platform) | 'pallas_diff'
    # (TPU: custom-VJP Pallas blend, ~2.8x faster rasterizer fwd+bwd)
    lpips_bf16: bool = False      # VGG16 feature convs in bf16 (MXU);
    # the distance itself stays f32 — measured knob, default off
    reuse_frozen_planes: bool = True  # use_gen_finetune=False only: decode
    # from the frozen target's feature planes instead of re-synthesising on
    # the (identical, masked-Adam-frozen) copy. Set False if params['G']
    # may have diverged from the frozen generator (e.g. a state carried
    # over from a fine-tuning phase).


class TrainState(NamedTuple):
    params: Any        # decoder params tree (heads + 'G' fine-tune copy)
    opt_state: Any
    step: jax.Array


def make_optimizer(decoder: GaussianDecoder, cfg: DistillConfig) -> optax.GradientTransformation:
    """Adam over get_params_custom's selection: heads always, generator copy
    only with use_gen_finetune (ref :213, sequential_decoder_reverse.py:89-99)."""
    tx = optax.adam(cfg.lr, b1=0.9, b2=0.999, eps=1e-8)
    if decoder.use_gen_finetune:
        return tx

    def mask_fn(params):
        return {k: (k != "G") for k in params}

    return optax.masked(tx, mask_fn)


def init_train_state(
    key, decoder: GaussianDecoder, generator_params, cfg: DistillConfig
) -> TrainState:
    # the fine-tune copy ('G') must OWN its buffers: the parallel train
    # step donates the state, which would otherwise delete the caller's
    # frozen generator params through the alias (ref deepcopies at
    # main/train_pano2gaussian_decoder.py:167 for the same reason)
    generator_params = jax.tree.map(jnp.copy, generator_params)
    params = decoder.init(key, generator_params=generator_params)
    tx = make_optimizer(decoder, cfg)
    return TrainState(params=params, opt_state=tx.init(params), step=jnp.zeros((), jnp.int32))


def make_loss_fn(
    decoder: GaussianDecoder,
    frozen_generator_params,
    vgg: VGG16LPIPS,
    vgg_params,
    irse: Optional[IRSE50],
    irse_params,
    cfg: DistillConfig = DistillConfig(),
    target_cfg: TargetSamplerConfig = TargetSamplerConfig(),
    raster_cfg: RasterizeConfig = RasterizeConfig(),
):
    """losses_and_metrics(params, key, z, iteration) -> (loss, (metrics, aux))."""
    gen = decoder.generator
    bg = jnp.asarray(cfg.bg_color, jnp.float32)
    # int8 brick quantization uses round() (zero gradient): the generator
    # fine-tune would silently receive no plane gradients. int8 is an
    # inference knob (flagship) / frozen-probe knob (int8_probe), never a
    # trainable-branch one.
    assert not (decoder.use_gen_finetune and decoder.int8_sampling), (
        "int8_sampling zeroes plane gradients; disable it or use_gen_finetune")

    def losses_and_metrics(params, key, z, iteration):
        k_target, k_misc = jax.random.split(key)
        target = sample_target(
            k_target, gen, frozen_generator_params, z,
            iteration=iteration, cfg=target_cfg,
        )

        if (cfg.reuse_frozen_planes and not decoder.use_gen_finetune
                and decoder.decoder_type != "sequential"):
            # the fine-tune copy's params are frozen (masked optimizer) and
            # identical to the frozen generator's, and the zero-camera
            # mapping convention matches the target pipeline's — so the
            # decode branch can REUSE the target's feature planes instead
            # of re-running mapping+synthesis on an identical network.
            # Removes a whole backbone forward AND its (masked-away)
            # backward from the step. 'sequential' (D4) maps with the REAL
            # camera (ref sequential_decoder.py:39), so its planes differ.
            decoded = decoder.decode_from_planes(
                params, target.feature_planes, target.vertices)
        else:
            decoded = decoder.apply(
                params, target.z, target.gan_camera_params, target.vertices,
                truncation_psi=target.truncation,
            )

        fov = target.fov_deg / 360.0 * 2 * jnp.pi
        cam = make_camera(cfg.image_size, fov, target.cam2world_pose[0])
        render_out = render_simple(cam, decoded, bg=bg, config=raster_cfg,
                                   backend=cfg.raster_backend)
        image = render_out["render"][:3]
        target_img = target.img[0]

        if cfg.apply_mask_to_rendering and target.img_mask is not None:
            scale = cfg.image_size // target.img_mask.shape[-1]
            mask = resize_bilinear(
                target.img_mask, cfg.image_size, cfg.image_size
            )[0]
            image = image * mask + 1 - mask
            target_img = target_img * mask + 1 - mask

        ll1 = l1_loss(image, target_img)
        ll2 = l2_loss(image, target_img)
        ssim_val, _ = ssim(image, target_img)
        lssim = 1.0 - ssim_val
        lsobel, _ = sobel_loss(image, target_img)
        llpips = lpips_loss(vgg, vgg_params, target_img[None], image[None],
                            dtype=jnp.bfloat16 if cfg.lpips_bf16 else None)

        loss = (
            ll1 * cfg.l1_weight
            + ll2 * cfg.l2_weight
            + llpips * cfg.lpips_weight
            + lssim * cfg.ssim_weight
            + lsobel * cfg.sobel_weight
        )

        lid = jnp.zeros(())
        if irse is not None and cfg.id_loss_weight > 0:
            frontal = (
                (jnp.abs(target.cam_h[0, 0] - jnp.pi / 2) < cfg.id_cam_threshold)
                & (jnp.abs(target.cam_v[0, 0] - jnp.pi / 2) < cfg.id_cam_threshold)
                & (target.fov_deg > cfg.id_min_fov)
            )
            lid = jax.lax.cond(
                frontal,
                lambda: id_loss_fn(irse, irse_params, image[None], target_img[None]).astype(loss.dtype),
                lambda: jnp.zeros((), loss.dtype),
            )
            loss = loss + lid * cfg.id_loss_weight

        metrics = {
            "Loss/L1": ll1,
            "Loss/L2": ll2,
            "Loss/LPIPS": llpips,
            "Loss/DSSIM": lssim,
            "Loss/Sobel": lsobel,
            "Loss/id": lid,
            "Loss/total": loss,
            "General/truncation": target.truncation,
            "General/n_dropped": render_out["n_dropped"],
        }
        aux = {"image": image, "target": target_img}
        return loss, (metrics, aux)

    return losses_and_metrics


def make_train_step(
    decoder: GaussianDecoder,
    frozen_generator_params,
    vgg: VGG16LPIPS,
    vgg_params,
    irse: Optional[IRSE50],
    irse_params,
    cfg: DistillConfig = DistillConfig(),
    target_cfg: TargetSamplerConfig = TargetSamplerConfig(),
    raster_cfg: RasterizeConfig = RasterizeConfig(),
):
    """Returns jittable step(state, key, z, iteration) -> (state, metrics, aux)."""
    tx = make_optimizer(decoder, cfg)
    losses_and_metrics = make_loss_fn(
        decoder, frozen_generator_params, vgg, vgg_params, irse, irse_params,
        cfg, target_cfg, raster_cfg,
    )

    def step(state: TrainState, key, z, iteration):
        (loss, (metrics, aux)), grads = jax.value_and_grad(
            losses_and_metrics, has_aux=True
        )(state.params, key, z, iteration)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(new_params, new_opt, state.step + 1)
        return new_state, metrics, aux

    return step
