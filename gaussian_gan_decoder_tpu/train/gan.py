"""3D-GAN adversarial training (PanoHead/EG3D style), TPU-native.

Functional re-design of
  /root/reference/PanoHead/training/loss.py:23-319 (StyleGAN2Loss: G/D
  phases, dual discrimination, generator-pose-conditioning swap, camera
  trans regularisation, density TV regularisation, lazy R1 with optional
  segmentation R1) and
  /root/reference/PanoHead/training/training_loop.py:90-495 (phase loop,
  EMA, grad accumulation, DP all_reduce).

Design deltas (TPU-first):
  * one jitted `gan_train_step` per (G-phase, D-phase) pair instead of
    Python phase objects; lazy regularisation via `lax.cond` on the step
    counter (reg folded into the same program — XLA skips the dead branch
    at runtime);
  * R1 uses JAX forward-over-reverse autodiff — no conv2d_gradfix needed
    (the reference's N6 exists only because torch's cudnn convs lack
    composable double-backward);
  * DP = pjit sharding of the batch axis (see parallel/mesh.py), EMA is a
    pure tree lerp;
  * the reference's manual flattened-grad all_reduce / param broadcast /
    ddp-consistency checks vanish by construction.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ..models.discriminator import Discriminator, filtered_resizing
from ..models.triplane import TriPlaneGenerator


@dataclass(frozen=True)
class GANLossConfig:
    r1_gamma: float = 10.0
    r1_gamma_seg: float = 1000.0
    trans_reg: float = 10.0
    density_reg: float = 0.25
    density_reg_p_dist: float = 0.004
    reg_type: str = "l1"                 # 'l1' | 'monotonic-detach' | 'monotonic-fix'
    blur_init_sigma: float = 0.0
    blur_fade_kimg: float = 0.0
    gpc_reg_prob: Optional[float] = 0.5
    gpc_reg_fade_kimg: float = 1000.0
    style_mixing_prob: float = 0.0
    neural_rendering_resolution_initial: int = 64
    neural_rendering_resolution_final: Optional[int] = None
    neural_rendering_resolution_fade_kimg: float = 0.0
    dual_discrimination: bool = True
    filter_mode: str = "antialiased"
    g_reg_interval: int = 4
    d_reg_interval: int = 16
    g_lr: float = 0.0025
    d_lr: float = 0.002
    ema_kimg: float = 10.0
    ema_rampup: Optional[float] = 0.05
    batch_size: int = 4


class GANTrainState(NamedTuple):
    g_params: Any
    d_params: Any
    g_ema: Any
    g_opt: Any
    d_opt: Any
    step: jax.Array
    cur_nimg: jax.Array


def _adam(lr, reg_interval):
    """Lazy-reg LR/beta adjustment (ref train.py launcher convention:
    mb_ratio = interval / (interval + 1))."""
    ratio = reg_interval / (reg_interval + 1)
    return optax.adam(lr * ratio, b1=0.0 ** ratio, b2=0.99 ** ratio, eps=1e-8)


def swap_conditioning(key, c, swapping_prob):
    """Generator pose-conditioning swap (ref loss.py:57-62)."""
    c_swapped = jnp.roll(c, 1, axis=0)
    take = jax.random.uniform(key, (c.shape[0], 1)) < swapping_prob
    return jnp.where(take, c_swapped, c)


def blur_image(img, blur_sigma, max_blur_size: int = 12):
    """Gaussian blur with fading sigma (ref loss.py:82-87) — static taps,
    zero-weight when faded out."""
    if max_blur_size <= 0:
        return img
    r = jnp.arange(-max_blur_size, max_blur_size + 1, dtype=jnp.float32)
    sigma = jnp.maximum(blur_sigma, 1e-8)
    f = jnp.exp2(-jnp.square(r / sigma))
    size_mask = jnp.abs(r) <= jnp.floor(blur_sigma * 3)
    f = jnp.where(size_mask, f, 0.0)
    f = f / jnp.sum(f)
    # depthwise separable blur
    import jax.lax as lax

    c = img.shape[1]
    k = f.reshape(1, 1, -1, 1)
    w = jnp.broadcast_to(k, (c, 1, 2 * max_blur_size + 1, 1))
    pad = max_blur_size
    img = lax.conv_general_dilated(
        img, w, (1, 1), ((pad, pad), (0, 0)), feature_group_count=c,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    img = lax.conv_general_dilated(
        img, jnp.swapaxes(w, 2, 3), (1, 1), ((0, 0), (pad, pad)),
        feature_group_count=c,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return img


def make_gan_train_step(
    G: TriPlaneGenerator,
    D: Discriminator,
    cfg: GANLossConfig = GANLossConfig(),
    augment_fn=None,   # (key, img_dict) -> img_dict  (ADA pipe)
):
    g_tx = _adam(cfg.g_lr, cfg.g_reg_interval)
    d_tx = _adam(cfg.d_lr, cfg.d_reg_interval)

    # -- neural-rendering-resolution fade INSIDE the jitted step --------------
    # (ref loss.py:93-98 + training_loop.py fade kimg). The reference
    # recomputes an int nrr per step on the host — under jit that is a
    # recompile per distinct value. TPU-native form: quantize the fade to
    # multiples of 8 and lax.switch over the (static-shape) levels; the
    # raw/depth/mask outputs are resized to the FINAL level inside each
    # branch so every branch returns identical shapes. One compiled
    # program covers the whole fade; D's own filtered_resizing to fixed
    # sizes (models/discriminator.py:274-278) is unchanged.
    nrr_init = cfg.neural_rendering_resolution_initial
    nrr_final = cfg.neural_rendering_resolution_final
    fading = (
        nrr_final is not None
        and nrr_final != nrr_init
        and cfg.neural_rendering_resolution_fade_kimg > 0
    )
    if fading:
        lo, hi = sorted((nrr_init, nrr_final))
        nrr_levels = tuple(range(lo, hi, 8)) + (hi,)
        if nrr_init > nrr_final:
            nrr_levels = tuple(reversed(nrr_levels))
    else:
        nrr_levels = (nrr_init,)

    def nrr_level_index(cur_nimg):
        """Traced index into nrr_levels for the reference's rint fade."""
        if not fading:
            return jnp.zeros((), jnp.int32)
        alpha = jnp.minimum(
            cur_nimg / (cfg.neural_rendering_resolution_fade_kimg * 1e3), 1.0
        )
        nrr_t = jnp.round(nrr_init + (nrr_final - nrr_init) * alpha)
        levels = jnp.asarray(nrr_levels, jnp.float32)
        return jnp.argmin(jnp.abs(levels - nrr_t)).astype(jnp.int32)

    def run_G(g_params, key, z, c, swapping_prob, nrr_idx):
        k_swap, k_render = jax.random.split(key)
        c_cond = swap_conditioning(k_swap, c, swapping_prob)
        ws = G.mapping(g_params, z, c_cond)
        if G.variant == "panohead":
            c_new, delta_c = G.apply_delta_c(g_params, z, c)
        else:
            c_new, delta_c = c, jnp.zeros((c.shape[0], 3))

        out_res = max(nrr_levels)

        def synth_at(nrr):
            def branch():
                out = G.synthesis(g_params, ws, c_new,
                                  neural_rendering_resolution=nrr,
                                  key=k_render)
                out = dict(out)
                out.pop("feature_planes", None)
                if nrr != out_res:
                    for k in ("image_raw", "image_depth", "image_mask"):
                        if k in out:
                            out[k] = filtered_resizing(
                                out[k], out_res, cfg.filter_mode
                            )
                if "image" not in out:  # without_sr: raw == final (alias
                    # AFTER the resize so every branch agrees on shape)
                    out["image"] = out["image_raw"]
                return out

            return branch

        if len(nrr_levels) == 1:
            out = synth_at(nrr_levels[0])()
        else:
            out = jax.lax.switch(nrr_idx, [synth_at(n) for n in nrr_levels])
        return out, ws, delta_c

    def run_D(d_params, key, img, c, blur_sigma):
        if cfg.blur_fade_kimg > 0:
            img = dict(img)
            img["image"] = blur_image(img["image"], blur_sigma)
        if augment_fn is not None:
            k_aug, key = jax.random.split(key)
            img = augment_fn(k_aug, img)
        return D.apply(d_params, img, c, noise_key=key)

    def schedules(cur_nimg):
        blur_sigma = (
            jnp.maximum(1 - cur_nimg / (cfg.blur_fade_kimg * 1e3), 0) * cfg.blur_init_sigma
            if cfg.blur_fade_kimg > 0 else jnp.asarray(0.0)
        )
        if cfg.gpc_reg_prob is not None:
            alpha = (
                jnp.minimum(cur_nimg / (cfg.gpc_reg_fade_kimg * 1e3), 1.0)
                if cfg.gpc_reg_fade_kimg > 0 else 1.0
            )
            swapping_prob = (1 - alpha) * 1.0 + alpha * cfg.gpc_reg_prob
        else:
            swapping_prob = 0.0
        return blur_sigma, swapping_prob

    def g_loss_fn(g_params, d_params, key, z, c, cur_nimg, do_reg):
        blur_sigma, swapping_prob = schedules(cur_nimg)
        nrr_idx = nrr_level_index(cur_nimg)
        k_g, k_d, k_reg = jax.random.split(key, 3)
        gen_img, ws, delta_c = run_G(g_params, k_g, z, c, swapping_prob, nrr_idx)
        gen_logits = run_D(d_params, k_d, gen_img, c, blur_sigma)
        loss_g = jnp.mean(jax.nn.softplus(-gen_logits))
        metrics = {"Loss/G/loss": loss_g, "Loss/scores/fake": jnp.mean(gen_logits),
                   "Progress/nrr": jnp.asarray(nrr_levels, jnp.float32)[nrr_idx]}

        if G.variant == "panohead" and cfg.trans_reg > 0:
            loss_trans = jnp.sum(jnp.square(jnp.mean(delta_c, axis=0))) * cfg.trans_reg
            loss_g = loss_g + loss_trans
            metrics["Loss/G/trans_reg_loss"] = loss_trans

        # density TV regularisation (ref loss.py:148-180, reg_type l1):
        # sigma at random points vs sigma at perturbed points, L1
        def density_reg():
            n_pts = 1000
            k1, k2, k3 = jax.random.split(k_reg, 3)
            pts = (jax.random.uniform(k1, (z.shape[0], n_pts, 3)) * 2 - 1) \
                * (G.rk["box_warp"] / 2)
            perturbed = pts + jax.random.normal(k2, pts.shape) * cfg.density_reg_p_dist
            coords = jnp.concatenate([pts, perturbed], axis=1)
            ws_reg = G.mapping(g_params, z, swap_conditioning(k3, c, swapping_prob))
            sigma = G.sample_mixed(g_params, coords, jnp.zeros_like(coords), ws_reg)["sigma"]
            s1, s2 = sigma[:, :n_pts], sigma[:, n_pts:]
            return jnp.mean(jnp.abs(s2 - s1)) * cfg.density_reg

        if cfg.density_reg > 0:
            loss_reg = jax.lax.cond(
                do_reg,
                lambda: density_reg().astype(jnp.float32),
                lambda: jnp.zeros((), jnp.float32),
            )
            loss_g = loss_g + loss_reg * cfg.g_reg_interval
            metrics["Loss/G/reg"] = loss_reg
        return loss_g, metrics

    def d_loss_fn(d_params, g_params, key, z, c, real_img, real_c, cur_nimg, do_reg):
        blur_sigma, swapping_prob = schedules(cur_nimg)
        nrr_idx = nrr_level_index(cur_nimg)
        k_g, k_d1, k_d2, k_r1 = jax.random.split(key, 4)
        gen_img, _, _ = run_G(g_params, k_g, z, c, swapping_prob, nrr_idx)
        gen_img = jax.lax.stop_gradient(gen_img)
        if fading and "image_raw" in real_img:
            # ref training_loop: the real dual-discrimination raw is the
            # real image downsampled to the CURRENT nrr; resize back up to
            # the branch-common resolution to keep one program
            out_res = max(nrr_levels)

            def real_raw_at(n):
                return lambda: filtered_resizing(
                    filtered_resizing(real_img["image"], n, cfg.filter_mode),
                    out_res, cfg.filter_mode,
                )

            real_img = dict(real_img)
            real_img["image_raw"] = jax.lax.switch(
                nrr_idx, [real_raw_at(n) for n in nrr_levels]
            )
        gen_logits = run_D(d_params, k_d1, gen_img, c, blur_sigma)
        loss_fake = jnp.mean(jax.nn.softplus(gen_logits))

        real_logits = run_D(d_params, k_d2, real_img, real_c, blur_sigma)
        loss_real = jnp.mean(jax.nn.softplus(-real_logits))
        metrics = {
            "Loss/D/loss": loss_fake + loss_real,
            "Loss/scores/real": jnp.mean(real_logits),
        }

        # lazy R1 on image (+raw, +seg) (ref loss.py:276-303)
        def r1():
            def d_sum(image, image_raw, image_mask):
                img2 = dict(real_img)
                img2["image"] = image
                if image_raw is not None:
                    img2["image_raw"] = image_raw
                if image_mask is not None:
                    img2["image_mask"] = image_mask
                return jnp.sum(run_D(d_params, k_r1, img2, real_c, blur_sigma))

            args = [real_img["image"],
                    real_img.get("image_raw") if cfg.dual_discrimination else None,
                    real_img.get("image_mask") if D.mode == "mask_dual" else None]
            argnums = tuple(i for i, a in enumerate(args) if a is not None)
            grads = jax.grad(d_sum, argnums=argnums)(*args)
            grads = list(grads)
            pen = 0.0
            # image (+ raw) share r1_gamma; seg uses r1_gamma_seg
            gi = grads.pop(0)
            pen += jnp.mean(jnp.sum(jnp.square(gi), axis=(1, 2, 3))) * (cfg.r1_gamma / 2)
            if cfg.dual_discrimination and len(grads) > 0:
                gr = grads.pop(0)
                pen += jnp.mean(jnp.sum(jnp.square(gr), axis=(1, 2, 3))) * (cfg.r1_gamma / 2)
            if D.mode == "mask_dual" and len(grads) > 0:
                gs = grads.pop(0)
                pen += jnp.mean(jnp.sum(jnp.square(gs), axis=(1, 2, 3))) * (cfg.r1_gamma_seg / 2)
            return pen

        if cfg.r1_gamma > 0:
            loss_r1 = jax.lax.cond(
                do_reg,
                lambda: r1().astype(jnp.float32),
                lambda: jnp.zeros((), jnp.float32),
            )
            metrics["Loss/r1_penalty"] = loss_r1
            return loss_fake + loss_real + loss_r1 * cfg.d_reg_interval, metrics
        return loss_fake + loss_real, metrics

    def step(state: GANTrainState, key, z, c, real_img_dict, real_c):
        k_g, k_d = jax.random.split(key)
        do_g_reg = (state.step % cfg.g_reg_interval) == 0
        do_d_reg = (state.step % cfg.d_reg_interval) == 0

        (g_loss, g_metrics), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
            state.g_params, state.d_params, k_g, z, c, state.cur_nimg, do_g_reg
        )
        g_updates, g_opt = g_tx.update(g_grads, state.g_opt, state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)

        (d_loss, d_metrics), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
            state.d_params, g_params, k_d, z, c, real_img_dict, real_c,
            state.cur_nimg, do_d_reg,
        )
        d_updates, d_opt = d_tx.update(d_grads, state.d_opt, state.d_params)
        d_params = optax.apply_updates(state.d_params, d_updates)

        # EMA (ref training_loop.py:303-315)
        cur_nimg = state.cur_nimg + cfg.batch_size
        ema_nimg = cfg.ema_kimg * 1000.0
        if cfg.ema_rampup is not None:
            ema_nimg = jnp.minimum(ema_nimg, cur_nimg * cfg.ema_rampup)
        beta = 0.5 ** (cfg.batch_size / jnp.maximum(ema_nimg, 1e-8))
        g_ema = jax.tree.map(
            lambda e, p: p + (e - p) * beta, state.g_ema, g_params
        )

        metrics = {**g_metrics, **d_metrics}
        new_state = GANTrainState(
            g_params, d_params, g_ema, g_opt, d_opt,
            state.step + 1, cur_nimg,
        )
        return new_state, metrics

    return step, (g_tx, d_tx)


def init_gan_state(key, G: TriPlaneGenerator, D: Discriminator, cfg: GANLossConfig):
    kg, kd = jax.random.split(key)
    g_params = G.init(kg)
    d_params = D.init(kd)
    g_tx = _adam(cfg.g_lr, cfg.g_reg_interval)
    d_tx = _adam(cfg.d_lr, cfg.d_reg_interval)
    return GANTrainState(
        g_params=g_params,
        d_params=d_params,
        g_ema=jax.tree.map(jnp.copy, g_params),
        g_opt=g_tx.init(g_params),
        d_opt=d_tx.init(d_params),
        step=jnp.zeros((), jnp.int32),
        cur_nimg=jnp.zeros((), jnp.float32),
    )
