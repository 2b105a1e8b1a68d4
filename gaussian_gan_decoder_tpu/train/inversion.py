"""GAN inversion (PTI): W-space projection + generator fine-tuning.

Re-design of /root/reference/PanoHead/projector_withseg.py:
  :47-184 project — optimize w from w_avg with LPIPS(VGG)+MSE, cosine lr
      ramp-up/ramp-down, decaying w-space exploration noise, self-adaptive
      camera offset (t_mapping) folded into c once up front;
  :186-260 project_pti — freeze the pivot w, Adam over ALL generator
      params.

Both loops are single jitted steps scanned on device; the schedules are
closed-form functions of the step index.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..decoder.camera_sampling import sample_pose_lookat
from ..losses import VGG16LPIPS
from ..losses.image import area_downsample
from ..models.triplane import TriPlaneGenerator


@dataclass(frozen=True)
class ProjectConfig:
    num_steps: int = 1000
    w_avg_samples: int = 10_000
    initial_learning_rate: float = 0.1
    initial_noise_factor: float = 0.05
    lr_rampdown_length: float = 0.25
    lr_rampup_length: float = 0.05
    noise_ramp_length: float = 0.75
    mse_weight: float = 0.1
    pti_learning_rate: float = 3e-4
    pti_steps: int = 1000
    neural_rendering_resolution: int = 64


def _lr_schedule(step, cfg: ProjectConfig):
    """(ref projector_withseg.py:122-129)"""
    # f32 throughout: an int64 `step` (x64 mode) would otherwise promote
    # the lr and then the whole Adam state to f64 mid-scan
    t = jnp.float32(step) / cfg.num_steps
    ramp = jnp.minimum(1.0, (1.0 - t) / cfg.lr_rampdown_length)
    ramp = 0.5 - 0.5 * jnp.cos(ramp * jnp.pi)
    ramp = ramp * jnp.minimum(1.0, t / cfg.lr_rampup_length)
    return (cfg.initial_learning_rate * ramp).astype(jnp.float32)


def compute_w_stats(gen: TriPlaneGenerator, gen_params, key, n_samples: int = 10_000):
    """w_avg / w_std over frontal-camera mappings (ref :73-82)."""
    z = jax.random.normal(key, (n_samples, gen.z_dim))
    pose, _, _ = sample_pose_lookat(key, jnp.pi / 2, jnp.pi / 2, radius=2.7)
    intr = jnp.asarray([[4.2647, 0, 0.5], [0, 4.2647, 0.5], [0, 0, 1]], jnp.float32)
    c = jnp.concatenate([pose.reshape(1, 16), intr.reshape(1, 9)], axis=1)
    c = jnp.broadcast_to(c, (n_samples, 25))

    def chunk_map(zc):
        cc = jnp.broadcast_to(c[:1], (zc.shape[0], 25))
        return gen.mapping(gen_params, zc, cc)[:, :1, :]

    ws = jax.lax.map(chunk_map, z.reshape(-1, 500, gen.z_dim)).reshape(n_samples, 1, -1)
    w_avg = jnp.mean(ws, axis=0, keepdims=True)          # (1, 1, C)
    w_std = jnp.sqrt(jnp.sum(jnp.square(ws - w_avg)) / n_samples)
    return w_avg, w_std


def _render(gen, gen_params, ws, c, key, nrr=64):
    out = gen.synthesis(gen_params, ws, c, key=key, noise_mode="const",
                        neural_rendering_resolution=nrr)
    return out["image"] if "image" in out else out["image_raw"]


def _perc_features(vgg, vgg_params, img_minus1_1):
    """LPIPS embedding of [-1,1] images at <=256^2 (ref :101-105)."""
    x = (img_minus1_1 + 1) * (255.0 / 2)
    if x.shape[-1] > 256:
        x = area_downsample(x, 256)
    return vgg.embed(vgg_params, x)


def project(
    gen: TriPlaneGenerator,
    gen_params,
    target_image: jax.Array,      # (C, H, W) in [0, 255]
    c: jax.Array,                 # (1, 25)
    vgg: VGG16LPIPS,
    vgg_params,
    key,
    cfg: ProjectConfig = ProjectConfig(),
) -> Tuple[jax.Array, jax.Array]:
    """-> (w_pivot (1, num_ws, w_dim), c_adjusted). Stage 1 of PTI."""
    k_stats, k_loop = jax.random.split(key)
    w_avg, w_std = compute_w_stats(gen, gen_params, k_stats, cfg.w_avg_samples)

    # fold the self-adaptive camera offset into c once (ref :86-91)
    if gen.variant == "panohead":
        z_mean = jnp.zeros((1, gen.z_dim))
        c, _ = gen.apply_delta_c(gen_params, z_mean, c)

    target = target_image[None].astype(jnp.float32) / 255.0 * 2 - 1
    target_feat = _perc_features(vgg, vgg_params, target)

    num_ws = gen.num_ws
    w0 = jnp.broadcast_to(w_avg, (1, num_ws, w_avg.shape[-1]))

    opt = optax.adam(1.0, b1=0.9, b2=0.999)  # lr applied via schedule scaling
    opt_state = opt.init(w0)

    def loss_fn(w, k, step):
        t = step / cfg.num_steps
        w_noise_scale = (
            w_std * cfg.initial_noise_factor
            * jnp.maximum(0.0, 1.0 - t / cfg.noise_ramp_length) ** 2
        )
        ws = w + jax.random.normal(k, w.shape) * w_noise_scale
        img = _render(gen, gen_params, ws, c, k, cfg.neural_rendering_resolution)
        feat = _perc_features(vgg, vgg_params, img)
        perc = jnp.sum(jnp.square(feat - target_feat))
        tgt = target if img.shape == target.shape else jax.image.resize(
            target, img.shape, "linear"
        )
        mse = jnp.mean(jnp.square(img - tgt))
        return perc + cfg.mse_weight * mse

    def step_fn(carry, step):
        w, opt_state = carry
        k = jax.random.fold_in(k_loop, step)
        loss, grads = jax.value_and_grad(loss_fn)(w, k, step)
        lr = _lr_schedule(step, cfg)
        updates, opt_state = opt.update(jax.tree.map(lambda g: g * lr, grads), opt_state, w)
        w = optax.apply_updates(w, updates)
        return (w, opt_state), loss

    (w, _), losses = jax.lax.scan(
        step_fn, (w0, opt_state), jnp.arange(cfg.num_steps)
    )
    return w, c


def project_pti(
    gen: TriPlaneGenerator,
    gen_params,
    w_pivot: jax.Array,
    target_image: jax.Array,   # (C, H, W) in [0, 255]
    c: jax.Array,
    vgg: VGG16LPIPS,
    vgg_params,
    key,
    cfg: ProjectConfig = ProjectConfig(),
):
    """Stage 2: fine-tune generator params at the frozen pivot (ref :186-260)."""
    target = target_image[None].astype(jnp.float32) / 255.0 * 2 - 1
    target_feat = _perc_features(vgg, vgg_params, target)
    opt = optax.adam(cfg.pti_learning_rate)
    opt_state = opt.init(gen_params)

    def loss_fn(params, k):
        img = _render(gen, params, w_pivot, c, k, cfg.neural_rendering_resolution)
        feat = _perc_features(vgg, vgg_params, img)
        perc = jnp.sum(jnp.square(feat - target_feat))
        tgt = target if img.shape == target.shape else jax.image.resize(
            target, img.shape, "linear"
        )
        mse = jnp.mean(jnp.square(img - tgt))
        return perc + cfg.mse_weight * mse

    def step_fn(carry, step):
        params, opt_state = carry
        k = jax.random.fold_in(key, step)
        loss, grads = jax.value_and_grad(loss_fn)(params, k)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss

    (params, _), losses = jax.lax.scan(
        step_fn, (gen_params, opt_state), jnp.arange(cfg.pti_steps)
    )
    return params, losses
