"""ADA augmentation pipeline, TPU-native.

Re-design of /root/reference/PanoHead/training/augment.py:124-565
(AugmentPipe): the same augmentation categories with the same default
probability multipliers —

  pixel blitting:  xflip, rotate90, xint (integer translation)
  geometric:       scale, rotate, aniso, xfrac — composed into ONE inverse
                   affine and applied with a single bilinear grid-sample
  color:           brightness, contrast, lumaflip, hue, saturation —
                   composed into ONE 4x4 color matrix
  filtering:       imgfilter — per-sample random amplification of 4 dyadic
                   sym2 wavelet frequency bands (ref augment.py:176-186,
                   382-410), applied as a separable depthwise conv
  corruption:      additive gaussian noise, cutout

plus the adaptive-p heuristic (`ada_update`, ref training_loop.py:316-325).

Geometric warps come in two execution modes:

  * alias_free=False (default): plain bilinear resample with zeros
    padding — same augmentation distribution, cheaper, non-alias-free
    (acceptable for the D-input corruption role).
  * alias_free=True: the reference's strictly alias-free execution
    (augment.py:212-320) — reflect padding, 2x sym6-wavelet upsampling,
    bilinear warp at 2x, wavelet downsample + crop. One deviation forced
    by XLA static shapes: the reference computes a per-sample reflect
    margin from the transformed corners (clamped to width-1); here the
    margin is STATIC (alias_free_margin, default the same width-1
    clamp), which reproduces the reference exactly — a larger reflect
    pad changes nothing for samples whose support the reference's
    margin already contained, and the clamp case coincides.
"""
from __future__ import annotations

import functools
import math
from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import grid_sample_2d


@dataclass(frozen=True)
class AugmentConfig:
    # probability multipliers (ref augment.py:129-151 defaults)
    xflip: float = 1.0
    rotate90: float = 1.0
    xint: float = 1.0
    xint_max: float = 0.125
    scale: float = 1.0
    rotate: float = 1.0
    aniso: float = 1.0
    xfrac: float = 1.0
    scale_std: float = 0.2
    rotate_max: float = 1.0
    aniso_std: float = 0.2
    xfrac_std: float = 0.125
    brightness: float = 1.0
    contrast: float = 1.0
    lumaflip: float = 1.0
    hue: float = 1.0
    saturation: float = 1.0
    brightness_std: float = 0.2
    contrast_std: float = 0.5
    hue_max: float = 1.0
    saturation_std: float = 1.0
    imgfilter: float = 0.0
    imgfilter_bands: Tuple[float, ...] = (1.0, 1.0, 1.0, 1.0)
    imgfilter_std: float = 1.0
    noise: float = 0.0
    cutout: float = 0.0
    noise_std: float = 0.1
    cutout_size: float = 0.5
    alias_free: bool = False   # reference-exact wavelet-filtered warps
    # (see module docstring); ~9x the warp pixels at the default margin
    alias_free_margin: int = 0  # static reflect margin per side; 0 = the
    # reference's width-1 clamp (exact); smaller trades tail-transform
    # reflect coverage for memory


# sym6 wavelet (standard symlet-6 coefficients, ref augment.py:42):
# the orthogonal lowpass for the alias-free geometric warp (Hz_geom)
_SYM6 = (0.015404109327027373, 0.0034907120842174702, -0.11799011114819057,
         -0.048311742585633, 0.4910559419267466, 0.787641141030194,
         0.3379294217276218, -0.07263752278646252, -0.021060292512300564,
         0.04472490177066578, 0.0017677118642428036, -0.007800708325034148)


# sym2 wavelet (ref augment.py:38); the 4-band filter bank below follows
# ref augment.py:176-186: band 0 = iterated lowpass, band i = lowpass^(i-1)
# then highpass, dyadically upsampled — a perfect-reconstruction split
# (the rows sum to a unit impulse).
_SYM2 = (-0.12940952255092145, 0.22414386804185735,
         0.836516303737469, 0.48296291314469025)


@functools.lru_cache(maxsize=1)
def imgfilter_bank() -> np.ndarray:
    """-> (4, taps) frequency band filters (ref Hz_fbank buffer)."""
    hz_lo = np.asarray(_SYM2)
    hz_hi = hz_lo * ((-1.0) ** np.arange(hz_lo.size))
    hz_lo2 = np.convolve(hz_lo, hz_lo[::-1]) / 2
    hz_hi2 = np.convolve(hz_hi, hz_hi[::-1]) / 2
    fbank = np.eye(4, 1)
    for i in range(1, fbank.shape[0]):
        # dyadic upsample of every row, then per-row full convolution
        # with hz_lo2 (≙ scipy.signal.convolve(fbank, [hz_lo2]))
        fbank = np.dstack([fbank, np.zeros_like(fbank)]).reshape(
            fbank.shape[0], -1)[:, :-1]
        fbank = np.stack([np.convolve(row, hz_lo2) for row in fbank])
        lo = (fbank.shape[1] - hz_hi2.size) // 2
        fbank[i, lo:lo + hz_hi2.size] += hz_hi2
    return fbank.astype(np.float32)


def apply_imgfilter(images: jax.Array, g: jax.Array) -> jax.Array:
    """Amplify frequency bands with per-sample gains g (N, 4): separable
    per-sample depthwise conv with reflect padding (ref augment.py:399-410)."""
    n, c, h, w = images.shape
    fbank = jnp.asarray(imgfilter_bank())
    hz = g @ fbank                                   # (N, taps)
    taps = fbank.shape[1]
    pd = taps // 2
    f = jnp.repeat(hz, c, axis=0)                    # (N*C, taps), batch-major
    x = images.reshape(1, n * c, h, w)
    x = jnp.pad(x, ((0, 0), (0, 0), (pd, pd), (pd, pd)), mode="reflect")
    dn = ("NCHW", "OIHW", "NCHW")
    x = jax.lax.conv_general_dilated(
        x, f.reshape(n * c, 1, 1, taps), (1, 1), "VALID",
        feature_group_count=n * c, dimension_numbers=dn)
    x = jax.lax.conv_general_dilated(
        x, f.reshape(n * c, 1, taps, 1), (1, 1), "VALID",
        feature_group_count=n * c, dimension_numbers=dn)
    return x.reshape(n, c, h, w)


def _rot2(theta):
    c, s = jnp.cos(theta), jnp.sin(theta)
    z = jnp.zeros_like(theta)
    o = jnp.ones_like(theta)
    return jnp.stack(
        [jnp.stack([c, -s, z], -1), jnp.stack([s, c, z], -1), jnp.stack([z, z, o], -1)],
        -2,
    )


def _affine(sx, sy, tx, ty):
    z = jnp.zeros_like(sx)
    o = jnp.ones_like(sx)
    return jnp.stack(
        [jnp.stack([sx, z, tx], -1), jnp.stack([z, sy, ty], -1), jnp.stack([z, z, o], -1)],
        -2,
    )


def _warp_affine_alias_free(images: jax.Array, G_ndc: jax.Array,
                            margin: int = 0) -> jax.Array:
    """Reference-exact alias-free affine warp (ref augment.py:275-312):
    reflect pad -> 2x sym6 upsample -> bilinear warp at 2x -> sym6
    downsample + crop. G_ndc is OUR inverse transform in pixel-center NDC
    (output -> input); the reference composes in image-CENTERED pixel
    coords, a pure per-axis scaling away (x_c = (W/2) * x_ndc).

    `margin` is the STATIC reflect pad per side (0 = the reference's
    width-1 clamp); see the module docstring for why a static symmetric
    margin reproduces the reference's per-sample asymmetric one."""
    from ..ops.upfirdn2d import downsample2d, setup_filter, upsample2d

    n, c, h, w = images.shape
    hz = setup_filter(list(_SYM6))
    hz_pad = len(_SYM6) // 4
    mx = margin if margin > 0 else w - 1
    my = margin if margin > 0 else h - 1
    mx, my = min(mx, w - 1), min(my, h - 1)

    # NDC -> centered-pixel conjugation
    s_in = np.diag([w / 2.0, h / 2.0, 1.0]).astype(np.float32)
    s_out = np.diag([2.0 / w, 2.0 / h, 1.0]).astype(np.float32)
    G = jnp.einsum("ij,njk,kl->nil", jnp.asarray(s_in), G_ndc,
                   jnp.asarray(s_out))

    # pad image; symmetric static margins need no origin adjustment
    # (ref translate2d((mx0-mx1)/2, (my0-my1)/2) is identity here)
    x = jnp.pad(images, ((0, 0), (0, 0), (my, my), (mx, mx)), mode="reflect")

    # upsample 2x and conjugate the transform into the upsampled frame
    x = upsample2d(x, hz, up=2)
    up2 = np.diag([2.0, 2.0, 1.0]).astype(np.float32)
    up2_inv = np.diag([0.5, 0.5, 1.0]).astype(np.float32)
    t_half = np.eye(3, dtype=np.float32)
    t_half[:2, 2] = -0.5
    t_half_inv = np.eye(3, dtype=np.float32)
    t_half_inv[:2, 2] = 0.5
    G = jnp.einsum("ij,njk,kl->nil", jnp.asarray(up2), G, jnp.asarray(up2_inv))
    G = jnp.einsum("ij,njk,kl->nil", jnp.asarray(t_half), G,
                   jnp.asarray(t_half_inv))

    # bilinear warp at 2x into the (image + filter halo) output frame
    out_h, out_w = (h + hz_pad * 2) * 2, (w + hz_pad * 2) * 2
    in_h, in_w = x.shape[2], x.shape[3]
    a = np.diag([2.0 / in_w, 2.0 / in_h, 1.0]).astype(np.float32)
    b = np.diag([out_w / 2.0, out_h / 2.0, 1.0]).astype(np.float32)
    Gg = jnp.einsum("ij,njk,kl->nil", jnp.asarray(a), G, jnp.asarray(b))

    # torch affine_grid semantics, align_corners=False
    xs = (2.0 * jnp.arange(out_w, dtype=jnp.float32) + 1.0) / out_w - 1.0
    ys = (2.0 * jnp.arange(out_h, dtype=jnp.float32) + 1.0) / out_h - 1.0
    gx = (Gg[:, 0, 0, None, None] * xs[None, None, :]
          + Gg[:, 0, 1, None, None] * ys[None, :, None]
          + Gg[:, 0, 2, None, None])
    gy = (Gg[:, 1, 0, None, None] * xs[None, None, :]
          + Gg[:, 1, 1, None, None] * ys[None, :, None]
          + Gg[:, 1, 2, None, None])
    grid = jnp.stack([jnp.broadcast_to(gx, (n, out_h, out_w)),
                      jnp.broadcast_to(gy, (n, out_h, out_w))], axis=-1)
    x = grid_sample_2d(x, grid)

    # wavelet downsample, cropping the filter halo
    return downsample2d(x, hz, down=2, padding=-hz_pad * 2, flip_filter=True)


def augment_pipe(key, images: jax.Array, p: jax.Array, cfg: AugmentConfig = AugmentConfig()):
    """images (N, C, H, W) in [-1,1]; p scalar adaptive probability."""
    n, c, h, w = images.shape
    keys = iter(jax.random.split(key, 40))
    nk = lambda: next(keys)  # noqa: E731

    def bern(prob_mult):
        return jax.random.uniform(nk(), (n,)) < (p * prob_mult)

    # ---- geometric: compose inverse transforms in NDC ------------------------
    G = jnp.broadcast_to(jnp.eye(3), (n, 3, 3))

    if cfg.xflip > 0:
        flip = jnp.where(bern(cfg.xflip), -1.0, 1.0)
        G = G @ _affine(flip, jnp.ones((n,)), jnp.zeros((n,)), jnp.zeros((n,)))
    if cfg.rotate90 > 0:
        k90 = jax.random.randint(nk(), (n,), 0, 4)
        theta = jnp.where(bern(cfg.rotate90), k90.astype(jnp.float32) * (math.pi / 2), 0.0)
        G = G @ _rot2(theta)
    if cfg.xint > 0:
        t = (jax.random.uniform(nk(), (n, 2)) * 2 - 1) * cfg.xint_max
        t = jnp.where(bern(cfg.xint)[:, None], jnp.round(t * jnp.asarray([w, h]) ) / jnp.asarray([w, h]) * 2, 0.0)
        G = G @ _affine(jnp.ones((n,)), jnp.ones((n,)), t[:, 0], t[:, 1])
    if cfg.scale > 0:
        s = jnp.exp2(jax.random.normal(nk(), (n,)) * cfg.scale_std)
        s = jnp.where(bern(cfg.scale), s, 1.0)
        G = G @ _affine(s, s, jnp.zeros((n,)), jnp.zeros((n,)))
    # pre/post rotation sandwich around the anisotropic scaling, each
    # with p_rot such that P(pre OR post) = rotate * p (ref :240-263)
    p_rot = 1.0 - jnp.sqrt(jnp.clip(1.0 - cfg.rotate * p, 0.0, 1.0))
    if cfg.rotate > 0:
        theta = (jax.random.uniform(nk(), (n,)) * 2 - 1) * math.pi * cfg.rotate_max
        theta = jnp.where(jax.random.uniform(nk(), (n,)) < p_rot, theta, 0.0)
        G = G @ _rot2(-theta)
    if cfg.aniso > 0:
        a = jnp.exp2(jax.random.normal(nk(), (n,)) * cfg.aniso_std)
        a = jnp.where(bern(cfg.aniso), a, 1.0)
        G = G @ _affine(a, 1.0 / a, jnp.zeros((n,)), jnp.zeros((n,)))
    if cfg.rotate > 0:
        theta = (jax.random.uniform(nk(), (n,)) * 2 - 1) * math.pi * cfg.rotate_max
        theta = jnp.where(jax.random.uniform(nk(), (n,)) < p_rot, theta, 0.0)
        G = G @ _rot2(-theta)
    if cfg.xfrac > 0:
        t = jax.random.normal(nk(), (n, 2)) * cfg.xfrac_std
        t = jnp.where(bern(cfg.xfrac)[:, None], t * 2, 0.0)
        G = G @ _affine(jnp.ones((n,)), jnp.ones((n,)), t[:, 0], t[:, 1])

    if cfg.alias_free:
        images = _warp_affine_alias_free(images, G, cfg.alias_free_margin)
    else:
        # apply: sample source at G_inv @ target (G already composed as
        # inverse); pixel-CENTER NDC coords so an identity transform is
        # exactly identity under grid_sample's align_corners=False
        # convention
        ys, xs = jnp.meshgrid(
            (jnp.arange(h) + 0.5) / h * 2 - 1,
            (jnp.arange(w) + 0.5) / w * 2 - 1,
            indexing="ij",
        )
        grid = jnp.stack([xs, ys, jnp.ones_like(xs)], axis=-1)  # (H, W, 3)
        src = jnp.einsum("nij,hwj->nhwi", G, grid)
        images = grid_sample_2d(images, src[..., :2] / src[..., 2:3])

    # ---- color: compose a 4x4 matrix on homogeneous rgb ----------------------
    C = jnp.broadcast_to(jnp.eye(4), (n, 4, 4))
    v_axis = jnp.asarray([1.0, 1.0, 1.0, 0.0]) / math.sqrt(3)

    if cfg.brightness > 0:
        b = jax.random.normal(nk(), (n,)) * cfg.brightness_std
        b = jnp.where(bern(cfg.brightness), b, 0.0)
        M = jnp.broadcast_to(jnp.eye(4), (n, 4, 4)).at[:, :3, 3].set(b[:, None])
        C = M @ C
    if cfg.contrast > 0:
        s = jnp.exp2(jax.random.normal(nk(), (n,)) * cfg.contrast_std)
        s = jnp.where(bern(cfg.contrast), s, 1.0)
        M = jax.vmap(lambda ss: jnp.diag(jnp.asarray([ss, ss, ss, 1.0])))(s)
        C = M @ C
    if cfg.lumaflip > 0:
        do = bern(cfg.lumaflip).astype(jnp.float32)
        house = jnp.eye(4) - 2 * jnp.outer(v_axis, v_axis)
        M = jnp.eye(4)[None] * (1 - do)[:, None, None] + house[None] * do[:, None, None]
        C = M @ C
    if cfg.hue > 0:
        theta = (jax.random.uniform(nk(), (n,)) * 2 - 1) * math.pi * cfg.hue_max
        theta = jnp.where(bern(cfg.hue), theta, 0.0)

        def rot_around_v(t):
            # Rodrigues rotation about (1,1,1)/sqrt(3) embedded in 4x4
            k = v_axis[:3]
            K = jnp.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
            R = jnp.eye(3) + jnp.sin(t) * K + (1 - jnp.cos(t)) * (K @ K)
            M = jnp.eye(4).at[:3, :3].set(R)
            return M

        C = jax.vmap(rot_around_v)(theta) @ C
    if cfg.saturation > 0:
        s = jnp.exp2(jax.random.normal(nk(), (n,)) * cfg.saturation_std)
        s = jnp.where(bern(cfg.saturation), s, 1.0)
        outer = jnp.outer(v_axis, v_axis)

        def sat(ss):
            return outer + (jnp.eye(4) - outer) * ss

        C = jax.vmap(sat)(s) @ C

    rgb = jnp.concatenate(
        [images[:, :3], jnp.ones((n, 1, h, w), images.dtype)], axis=1
    )
    rgb = jnp.einsum("nij,njhw->nihw", C.astype(images.dtype), rgb)[:, :3]
    images = jnp.concatenate([rgb, images[:, 3:]], axis=1) if c > 3 else rgb

    # ---- image-space filtering (ref augment.py:382-410) ----------------------
    if cfg.imgfilter > 0:
        num_bands = 4
        assert len(cfg.imgfilter_bands) == num_bands
        expected_power = jnp.asarray([10.0, 1.0, 1.0, 1.0]) / 13.0  # 1/f law
        g = jnp.ones((n, num_bands))
        for i, band_strength in enumerate(cfg.imgfilter_bands):
            t_i = jnp.exp2(jax.random.normal(nk(), (n,)) * cfg.imgfilter_std)
            t_i = jnp.where(bern(cfg.imgfilter * band_strength), t_i, 1.0)
            t = jnp.ones((n, num_bands)).at[:, i].set(t_i)
            t = t / jnp.sqrt(
                jnp.sum(expected_power * jnp.square(t), axis=-1, keepdims=True))
            g = g * t
        images = apply_imgfilter(images, g.astype(images.dtype))

    # ---- corruption -----------------------------------------------------------
    if cfg.noise > 0:
        sigma = jnp.abs(jax.random.normal(nk(), (n,))) * cfg.noise_std
        sigma = jnp.where(bern(cfg.noise), sigma, 0.0)
        images = images + jax.random.normal(nk(), images.shape, images.dtype) * sigma[:, None, None, None]
    if cfg.cutout > 0:
        center = jax.random.uniform(nk(), (n, 2))
        do = bern(cfg.cutout)
        ys_n = (jnp.arange(h) + 0.5) / h
        xs_n = (jnp.arange(w) + 0.5) / w
        inside_y = jnp.abs(ys_n[None, :] - center[:, 1:2]) < cfg.cutout_size / 2
        inside_x = jnp.abs(xs_n[None, :] - center[:, 0:1]) < cfg.cutout_size / 2
        mask = inside_y[:, :, None] & inside_x[:, None, :]
        mask = mask & do[:, None, None]
        images = jnp.where(mask[:, None, :, :], 0.0, images)

    return images


def ada_update(p, real_logit_signs_mean, batch_size, ada_interval: int = 4,
               ada_target: float = 0.6, ada_kimg: float = 500.0):
    """Adaptive-p heuristic (ref training_loop.py:316-325)."""
    adjust = jnp.sign(real_logit_signs_mean - ada_target) * (
        batch_size * ada_interval
    ) / (ada_kimg * 1000.0)
    return jnp.clip(p + adjust, 0.0, 1.0)
