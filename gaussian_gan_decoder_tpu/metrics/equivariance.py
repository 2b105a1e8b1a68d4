"""Equivariance metrics (EQ-T, EQ-T_frac, EQ-R) from "Alias-Free GANs".

Re-design of /root/reference/eg3d/metrics/equivariance.py:23-266 for JAX:
the per-batch synthesis passes (identity transform + transformed) run in
ONE jitted function with the 3x3 user transform as a traced argument (the
reference mutates the generator's `transform` buffer in place between
eager forwards, eg3d/metrics/equivariance.py:215-248 — a buffer-mutation
pattern that would retrace under jit); the translation / rotation image
operators run eagerly on concrete host-drawn offsets, mirroring the
reference's host-side branching.

Consumed by metric_main.eqt50k_int / eqr50k. Requires a generator whose
synthesis input exposes a user transform (models/stylegan3.Generator3:
params['synthesis']['input']['transform'], ref networks_stylegan3.py:
209-217); raises ValueError otherwise, like the reference (:202-204).
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.upfirdn2d import filter2d, upsample2d


# ---------------------------------------------------------------------------
# utilities (ref equivariance.py:23-41)


def sinc(x):
    y = jnp.abs(x * np.pi)
    z = jnp.sin(y) / jnp.clip(y, 1e-30, None)
    return jnp.where(y < 1e-30, jnp.ones_like(z), z)


def lanczos_window(x, a):
    x = jnp.abs(x) / a
    return jnp.where(x < 1, sinc(x), jnp.zeros_like(x))


def rotation_matrix(angle: float) -> np.ndarray:
    a = float(angle)
    m = np.eye(3, dtype=np.float32)
    m[0, 0] = np.cos(a)
    m[0, 1] = np.sin(a)
    m[1, 0] = -np.sin(a)
    m[1, 1] = np.cos(a)
    return m


# ---------------------------------------------------------------------------
# T_x, integer (ref :46-62). tx/ty are concrete host floats in [-1, 1] units
# of image size — slices are static, mirroring the reference's host branches.


def apply_integer_translation(x, tx, ty):
    _N, _C, H, W = x.shape
    ix = int(round(float(tx) * W))
    iy = int(round(float(ty) * H))
    z = jnp.zeros_like(x)
    m = jnp.zeros_like(x)
    if abs(ix) < W and abs(iy) < H:
        y = x[:, :, max(-iy, 0):H + min(-iy, 0), max(-ix, 0):W + min(-ix, 0)]
        z = z.at[:, :, max(iy, 0):H + min(iy, 0), max(ix, 0):W + min(ix, 0)].set(y)
        m = m.at[:, :, max(iy, 0):H + min(iy, 0), max(ix, 0):W + min(ix, 0)].set(1.0)
    return z, m


# ---------------------------------------------------------------------------
# T_x, fractional: windowed-sinc resampling (ref :67-97)


def apply_fractional_translation(x, tx, ty, a: int = 3):
    _N, _C, H, W = x.shape
    txp = float(tx) * W
    typ = float(ty) * H
    ix = int(math.floor(txp))
    iy = int(math.floor(typ))
    fx = txp - ix
    fy = typ - iy
    b = a - 1

    z = jnp.zeros_like(x)
    zx0, zy0 = max(ix - b, 0), max(iy - b, 0)
    zx1, zy1 = min(ix + a, 0) + W, min(iy + a, 0) + H
    if zx0 < zx1 and zy0 < zy1:
        taps = jnp.arange(a * 2, dtype=jnp.float32) - b
        filter_x = (sinc(taps - fx) * sinc((taps - fx) / a))[None, :]
        filter_y = (sinc(taps - fy) * sinc((taps - fy) / a))[:, None]
        y = filter2d(x, filter_x / jnp.sum(filter_x), padding=[b, a, 0, 0])
        y = filter2d(y, filter_y / jnp.sum(filter_y), padding=[0, 0, b, a])
        y = y[:, :, max(b - iy, 0):H + b + a + min(-iy - a, 0),
              max(b - ix, 0):W + b + a + min(-ix - a, 0)]
        z = z.at[:, :, zy0:zy1, zx0:zx1].set(y)

    m = jnp.zeros_like(x)
    mx0, my0 = max(ix + a, 0), max(iy + a, 0)
    mx1, my1 = min(ix - b, 0) + W, min(iy - b, 0) + H
    if mx0 < mx1 and my0 < my1:
        m = m.at[:, :, my0:my1, mx0:mx1].set(1.0)
    return z, m


# ---------------------------------------------------------------------------
# oriented band-limit filter for an affine transform (ref :103-132)


def construct_affine_bandlimit_filter(mat, a=3, amax=16, aflt=64, up=4,
                                      cutoff_in=1.0, cutoff_out=1.0):
    assert a <= amax < aflt
    mat = jnp.asarray(mat, jnp.float32)

    taps = jnp.roll(
        (jnp.arange(aflt * up * 2 - 1, dtype=jnp.float32) + 1) / up - aflt,
        1 - aflt * up)
    yi, xi = jnp.meshgrid(taps, taps, indexing="ij")
    grid = jnp.stack([xi, yi], axis=2) @ mat[:2, :2].T
    xo, yo = grid[..., 0], grid[..., 1]

    fi = sinc(xi * cutoff_in) * sinc(yi * cutoff_in)
    fo = sinc(xo * cutoff_out) * sinc(yo * cutoff_out)
    f = jnp.real(jnp.fft.ifftn(jnp.fft.fftn(fi) * jnp.fft.fftn(fo)))

    wi = lanczos_window(xi, a) * lanczos_window(yi, a)
    wo = lanczos_window(xo, a) * lanczos_window(yo, a)
    w = jnp.real(jnp.fft.ifftn(jnp.fft.fftn(wi) * jnp.fft.fftn(wo)))

    f = f * w
    c = (aflt - amax) * up
    f = jnp.roll(f, (aflt * up - 1, aflt * up - 1), axis=(0, 1))[c:-c, c:-c]
    f = jnp.pad(f, ((0, 1), (0, 1))).reshape(amax * 2, up, amax * 2, up)
    f = f / jnp.sum(f, axis=(0, 2), keepdims=True) / (up ** 2)
    f = f.reshape(amax * 2 * up, amax * 2 * up)[:-1, :-1]
    return f


# ---------------------------------------------------------------------------
# affine resampling (ref :137-166): upsample -> affine grid -> bilinear


def _affine_grid(theta, N, H, W):
    """torch.nn.functional.affine_grid, align_corners=False: (N,2,3) theta
    -> (N, H, W, 2) sampling grid over pixel centers."""
    xs = (2.0 * jnp.arange(W, dtype=jnp.float32) + 1.0) / W - 1.0
    ys = (2.0 * jnp.arange(H, dtype=jnp.float32) + 1.0) / H - 1.0
    gx = xs[None, :]
    gy = ys[:, None]
    out_x = theta[0, 0] * gx + theta[0, 1] * gy + theta[0, 2]
    out_y = theta[1, 0] * gx + theta[1, 1] * gy + theta[1, 2]
    g = jnp.stack([jnp.broadcast_to(out_x, (H, W)),
                   jnp.broadcast_to(out_y, (H, W))], axis=-1)
    return jnp.broadcast_to(g[None], (N, H, W, 2))


def _grid_sample_nearest(x, grid):
    """zeros-padded nearest-neighbor grid_sample (align_corners=False)."""
    N, C, H, W = x.shape
    gx = ((grid[..., 0] + 1.0) * W - 1.0) * 0.5
    gy = ((grid[..., 1] + 1.0) * H - 1.0) * 0.5
    ix = jnp.round(gx).astype(jnp.int32)
    iy = jnp.round(gy).astype(jnp.int32)
    valid = (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
    idx = jnp.clip(iy, 0, H - 1) * W + jnp.clip(ix, 0, W - 1)  # (N, Ho, Wo)
    x_cl = jnp.transpose(x, (0, 2, 3, 1)).reshape(N, H * W, C)
    out = jax.vmap(lambda img, i: jnp.take(img, i, axis=0))(x_cl, idx)
    out = out * valid[..., None].astype(out.dtype)
    return jnp.moveaxis(out, -1, 1)


def apply_affine_transformation(x, mat, up=4, **filter_kwargs):
    from ..ops.grid_sample import grid_sample_2d

    N, _C, H, W = x.shape
    mat = jnp.asarray(mat, jnp.float32)

    f = construct_affine_bandlimit_filter(mat, up=up, **filter_kwargs)
    assert f.ndim == 2 and f.shape[0] == f.shape[1] and f.shape[0] % 2 == 1
    p = f.shape[0] // 2

    theta = jnp.linalg.inv(mat)
    theta = theta.at[:2, 2].multiply(2.0)
    theta = theta.at[0, 2].add(1.0 / up / W)
    theta = theta.at[1, 2].add(1.0 / up / H)
    theta = theta.at[0, :].multiply(W / (W + p / up * 2))
    theta = theta.at[1, :].multiply(H / (H + p / up * 2))
    g = _affine_grid(theta[:2, :3], N, H, W)

    y = upsample2d(x, f, up=up, padding=p)
    z = grid_sample_2d(y, g)  # bilinear, zeros, align_corners=False

    m = jnp.zeros_like(y)
    c = p * 2 + 1
    m = m.at[:, :, c:-c, c:-c].set(1.0)
    m = _grid_sample_nearest(m, g)
    return z, m


def apply_fractional_rotation(x, angle, a=3, **filter_kwargs):
    mat = rotation_matrix(angle)
    return apply_affine_transformation(x, mat, a=a, amax=a * 2, **filter_kwargs)


def apply_fractional_pseudo_rotation(x, angle, a=3, **filter_kwargs):
    """R^*_alpha: band-limit as if rotated, without rotating (ref :181-190)."""
    mat = rotation_matrix(-float(angle))
    f = construct_affine_bandlimit_filter(mat, a=a, amax=a * 2, up=1,
                                          **filter_kwargs)
    y = filter2d(x, f)
    m = jnp.zeros_like(y)
    c = f.shape[0] // 2
    m = m.at[:, :, c:-c, c:-c].set(1.0)
    return y, m


# ---------------------------------------------------------------------------
# main sampling loop (ref :195-266)


def compute_equivariance_metrics(
    gen,                      # models.stylegan3.Generator3 (or API-compatible)
    params,
    key,
    num_samples: int = 50_000,
    batch_size: int = 4,
    translate_max: float = 0.125,
    rotate_max: float = 1.0,
    compute_eqt_int: bool = False,
    compute_eqt_frac: bool = False,
    compute_eqr: bool = False,
    c_dim: Optional[int] = None,
    label_iter=None,          # optional iterator of (batch, c_dim) labels
    truncation_psi: float = 1.0,
):
    """-> PSNR (dB) per requested metric, reference order (int, frac, rot)."""
    assert compute_eqt_int or compute_eqt_frac or compute_eqr
    sp = params["synthesis"]
    if "input" not in sp or "transform" not in sp["input"]:
        raise ValueError(
            "Cannot compute equivariance metrics; the given generator does "
            "not support user-specified image transformations")

    @jax.jit
    def synth_pair(p, z, c, transform):
        ws = gen.mapping.apply(p["mapping"], z, c,
                               truncation_psi=truncation_psi)
        s = p["synthesis"]
        orig = gen.synthesis.apply(s, ws)
        s_t = {**s, "input": {**s["input"],
                              "transform": transform.astype(jnp.float32)}}
        img = gen.synthesis.apply(s_t, ws)
        return orig, img

    rng = np.random.default_rng(np.asarray(jax.random.key_data(key))[-1])
    eye = np.eye(3, dtype=np.float32)
    res = gen.img_resolution
    sums = None
    done = 0
    while done < num_samples:
        key, kz = jax.random.split(key)
        z = jax.random.normal(kz, (batch_size, gen.z_dim))
        if label_iter is not None:
            c = jnp.asarray(next(label_iter))
        elif gen.c_dim > 0:
            c = jnp.zeros((batch_size, gen.c_dim))
        else:
            c = None
        s = []

        if compute_eqt_int:
            t = (rng.random(2) * 2 - 1) * translate_max
            t = np.round(t * res) / res
            m = eye.copy()
            m[:2, 2] = -t
            orig, img = synth_pair(params, z, c, jnp.asarray(m))
            ref, mask = apply_integer_translation(orig, t[0], t[1])
            s += [jnp.square(ref - img) * mask, mask]

        if compute_eqt_frac:
            t = (rng.random(2) * 2 - 1) * translate_max
            m = eye.copy()
            m[:2, 2] = -t
            orig, img = synth_pair(params, z, c, jnp.asarray(m))
            ref, mask = apply_fractional_translation(orig, t[0], t[1])
            s += [jnp.square(ref - img) * mask, mask]

        if compute_eqr:
            angle = float((rng.random() * 2 - 1) * (rotate_max * np.pi))
            orig, img = synth_pair(params, z, c,
                                   jnp.asarray(rotation_matrix(-angle)))
            ref, ref_mask = apply_fractional_rotation(orig, angle)
            pseudo, pseudo_mask = apply_fractional_pseudo_rotation(img, angle)
            mask = ref_mask * pseudo_mask
            s += [jnp.square(ref - pseudo) * mask, mask]

        batch_sums = np.stack(
            [float(jnp.sum(v.astype(jnp.float64))) for v in s])
        sums = batch_sums if sums is None else sums + batch_sums
        done += batch_size

    mses = sums[0::2] / sums[1::2]
    psnrs = np.log10(2.0) * 20 - np.log10(mses) * 10
    return tuple(float(p) for p in psnrs)
