"""Equivariance metrics (EQ-T, EQ-T_frac, EQ-R) from "Alias-Free GANs".

Port of /root/reference/eg3d/metrics/equivariance.py:23-266, with the
sampling loop restructured for JAX:
the per-batch synthesis passes (identity transform + transformed) run in
ONE jitted function with the 3x3 user transform as a traced argument (the
reference mutates the generator's `transform` buffer in place between
eager forwards, eg3d/metrics/equivariance.py:215-248 — a buffer-mutation
pattern that would retrace under jit); the translation / rotation image
operators run eagerly on concrete host-drawn offsets, mirroring the
reference's host-side branching.

The image operators (integer/fractional translation, oriented band-limit
filter, affine resampling) are a FAITHFUL PORT of the reference's
(:23-190): they are exact numerical specifications from the Alias-Free
GAN paper's Appendix E, and the goldens in tests/test_equivariance.py
assert bit-parity against the actual reference module, so the arithmetic
and its order are fixed — only the decomposition and naming are ours.

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


def _lanczos_shift_taps(frac: float, a: int) -> jnp.ndarray:
    """Normalised 1-D Lanczos-a windowed-sinc taps realising a sub-pixel
    shift by `frac` in [0, 1): 2a taps whose centre sits `frac` past tap
    a-1."""
    grid = jnp.arange(2 * a, dtype=jnp.float32) - (a - 1) - frac
    taps = sinc(grid) * sinc(grid / a)
    return taps / jnp.sum(taps)


def apply_fractional_translation(x, tx, ty, a: int = 3):
    _N, _C, H, W = x.shape
    # split the pixel-space shift into whole-pixel + fractional parts; the
    # fractional part becomes a separable windowed-sinc resampling
    shift_x, shift_y = float(tx) * W, float(ty) * H
    wx, wy = int(math.floor(shift_x)), int(math.floor(shift_y))
    halo = a - 1  # taps extending past the shifted sample on the near side

    out = jnp.zeros_like(x)
    # destination rectangle the filtered source can land on
    dst_l, dst_t = max(wx - halo, 0), max(wy - halo, 0)
    dst_r, dst_b = min(wx + a, 0) + W, min(wy + a, 0) + H
    if dst_l < dst_r and dst_t < dst_b:
        fx = _lanczos_shift_taps(shift_x - wx, a)
        fy = _lanczos_shift_taps(shift_y - wy, a)
        y = filter2d(x, fx[None, :], padding=[halo, a, 0, 0])
        y = filter2d(y, fy[:, None], padding=[0, 0, halo, a])
        y = y[:, :, max(halo - wy, 0):H + halo + a + min(-wy - a, 0),
              max(halo - wx, 0):W + halo + a + min(-wx - a, 0)]
        out = out.at[:, :, dst_t:dst_b, dst_l:dst_r].set(y)

    # validity mask: pixels whose full 2a-tap support stayed inside the
    # source image
    valid = jnp.zeros_like(x)
    v_l, v_t = max(wx + a, 0), max(wy + a, 0)
    v_r, v_b = min(wx - halo, 0) + W, min(wy - halo, 0) + H
    if v_l < v_r and v_t < v_b:
        valid = valid.at[:, :, v_t:v_b, v_l:v_r].set(1.0)
    return out, valid


# ---------------------------------------------------------------------------
# oriented band-limit filter for an affine transform (ref :103-132)


def _conv2_circular(p, q):
    """Circular 2-D convolution of two equal-shape tap grids via FFT."""
    return jnp.real(jnp.fft.ifftn(jnp.fft.fftn(p) * jnp.fft.fftn(q)))


def construct_affine_bandlimit_filter(mat, a=3, amax=16, aflt=64, up=4,
                                      cutoff_in=1.0, cutoff_out=1.0):
    assert a <= amax < aflt
    mat = jnp.asarray(mat, jnp.float32)

    # tap coordinates in FFT (wrap-around) order so the circular
    # convolutions below need no explicit centring shift; the same grid
    # viewed in source space and mapped through the transform
    coords = jnp.roll(
        (jnp.arange(aflt * up * 2 - 1, dtype=jnp.float32) + 1) / up - aflt,
        1 - aflt * up)
    src_y, src_x = jnp.meshgrid(coords, coords, indexing="ij")
    mapped = jnp.stack([src_x, src_y], axis=2) @ mat[:2, :2].T
    dst_x, dst_y = mapped[..., 0], mapped[..., 1]

    # band-limit jointly in both spaces: convolve the axis-aligned source
    # sinc with the transform-oriented destination sinc, and window with
    # the matching pair of oriented 2-D Lanczos windows
    band = _conv2_circular(
        sinc(src_x * cutoff_in) * sinc(src_y * cutoff_in),
        sinc(dst_x * cutoff_out) * sinc(dst_y * cutoff_out))
    window = _conv2_circular(
        lanczos_window(src_x, a) * lanczos_window(src_y, a),
        lanczos_window(dst_x, a) * lanczos_window(dst_y, a))
    f = band * window

    # recentre out of FFT order and crop the support to +-amax, then
    # normalise every up-phase separately (each phase is its own
    # interpolation filter) with the 1/up^2 gain upsample2d expects
    crop = (aflt - amax) * up
    f = jnp.roll(f, (aflt * up - 1, aflt * up - 1), axis=(0, 1))[crop:-crop,
                                                                 crop:-crop]
    f = jnp.pad(f, ((0, 1), (0, 1))).reshape(amax * 2, up, amax * 2, up)
    f = f / jnp.sum(f, axis=(0, 2), keepdims=True) / (up ** 2)
    return f.reshape(amax * 2 * up, amax * 2 * up)[:-1, :-1]


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
        # the reference explicitly resets the transform to identity for
        # the orig pass (ref :223) — a checkpoint carrying a non-identity
        # transform must not skew the reference image
        s_id = {**s, "input": {**s["input"],
                               "transform": jnp.eye(3, dtype=jnp.float32)}}
        orig = gen.synthesis.apply(s_id, ws)
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
