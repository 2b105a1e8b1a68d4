"""Image-space losses: L1 / L2 / windowed SSIM / Sobel.

Re-designs of /root/reference/gaussian_splatting/utils/loss_utils.py:17-63
and /root/reference/main/loss_utils/sobel_loss.py:4-29 with identical
numerics (11x11 Gaussian window sigma=1.5, padded depthwise convs; Sobel
kernels summed over RGB channels).
"""
from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


def l1_loss(a, b):
    return jnp.mean(jnp.abs(a - b))


def l2_loss(a, b):
    return jnp.mean(jnp.square(a - b))


@lru_cache(maxsize=None)
def _gaussian_window(window_size: int, sigma: float) -> np.ndarray:
    g = np.exp(
        -((np.arange(window_size) - window_size // 2) ** 2) / (2 * sigma ** 2)
    )
    g /= g.sum()
    return np.outer(g, g).astype(np.float32)


def _depthwise(x, k):
    c = x.shape[1]
    w = jnp.broadcast_to(jnp.asarray(k)[None, None], (c, 1, k.shape[0], k.shape[1]))
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1),
        padding=((k.shape[0] // 2,) * 2, (k.shape[1] // 2,) * 2),
        feature_group_count=c,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )


def ssim(img1, img2, window_size: int = 11):
    """-> (mean ssim, ssim map); inputs (C,H,W) or (N,C,H,W)
    (ref loss_utils.py:29-63)."""
    squeeze = img1.ndim == 3
    if squeeze:
        img1, img2 = img1[None], img2[None]
    w = _gaussian_window(window_size, 1.5)
    mu1 = _depthwise(img1, w)
    mu2 = _depthwise(img2, w)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _depthwise(img1 * img1, w) - mu1_sq
    sigma2_sq = _depthwise(img2 * img2, w) - mu2_sq
    sigma12 = _depthwise(img1 * img2, w) - mu1_mu2
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    if squeeze:
        ssim_map = ssim_map[0]
    return jnp.mean(ssim_map), ssim_map


_SOBEL_X = np.array([[1, 0, -1], [2, 0, -2], [1, 0, -1]], np.float32)
_SOBEL_Y = np.array([[1, 2, 1], [0, 0, 0], [-1, -2, -1]], np.float32)


def _sobel(x, k):
    # single output channel summing over the 3 RGB inputs (ref kernel
    # .expand(1, 3, 3, 3))
    w = jnp.broadcast_to(jnp.asarray(k)[None, None], (1, x.shape[1], 3, 3))
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )


def sobel_loss(render, target):
    """-> (mean squared gradient difference, map) (ref sobel_loss.py:18-29).

    Inputs (C,H,W) or (N,C,H,W)."""
    if render.ndim == 3:
        render, target = render[None], target[None]
    dx = _sobel(render, _SOBEL_X) - _sobel(target, _SOBEL_X)
    dy = _sobel(render, _SOBEL_Y) - _sobel(target, _SOBEL_Y)
    diff = jnp.square(dx) + jnp.square(dy)
    return jnp.mean(diff), diff


def area_downsample(x, out: int):
    """torch F.interpolate(mode='area') for integer factors — plain average
    pooling. Used for the LPIPS 256^2 input (ref main/loss_utils/lpips.py:26-29)."""
    n, c, h, w = x.shape
    f = h // out
    assert f * out == h and w // out * out == w, (h, w, out)
    x = x.reshape(n, c, out, f, out, f)
    return jnp.mean(x, axis=(3, 5))
