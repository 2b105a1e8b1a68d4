"""Parity of conv2d_resample / modulated_conv2d against torch oracles."""
import numpy as np
import torch
import torch.nn.functional as F
import pytest

import jax.numpy as jnp

from gaussian_gan_decoder_tpu.ops import (
    conv2d_resample,
    modulated_conv2d,
    setup_filter,
)
from tests.test_ops_upfirdn2d import torch_upfirdn2d


def torch_conv2d_resample(x, w, f=None, up=1, down=1, padding=0):
    """Oracle: upfirdn(up) -> conv -> upfirdn(down), padding up-front."""
    x = torch.as_tensor(x)
    w = torch.as_tensor(w)
    fw = 1 if f is None else f.shape[-1]
    fh = fw
    px0 = px1 = py0 = py1 = padding
    if up > 1:
        px0 += (fw + up - 1) // 2
        px1 += (fw - up) // 2
        py0 += (fh + up - 1) // 2
        py1 += (fh - up) // 2
    if down > 1:
        px0 += (fw - down + 1) // 2
        px1 += (fw - down) // 2
        py0 += (fh - down + 1) // 2
        py1 += (fh - down) // 2
    if up > 1:
        x = torch_upfirdn2d(x, f, up=up, padding=(px0, px1, py0, py1), gain=up ** 2)
        x = F.conv2d(x, w)
    elif down > 1:
        if f is None:
            x = F.pad(x, (px0, px1, py0, py1))
        else:
            x = torch_upfirdn2d(x, f, padding=(px0, px1, py0, py1))
        x = F.conv2d(x, w, stride=down)
    else:
        x = F.pad(x, (px0, px1, py0, py1))
        x = F.conv2d(x, w)
    return x


@pytest.mark.parametrize("up,down,k", [(1, 1, 3), (2, 1, 3), (1, 2, 3), (1, 1, 1)])
def test_conv2d_resample(rng, up, down, k):
    x = rng.randn(2, 4, 10, 10).astype(np.float64)
    w = rng.randn(5, 4, k, k).astype(np.float64)
    f = setup_filter([1, 3, 3, 1]).astype(np.float64) if (up > 1 or down > 1) else None
    pad = k // 2
    want = torch_conv2d_resample(x, w, f, up=up, down=down, padding=pad).numpy()
    got = np.asarray(
        conv2d_resample(jnp.asarray(x), jnp.asarray(w), f, up=up, down=down, padding=pad)
    )
    np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-8)


def torch_modulated_conv2d(x, weight, styles, demodulate=True, padding=0):
    """Oracle re-expressing networks_stylegan2.py:34-91 fused math."""
    x = torch.as_tensor(x)
    weight = torch.as_tensor(weight)
    styles = torch.as_tensor(styles)
    b = x.shape[0]
    w = weight[None] * styles[:, None, :, None, None]
    if demodulate:
        d = (w.square().sum(dim=(2, 3, 4)) + 1e-8).rsqrt()
        w = w * d[:, :, None, None, None]
    x = x.reshape(1, -1, *x.shape[2:])
    w = w.reshape(-1, *weight.shape[1:])
    y = F.conv2d(x, w, groups=b, padding=padding)
    return y.reshape(b, -1, *y.shape[2:])


@pytest.mark.parametrize("demod", [True, False])
def test_modulated_conv2d_matches_fused_torch(rng, demod):
    x = rng.randn(3, 6, 8, 8).astype(np.float64)
    w = rng.randn(7, 6, 3, 3).astype(np.float64)
    s = (rng.rand(3, 6).astype(np.float64) + 0.5)
    want = torch_modulated_conv2d(x, w, s, demodulate=demod, padding=1).numpy()
    got = np.asarray(
        modulated_conv2d(
            jnp.asarray(x), jnp.asarray(w), jnp.asarray(s),
            padding=1, demodulate=demod,
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-7, atol=1e-8)


def test_modulated_conv2d_up2(rng):
    """Upsampling modconv: scaling-path math == fused grouped transpose conv."""
    x = rng.randn(2, 4, 6, 6).astype(np.float64)
    w = rng.randn(5, 4, 3, 3).astype(np.float64)
    s = (rng.rand(2, 4).astype(np.float64) + 0.5)
    f = setup_filter([1, 3, 3, 1]).astype(np.float64)

    # oracle: modulate weights per sample, then conv2d_resample per sample
    outs = []
    for i in range(2):
        wi = w * s[i][None, :, None, None]
        d = 1.0 / np.sqrt((wi ** 2).sum(axis=(1, 2, 3)) + 1e-8)
        wi = wi * d[:, None, None, None]
        # flip_weight=False => true convolution: flip kernel for the
        # correlation-based oracle
        wi = np.ascontiguousarray(wi[:, :, ::-1, ::-1])
        o = torch_conv2d_resample(
            x[i : i + 1], wi, f, up=2, padding=1
        )
        outs.append(o.numpy())
    want = np.concatenate(outs, axis=0)
    got = np.asarray(
        modulated_conv2d(
            jnp.asarray(x), jnp.asarray(w), jnp.asarray(s),
            up=2, padding=1, resample_filter=f, flip_weight=False,
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-7, atol=1e-8)
