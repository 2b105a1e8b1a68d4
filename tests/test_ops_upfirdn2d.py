"""Golden parity of ops.upfirdn2d against direct torch math.

The torch side below re-expresses the documented op contract
(pad -> zero-insert upsample -> FIR correlate -> decimate) with plain
torch primitives — the same oracle role as the reference's impl='ref'.
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from gaussian_gan_decoder_tpu.ops import (
    downsample2d,
    filter2d,
    setup_filter,
    upfirdn2d,
    upsample2d,
)


def torch_upfirdn2d(x, f, up=1, down=1, padding=(0, 0, 0, 0), gain=1.0):
    """Direct torch expression of the op contract (oracle)."""
    x = torch.as_tensor(x)
    b, c, h, w = x.shape
    f = torch.as_tensor(f, dtype=torch.float64)
    if f.ndim == 1:
        f = torch.outer(f, f)
    f = f * gain
    px0, px1, py0, py1 = padding
    # upsample by zero insertion
    y = torch.zeros(b, c, h * up, w * up, dtype=x.dtype)
    y[:, :, ::up, ::up] = x
    # pad / crop
    y = F.pad(y, (max(px0, 0), max(px1, 0), max(py0, 0), max(py1, 0)))
    y = y[
        :,
        :,
        max(-py0, 0): y.shape[2] - max(-py1, 0),
        max(-px0, 0): y.shape[3] - max(-px1, 0),
    ]
    # correlate with flipped filter (convolution)
    k = f.flip(0, 1)[None, None].repeat(c, 1, 1, 1).to(y.dtype)
    y = F.conv2d(y, k, groups=c)
    # decimate
    return y[:, :, ::down, ::down]


@pytest.mark.parametrize("up,down,pad", [
    (1, 1, (1, 1, 1, 1)),
    (2, 1, (2, 1, 2, 1)),
    (1, 2, (1, 1, 1, 1)),
    (2, 2, (3, 2, 3, 2)),
    (1, 1, (-1, 2, 0, -1)),
])
def test_upfirdn2d_matches_torch(rng, up, down, pad):
    x = rng.randn(2, 3, 12, 12).astype(np.float64)
    f = setup_filter([1, 3, 3, 1]).astype(np.float64)
    want = torch_upfirdn2d(x, f, up=up, down=down, padding=pad).numpy()
    got = np.asarray(
        upfirdn2d(jnp.asarray(x), f, up=up, down=down, padding=list(pad))
    )
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-10)


def test_separable_filter_matches_2d(rng):
    x = rng.randn(1, 2, 16, 16).astype(np.float64)
    taps = np.asarray([1, 3, 3, 1, 1, 3, 3, 1], dtype=np.float32)
    f_sep = setup_filter(taps, separable=True).astype(np.float64)
    f_2d = setup_filter(taps, separable=False).astype(np.float64)
    a = np.asarray(upfirdn2d(jnp.asarray(x), f_sep, up=2, padding=4))
    b = np.asarray(upfirdn2d(jnp.asarray(x), f_2d, up=2, padding=4))
    np.testing.assert_allclose(a, b, rtol=1e-8, atol=1e-8)


def test_upsample2d_shape_and_mass(rng):
    x = rng.rand(1, 1, 8, 8).astype(np.float64) + 1.0  # positive mass
    f = setup_filter([1, 3, 3, 1]).astype(np.float64)
    y = np.asarray(upsample2d(jnp.asarray(x), f, up=2))
    assert y.shape == (1, 1, 16, 16)
    # unit-DC filter with gain=up^2 preserves total mass away from borders
    np.testing.assert_allclose(y.sum(), 4 * x.sum(), rtol=0.15)


def test_downsample2d_shape(rng):
    x = rng.randn(1, 1, 16, 16).astype(np.float64)
    f = setup_filter([1, 3, 3, 1]).astype(np.float64)
    y = np.asarray(downsample2d(jnp.asarray(x), f, down=2))
    assert y.shape == (1, 1, 8, 8)


def test_filter2d_identity():
    x = np.arange(36, dtype=np.float64).reshape(1, 1, 6, 6)
    y = np.asarray(filter2d(jnp.asarray(x), setup_filter(None).astype(np.float64)))
    np.testing.assert_allclose(y, x)
