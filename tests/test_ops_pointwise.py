"""Parity of bias_act / grid_sample / resize / knn against torch oracles."""
import math

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from gaussian_gan_decoder_tpu.ops import (
    bias_act,
    grid_sample_2d,
    grid_sample_3d,
    mean_sq_dist_to_knn,
    resize_bilinear,
)


TORCH_ACTS = {
    "linear": lambda x: x,
    "relu": F.relu,
    "lrelu": lambda x: F.leaky_relu(x, 0.2),
    "tanh": torch.tanh,
    "sigmoid": torch.sigmoid,
    "elu": F.elu,
    "selu": F.selu,
    "softplus": F.softplus,
    "swish": lambda x: torch.sigmoid(x) * x,
    "gelu": lambda x: F.gelu(x),
}
DEF_GAIN = {
    "relu": math.sqrt(2), "lrelu": math.sqrt(2), "swish": math.sqrt(2),
}


@pytest.mark.parametrize("act", sorted(TORCH_ACTS))
def test_bias_act_matches_torch(rng, act):
    x = rng.randn(4, 8, 5, 5).astype(np.float32)
    b = rng.randn(8).astype(np.float32)
    xt = torch.as_tensor(x) + torch.as_tensor(b).reshape(1, -1, 1, 1)
    want = (TORCH_ACTS[act](xt) * DEF_GAIN.get(act, 1.0)).numpy()
    got = np.asarray(bias_act(jnp.asarray(x), jnp.asarray(b), act=act))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_bias_act_gain_clamp(rng):
    x = rng.randn(2, 4).astype(np.float32) * 10
    got = np.asarray(bias_act(jnp.asarray(x), act="lrelu", gain=2.0, clamp=3.0))
    want = np.clip(
        np.where(x > 0, x, 0.2 * x) * 2.0, -3.0, 3.0
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_grid_sample_2d_matches_torch(rng):
    x = rng.randn(2, 6, 9, 7).astype(np.float32)
    g = (rng.rand(2, 4, 5, 2).astype(np.float32) * 2.6 - 1.3)  # incl. OOB
    want = F.grid_sample(
        torch.as_tensor(x), torch.as_tensor(g),
        mode="bilinear", padding_mode="zeros", align_corners=False,
    ).numpy()
    got = np.asarray(grid_sample_2d(jnp.asarray(x), jnp.asarray(g)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_grid_sample_3d_matches_torch(rng):
    x = rng.randn(2, 4, 3, 6, 5).astype(np.float32)
    g = (rng.rand(2, 2, 3, 4, 3).astype(np.float32) * 2.6 - 1.3)
    want = F.grid_sample(
        torch.as_tensor(x), torch.as_tensor(g),
        mode="bilinear", padding_mode="zeros", align_corners=False,
    ).numpy()
    got = np.asarray(grid_sample_3d(jnp.asarray(x), jnp.asarray(g)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("antialias", [False, True])
@pytest.mark.parametrize("size", [(32, 32, 16, 16), (16, 16, 32, 32), (20, 12, 10, 24)])
def test_resize_bilinear_matches_torch(rng, antialias, size):
    ih, iw, oh, ow = size
    x = rng.randn(2, 3, ih, iw).astype(np.float32)
    want = F.interpolate(
        torch.as_tensor(x), size=(oh, ow), mode="bilinear",
        align_corners=False, antialias=antialias,
    ).numpy()
    got = np.asarray(resize_bilinear(jnp.asarray(x), oh, ow, antialias=antialias))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_knn_mean_sq_dist_exact_small(rng):
    pts = rng.randn(256, 3).astype(np.float32)
    d2 = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    want = np.sort(d2, axis=1)[:, :3].mean(axis=1)
    got = np.asarray(mean_sq_dist_to_knn(jnp.asarray(pts), k=3, window=64))
    # approximate KNN: demand 95% of points exact, rest close
    exact = np.isclose(got, want, rtol=1e-4).mean()
    assert exact > 0.9, exact
    assert np.all(got >= want - 1e-5)  # never closer than true NN
