"""Parity + shape tests for the StyleGAN2 backbone re-design."""
import math

import numpy as np
import torch
import torch.nn.functional as F
import pytest

import jax
import jax.numpy as jnp

from gaussian_gan_decoder_tpu.models import (
    FullyConnectedLayer,
    MappingNetwork,
    SynthesisNetwork,
    Generator,
)


def test_fully_connected_matches_torch_math(rng):
    cfg = FullyConnectedLayer(8, 6, activation="lrelu", lr_multiplier=0.01, bias_init=1.0)
    p = cfg.init(jax.random.PRNGKey(0))
    x = rng.randn(4, 8).astype(np.float64)

    w = np.asarray(p["weight"], np.float64)
    b = np.asarray(p["bias"], np.float64)
    # ref networks_stylegan2.py:114-127
    want = torch.as_tensor(x) @ torch.as_tensor(w.T * (0.01 / math.sqrt(8)))
    want = F.leaky_relu(want + torch.as_tensor(b) * 0.01, 0.2) * math.sqrt(2)
    got = np.asarray(cfg.apply(jax.tree.map(lambda a: a.astype(jnp.float64), p), jnp.asarray(x)))
    np.testing.assert_allclose(got, want.numpy(), rtol=1e-6, atol=1e-9)


def test_mapping_truncation_and_broadcast():
    cfg = MappingNetwork(z_dim=16, c_dim=0, w_dim=16, num_ws=5, num_layers=2)
    p = cfg.init(jax.random.PRNGKey(1))
    p["w_avg"] = jnp.full((16,), 0.7)
    z = jax.random.normal(jax.random.PRNGKey(2), (3, 16))
    w_full = cfg.apply(p, z, None, truncation_psi=1.0)
    assert w_full.shape == (3, 5, 16)
    # all num_ws broadcasts identical
    np.testing.assert_allclose(np.asarray(w_full[:, 0]), np.asarray(w_full[:, 4]))
    w_trunc = cfg.apply(p, z, None, truncation_psi=0.0)
    np.testing.assert_allclose(np.asarray(w_trunc), 0.7, rtol=1e-6)
    w_half = cfg.apply(p, z, None, truncation_psi=0.5)
    np.testing.assert_allclose(
        np.asarray(w_half), (np.asarray(w_full) + 0.7) / 2, rtol=1e-5, atol=1e-6
    )


def test_mapping_conditioning_shapes():
    cfg = MappingNetwork(z_dim=16, c_dim=25, w_dim=16, num_ws=None, num_layers=2)
    p = cfg.init(jax.random.PRNGKey(1))
    z = jax.random.normal(jax.random.PRNGKey(2), (2, 16))
    c = jax.random.normal(jax.random.PRNGKey(3), (2, 25))
    w = cfg.apply(p, z, c)
    assert w.shape == (2, 16)


def test_synthesis_network_shapes_and_num_ws():
    cfg = SynthesisNetwork(w_dim=32, img_resolution=32, img_channels=6,
                           channel_base=1024, channel_max=64, num_fp16_res=0)
    # resolutions 4, 8, 16, 32: num_conv = 1 + 2*3 = 7, +1 torgb = 8
    assert cfg.num_ws == 8
    p = cfg.init(jax.random.PRNGKey(0))
    ws = jax.random.normal(jax.random.PRNGKey(1), (2, cfg.num_ws, 32))
    img = cfg.apply(p, ws, noise_mode="const")
    assert img.shape == (2, 6, 32, 32)
    assert img.dtype == jnp.float32


def test_generator_end_to_end_and_determinism():
    g = Generator(z_dim=32, c_dim=0, w_dim=32, img_resolution=16, img_channels=3,
                  channel_base=512, channel_max=64, num_fp16_res=0)
    p = g.init(jax.random.PRNGKey(0))
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 32))
    img1 = g.apply(p, z, None, noise_mode="const")
    img2 = g.apply(p, z, None, noise_mode="const")
    np.testing.assert_allclose(np.asarray(img1), np.asarray(img2))
    assert img1.shape == (2, 3, 16, 16)
    # random noise changes the output
    img3 = g.apply(p, z, None, noise_mode="random", noise_key=jax.random.PRNGKey(7))
    # noise_strength init 0 => still equal; bump strength to check plumbing
    p2 = jax.tree.map(lambda a: a, p)
    def bump(d):
        for k, v in d.items():
            if k == "noise_strength":
                d[k] = jnp.ones_like(v)
            elif isinstance(v, dict):
                bump(v)
    bump(p2["synthesis"])
    img4 = g.apply(p2, z, None, noise_mode="random", noise_key=jax.random.PRNGKey(7))
    img5 = g.apply(p2, z, None, noise_mode="random", noise_key=jax.random.PRNGKey(8))
    assert not np.allclose(np.asarray(img4), np.asarray(img5))


def test_generator_is_jittable_and_differentiable():
    g = Generator(z_dim=16, c_dim=0, w_dim=16, img_resolution=8, img_channels=3,
                  channel_base=256, channel_max=32, num_fp16_res=0)
    p = g.init(jax.random.PRNGKey(0))
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 16))

    @jax.jit
    def loss_fn(params):
        img = g.apply(params, z, None, noise_mode="const")
        return jnp.mean(jnp.square(img))

    val, grads = jax.value_and_grad(loss_fn)(p)
    assert np.isfinite(float(val))
    leaf_norms = [float(jnp.abs(x).sum()) for x in jax.tree.leaves(grads)]
    assert any(n > 0 for n in leaf_norms)
