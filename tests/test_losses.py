"""Loss parity vs torch oracles + LPIPS/ID plumbing."""
import math

import numpy as np
import torch
import torch.nn.functional as F
import pytest

import jax
import jax.numpy as jnp

from gaussian_gan_decoder_tpu.losses import (
    IRSE50,
    VGG16LPIPS,
    area_downsample,
    id_loss,
    l1_loss,
    l2_loss,
    lpips_loss,
    sobel_loss,
    ssim,
)


def torch_ssim(img1, img2, window_size=11):
    """Oracle re-expressing ref loss_utils.py:29-63."""
    img1 = torch.as_tensor(img1)[None]
    img2 = torch.as_tensor(img2)[None]
    channel = img1.size(-3)
    g = torch.tensor(
        [math.exp(-((x - window_size // 2) ** 2) / (2 * 1.5 ** 2)) for x in range(window_size)],
        dtype=img1.dtype,
    )
    g = g / g.sum()
    w = g[:, None] @ g[None, :]
    w = w.expand(channel, 1, window_size, window_size).contiguous()
    pad = window_size // 2
    mu1 = F.conv2d(img1, w, padding=pad, groups=channel)
    mu2 = F.conv2d(img2, w, padding=pad, groups=channel)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 ** 2, mu2 ** 2, mu1 * mu2
    s1 = F.conv2d(img1 * img1, w, padding=pad, groups=channel) - mu1_sq
    s2 = F.conv2d(img2 * img2, w, padding=pad, groups=channel) - mu2_sq
    s12 = F.conv2d(img1 * img2, w, padding=pad, groups=channel) - mu1_mu2
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    m = ((2 * mu1_mu2 + c1) * (2 * s12 + c2)) / ((mu1_sq + mu2_sq + c1) * (s1 + s2 + c2))
    return m.mean().item(), m.numpy()


def test_ssim_matches_torch(rng):
    a = rng.rand(3, 32, 32)
    b = rng.rand(3, 32, 32)
    want_mean, want_map = torch_ssim(a, b)
    got_mean, got_map = ssim(jnp.asarray(a), jnp.asarray(b))
    # our window constant is f32 (like the reference's type_as(img) on f32)
    np.testing.assert_allclose(float(got_mean), want_mean, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(got_map)[None], want_map, rtol=1e-5, atol=1e-7)


def test_ssim_identical_images_is_one(rng):
    a = rng.rand(3, 24, 24)
    m, _ = ssim(jnp.asarray(a), jnp.asarray(a))
    np.testing.assert_allclose(float(m), 1.0, rtol=1e-6)


def test_sobel_matches_torch(rng):
    a = rng.rand(3, 16, 16).astype(np.float32)
    b = rng.rand(3, 16, 16).astype(np.float32)
    kx = torch.tensor([[1, 0, -1], [2, 0, -2], [1, 0, -1]], dtype=torch.float32)
    kx = kx.unsqueeze(0).expand(1, 3, 3, 3).reshape(1, 3, 3, 3)
    ky = torch.tensor([[1, 2, 1], [0, 0, 0], [-1, -2, -1]], dtype=torch.float32)
    ky = ky.unsqueeze(0).expand(1, 3, 3, 3).reshape(1, 3, 3, 3)
    rx = F.conv2d(torch.tensor(a)[None], kx, padding=1)
    tx = F.conv2d(torch.tensor(b)[None], kx, padding=1)
    ry = F.conv2d(torch.tensor(a)[None], ky, padding=1)
    ty = F.conv2d(torch.tensor(b)[None], ky, padding=1)
    want = ((rx - tx) ** 2 + (ry - ty) ** 2)
    got_mean, got_map = sobel_loss(jnp.asarray(a), jnp.asarray(b))
    np.testing.assert_allclose(float(got_mean), want.mean().item(), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got_map), want.numpy(), rtol=1e-4, atol=1e-6)


def test_area_downsample_matches_torch(rng):
    x = rng.rand(1, 3, 64, 64).astype(np.float32)
    want = F.interpolate(torch.tensor(x), size=(16, 16), mode="area").numpy()
    got = np.asarray(area_downsample(jnp.asarray(x), 16))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


def test_l1_l2(rng):
    a, b = rng.rand(4, 4), rng.rand(4, 4)
    np.testing.assert_allclose(float(l1_loss(jnp.asarray(a), jnp.asarray(b))), np.abs(a - b).mean())
    np.testing.assert_allclose(float(l2_loss(jnp.asarray(a), jnp.asarray(b))), ((a - b) ** 2).mean())


def test_lpips_zero_for_identical_and_positive_otherwise(rng):
    vgg = VGG16LPIPS()
    p = vgg.init(jax.random.PRNGKey(0))
    a = jnp.asarray(rng.rand(1, 3, 64, 64).astype(np.float32))
    b = jnp.asarray(rng.rand(1, 3, 64, 64).astype(np.float32))
    d_same = float(lpips_loss(vgg, p, a, a, downsampling=False))
    d_diff = float(lpips_loss(vgg, p, a, b, downsampling=False))
    assert abs(d_same) < 1e-6
    assert d_diff > 1e-4


def test_lpips_torchvision_key_mapping(rng):
    """load_torch_state_dict consumes torchvision `features.N.*` naming."""
    vgg = VGG16LPIPS()
    # build a synthetic torchvision-style state dict
    plan = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M", 512, 512, 512]
    state = {}
    idx = 0
    cin = 3
    for c in plan:
        if c == "M":
            idx += 1
            continue
        state[f"features.{idx}.weight"] = rng.randn(c, cin, 3, 3).astype(np.float32) * 0.01
        state[f"features.{idx}.bias"] = np.zeros(c, np.float32)
        cin = c
        idx += 2
    params = vgg.load_torch_state_dict(state)
    x = jnp.asarray(rng.rand(1, 3, 64, 64).astype(np.float32))
    emb = vgg.embed(params, x * 255)
    assert np.all(np.isfinite(np.asarray(emb)))


def test_irse50_embed_and_id_loss(rng):
    model = IRSE50()
    p = model.init(jax.random.PRNGKey(0))
    img = jnp.asarray(rng.rand(1, 3, 512, 512).astype(np.float32))
    e = model.extract_feats(p, img)
    assert e.shape == (1, 512)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(e)), 1.0, rtol=1e-5)
    loss_same = float(id_loss(model, p, img, img))
    np.testing.assert_allclose(loss_same, 0.0, atol=1e-5)
    img2 = jnp.asarray(rng.rand(1, 3, 512, 512).astype(np.float32))
    assert float(id_loss(model, p, img, img2)) > 1e-5


def test_adaptive_avg_pool_matches_torch(rng):
    from gaussian_gan_decoder_tpu.losses.id_loss import _adaptive_avg_pool

    x = rng.rand(1, 2, 188, 188).astype(np.float32)
    want = torch.nn.AdaptiveAvgPool2d((112, 112))(torch.tensor(x)).numpy()
    got = np.asarray(_adaptive_avg_pool(jnp.asarray(x), 112))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_lpips_bf16_close_to_f32():
    """The --bf16_lpips knob: bf16 feature convs must stay within a small
    relative error of the f32 LPIPS distance (the distance itself is
    computed in f32 either way)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gaussian_gan_decoder_tpu.losses import VGG16LPIPS
    from gaussian_gan_decoder_tpu.losses.lpips import lpips_loss

    vgg = VGG16LPIPS()
    p = vgg.init(jax.random.PRNGKey(0))
    k = jax.random.PRNGKey(1)
    a = jax.random.uniform(k, (1, 3, 128, 128)) * 2 - 1
    b = jnp.clip(a + jax.random.normal(jax.random.fold_in(k, 1), a.shape) * 0.1,
                 -1, 1)
    f32 = float(lpips_loss(vgg, p, a, b))
    bf16 = float(lpips_loss(vgg, p, a, b, dtype=jnp.bfloat16))
    assert f32 > 0
    assert abs(bf16 - f32) / f32 < 0.05, (bf16, f32)
