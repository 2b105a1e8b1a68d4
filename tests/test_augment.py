"""ADA augmentation pipe: p=0 identity, p=1 transforms, adaptive update."""
import numpy as np
import jax
import jax.numpy as jnp

from gaussian_gan_decoder_tpu.train.augment import AugmentConfig, ada_update, augment_pipe


def test_p_zero_is_identity(rng):
    x = jnp.asarray(rng.rand(2, 3, 16, 16).astype(np.float32) * 2 - 1)
    y = augment_pipe(jax.random.PRNGKey(0), x, jnp.asarray(0.0))
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)


def test_p_one_transforms(rng):
    x = jnp.asarray(rng.rand(4, 3, 16, 16).astype(np.float32) * 2 - 1)
    y = augment_pipe(jax.random.PRNGKey(0), x, jnp.asarray(1.0))
    assert y.shape == x.shape
    assert not np.allclose(np.asarray(y), np.asarray(x))
    assert np.all(np.isfinite(np.asarray(y)))


def test_xflip_only_is_exact_mirror(rng):
    cfg = AugmentConfig(
        rotate90=0, xint=0, scale=0, rotate=0, aniso=0, xfrac=0,
        brightness=0, contrast=0, lumaflip=0, hue=0, saturation=0,
    )
    x = jnp.asarray(rng.rand(8, 3, 16, 16).astype(np.float32) * 2 - 1)
    y = np.asarray(augment_pipe(jax.random.PRNGKey(1), x, jnp.asarray(1.0), cfg))
    xn = np.asarray(x)
    flipped = np.allclose(y, xn[:, :, :, ::-1], atol=1e-4)
    same = np.allclose(y, xn, atol=1e-4)
    # per-sample: each is either flipped or untouched
    for i in range(8):
        assert (
            np.allclose(y[i], xn[i], atol=1e-4)
            or np.allclose(y[i], xn[i, :, :, ::-1], atol=1e-4)
        ), i


def test_ada_update_direction():
    p = jnp.asarray(0.5)
    up = ada_update(p, jnp.asarray(1.0), batch_size=8)    # overfit -> raise p
    down = ada_update(p, jnp.asarray(-1.0), batch_size=8)
    assert float(up) > 0.5 > float(down)
    assert 0.0 <= float(ada_update(jnp.asarray(0.0), jnp.asarray(-1.0), 8))


# ---- imgfilter (frequency-band amplification, ref augment.py:176-186,382-410)


def test_imgfilter_bank_golden_vs_reference():
    """Our filter bank must equal the reference AugmentPipe's Hz_fbank."""
    import os
    import sys

    ref = "/root/reference/PanoHead"
    if not os.path.isdir(ref):
        import pytest

        pytest.skip("no reference checkout")
    if ref not in sys.path:
        sys.path.insert(0, ref)
    torch = __import__("torch")
    from training.augment import AugmentPipe

    from gaussian_gan_decoder_tpu.train.augment import imgfilter_bank

    pipe = AugmentPipe(imgfilter=1)
    np.testing.assert_allclose(
        imgfilter_bank(), pipe.Hz_fbank.numpy(), atol=1e-12)


def test_apply_imgfilter_golden_vs_torch(rng):
    """Separable depthwise conv path vs a torch replica with the same gains."""
    import pytest

    torch = pytest.importorskip("torch")
    from gaussian_gan_decoder_tpu.train.augment import (
        apply_imgfilter, imgfilter_bank)

    n, c, h, w = 3, 3, 48, 48  # taps=43 -> reflect pad 21 needs dim > 21
    x = rng.rand(n, c, h, w).astype(np.float32) * 2 - 1
    g = np.exp2(rng.randn(n, 4).astype(np.float32) * 0.5)
    ours = np.asarray(apply_imgfilter(jnp.asarray(x), jnp.asarray(g)))

    fbank = torch.as_tensor(imgfilter_bank())
    hz = torch.as_tensor(g) @ fbank
    hz = hz.unsqueeze(1).repeat([1, c, 1]).reshape(n * c, 1, -1)
    p = fbank.shape[1] // 2
    t = torch.as_tensor(x).reshape(1, n * c, h, w)
    t = torch.nn.functional.pad(t, [p, p, p, p], mode="reflect")
    t = torch.nn.functional.conv2d(t, hz.unsqueeze(2), groups=n * c)
    t = torch.nn.functional.conv2d(t, hz.unsqueeze(3), groups=n * c)
    np.testing.assert_allclose(ours, t.reshape(n, c, h, w).numpy(),
                               atol=1e-4, rtol=1e-4)


def test_imgfilter_zero_std_is_identity(rng):
    """std=0 -> every gain 1 -> the band sum is a unit impulse (perfect
    reconstruction), so the augment must be a no-op away from borders."""
    cfg = AugmentConfig(
        xflip=0, rotate90=0, xint=0, scale=0, rotate=0, aniso=0, xfrac=0,
        brightness=0, contrast=0, lumaflip=0, hue=0, saturation=0,
        imgfilter=1.0, imgfilter_std=0.0,
    )
    x = jnp.asarray(rng.rand(2, 3, 32, 32).astype(np.float32) * 2 - 1)
    y = np.asarray(augment_pipe(jax.random.PRNGKey(2), x, jnp.asarray(1.0), cfg))
    np.testing.assert_allclose(y, np.asarray(x), atol=1e-4)


def test_imgfilter_transforms(rng):
    cfg = AugmentConfig(
        xflip=0, rotate90=0, xint=0, scale=0, rotate=0, aniso=0, xfrac=0,
        brightness=0, contrast=0, lumaflip=0, hue=0, saturation=0,
        imgfilter=1.0,
    )
    x = jnp.asarray(rng.rand(4, 3, 32, 32).astype(np.float32) * 2 - 1)
    y = np.asarray(augment_pipe(jax.random.PRNGKey(3), x, jnp.asarray(1.0), cfg))
    assert np.all(np.isfinite(y)) and not np.allclose(y, np.asarray(x))
