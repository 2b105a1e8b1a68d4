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
