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


def test_alias_free_warp_golden_vs_reference(rng):
    """alias_free=True must reproduce the reference's wavelet-filtered
    geometric execution (ref augment.py:275-312) bit-for-bit given the
    same transform: drive the ACTUAL reference AugmentPipe with
    debug_percentile (every draw becomes a deterministic function of the
    percentile), rebuild that transform on our side from the same debug
    formulas, and compare outputs. Exercises the static-margin
    equivalence argument from the module docstring."""
    import os
    import sys

    import pytest

    ref = "/root/reference/PanoHead"
    if not os.path.isdir(ref):
        pytest.skip("no reference checkout")
    if ref not in sys.path:
        sys.path.insert(0, ref)
    torch = pytest.importorskip("torch")
    from training.augment import AugmentPipe

    import jax.numpy as jnp

    from gaussian_gan_decoder_tpu.train.augment import (
        _warp_affine_alias_free)

    n, c, h, w = 2, 3, 32, 32
    x = rng.rand(n, c, h, w).astype(np.float32) * 2 - 1
    pipe = AugmentPipe(xflip=1, rotate90=1, xint=1, scale=1, rotate=1,
                       aniso=1, xfrac=1)
    pipe.p.copy_(torch.ones([]))

    def ref_G_centered(q, width, height):
        """The reference's debug-percentile G_inv (image-centered pixel
        coords), per augment.py:195-274."""
        import numpy as _np

        def translate(tx, ty):
            m = _np.eye(3)
            m[0, 2], m[1, 2] = tx, ty
            return m

        def scale(sx, sy):
            return _np.diag([sx, sy, 1.0])

        def rot(theta):
            c0, s0 = _np.cos(theta), _np.sin(theta)
            return _np.array([[c0, -s0, 0], [s0, c0, 0], [0, 0, 1.0]])

        erfinv = float(torch.erfinv(torch.tensor(q * 2 - 1)))
        G = _np.eye(3)
        i = _np.floor(q * 2)
        G = G @ scale(1 - 2 * i, 1)                      # xflip (inv = self)
        i = _np.floor(q * 4)
        G = G @ rot(-(-_np.pi / 2 * i))                  # rotate90_inv
        t = q * 2 - 1
        G = G @ translate(-_np.rint(t * 0.125 * width),
                          -_np.rint(t * 0.125 * height))  # xint_inv
        s = 2.0 ** (erfinv * 0.2)
        G = G @ scale(1 / s, 1 / s)                      # scale_inv
        theta = (q * 2 - 1) * _np.pi
        G = G @ rot(-(-theta))                           # pre-rot_inv
        s = 2.0 ** (erfinv * 0.2)
        G = G @ scale(1 / s, s)                          # aniso_inv
        # post-rot: debug sets theta = 0 -> identity
        tf = erfinv * 0.125
        G = G @ translate(-tf * width, -tf * height)     # xfrac_inv
        return G

    s_pix = np.diag([w / 2.0, h / 2.0, 1.0])
    s_ndc = np.diag([2.0 / w, 2.0 / h, 1.0])
    for q in (0.3, 0.62, 0.97):
        with torch.no_grad():
            want = pipe(torch.from_numpy(x), debug_percentile=q).numpy()
        Gc = ref_G_centered(q, w, h)
        G_ndc = s_ndc @ Gc @ s_pix                       # centered-pixel -> NDC
        got = np.asarray(_warp_affine_alias_free(
            jnp.asarray(x), jnp.asarray(np.tile(G_ndc[None], (n, 1, 1)),
                                        jnp.float32)))
        np.testing.assert_allclose(got, want, atol=2e-4, err_msg=f"q={q}")


def test_alias_free_pipe_smoke(rng):
    """alias_free=True end-to-end: finite, shape-preserving, p=0 identity."""
    from gaussian_gan_decoder_tpu.train.augment import (
        AugmentConfig, augment_pipe)

    x = jnp.asarray(rng.rand(2, 3, 32, 32).astype(np.float32) * 2 - 1)
    cfg = AugmentConfig(alias_free=True)
    out = augment_pipe(jax.random.PRNGKey(0), x, jnp.asarray(1.0), cfg)
    assert out.shape == x.shape and np.isfinite(np.asarray(out)).all()
    out0 = augment_pipe(jax.random.PRNGKey(0), x, jnp.asarray(0.0), cfg)
    # p=0: the warp still runs but with an identity transform; the
    # up/down wavelet pair is perfect-reconstruction up to float error
    np.testing.assert_allclose(np.asarray(out0), np.asarray(x), atol=1e-3)
