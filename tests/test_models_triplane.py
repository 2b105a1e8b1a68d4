"""Smoke + behavior tests for the unified TriPlaneGenerator."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gaussian_gan_decoder_tpu.models import TriPlaneGenerator


def tiny_generator(variant, c_gen_conditioning_zero=True):
    # NB with c_gen_conditioning_zero=True the PanoHead forward() path is
    # degenerate BY REFERENCE SEMANTICS (apply_delta_c rebinds c to zeros
    # before cloning, triplane.py:109-124); tests of the full forward use
    # False, matching real GAN configs.
    return TriPlaneGenerator(
        z_dim=32, c_dim=25, w_dim=32, img_resolution=64, img_channels=3,
        variant=variant, without_sr=True,
        channel_base=1024, channel_max=64,
        rendering_kwargs=(
            ("triplane_size", 32),
            ("depth_resolution", 8),
            ("depth_resolution_importance", 8),
            ("c_gen_conditioning_zero", c_gen_conditioning_zero),
        ),
    )


def _camera_params():
    cam2world = np.eye(4, dtype=np.float32)
    cam2world[2, 3] = 2.7
    cam2world[:3, :3] = np.diag([-1.0, 1.0, -1.0])  # look at origin down -z
    intr = np.array([[4.26, 0, 0.5], [0, 4.26, 0.5], [0, 0, 1]], np.float32)
    return jnp.asarray(
        np.concatenate([cam2world.reshape(-1), intr.reshape(-1)])[None]
    )


@pytest.mark.parametrize("variant", ["eg3d", "panohead"])
def test_synthesis_output_shapes(variant):
    g = tiny_generator(variant, c_gen_conditioning_zero=False)
    params = g.init(jax.random.PRNGKey(0))
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 32))
    c = _camera_params()
    out = g.apply(params, z, c, neural_rendering_resolution=16,
                  key=jax.random.PRNGKey(2))
    assert out["image_raw"].shape == (1, 3, 16, 16)
    assert out["image_depth"].shape == (1, 1, 16, 16)
    depth = g.triplane_depth
    assert out["feature_planes"].shape == (1, 3, 32 * depth, 32, 32)
    if variant == "panohead":
        assert out["image_mask"].shape == (1, 1, 16, 16)
        mask = np.asarray(out["image_mask"])
        assert mask.min() >= -0.001 - 1e-5 and mask.max() <= 1.001 + 1e-5
    for v in out.values():
        assert np.all(np.isfinite(np.asarray(v)))


@pytest.mark.parametrize("variant", ["eg3d", "panohead"])
def test_sample_mixed_shapes(variant):
    g = tiny_generator(variant)
    params = g.init(jax.random.PRNGKey(0))
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 32))
    c = _camera_params()
    ws = g.mapping(params, z, c)
    assert ws.shape == (1, g.num_ws, 32)
    coords = jax.random.uniform(jax.random.PRNGKey(3), (1, 100, 3)) - 0.5
    dirs = jnp.zeros_like(coords).at[..., 2].set(-1.0)
    out = g.sample_mixed(params, coords, dirs, ws)
    assert out["sigma"].shape == (1, 100, 1)
    assert out["rgb"].shape == (1, 100, 32)


def test_truncation_pulls_towards_w_avg():
    g = tiny_generator("eg3d")
    params = g.init(jax.random.PRNGKey(0))
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 32))
    c = _camera_params().repeat(2, axis=0)
    w1 = g.mapping(params, z, c, truncation_psi=1.0)
    w0 = g.mapping(params, z, c, truncation_psi=0.0)
    w_avg = np.asarray(params["backbone"]["mapping"]["w_avg"])
    np.testing.assert_allclose(
        np.asarray(w0[0]), np.broadcast_to(w_avg, w0[0].shape),
        rtol=1e-5, atol=1e-6,
    )
    assert not np.allclose(np.asarray(w1), np.asarray(w0))


def test_apply_delta_c_shifts_translation():
    g = tiny_generator("panohead", c_gen_conditioning_zero=False)
    params = g.init(jax.random.PRNGKey(0))
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 32))
    c = _camera_params()
    c_new, delta_c = g.apply_delta_c(params, z, c)
    assert delta_c.shape == (1, 3)
    np.testing.assert_allclose(
        np.asarray(c_new[0, 3]), np.asarray(c[0, 3] + delta_c[0, 0]), rtol=1e-6
    )
    # only translation entries change
    unchanged = [i for i in range(25) if i not in (3, 7, 11)]
    np.testing.assert_allclose(
        np.asarray(c_new[0, unchanged]), np.asarray(c[0, unchanged])
    )


def test_apply_delta_c_zero_conditioning_rebinds_c():
    """Reference quirk parity (triplane.py:109-124): with
    c_gen_conditioning_zero=True the returned camera is ZEROS + delta
    translation (golden-tested in test_reference_golden.py)."""
    g = tiny_generator("panohead")
    params = g.init(jax.random.PRNGKey(0))
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 32))
    c = _camera_params()
    c_new, delta_c = g.apply_delta_c(params, z, c)
    unchanged = [i for i in range(25) if i not in (3, 7, 11)]
    assert np.abs(np.asarray(c_new[0, unchanged])).max() == 0.0
    np.testing.assert_allclose(np.asarray(c_new[0, [3, 7, 11]]),
                               np.asarray(delta_c[0]), rtol=1e-6)


def test_synthesis_planes_jit_and_cache_pattern():
    g = tiny_generator("panohead")
    params = g.init(jax.random.PRNGKey(0))
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 32))
    c = _camera_params()
    ws = g.mapping(params, z, c)
    planes = jax.jit(lambda p, w: g.synthesis_planes(p, w))(params, ws)
    out1 = g.render_planes(params, planes, ws, c, neural_rendering_resolution=16,
                           key=jax.random.PRNGKey(5))
    out2 = g.synthesis(params, ws, c, neural_rendering_resolution=16,
                       key=jax.random.PRNGKey(5))
    np.testing.assert_allclose(
        np.asarray(out1["image_raw"]), np.asarray(out2["image_raw"]), rtol=1e-6, atol=1e-7
    )
