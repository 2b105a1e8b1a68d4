"""Rasterizer correctness: tiled pipeline vs exact all-pairs oracle,
gradient checks, camera math parity, PLY roundtrip."""
import math

import numpy as np
import torch
import pytest

import jax
import jax.numpy as jnp

from gaussian_gan_decoder_tpu.gaussians import (
    Camera,
    GaussianScene,
    make_camera,
)
from gaussian_gan_decoder_tpu.gaussians.model import create_from_points, gaussian_scene_from_decoded
from gaussian_gan_decoder_tpu.gaussians.ply import load_ply, save_ply
from gaussian_gan_decoder_tpu.splat import (
    RasterizeConfig,
    rasterize,
    reference_rasterize,
    render_simple,
)


def _eg3d_cam2world():
    m = np.eye(4, dtype=np.float32)
    m[:3, :3] = np.diag([-1.0, 1.0, -1.0])
    m[2, 3] = 2.7
    return m


def _random_scene(rng, n):
    means = (rng.rand(n, 3).astype(np.float32) - 0.5) * 0.8
    scales = np.exp(rng.randn(n, 3).astype(np.float32) * 0.5 - 4.0)
    rots = rng.randn(n, 4).astype(np.float32)
    rots /= np.linalg.norm(rots, axis=1, keepdims=True)
    opac = 1 / (1 + np.exp(-rng.randn(n, 1).astype(np.float32)))
    colors = rng.rand(n, 3).astype(np.float32)
    return means, scales, rots, opac, colors


def psnr(a, b):
    mse = np.mean((a - b) ** 2)
    return 10 * math.log10(1.0 / max(mse, 1e-12))


def test_camera_matches_torch_custom_cam():
    """CustomCam math (ref scene/cameras.py:75-92, graphics_utils.py:52-74)."""
    extr = torch.tensor(_eg3d_cam2world(), dtype=torch.float64)
    fov = 0.3
    znear, zfar = 0.01, 10.0
    tanHalf = math.tan(fov / 2)
    top = tanHalf * znear
    right = tanHalf * znear
    P = torch.zeros(4, 4, dtype=torch.float64)
    P[0, 0] = 2 * znear / (2 * right)
    P[1, 1] = 2 * znear / (2 * top)
    P[3, 2] = 1.0
    P[2, 2] = (zfar + znear) / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    wvt = extr.T.inverse()
    full = wvt @ P.T
    center = wvt[3, :3]

    cam = make_camera(64, jnp.asarray(fov, jnp.float64), jnp.asarray(np.asarray(extr)))
    np.testing.assert_allclose(np.asarray(cam.world_view_transform), wvt.numpy(), atol=1e-12)
    np.testing.assert_allclose(np.asarray(cam.full_proj_transform), full.numpy(), atol=1e-12)
    np.testing.assert_allclose(np.asarray(cam.camera_center), center.numpy(), atol=1e-12)


def test_tiled_matches_reference_oracle(rng):
    n = 300
    means, scales, rots, opac, colors = _random_scene(rng, n)
    cam = make_camera(64, 0.4, jnp.asarray(_eg3d_cam2world()))
    bg = jnp.asarray([0.55, 0.52, 0.51])
    cfg = RasterizeConfig(tile_size=16, max_pairs=4096, tile_capacity=512, chunk=64)
    out = rasterize(
        cam, jnp.asarray(means), jnp.asarray(scales), jnp.asarray(rots),
        jnp.asarray(opac), colors_precomp=jnp.asarray(colors), bg=bg, config=cfg,
    )
    assert int(out["n_dropped"]) == 0
    want = np.asarray(
        reference_rasterize(
            cam, jnp.asarray(means), jnp.asarray(scales), jnp.asarray(rots),
            jnp.asarray(opac), jnp.asarray(colors), bg=bg,
        )
    )
    got = np.asarray(out["render"])
    assert got.shape == (3, 64, 64)
    p = psnr(got, want)
    assert p > 45.0, f"tiled vs oracle PSNR {p:.2f} dB"


def test_capacity_truncation_reported(rng):
    n = 300
    means, scales, rots, opac, colors = _random_scene(rng, n)
    cam = make_camera(32, 0.4, jnp.asarray(_eg3d_cam2world()))
    cfg = RasterizeConfig(tile_size=16, max_pairs=64, tile_capacity=64, chunk=64)
    out = rasterize(
        cam, jnp.asarray(means), jnp.asarray(scales), jnp.asarray(rots),
        jnp.asarray(opac), colors_precomp=jnp.asarray(colors), config=cfg,
    )
    assert int(out["n_dropped"]) > 0


def test_rasterize_gradients_match_finite_differences(rng):
    """Autodiff through project+bin+blend vs central differences."""
    n = 12
    means, scales, rots, opac, colors = _random_scene(rng, n)
    scales *= 4  # make them visible at 16x16
    cam = make_camera(16, 0.5, jnp.asarray(_eg3d_cam2world()))
    cfg = RasterizeConfig(tile_size=16, max_pairs=64, tile_capacity=64, chunk=32)
    bg = jnp.asarray([0.1, 0.2, 0.3])
    target = jnp.asarray(rng.rand(3, 16, 16).astype(np.float32))

    def loss(means_, opac_, scales_):
        out = rasterize(
            cam, means_, scales_, jnp.asarray(rots), opac_,
            colors_precomp=jnp.asarray(colors), bg=bg, config=cfg,
        )
        return jnp.mean(jnp.square(out["render"] - target))

    g_means, g_opac, g_scales = jax.grad(loss, argnums=(0, 1, 2))(
        jnp.asarray(means, jnp.float64), jnp.asarray(opac, jnp.float64),
        jnp.asarray(scales, jnp.float64),
    )

    def num_grad(arr, idx, f, h=1e-5):
        arr = np.asarray(arr, np.float64)
        a1, a2 = arr.copy(), arr.copy()
        a1[idx] += h
        a2[idx] -= h
        return (f(jnp.asarray(a1)) - f(jnp.asarray(a2))) / (2 * h)

    f_means = lambda m: float(loss(m, jnp.asarray(opac, jnp.float64), jnp.asarray(scales, jnp.float64)))
    f_opac = lambda o: float(loss(jnp.asarray(means, jnp.float64), o, jnp.asarray(scales, jnp.float64)))
    for idx in [(0, 0), (3, 1), (7, 2)]:
        want = num_grad(means, idx, f_means)
        np.testing.assert_allclose(float(g_means[idx]), want, rtol=2e-3, atol=1e-7)
    for idx in [(0, 0), (5, 0)]:
        want = num_grad(opac, idx, f_opac)
        np.testing.assert_allclose(float(g_opac[idx]), want, rtol=2e-3, atol=1e-7)
    assert np.all(np.isfinite(np.asarray(g_scales)))


def test_render_simple_shapes(rng):
    n = 50
    decoded = {
        "xyz": jnp.asarray((rng.rand(n, 3) - 0.5) * 0.5),
        "scale": jnp.asarray(rng.randn(n, 3) * 0.3 - 5.0),
        "rotation": jnp.asarray(rng.randn(n, 4)),
        "opacity": jnp.asarray(rng.randn(n, 1)),
        "color": jnp.asarray(rng.rand(n, 3)),
    }
    cam = make_camera(32, 0.4, jnp.asarray(_eg3d_cam2world()))
    cfg = RasterizeConfig(tile_size=16, max_pairs=1024, tile_capacity=64, chunk=32)
    out = render_simple(cam, decoded, bg=jnp.zeros(3), config=cfg)
    assert out["render"].shape == (3, 32, 32)
    assert out["radii"].shape == (n,)
    assert np.all(np.isfinite(np.asarray(out["render"])))


def test_ply_roundtrip(tmp_path, rng):
    n = 20
    pts = jnp.asarray(rng.randn(n, 3).astype(np.float32))
    scene = create_from_points(pts, colors=jnp.asarray(rng.rand(n, 3).astype(np.float32)))
    path = str(tmp_path / "scene.ply")
    save_ply(scene, path)
    loaded = load_ply(path, max_sh_degree=0)
    np.testing.assert_allclose(np.asarray(loaded.xyz), np.asarray(scene.xyz), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(loaded.features_dc), np.asarray(scene.features_dc), rtol=1e-6
    )
    np.testing.assert_allclose(np.asarray(loaded.scaling), np.asarray(scene.scaling), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(loaded.opacity), np.asarray(scene.opacity), rtol=1e-6)
    # header is reference-layout
    head = open(path, "rb").read(500).decode("ascii", "ignore")
    assert "property float f_dc_0" in head and "property float rot_3" in head


def test_scene_from_decoded_activations(rng):
    decoded = {
        "xyz": jnp.asarray(rng.randn(5, 3)),
        "scale": jnp.asarray(rng.randn(5, 3)),
        "rotation": jnp.asarray(rng.randn(5, 4)),
        "opacity": jnp.asarray(rng.randn(5, 1)),
        "color": jnp.asarray(rng.rand(5, 3)),
    }
    s = gaussian_scene_from_decoded(decoded)
    np.testing.assert_allclose(np.asarray(s.get_scaling), np.exp(np.asarray(decoded["scale"])), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(s.get_opacity), 1 / (1 + np.exp(-np.asarray(decoded["opacity"]))), rtol=1e-6
    )
    norms = np.linalg.norm(np.asarray(s.get_rotation), axis=1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-6)


def test_ply_header_matches_reference_layout(tmp_path, rng):
    """Byte-layout golden vs the reference writer's property list
    (gaussian_model.py:266-279 construct_list_of_attributes + :281-308
    save_ply): exact header lines and row struct width, sh degree 0 and 1."""
    from gaussian_gan_decoder_tpu.gaussians.model import GaussianScene

    for deg, n_rest in ((0, 0), (1, 3)):
        n = 5
        scene = GaussianScene(
            xyz=jnp.asarray(rng.randn(n, 3), jnp.float32),
            features_dc=jnp.asarray(rng.randn(n, 1, 3), jnp.float32),
            features_rest=jnp.asarray(rng.randn(n, n_rest, 3), jnp.float32),
            scaling=jnp.asarray(rng.randn(n, 3), jnp.float32),
            rotation=jnp.asarray(rng.randn(n, 4), jnp.float32),
            opacity=jnp.asarray(rng.randn(n, 1), jnp.float32),
            valid=jnp.ones((n,), bool),
            max_sh_degree=deg, active_sh_degree=deg,
        )
        path = str(tmp_path / f"deg{deg}.ply")
        save_ply(scene, path)
        blob = open(path, "rb").read()
        header, _, body = blob.partition(b"end_header\n")
        want = ["ply", "format binary_little_endian 1.0", f"element vertex {n}"]
        names = ["x", "y", "z", "nx", "ny", "nz", "f_dc_0", "f_dc_1", "f_dc_2"]
        names += [f"f_rest_{i}" for i in range(3 * n_rest)]
        names += ["opacity", "scale_0", "scale_1", "scale_2",
                  "rot_0", "rot_1", "rot_2", "rot_3"]
        want += [f"property float {nm}" for nm in names]
        assert header.decode().splitlines() == want
        assert len(body) == n * len(names) * 4          # packed <f4 rows
        # normals are zeros like the reference (save_ply :285)
        row = np.frombuffer(body, "<f4", count=len(names))
        np.testing.assert_array_equal(row[3:6], 0.0)
