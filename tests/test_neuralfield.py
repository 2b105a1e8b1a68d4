"""Parity tests for ray sampling / marching / plane sampling."""
import numpy as np
import torch
import torch.nn.functional as F
import pytest

import jax
import jax.numpy as jnp

from gaussian_gan_decoder_tpu.neuralfield import (
    ImportanceRenderer,
    generate_planes,
    get_ray_limits_box,
    mip_ray_march,
    sample_from_planes,
    sample_rays,
)


def torch_ray_sampler(cam2world, intrinsics, resolution):
    """Oracle re-expressing ref ray_sampler.py:24-62."""
    cam2world = torch.as_tensor(cam2world)
    intrinsics = torch.as_tensor(intrinsics)
    N, M = cam2world.shape[0], resolution ** 2
    cam_locs = cam2world[:, :3, 3]
    fx = intrinsics[:, 0, 0]
    fy = intrinsics[:, 1, 1]
    cx = intrinsics[:, 0, 2]
    cy = intrinsics[:, 1, 2]
    sk = intrinsics[:, 0, 1]
    uv = torch.stack(
        torch.meshgrid(
            torch.arange(resolution, dtype=torch.float64),
            torch.arange(resolution, dtype=torch.float64),
            indexing="ij",
        )
    ) * (1.0 / resolution) + (0.5 / resolution)
    uv = uv.flip(0).reshape(2, -1).transpose(1, 0)[None].repeat(N, 1, 1)
    x_cam = uv[:, :, 0]
    y_cam = uv[:, :, 1]
    z_cam = torch.ones((N, M), dtype=torch.float64)
    x_lift = (
        x_cam - cx[:, None] + cy[:, None] * sk[:, None] / fy[:, None]
        - sk[:, None] * y_cam / fy[:, None]
    ) / fx[:, None] * z_cam
    y_lift = (y_cam - cy[:, None]) / fy[:, None] * z_cam
    cam_rel = torch.stack((x_lift, y_lift, z_cam, torch.ones_like(z_cam)), dim=-1)
    world = torch.bmm(cam2world, cam_rel.permute(0, 2, 1)).permute(0, 2, 1)[:, :, :3]
    dirs = world - cam_locs[:, None, :]
    dirs = F.normalize(dirs, dim=2)
    origins = cam_locs[:, None, :].repeat(1, dirs.shape[1], 1)
    return origins.numpy(), dirs.numpy()


def _lookat_cam2world():
    fwd = np.array([0.1, -0.2, -1.0])
    fwd = fwd / np.linalg.norm(fwd)
    up = np.array([0.0, 1.0, 0.0])
    right = -np.cross(up, fwd)
    right /= np.linalg.norm(right)
    up2 = np.cross(fwd, right)
    m = np.eye(4)
    m[:3, :3] = np.stack([right, up2, fwd], axis=-1)
    m[:3, 3] = np.array([0.3, 0.5, 2.7])
    return m


def test_ray_sampler_matches_torch():
    cam = _lookat_cam2world()[None].astype(np.float64)
    intr = np.array([[[4.26, 0, 0.5], [0, 4.26, 0.5], [0, 0, 1]]], np.float64)
    want_o, want_d = torch_ray_sampler(cam, intr, 8)
    got_o, got_d = sample_rays(jnp.asarray(cam), jnp.asarray(intr), 8)
    np.testing.assert_allclose(np.asarray(got_o), want_o, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(got_d), want_d, rtol=1e-9, atol=1e-12)


def torch_mip_ray_march(colors, densities, depths):
    """Oracle re-expressing ref ray_marcher.py:27-57."""
    colors = torch.as_tensor(colors)
    densities = torch.as_tensor(densities)
    depths = torch.as_tensor(depths)
    deltas = depths[:, :, 1:] - depths[:, :, :-1]
    colors_mid = (colors[:, :, :-1] + colors[:, :, 1:]) / 2
    densities_mid = F.softplus((densities[:, :, :-1] + densities[:, :, 1:]) / 2 - 1)
    depths_mid = (depths[:, :, :-1] + depths[:, :, 1:]) / 2
    density_delta = densities_mid * deltas
    alpha = 1 - torch.exp(-density_delta)
    alpha_shifted = torch.cat([torch.ones_like(alpha[:, :, :1]), 1 - alpha + 1e-10], -2)
    weights = alpha * torch.cumprod(alpha_shifted, -2)[:, :, :-1]
    composite_rgb = torch.sum(weights * colors_mid, -2)
    weight_total = weights.sum(2)
    composite_depth = torch.sum(weights * depths_mid, -2) / weight_total
    composite_depth = torch.nan_to_num(composite_depth, float("inf"))
    composite_depth = torch.clamp(composite_depth, torch.min(depths), torch.max(depths))
    return composite_rgb.numpy(), composite_depth.numpy(), weights.numpy()


def test_ray_marcher_matches_torch(rng):
    N, R, S, C = 2, 5, 9, 4
    colors = rng.rand(N, R, S, C)
    densities = rng.randn(N, R, S, 1) * 3
    depths = np.sort(rng.rand(N, R, S, 1) * 2 + 2.2, axis=2)
    want_rgb, want_depth, want_w = torch_mip_ray_march(colors, densities, depths)
    got_rgb, got_depth, got_w = mip_ray_march(
        jnp.asarray(colors), jnp.asarray(densities), jnp.asarray(depths)
    )
    np.testing.assert_allclose(np.asarray(got_rgb), want_rgb, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(got_depth), want_depth, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(got_w), want_w, rtol=1e-9, atol=1e-12)


def torch_sample_from_planes(plane_axes, planes, coords, box_warp, depth=1):
    """Oracle re-expressing ref renderer.py:31-58 (both variants)."""
    planes_t = torch.as_tensor(planes, dtype=torch.float64)
    coords_t = torch.as_tensor(coords, dtype=torch.float64)
    axes = torch.as_tensor(plane_axes, dtype=torch.float64)
    N, P, CD, H, W = planes_t.shape
    M = coords_t.shape[1]
    C, D = CD // depth, depth
    coords_t = (2.0 / box_warp) * coords_t
    cc = coords_t.unsqueeze(1).expand(-1, P, -1, -1).reshape(N * P, M, 3)
    inv = torch.linalg.inv(axes).unsqueeze(0).expand(N, -1, -1, -1).reshape(N * P, 3, 3)
    proj = torch.bmm(cc, inv)
    if depth == 1:
        feats = planes_t.reshape(N * P, C, H, W)
        grid = proj[..., :2].unsqueeze(1)
        out = F.grid_sample(feats, grid, mode="bilinear", padding_mode="zeros",
                            align_corners=False)
        out = out.permute(0, 3, 2, 1).reshape(N, P, M, C)
    else:
        feats = planes_t.reshape(N * P, C, D, H, W)
        grid = proj.unsqueeze(1).unsqueeze(2)
        out = F.grid_sample(feats, grid, mode="bilinear", padding_mode="zeros",
                            align_corners=False)
        out = out.permute(0, 4, 3, 2, 1).reshape(N, P, M, C)
    return out.numpy()


@pytest.mark.parametrize("variant,depth", [("eg3d", 1), ("panohead", 1), ("panohead", 3)])
def test_sample_from_planes_matches_torch(rng, variant, depth):
    N, C, H, W, M = 2, 4, 8, 8, 31
    planes = rng.randn(N, 3, C * depth, H, W)
    coords = (rng.rand(N, M, 3) - 0.5) * 1.2  # some out of box
    axes = generate_planes(variant)
    want = torch_sample_from_planes(axes, planes, coords, box_warp=1.0, depth=depth)
    got = np.asarray(
        sample_from_planes(axes, jnp.asarray(planes), jnp.asarray(coords),
                           box_warp=1.0, triplane_depth=depth)
    )
    np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-10)


def test_ray_limits_box():
    o = jnp.asarray([[[0.0, 0.0, 2.7], [0.0, 0.0, 2.7]]])
    d = jnp.asarray([[[0.0, 0.0, -1.0], [1.0, 0.0, 0.0]]])  # hit / miss
    tmin, tmax = get_ray_limits_box(o, d, box_side_length=1.0)
    np.testing.assert_allclose(np.asarray(tmin[0, 0, 0]), 2.2, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(tmax[0, 0, 0]), 3.2, rtol=1e-6)
    assert float(tmin[0, 1, 0]) == -1.0 and float(tmax[0, 1, 0]) == -2.0


def test_importance_renderer_smoke(rng):
    """Two-pass renderer on a synthetic density field: centered blob."""
    renderer = ImportanceRenderer(plane_variant="panohead")
    planes = jnp.asarray(rng.randn(1, 3, 4 * 3, 16, 16))

    def decoder_fn(feats, dirs):
        m = jnp.mean(feats, axis=1)  # (N, M, C)
        rgb = jax.nn.sigmoid(m[..., :3])
        sigma = jnp.sum(m, axis=-1, keepdims=True)
        return {"rgb": rgb, "sigma": sigma}

    o = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 2.7]), (1, 16, 3))
    d = jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.0]), (1, 16, 3))
    opts = dict(
        box_warp=1.0, depth_resolution=12, depth_resolution_importance=12,
        ray_start="auto", ray_end="auto", clamp_mode="softplus",
        triplane_depth=3,
    )
    rgb, depth, wsum = renderer(jax.random.PRNGKey(0), planes, decoder_fn, o, d, opts)
    assert rgb.shape == (1, 16, 3)
    assert depth.shape == (1, 16, 1)
    assert wsum.shape == (1, 16, 1)
    assert np.all(np.isfinite(np.asarray(rgb)))
    # depth must lie within the box-limited segment
    assert np.all(np.asarray(depth) >= 2.2 - 1e-4)
    assert np.all(np.asarray(depth) <= 3.2 + 1e-4)


@pytest.mark.parametrize("dtype", ["float32", "bfloat16", "int8"])
@pytest.mark.parametrize("select", [False, True])
def test_pallas_brick_table_matches_xla(dtype, select):
    """Pallas brick-table build (rotate AND channel-duplicated masked-
    select variants, interpret mode on CPU) == the XLA 8-slice concat
    table on the rows the sampler can index (y0 <= H; padded NY rows
    beyond hold garbage by design)."""
    from gaussian_gan_decoder_tpu.neuralfield.pallas_expand import (
        build_brick_table)
    from gaussian_gan_decoder_tpu.neuralfield.renderer import (
        _trilinear_table)

    rng = np.random.RandomState(select + 7)
    B, C, D, H, W = 3, 32, 3, 16, 16
    feats = rng.randn(B, C, D, H, W).astype(np.float32)
    if dtype == "int8":
        feats = np.clip(np.round(feats * 30), -127, 127).astype(np.int8)
    else:
        feats = feats.astype(dtype)
    fj = jnp.asarray(feats)

    want, _ = _trilinear_table(fj, pallas_build=False)
    want = want.reshape(B, D + 1, H + 1, W + 1, 8 * C)
    got, NY = build_brick_table(fj, select=select)
    got = got.reshape(B, D + 1, NY, W + 1, 8 * C)[:, :, : H + 1]
    assert got.dtype == fj.dtype
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_sample_from_planes_pallas_select_build():
    """End-to-end: pallas_build='select' sampling == default-path sampling."""
    rng = np.random.RandomState(3)
    planes = jnp.asarray(rng.randn(1, 3, 32 * 3, 16, 16).astype(np.float32))
    coords = jnp.asarray(((rng.rand(1, 200, 3) - 0.5) * 1.1).astype(np.float32))
    axes = generate_planes("panohead")
    ref = sample_from_planes(axes, planes, coords, box_warp=1.0, triplane_depth=3)
    got = sample_from_planes(axes, planes, coords, box_warp=1.0,
                             triplane_depth=3, pallas_build="select")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_int8_brick_sampling_error_budget():
    """int8 tri-grid bricks (flagship fast path) stay within ~2^-7
    relative feature error of the f32 path."""
    import jax
    import jax.numpy as jnp

    from gaussian_gan_decoder_tpu.neuralfield.renderer import (
        generate_planes, sample_from_planes)

    rng = np.random.RandomState(0)
    planes = jnp.asarray(rng.randn(1, 3, 32 * 3, 16, 16).astype(np.float32))
    coords = jnp.asarray(((rng.rand(1, 500, 3) - 0.5) * 0.9).astype(np.float32))
    axes = generate_planes("panohead")
    ref = sample_from_planes(axes, planes, coords, box_warp=1.0, triplane_depth=3)
    q = sample_from_planes(axes, planes, coords, box_warp=1.0, triplane_depth=3,
                           brick_dtype=jnp.int8)
    assert q.dtype == jnp.float32
    err = np.abs(np.asarray(q) - np.asarray(ref))
    scale = np.abs(np.asarray(planes)).max()
    assert err.max() <= scale * 2 ** -6.5, err.max() / scale
