"""Fast (Pallas) rasterizer parity vs the XLA reference path.

Runs the kernel in interpret mode on CPU; the real Mosaic compile path is
exercised on TPU by bench.py.
"""
import numpy as np
import jax
import jax.numpy as jnp

from gaussian_gan_decoder_tpu.gaussians import make_camera
from gaussian_gan_decoder_tpu.splat import RasterizeConfig, rasterize
from gaussian_gan_decoder_tpu.splat.fast_raster import rasterize_fast
from tests.test_splat import _eg3d_cam2world, _random_scene, psnr


def test_fast_matches_xla_path(rng):
    n = 500
    means, scales, rots, opac, colors = _random_scene(rng, n)
    cam = make_camera(64, 0.4, jnp.asarray(_eg3d_cam2world(), jnp.float32))
    cfg = RasterizeConfig(tile_size=16, max_pairs=2 ** 13, tile_capacity=512, chunk=64)
    bg = jnp.asarray([0.2, 0.4, 0.6], jnp.float32)
    args = (
        cam,
        jnp.asarray(means), jnp.asarray(scales), jnp.asarray(rots), jnp.asarray(opac),
    )
    kw = dict(colors_precomp=jnp.asarray(colors), bg=bg, config=cfg)
    out_ref = rasterize(*args, **kw)
    out_fast = rasterize_fast(*args, **kw, interpret=True, overflow_budget=2 ** 13)
    assert int(out_ref["n_dropped"]) == 0 and int(out_fast["n_dropped"]) == 0
    p = psnr(np.asarray(out_fast["render"]), np.asarray(out_ref["render"]))
    assert p > 45.0, p


def test_fast_segment_alignment_prefix(rng):
    """Segments starting at arbitrary (unaligned) offsets blend correctly:
    many tiny tiles-worth of gaussians force unaligned starts."""
    n = 300
    means, scales, rots, opac, colors = _random_scene(rng, n)
    scales = scales * 0.3  # tiny: 1 tile each, many distinct segments
    cam = make_camera(64, 0.4, jnp.asarray(_eg3d_cam2world(), jnp.float32))
    cfg = RasterizeConfig(tile_size=16, max_pairs=2 ** 12, tile_capacity=256, chunk=64)
    args = (
        cam,
        jnp.asarray(means), jnp.asarray(scales), jnp.asarray(rots), jnp.asarray(opac),
    )
    kw = dict(colors_precomp=jnp.asarray(colors), config=cfg)
    out_ref = rasterize(*args, **kw)
    out_fast = rasterize_fast(*args, **kw, interpret=True, overflow_budget=2 ** 12)
    p = psnr(np.asarray(out_fast["render"]), np.asarray(out_ref["render"]))
    assert p > 45.0, p


import pytest


@pytest.mark.parametrize("copies", [1, 2])
def test_render_packed_matches_render_simple(copies):
    """Channel-major packed hot path == XLA render_simple (bit-close),
    including masking of the heads kernel's padding rows. copies=1 is the
    sort-row-rebalance candidate (all area>=2 pairs ride the overflow
    lane, PERFORMANCE.md round-2 roadmap / BENCH_COPIES knob)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gaussian_gan_decoder_tpu.flagship import default_camera_params
    from gaussian_gan_decoder_tpu.gaussians.cameras import make_camera
    from gaussian_gan_decoder_tpu.splat.fast_raster import render_packed
    from gaussian_gan_decoder_tpu.splat.rasterize import RasterizeConfig, render_simple

    cp, c2w = default_camera_params()
    cam = make_camera(64, jnp.asarray(0.227), c2w)
    N, Mpad = 500, 512
    k = jax.random.PRNGKey(0)
    xyz = (jax.random.uniform(k, (N, 3)) - 0.5) * 0.4
    scale = -jax.nn.softplus(jax.random.normal(jax.random.fold_in(k, 1), (N, 3)) + 5.0) - 1.0
    rot = jax.random.normal(jax.random.fold_in(k, 2), (N, 4))
    opa = jax.random.normal(jax.random.fold_in(k, 3), (N, 1))
    col = jax.random.normal(jax.random.fold_in(k, 4), (N, 3)) * 0.3
    cfg = RasterizeConfig(tile_size=16, max_pairs=2 ** 14, tile_capacity=256,
                          chunk=32, static_copies=copies,
                          overflow_budget=2 ** 12)
    bg = jnp.asarray([0.5, 0.5, 0.5])
    ref = render_simple(cam, dict(xyz=xyz, scale=scale, rotation=rot,
                                  opacity=opa, color=col), bg=bg, config=cfg,
                        backend="xla")

    out16 = jnp.zeros((Mpad, 16))
    out16 = (out16.at[:N, 0:3].set(col).at[:N, 3:4].set(opa)
             .at[:N, 4:8].set(rot).at[:N, 8:11].set(scale).at[:N, 11:14].set(xyz))
    out16 = out16.at[N:, :].set(7.7)  # padding rows must be masked out
    layout = {"color": (0, 3), "opacity": (3, 1), "rotation": (4, 4),
              "scale": (8, 3), "xyz": (11, 3)}
    out = render_packed(cam, out16, layout, N, bg=bg, config=cfg, interpret=True)
    a = np.asarray(ref["render"])
    b = np.asarray(out["render"])
    assert np.abs(a - b).max() < 2e-5


def test_bf16_color_packing_close():
    """bf16-packed (r,g)/(b,opacity) sort payloads stay within rounding
    distance of the f32 path (conics and pixel coords are untouched)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gaussian_gan_decoder_tpu.flagship import default_camera_params
    from gaussian_gan_decoder_tpu.gaussians.cameras import make_camera
    from gaussian_gan_decoder_tpu.splat.fast_raster import rasterize_fast
    from gaussian_gan_decoder_tpu.splat.rasterize import RasterizeConfig

    cp, c2w = default_camera_params()
    cam = make_camera(64, jnp.asarray(0.227), c2w)
    N = 500
    k = jax.random.PRNGKey(0)
    xyz = (jax.random.uniform(k, (N, 3)) - 0.5) * 0.4
    scale = jnp.exp(-jax.nn.softplus(jax.random.normal(jax.random.fold_in(k, 1), (N, 3)) + 5.0) - 1.0)
    rot = jax.random.normal(jax.random.fold_in(k, 2), (N, 4))
    opa = jax.nn.sigmoid(jax.random.normal(jax.random.fold_in(k, 3), (N,)))
    col = jnp.maximum(jax.random.normal(jax.random.fold_in(k, 4), (N, 3)) * 0.3 + 0.5, 0.0)
    kw = dict(tile_size=16, max_pairs=2 ** 14, tile_capacity=256,
              chunk=32, static_copies=2, overflow_budget=2 ** 12)
    bg = jnp.asarray([0.5, 0.5, 0.5])
    args = (cam, xyz, scale, rot, opa)
    a = rasterize_fast(*args, colors_precomp=col, bg=bg,
                       config=RasterizeConfig(**kw), interpret=True)
    b = rasterize_fast(*args, colors_precomp=col, bg=bg,
                       config=RasterizeConfig(**kw, bf16_colors=True),
                       interpret=True)
    ia, ib = np.asarray(a["render"]), np.asarray(b["render"])
    mse = ((ia - ib) ** 2).mean()
    psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
    assert psnr > 48.0, psnr


def test_pallas_blend_backward_matches_xla_autodiff():
    """custom-VJP Pallas blend (back-to-front replay + scatter-add) produces
    the same input gradients as XLA autodiff through the scan blend."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gaussian_gan_decoder_tpu.flagship import default_camera_params
    from gaussian_gan_decoder_tpu.gaussians.cameras import make_camera
    from gaussian_gan_decoder_tpu.splat.rasterize import (
        RasterizeConfig, render_simple)

    cp, c2w = default_camera_params()
    cam = make_camera(48, jnp.asarray(0.227), c2w)
    N = 200
    k = jax.random.PRNGKey(0)
    decoded = dict(
        xyz=(jax.random.uniform(k, (N, 3)) - 0.5) * 0.4,
        scale=-jax.nn.softplus(jax.random.normal(jax.random.fold_in(k, 1), (N, 3)) + 5.0) - 1.0,
        rotation=jax.random.normal(jax.random.fold_in(k, 2), (N, 4)),
        opacity=jax.random.normal(jax.random.fold_in(k, 3), (N, 1)),
        color=jax.random.normal(jax.random.fold_in(k, 4), (N, 3)) * 0.3,
    )
    cfg = RasterizeConfig(tile_size=16, max_pairs=2 ** 13, tile_capacity=256,
                          chunk=32, static_copies=2, overflow_budget=2 ** 11)
    bg = jnp.asarray([0.5, 0.5, 0.5])
    tgt = jax.random.uniform(jax.random.fold_in(k, 9), (3, 48, 48))

    def loss(d, backend):
        out = render_simple(cam, d, bg=bg, config=cfg, backend=backend)
        return jnp.sum((out["render"] - tgt) ** 2)

    assert abs(float(loss(decoded, "xla")) - float(loss(decoded, "pallas_diff"))) < 1e-3
    g_x = jax.grad(lambda d: loss(d, "xla"))(decoded)
    g_p = jax.grad(lambda d: loss(d, "pallas_diff"))(decoded)
    for key in decoded:
        a, b = np.asarray(g_x[key]), np.asarray(g_p[key])
        rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-8)
        assert rel < 1e-4, (key, rel)


def test_packed_v2_payloads_close():
    """packed_v2 (int16 tile-local pixel coords + f16 conics + bf16
    colors, 5 sort payloads) stays within rounding distance of the f32
    path — including overflow-lane pairs (large-radius gaussians)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gaussian_gan_decoder_tpu.flagship import default_camera_params
    from gaussian_gan_decoder_tpu.gaussians.cameras import make_camera
    from gaussian_gan_decoder_tpu.splat.fast_raster import rasterize_fast
    from gaussian_gan_decoder_tpu.splat.rasterize import RasterizeConfig

    cp, c2w = default_camera_params()
    cam = make_camera(64, jnp.asarray(0.227), c2w)
    N = 500
    k = jax.random.PRNGKey(0)
    xyz = (jax.random.uniform(k, (N, 3)) - 0.5) * 0.4
    scale = jnp.exp(-jax.nn.softplus(
        jax.random.normal(jax.random.fold_in(k, 1), (N, 3)) + 5.0) - 1.0)
    # a few big ones so the overflow lane carries packed coords too
    scale = scale.at[:8].mul(20.0)
    rot = jax.random.normal(jax.random.fold_in(k, 2), (N, 4))
    opa = jax.nn.sigmoid(jax.random.normal(jax.random.fold_in(k, 3), (N,)))
    col = jnp.maximum(
        jax.random.normal(jax.random.fold_in(k, 4), (N, 3)) * 0.3 + 0.5, 0.0)
    kw = dict(tile_size=16, max_pairs=2 ** 14, tile_capacity=256,
              chunk=32, static_copies=2, overflow_budget=2 ** 12)
    bg = jnp.asarray([0.5, 0.5, 0.5])
    args = (cam, xyz, scale, rot, opa)
    a = rasterize_fast(*args, colors_precomp=col, bg=bg,
                       config=RasterizeConfig(**kw), interpret=True)
    b = rasterize_fast(*args, colors_precomp=col, bg=bg,
                       config=RasterizeConfig(**kw, packed_payloads=True),
                       interpret=True)
    assert int(a["n_dropped"]) == 0 and int(b["n_dropped"]) == 0
    ia, ib = np.asarray(a["render"]), np.asarray(b["render"])
    mse = ((ia - ib) ** 2).mean()
    p = 10 * np.log10(1.0 / max(mse, 1e-12))
    assert p > 45.0, p


def test_packed_v3_rgb10_close():
    """packed_v3 (4 payload words: cc|op f16 pair, rgb in one 10-bit
    fixed-point word) stays within the rgb quantization budget of the f32
    path — including overflow-lane pairs. The 1/256 color step bounds the
    deviation near the 8-bit output quantization, far above the 39 dB
    acceptance."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gaussian_gan_decoder_tpu.flagship import default_camera_params
    from gaussian_gan_decoder_tpu.gaussians.cameras import make_camera
    from gaussian_gan_decoder_tpu.splat.fast_raster import rasterize_fast
    from gaussian_gan_decoder_tpu.splat.rasterize import RasterizeConfig

    cp, c2w = default_camera_params()
    cam = make_camera(64, jnp.asarray(0.227), c2w)
    N = 500
    k = jax.random.PRNGKey(0)
    xyz = (jax.random.uniform(k, (N, 3)) - 0.5) * 0.4
    scale = jnp.exp(-jax.nn.softplus(
        jax.random.normal(jax.random.fold_in(k, 1), (N, 3)) + 5.0) - 1.0)
    scale = scale.at[:8].mul(20.0)   # exercise the overflow lane
    rot = jax.random.normal(jax.random.fold_in(k, 2), (N, 4))
    opa = jax.nn.sigmoid(jax.random.normal(jax.random.fold_in(k, 3), (N,)))
    col = jnp.maximum(
        jax.random.normal(jax.random.fold_in(k, 4), (N, 3)) * 0.3 + 0.5, 0.0)
    kw = dict(tile_size=16, max_pairs=2 ** 14, tile_capacity=256,
              chunk=32, static_copies=2, overflow_budget=2 ** 12)
    bg = jnp.asarray([0.5, 0.5, 0.5])
    args = (cam, xyz, scale, rot, opa)
    a = rasterize_fast(*args, colors_precomp=col, bg=bg,
                       config=RasterizeConfig(**kw), interpret=True)
    b = rasterize_fast(*args, colors_precomp=col, bg=bg,
                       config=RasterizeConfig(**kw, packed_payloads=True,
                                              rgb10_payloads=True,
                                              fused_sort_key=True),
                       interpret=True)
    assert int(a["n_dropped"]) == 0 and int(b["n_dropped"]) == 0
    ia, ib = np.asarray(a["render"]), np.asarray(b["render"])
    mse = ((ia - ib) ** 2).mean()
    p = 10 * np.log10(1.0 / max(mse, 1e-12))
    assert p > 44.0, p


def test_blend_mxu_power_close():
    """blend_mxu_power (quadratic-basis MXU falloff) matches the direct
    dx/dy VPU form to f32 rounding on the packed_v2 path — tile-local
    coords keep the basis cancellation benign."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gaussian_gan_decoder_tpu.flagship import default_camera_params
    from gaussian_gan_decoder_tpu.gaussians.cameras import make_camera
    from gaussian_gan_decoder_tpu.splat.fast_raster import rasterize_fast
    from gaussian_gan_decoder_tpu.splat.rasterize import RasterizeConfig

    cp, c2w = default_camera_params()
    cam = make_camera(64, jnp.asarray(0.227), c2w)
    N = 500
    k = jax.random.PRNGKey(0)
    xyz = (jax.random.uniform(k, (N, 3)) - 0.5) * 0.4
    scale = jnp.exp(-jax.nn.softplus(
        jax.random.normal(jax.random.fold_in(k, 1), (N, 3)) + 5.0) - 1.0)
    scale = scale.at[:8].mul(20.0)   # overflow-lane coverage
    rot = jax.random.normal(jax.random.fold_in(k, 2), (N, 4))
    opa = jax.nn.sigmoid(jax.random.normal(jax.random.fold_in(k, 3), (N,)))
    col = jnp.maximum(
        jax.random.normal(jax.random.fold_in(k, 4), (N, 3)) * 0.3 + 0.5, 0.0)
    kw = dict(tile_size=16, max_pairs=2 ** 14, tile_capacity=256,
              chunk=32, static_copies=2, overflow_budget=2 ** 12,
              packed_payloads=True, fused_sort_key=True)
    bg = jnp.asarray([0.5, 0.5, 0.5])
    args = (cam, xyz, scale, rot, opa)
    a = rasterize_fast(*args, colors_precomp=col, bg=bg,
                       config=RasterizeConfig(**kw), interpret=True)
    b = rasterize_fast(*args, colors_precomp=col, bg=bg,
                       config=RasterizeConfig(**kw, blend_mxu_power=True),
                       interpret=True)
    ia, ib = np.asarray(a["render"]), np.asarray(b["render"])
    mse = ((ia - ib) ** 2).mean()
    p = 10 * np.log10(1.0 / max(mse, 1e-12))
    assert p > 60.0, p


def test_rgb10_pack_roundtrip():
    """rgb10 pack -> kernel-side integer unpack round-trips to the 1/256
    step across [0, 1023/256], clamping above."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gaussian_gan_decoder_tpu.splat.fast_raster import (
        RGB10_SCALE, _rgb10_pack)

    r = np.linspace(0.0, 4.2, 257).astype(np.float32)
    g = r[::-1].copy()
    b = (r * 0.37) % 3.9
    w = jax.lax.bitcast_convert_type(
        _rgb10_pack(jnp.asarray(r), jnp.asarray(g), jnp.asarray(b)),
        jnp.int32)
    ur = np.asarray((w >> 20) & 0x3FF) / RGB10_SCALE
    ug = np.asarray((w >> 10) & 0x3FF) / RGB10_SCALE
    ub = np.asarray(w & 0x3FF) / RGB10_SCALE
    top = 1023 / RGB10_SCALE
    for got, want in ((ur, r), (ug, g), (ub, b)):
        want_c = np.minimum(want, top)
        assert np.abs(got - want_c).max() <= 0.5 / RGB10_SCALE + 1e-6


def test_f16_pack_roundtrip():
    """Manual f16 pack (XLA side) -> integer unpack (kernel side) round-
    trips to f16 precision across the conic magnitude range."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gaussian_gan_decoder_tpu.splat.fast_raster import _f16_pack_pair
    from gaussian_gan_decoder_tpu.splat.pallas_blend import _f16_unpack

    vals = np.concatenate([
        np.geomspace(2e-8, 3.4, 300),
        -np.geomspace(2e-8, 3.4, 300),
        [0.0, 3.33, -3.33],
    ]).astype(np.float32)
    a = jnp.asarray(vals)
    b = jnp.asarray(vals[::-1].copy())
    w = jax.lax.bitcast_convert_type(_f16_pack_pair(a, b), jnp.int32)
    ua = np.asarray(_f16_unpack((w >> 16) & 0xFFFF, 12))
    ub = np.asarray(_f16_unpack(w & 0xFFFF, 12))
    # f16 relative error 2^-11 (+ subnormal flush below 1.5e-8)
    for got, want in ((ua, vals), (ub, vals[::-1])):
        rel = np.abs(got - want) / np.maximum(np.abs(want), 1.5e-8)
        mask = np.abs(want) > 6e-8
        assert rel[mask].max() < 2 ** -10.5, rel[mask].max()


def test_fused_sort_key_close():
    """Single fused uint32 (tile | depth>>11) sort key matches the 2-key
    lexsort render to high PSNR (ties at 2^-12 relative depth may swap)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gaussian_gan_decoder_tpu.flagship import default_camera_params
    from gaussian_gan_decoder_tpu.gaussians.cameras import make_camera
    from gaussian_gan_decoder_tpu.splat.fast_raster import rasterize_fast
    from gaussian_gan_decoder_tpu.splat.rasterize import RasterizeConfig

    cp, c2w = default_camera_params()
    cam = make_camera(64, jnp.asarray(0.227), c2w)
    N = 500
    k = jax.random.PRNGKey(0)
    xyz = (jax.random.uniform(k, (N, 3)) - 0.5) * 0.4
    scale = jnp.exp(-jax.nn.softplus(
        jax.random.normal(jax.random.fold_in(k, 1), (N, 3)) + 5.0) - 1.0)
    rot = jax.random.normal(jax.random.fold_in(k, 2), (N, 4))
    opa = jax.nn.sigmoid(jax.random.normal(jax.random.fold_in(k, 3), (N,)))
    col = jnp.maximum(
        jax.random.normal(jax.random.fold_in(k, 4), (N, 3)) * 0.3 + 0.5, 0.0)
    kw = dict(tile_size=16, max_pairs=2 ** 14, tile_capacity=256,
              chunk=32, static_copies=2, overflow_budget=2 ** 12)
    bg = jnp.asarray([0.5, 0.5, 0.5])
    args = (cam, xyz, scale, rot, opa)
    a = rasterize_fast(*args, colors_precomp=col, bg=bg,
                       config=RasterizeConfig(**kw, packed_payloads=True),
                       interpret=True)
    b = rasterize_fast(*args, colors_precomp=col, bg=bg,
                       config=RasterizeConfig(**kw, packed_payloads=True,
                                              fused_sort_key=True),
                       interpret=True)
    ia, ib = np.asarray(a["render"]), np.asarray(b["render"])
    mse = ((ia - ib) ** 2).mean()
    p = 10 * np.log10(1.0 / max(mse, 1e-12))
    assert p > 45.0, p


def test_decode_and_render_stream_matches_single():
    """Batched-backbone frame stream == per-frame decode_and_render."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gaussian_gan_decoder_tpu.flagship import (
        decode_and_render, decode_and_render_stream, default_camera_params,
        flagship_decoder)
    from gaussian_gan_decoder_tpu.models.triplane import TriPlaneGenerator
    from gaussian_gan_decoder_tpu.splat.rasterize import RasterizeConfig

    gen = TriPlaneGenerator(
        z_dim=32, c_dim=25, w_dim=32, img_resolution=64, variant="panohead",
        without_sr=True, channel_base=512, channel_max=32,
        rendering_kwargs=(
            ("triplane_size", 16), ("depth_resolution", 4),
            ("depth_resolution_importance", 4),
            ("c_gen_conditioning_zero", True),
        ),
    )
    dec = flagship_decoder(gen=gen)  # hidden_dim 128: the fused kernel assumes it
    params = dec.init(jax.random.PRNGKey(0),
                      generator_params=gen.init(jax.random.PRNGKey(1)))
    cp, c2w = default_camera_params()
    init_pos = (jax.random.uniform(jax.random.PRNGKey(2), (640, 3)) - 0.5) * 0.4
    rcfg = RasterizeConfig(tile_size=16, max_pairs=2 ** 13, tile_capacity=128,
                           chunk=32, static_copies=2, overflow_budget=2 ** 11,
                           packed_payloads=True)
    zs = jax.random.normal(jax.random.PRNGKey(3), (2, 1, 32))
    imgs = decode_and_render_stream(
        dec, params, zs, cp, c2w, init_pos, jnp.asarray(0.227),
        image_size=64, raster_cfg=rcfg, frame_batch=2)
    assert imgs.shape == (2, 3, 64, 64)
    for i in range(2):
        ref, _ = decode_and_render(
            dec, params, zs[i], cp, c2w, init_pos, jnp.asarray(0.227),
            image_size=64, raster_cfg=rcfg, backend="pallas")
        # the stream's batch-2 backbone convs reorder reductions vs the
        # batch-1 path (~1e-7 relative in the planes), which the decoder
        # chain + rasterizer can amplify to ~5e-4 on a few pixels; assert
        # PSNR-grade agreement rather than bitwise
        a, b = np.asarray(imgs[i]), np.asarray(ref)
        mse = ((a - b) ** 2).mean()
        psnr = 10 * np.log10(1.0 / max(mse, 1e-14))
        assert psnr > 60.0, psnr
        assert np.abs(a - b).max() < 2e-3


@pytest.mark.parametrize("budget_factor", [0.5, 2.0])
def test_expand_ids_matches_repeat(budget_factor):
    """The sort-based overflow-id expansion is integer-exact vs jnp.repeat
    for every in-budget slot, both when the budget truncates (drops) and
    when it pads (garbage slots are masked by valid_o in the callers)."""
    from gaussian_gan_decoder_tpu.splat.fast_raster import _expand_ids

    rng = np.random.default_rng(7)
    N = 20_000
    counts = jnp.asarray(
        np.where(rng.random(N) < 0.03, rng.integers(1, 40, N), 0)
        .astype(np.int32))
    total = int(counts.sum())
    budget = int(total * budget_factor)
    ids, offs, over_total = _expand_ids(counts, budget)
    ref = jnp.repeat(jnp.arange(N, dtype=jnp.int32), counts,
                     total_repeat_length=budget)
    valid = min(total, budget)
    assert int(over_total) == total
    np.testing.assert_array_equal(np.asarray(ids[:valid]),
                                  np.asarray(ref[:valid]))
    np.testing.assert_array_equal(
        np.asarray(offs), np.asarray(jnp.cumsum(counts) - counts))
    # past-the-end slots hold the finite N-1 pad (NOT N: jnp.take's 'fill'
    # mode would turn id N into NaN rows that leak through the blend
    # kernel's masked-by-multiply reads); the callers' valid_o mask covers
    # their tile keys
    assert (np.asarray(ids[valid:]) == N - 1).all()
