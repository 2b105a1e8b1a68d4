"""Slab-gather decode path: packer invariants + kernel parity vs the
brick-table decode (interpret mode on the CPU mesh).

The slab path (decoder/point_blocks.py + pallas_heads.decode_project_
pallas_slab + renderer.build_slab_volume) replaces brick-table build +
HBM row gather + staging build + heads kernel with one Pallas kernel
over the raw int8 volume; these tests pin (1) the packing invariants the
kernel's DMA windows rely on, (2) volume-layout equivalence with the
corner-weights contract, (3) end-to-end decode parity against the
existing decode_project path modulo the Morton permutation.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gaussian_gan_decoder_tpu.decoder.heads import GaussianDecoder
from gaussian_gan_decoder_tpu.decoder.point_blocks import (
    DZW, EX, EY, X_ALIGN, Y_ALIGN, build_point_blocks, build_slab_weights,
)
from gaussian_gan_decoder_tpu.models.triplane import TriPlaneGenerator
from gaussian_gan_decoder_tpu.neuralfield.renderer import (
    build_slab_volume, generate_planes,
)


def _small_gen(variant="panohead"):
    return TriPlaneGenerator(
        z_dim=32, c_dim=25, w_dim=32, img_resolution=64, variant=variant,
        without_sr=True, channel_base=512, channel_max=32,
        rendering_kwargs=(("triplane_size", 64),),
    )


def _template(m=3000, seed=0):
    rng = np.random.RandomState(seed)
    # mixture: bulk inside the box + a shell poking out (exercises the
    # validity-folded corner weights at the border)
    pos = (rng.rand(m, 3).astype(np.float32) - 0.5) * 0.4
    pos[: m // 8] *= 3.0
    return pos


def test_point_blocks_invariants():
    pos = _template()
    axes = generate_planes("panohead")
    pb = build_point_blocks(pos, axes, box_warp=1.0, sizes=(3, 64, 64),
                            block=256)
    M = pos.shape[0]
    assert pb.n_points == M
    assert pb.m_padded == pb.n_blocks * pb.block
    assert pb.valid.sum() == M
    # permutation covers every point exactly once
    assert np.array_equal(np.sort(pb.perm), np.arange(M))
    # positions at valid slots = permuted template
    vs = np.where(pb.valid > 0)[0]
    np.testing.assert_array_equal(pb.positions[vs], pos[pb.perm])

    D, H, W = 3, 64, 64
    DZ = D + 2
    YP = -(-(H + 2) // Y_ALIGN) * Y_ALIGN
    XP = -(-(W + 2) // X_ALIGN) * X_ALIGN
    blk_of = np.repeat(np.arange(pb.n_blocks), pb.block)
    for p in range(3):
        c0 = p * 9
        ix, iy, iz = pb.idxw[c0 + 0], pb.idxw[c0 + 3], pb.idxw[c0 + 6]
        zt = pb.origins[blk_of, 3 * p]
        y0 = pb.origins[blk_of, 3 * p + 1] * Y_ALIGN
        x0 = pb.origins[blk_of, 3 * p + 2] * X_ALIGN
        v = pb.valid > 0
        # every point's BOTH corners inside its block's slab window
        assert np.all(iz[v] >= zt[v]) and np.all(iz[v] + 1 <= zt[v] + DZW - 1)
        assert np.all(iy[v] >= y0[v]) and np.all(iy[v] + 1 <= y0[v] + pb.ey - 1)
        assert np.all(ix[v] >= x0[v]) and np.all(ix[v] + 1 <= x0[v] + pb.ex - 1)
        # window inside the padded volume
        assert np.all(zt >= 0) and np.all(zt + DZW <= DZ)
        assert np.all(y0 >= 0) and np.all(y0 + pb.ey <= YP)
        assert np.all(x0 >= 0) and np.all(x0 + pb.ex <= XP)


def test_slab_volume_matches_corner_contract():
    """vol[p, z+1, y+1, (x+1)*C+c] == quantized feats[p, c, z, y, x], with
    zero pad rows — the padded-index contract of _corner_weights_1d."""
    rng = np.random.RandomState(1)
    C, D, H, W = 32, 3, 16, 16
    planes = rng.randn(1, 3, C * D, H, W).astype(np.float32)
    vol, scales = jax.jit(build_slab_volume, static_argnums=1)(
        jnp.asarray(planes), D)
    vol = np.asarray(vol)
    scales = np.asarray(scales)
    feats = planes.reshape(3, C, D, H, W)
    q8 = np.clip(np.round(feats / scales[:, :, None, None, None]),
                 -127, 127).astype(np.int8)
    YP = -(-(H + 2) // Y_ALIGN) * Y_ALIGN
    XP = -(-(W + 2) // X_ALIGN) * X_ALIGN
    assert vol.shape == (3, D + 2, YP, XP * C)
    v5 = vol.reshape(3, D + 2, YP, XP, C)
    np.testing.assert_array_equal(
        v5[:, 1:D + 1, 1:H + 1, 1:W + 1], np.transpose(q8, (0, 2, 3, 4, 1)))
    assert np.all(v5[:, 0] == 0) and np.all(v5[:, -1] == 0)
    assert np.all(v5[:, :, 0] == 0) and np.all(v5[:, :, H + 1:] == 0)
    assert np.all(v5[:, :, :, 0] == 0) and np.all(v5[:, :, :, W + 1:] == 0)


def test_slab_volume_clip_quantile():
    """slab_clip_q (build_slab_volume clip_quantile): percentile scales
    shrink the int8 step set by outlier features — inlier reconstruction
    error drops, outliers saturate to +-127*scale, and q=0 reproduces the
    absmax path exactly."""
    rng = np.random.RandomState(7)
    C, D, H, W = 32, 3, 16, 16
    feats = rng.randn(3, C, D, H, W).astype(np.float32)
    # plant heavy outliers: one voxel per (plane, channel) at 40x the bulk
    feats[:, :, 0, 0, 0] = 40.0
    planes = jnp.asarray(feats.reshape(1, 3, C * D, H, W))

    vol_a, sc_a = jax.jit(build_slab_volume, static_argnums=1)(planes, D)
    vol_q, sc_q = jax.jit(
        build_slab_volume, static_argnums=(1,),
        static_argnames=("clip_quantile",))(planes, D, clip_quantile=0.999)
    sc_a, sc_q = np.asarray(sc_a), np.asarray(sc_q)
    # quantile scales are much tighter than the outlier-set absmax
    assert np.all(sc_q < sc_a)
    # with 768 voxels/channel, q=0.999 interpolates 23% of the way into
    # the planted 40x outlier -> scale ratio ~3.4 (exactly the "roughly
    # halved step" the knob promises, conservatively bounded here)
    assert np.median(sc_a / sc_q) > 3.0, np.median(sc_a / sc_q)

    # dequantized reconstruction on the INLIER mass improves
    def dequant(vol, sc):
        v5 = np.asarray(vol).reshape(3, D + 2, -1, (vol.shape[-1] // C), C)
        core = v5[:, 1:D + 1, 1:H + 1, 1:W + 1].astype(np.float32)
        return core * sc[:, None, None, None, :]

    rec_a = np.transpose(dequant(vol_a, sc_a), (0, 4, 1, 2, 3))
    rec_q = np.transpose(dequant(vol_q, sc_q), (0, 4, 1, 2, 3))
    inlier = np.abs(feats) < 5.0
    err_a = np.abs(rec_a - feats)[inlier].mean()
    err_q = np.abs(rec_q - feats)[inlier].mean()
    assert err_q < 0.5 * err_a, (err_q, err_a)
    # outliers saturate to the clipped range, never explode
    out_mask = ~inlier
    assert np.abs(rec_q[out_mask]).max() <= (127.0 * sc_q.max()) * 1.001

    # q=0 is the absmax path bit-for-bit
    vol_0, sc_0 = jax.jit(
        build_slab_volume, static_argnums=(1,),
        static_argnames=("clip_quantile",))(planes, D, clip_quantile=0.0)
    np.testing.assert_array_equal(np.asarray(vol_0), np.asarray(vol_a))
    np.testing.assert_array_equal(np.asarray(sc_0), sc_a)


@pytest.mark.parametrize("use_embedding,variant", [
    (False, "panohead"), (True, "panohead"), (False, "eg3d")])
def test_slab_decode_parity(use_embedding, variant):
    """End-to-end rows parity: slab kernel vs the standard decode_project
    (int8 bricks + pallas heads), modulo the Morton permutation. The
    'eg3d' case exercises the BILINEAR slab variant (depth-1 planes: 2-D
    windows, dzw=1, ey=128, no z interpolation)."""
    gen = _small_gen(variant)
    dec = GaussianDecoder(
        generator=gen, decoder_type="sequential_reversed",
        int8_sampling=True, pallas_heads=True, heads_bf16=True,
        gelu="poly", use_xyz_embedding=use_embedding, slab_sampling=True,
    )
    params = dec.init(jax.random.PRNGKey(0),
                      generator_params=gen.init(jax.random.PRNGKey(1)))
    pos = jnp.asarray(_template(1500, seed=3))
    z = jax.random.normal(jax.random.PRNGKey(2), (1, 32))
    cp = jnp.zeros((1, 25))

    from gaussian_gan_decoder_tpu.flagship import default_camera_params
    from gaussian_gan_decoder_tpu.gaussians.cameras import make_camera
    _, c2w = default_camera_params()
    cam = make_camera(64, jnp.asarray(0.3), c2w)

    planes, _ = dec.synthesize_planes(params, z, cp)

    rows_std, layout_std = dec.decode_project(params, planes, pos, cam)
    ctx = dec.make_slab_context(pos, block=256)
    rows_slab, layout = dec.decode_project(params, planes, pos, cam,
                                           slab_ctx=ctx)
    assert layout == layout_std
    assert rows_slab.shape == (rows_std.shape[0], ctx.m_padded)

    rs = np.asarray(rows_std)[:, : pos.shape[0]]
    sl = np.asarray(rows_slab)
    vs = np.where(np.asarray(ctx.valid) > 0)[0]
    perm = np.asarray(ctx.perm)

    # raw head outputs (rows 0:14 — 16 is padded, rows 14:16 carry
    # uninitialized scratch in BOTH paths): bf16 lerp + bf16 chain vs
    # f32-weight lerp + bf16 chain — tolerance covers rounding, not math
    n_out = sum(d for _, d in layout.values())
    a = rs[:n_out][:, perm]
    b = sl[:n_out][:, vs]
    scale = np.maximum(np.abs(a).max(axis=1, keepdims=True), 1e-3)
    assert np.max(np.abs(a - b) / scale) < 5e-2, (
        np.max(np.abs(a - b) / scale))

    # projection rows follow the head outputs; check the blend-critical
    # ones loosely + visibility agreement
    from gaussian_gan_decoder_tpu.decoder.pallas_heads import PROJ_ROWS
    va = rs[PROJ_ROWS["visible"]][perm] > 0.5
    vb = sl[PROJ_ROWS["visible"]][vs] > 0.5
    assert np.mean(va == vb) > 0.995
    both = va & vb
    for r in ("px", "py", "depth", "opac"):
        aa, bb = rs[PROJ_ROWS[r]][perm][both], sl[PROJ_ROWS[r]][vs][both]
        s = np.maximum(np.abs(aa).max(), 1e-3)
        assert np.max(np.abs(aa - bb)) / s < 5e-2, (r, np.max(np.abs(aa - bb)) / s)

    # pad slots are culled
    pads = np.where(np.asarray(ctx.valid) == 0)[0]
    if pads.size:
        assert np.all(sl[PROJ_ROWS["visible"]][pads] == 0)
        assert np.all(sl[PROJ_ROWS["opac"]][pads] == 0)
        assert np.all(sl[PROJ_ROWS["radius_f"]][pads] == 0)


def test_slab_weights_reconstruct_lerp():
    """build_slab_weights x a dense volume == direct trilinear lerp with
    validity-folded corner weights (numpy oracle over random slabs)."""
    pos = _template(800, seed=5)
    axes = generate_planes("panohead")
    D, H, W = 3, 64, 64
    pb = build_point_blocks(pos, axes, box_warp=1.0, sizes=(D, H, W),
                            block=256)
    wzy, axs = build_slab_weights(pb)
    wzy = np.asarray(wzy, np.float32)
    axs = np.asarray(axs, np.float32)

    rng = np.random.RandomState(7)
    DZ = D + 2
    YP = -(-(H + 2) // Y_ALIGN) * Y_ALIGN
    XP = -(-(W + 2) // X_ALIGN) * X_ALIGN
    C = 32
    vol = rng.randint(-127, 128, (3, DZ, YP, XP, C)).astype(np.float32)

    kr = DZW * pb.ey
    blk_of = np.repeat(np.arange(pb.n_blocks), pb.block)
    out = np.zeros((pb.m_padded, C), np.float32)
    for p in range(3):
        zt = pb.origins[blk_of, 3 * p]
        y0 = pb.origins[blk_of, 3 * p + 1] * Y_ALIGN
        x0 = pb.origins[blk_of, 3 * p + 2] * X_ALIGN
        for m in range(pb.m_padded):
            slab = vol[p, zt[m]:zt[m] + DZW, y0[m]:y0[m] + pb.ey,
                       x0[m]:x0[m] + pb.ex]            # (DZW, EY, EX, C)
            t = np.einsum("k,kxc->xc", wzy[p, m], slab.reshape(kr, pb.ex, C))
            out[m] += np.einsum("x,xc->c", axs[m, p * pb.ex:(p + 1) * pb.ex], t)

    # oracle: direct 8-corner combine from idxw (global padded indices)
    ref = np.zeros_like(out)
    xw = pb.idxw
    for p in range(3):
        c0 = p * 9
        ix, wxa, wxb = xw[c0].astype(int), xw[c0 + 1], xw[c0 + 2]
        iy, wya, wyb = xw[c0 + 3].astype(int), xw[c0 + 4], xw[c0 + 5]
        iz, wza, wzb = xw[c0 + 6].astype(int), xw[c0 + 7], xw[c0 + 8]
        for dz, wz in ((0, wza), (1, wzb)):
            for dy, wy in ((0, wya), (1, wyb)):
                for dx, wx in ((0, wxa), (1, wxb)):
                    ref += vol[p, iz + dz, iy + dy, ix + dx] * (
                        wz * wy * wx)[:, None]
    v = pb.valid > 0
    err = np.max(np.abs(out[v] - ref[v])) / max(np.abs(ref[v]).max(), 1e-6)
    assert err < 2e-2, err  # bf16 weight rounding


def test_slab_context_disk_cache(tmp_path):
    """A warm make_slab_context (host pack loaded from the npz cache)
    reproduces the cold build bit-exactly, and a different template or
    block size never reads a stale entry (key covers both)."""
    gen = _small_gen()
    dec = GaussianDecoder(
        generator=gen, decoder_type="sequential_reversed",
        int8_sampling=True, pallas_heads=True, heads_bf16=True,
        gelu="poly", slab_sampling=True,
    )
    pos = jnp.asarray(_template(1500, seed=3))
    cold = dec.make_slab_context(pos, block=256)
    d = str(tmp_path)
    miss = dec.make_slab_context(pos, block=256, cache_dir=d)  # writes
    files = list(tmp_path.glob("slab_pack_*.npz"))
    assert len(files) == 1
    warm = dec.make_slab_context(pos, block=256, cache_dir=d)  # reads
    for k in ("origins", "wzy", "axs", "aux", "positions", "valid",
              "inv_slot"):
        np.testing.assert_array_equal(np.asarray(cold[k]), np.asarray(warm[k]))
        np.testing.assert_array_equal(np.asarray(cold[k]), np.asarray(miss[k]))
    for k in ("n_points", "block", "ey", "ex", "cond_dim", "m_padded"):
        assert cold[k] == warm[k] == miss[k]
    np.testing.assert_array_equal(cold.perm, warm.perm)
    # key sensitivity: new template / new block -> new cache entries
    dec.make_slab_context(jnp.asarray(_template(1500, seed=4)), block=256,
                          cache_dir=d)
    dec.make_slab_context(pos, block=512, cache_dir=d)
    assert len(list(tmp_path.glob("slab_pack_*.npz"))) == 3
