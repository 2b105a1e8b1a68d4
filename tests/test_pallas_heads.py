"""Parity: fused Pallas head chain (interpret mode) vs the XLA head path.

Covers all three decoder chain variants, with and without xyz embedding.
The Pallas kernel must reproduce decoder/heads.py bit-closely in f32
(same math, same transform placement in the chain).
"""
import jax
import jax.numpy as jnp
import pytest

from gaussian_gan_decoder_tpu.decoder.heads import _CHAINS, GaussianDecoder
from gaussian_gan_decoder_tpu.decoder.pallas_heads import decode_heads_pallas
from gaussian_gan_decoder_tpu.flagship import flagship_generator


def _xla_reference(dec, params, feats, pos):
    heads = dec._heads()
    cond = dec.embedder(pos) if dec.use_xyz_embedding else pos
    ref = {}
    for name, _ in _CHAINS[dec.decoder_type]:
        v = heads[name].apply(params[name], feats, cond)
        if name == "xyz":
            v = v * 0.01 + pos
        elif name == "scale":
            v = dec.activate_scale(v)
        ref[name] = v
        if dec.decoder_type != "parallel":
            cond = jnp.concatenate([cond, v], axis=-1)
    return ref


@pytest.mark.parametrize("decoder_type", ["sequential_reversed", "sequential", "parallel"])
@pytest.mark.parametrize("use_emb", [False, True])
def test_pallas_heads_parity(decoder_type, use_emb):
    gen = flagship_generator()
    dec = GaussianDecoder(
        generator=gen, decoder_type=decoder_type, use_xyz_embedding=use_emb
    )
    params = dec.init(jax.random.PRNGKey(0))
    M = 257  # deliberately not a block multiple
    feats = jax.random.normal(jax.random.PRNGKey(1), (3, M, 32), jnp.float32)
    pos = jax.random.normal(jax.random.PRNGKey(2), (M, 3), jnp.float32) * 0.2

    ref = _xla_reference(dec, params, feats, pos)
    cond0 = dec.embedder(pos) if use_emb else pos
    out = decode_heads_pallas(
        {name: params[name] for name, _ in _CHAINS[decoder_type]},
        _CHAINS[decoder_type],
        jnp.mean(feats, axis=0), cond0, pos, dec.scale_offset,
        parallel=(decoder_type == "parallel"),
        compute_dtype=jnp.float32, block=128, interpret=True,
    )
    for name in ref:
        assert float(jnp.max(jnp.abs(out[name] - ref[name]))) < 1e-4, name


def test_decoder_pallas_flag_routes():
    """GaussianDecoder(pallas_heads=True) produces the same attrs via
    decode_from_planes (interpret unavailable through the flag — run the
    wrapper directly on CPU where pallas_call falls back to interpret)."""
    gen = flagship_generator()
    dec = GaussianDecoder(generator=gen)
    params = dec.init(jax.random.PRNGKey(0))
    M = 64
    feats = jax.random.normal(jax.random.PRNGKey(1), (3, M, 32), jnp.float32)
    pos = jax.random.normal(jax.random.PRNGKey(2), (M, 3), jnp.float32) * 0.2
    ref = _xla_reference(dec, params, feats, pos)
    out = decode_heads_pallas(
        {name: params[name] for name, _ in _CHAINS[dec.decoder_type]},
        _CHAINS[dec.decoder_type], jnp.mean(feats, axis=0), pos, pos,
        dec.scale_offset, compute_dtype=jnp.float32, block=64, interpret=True,
    )
    for name in ref:
        assert jnp.allclose(out[name], ref[name], atol=1e-4), name


def test_decode_project_matches_heads_plus_projection():
    """Fused heads+projection kernel == decode_heads_pallas followed by the
    XLA project_channels stage + sigmoid/SH0 transforms (v2 hot path)."""
    import numpy as np

    from gaussian_gan_decoder_tpu.decoder.pallas_heads import (
        PROJ_ROWS, decode_project_pallas)
    from gaussian_gan_decoder_tpu.flagship import default_camera_params
    from gaussian_gan_decoder_tpu.gaussians.cameras import make_camera
    from gaussian_gan_decoder_tpu.gaussians.sh import SH_C0
    from gaussian_gan_decoder_tpu.splat.projection import project_channels

    gen = flagship_generator()
    dec = GaussianDecoder(generator=gen, decoder_type="sequential_reversed")
    params = dec.init(jax.random.PRNGKey(0))
    M = 257
    feats = jax.random.normal(jax.random.PRNGKey(1), (3, M, 32), jnp.float32)
    pos = jax.random.normal(jax.random.PRNGKey(2), (M, 3), jnp.float32) * 0.2
    _, c2w = default_camera_params()
    cam = make_camera(64, jnp.asarray(0.227), c2w)
    chain = _CHAINS["sequential_reversed"]
    hp = {name: params[name] for name, _ in chain}
    fm = jnp.mean(feats, axis=0)

    rows, layout = decode_project_pallas(
        hp, chain, fm, pos, pos, dec.scale_offset, cam=cam, n_points=M,
        compute_dtype=jnp.float32, block=128, interpret=True)

    out16, layout2 = decode_heads_pallas(
        hp, chain, fm, pos, pos, dec.scale_offset,
        compute_dtype=jnp.float32, block=128, interpret=True,
        return_packed=True)
    assert layout == layout2
    o = out16.T
    x0, _ = layout["xyz"]
    r0, _ = layout["rotation"]
    s0, _ = layout["scale"]
    c0, _ = layout["color"]
    op0, _ = layout["opacity"]
    ch = project_channels(
        cam, o[x0], o[x0 + 1], o[x0 + 2],
        (o[r0], o[r0 + 1], o[r0 + 2], o[r0 + 3]),
        (jnp.exp(o[s0]), jnp.exp(o[s0 + 1]), jnp.exp(o[s0 + 2])),
    )
    valid = jnp.arange(o.shape[1]) < M
    expect = {
        "px": ch["px"], "py": ch["py"], "conic_a": ch["conic_a"],
        "conic_b": ch["conic_b"], "conic_c": ch["conic_c"],
        "opac": jax.nn.sigmoid(o[op0]),
        "col_r": jnp.maximum(SH_C0 * o[c0] + 0.5, 0.0),
        "col_g": jnp.maximum(SH_C0 * o[c0 + 1] + 0.5, 0.0),
        "col_b": jnp.maximum(SH_C0 * o[c0 + 2] + 0.5, 0.0),
        "depth": ch["depth"], "radius_f": ch["radius_f"],
        "visible": (ch["visible"] & valid).astype(jnp.float32),
    }
    np.testing.assert_allclose(np.asarray(rows[:16]), np.asarray(o),
                               atol=1e-5)
    for name, r in PROJ_ROWS.items():
        got = np.asarray(rows[r])
        want = np.asarray(expect[name])
        # masked-out lanes may differ in dependent quantities; compare where
        # either is visible-consistent
        np.testing.assert_allclose(got, want, atol=1e-4, err_msg=name)


@pytest.mark.parametrize("depth,brick_dtype,lerp_mode", [
    (3, None, "bcast"), (3, jnp.bfloat16, "bcast"), (3, jnp.int8, "bcast"),
    (1, None, "bcast"), (3, jnp.int8, "dots"), (1, None, "dots"),
])
def test_decode_project_fused_sampling_parity(depth, brick_dtype, lerp_mode):
    """Gather-fused kernel (lerp/dequant/mean reconstructed in VMEM from
    raw brick rows) == sample_from_planes + decode_project_pallas on the
    SAME table dtype. 'bcast' lerp accumulates f32 (tight); 'dots' runs
    the expand/segment-sum MXU form in bf16 (loose: 2^-8 weight
    rounding)."""
    import numpy as np

    from gaussian_gan_decoder_tpu.decoder.pallas_heads import (
        decode_project_pallas, decode_project_pallas_fused)
    from gaussian_gan_decoder_tpu.flagship import default_camera_params
    from gaussian_gan_decoder_tpu.gaussians.cameras import make_camera
    from gaussian_gan_decoder_tpu.neuralfield.renderer import (
        generate_planes, sample_from_planes, sample_fused_inputs)

    C, H = 32, 16
    planes = jax.random.normal(
        jax.random.PRNGKey(1), (1, 3, C * depth, H, H), jnp.float32)
    M, block = 300, 128
    Mpad = -(-M // block) * block
    # spread positions past the box edge to exercise the validity masks
    pos = (jax.random.uniform(jax.random.PRNGKey(2), (M, 3)) - 0.5) * 1.3
    axes = generate_planes("panohead")
    box_warp = 1.0

    gen = flagship_generator()
    dec = GaussianDecoder(generator=gen, decoder_type="sequential_reversed")
    params = dec.init(jax.random.PRNGKey(0))
    chain = _CHAINS["sequential_reversed"]
    hp = {name: params[name] for name, _ in chain}
    _, c2w = default_camera_params()
    cam = make_camera(64, jnp.asarray(0.227), c2w)

    feats = sample_from_planes(
        axes, planes, pos[None], box_warp=box_warp, triplane_depth=depth,
        brick_dtype=brick_dtype)[0]
    fm = jnp.mean(feats, axis=0).astype(jnp.float32)
    ref_rows, layout_ref = decode_project_pallas(
        hp, chain, fm, pos, pos, dec.scale_offset, cam=cam, n_points=M,
        compute_dtype=jnp.float32, block=block, interpret=True)

    rows_in, wts, smats, K = sample_fused_inputs(
        axes, planes, pos[None], box_warp=box_warp, triplane_depth=depth,
        brick_dtype=brick_dtype, pad_to=Mpad)
    assert K == (8 if depth > 1 else 4)
    got_rows, layout = decode_project_pallas_fused(
        hp, chain, rows_in, wts, smats, K, pos, pos, dec.scale_offset,
        cam=cam, n_points=M, compute_dtype=jnp.float32, block=block,
        interpret=True, lerp_mode=lerp_mode)
    assert layout == layout_ref

    atol = (3e-2 if brick_dtype == jnp.bfloat16 or lerp_mode == "dots"
            else 1e-3)
    np.testing.assert_allclose(
        np.asarray(got_rows[:, :M]), np.asarray(ref_rows[:, :M]), atol=atol)


def test_decoder_fused_sampling_flag_routes():
    """GaussianDecoder(fused_sampling=True).decode_project == the plain
    decode_project at the decoder level (same planes, same params)."""
    import dataclasses

    import numpy as np

    from gaussian_gan_decoder_tpu.flagship import default_camera_params
    from gaussian_gan_decoder_tpu.gaussians.cameras import make_camera

    gen = flagship_generator()
    dec = GaussianDecoder(generator=gen, decoder_type="sequential_reversed",
                          pallas_heads=True, int8_sampling=True)
    params = dec.init(jax.random.PRNGKey(0))
    M = 200
    planes = jax.random.normal(
        jax.random.PRNGKey(1),
        (1, 3, 32 * gen.triplane_depth, 32, 32), jnp.float32)
    pos = (jax.random.uniform(jax.random.PRNGKey(2), (M, 3)) - 0.5) * 0.4
    _, c2w = default_camera_params()
    cam = make_camera(64, jnp.asarray(0.227), c2w)

    rows_a, layout_a = dec.decode_project(params, planes, pos, cam)
    dec_f = dataclasses.replace(dec, fused_sampling=True)
    rows_b, layout_b = dec_f.decode_project(params, planes, pos, cam)
    assert layout_a == layout_b
    np.testing.assert_allclose(
        np.asarray(rows_b[:, :M]), np.asarray(rows_a[:, :M]), atol=1e-3)


def test_heads_vjp_matches_xla_grads():
    """Custom-VJP fused heads chain: gradients match jax.grad through the
    XLA reference chain (weights, biases, feats, cond, init) to ~1e-4."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gaussian_gan_decoder_tpu.decoder.heads import _CHAINS, DecoderHead
    from gaussian_gan_decoder_tpu.decoder.pallas_heads_vjp import (
        decode_heads_pallas_diff)

    chain_spec = _CHAINS["sequential_reversed"]
    M, P = 300, 3
    scale_offset = -2.5
    heads = {}
    extra = 0
    key = jax.random.PRNGKey(0)
    params = {}
    for i, (name, out_dim) in enumerate(chain_spec):
        heads[name] = DecoderHead(n_features=32 + P + extra,
                                  out_features=out_dim, hidden_dim=128)
        params[name] = heads[name].init(jax.random.fold_in(key, i))
        extra += out_dim

    feats = jax.random.normal(jax.random.fold_in(key, 10), (M, 32)) * 0.5
    cond0 = jax.random.normal(jax.random.fold_in(key, 11), (M, P)) * 0.2
    init = jax.random.normal(jax.random.fold_in(key, 12), (M, 3)) * 0.2
    tgt = jax.random.normal(jax.random.fold_in(key, 13), (M, 14))

    def ref_loss(params, feats, cond0, init):
        cond = cond0
        cols = []
        for name, out_dim in chain_spec:
            v = heads[name].apply(params[name], feats[None], cond)
            if name == "xyz":
                v = v * 0.01 + init
            elif name == "scale":
                v = -jax.nn.softplus(v + 5.0) + scale_offset
            cols.append(v)
            cond = jnp.concatenate([cond, v], axis=-1)
        out = jnp.concatenate(cols, axis=-1)       # (M, 14)
        return jnp.sum(out * tgt) + jnp.sum(jnp.sin(out))

    def pallas_loss(params, feats, cond0, init):
        out = decode_heads_pallas_diff(
            params, chain_spec, feats, cond0, init, scale_offset,
            False, "exact", 256, None)[:M, :14]
        return jnp.sum(out * tgt) + jnp.sum(jnp.sin(out))

    v_ref, g_ref = jax.value_and_grad(ref_loss, argnums=(0, 1, 2, 3))(
        params, feats, cond0, init)
    v_pal, g_pal = jax.value_and_grad(pallas_loss, argnums=(0, 1, 2, 3))(
        params, feats, cond0, init)
    assert abs(float(v_ref) - float(v_pal)) < 1e-2 * max(1.0, abs(float(v_ref)))

    flat_r, _ = jax.tree_util.tree_flatten(g_ref)
    flat_p, _ = jax.tree_util.tree_flatten(g_pal)
    assert len(flat_r) == len(flat_p)
    for a, b in zip(flat_r, flat_p):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-3)
        np.testing.assert_allclose(b, a, atol=2e-4 * scale, rtol=2e-3)


def test_pallas_mapping_matches_xla():
    """Fused mapping kernel vs MappingNetwork.apply at flagship dims
    (bf16 weights => ~1e-2 relative tolerance), incl. the c embed branch,
    truncation lerp, and the num_ws broadcast."""
    import numpy as np
    from gaussian_gan_decoder_tpu.models.stylegan2 import MappingNetwork
    from gaussian_gan_decoder_tpu.models.pallas_mapping import (
        mapping_forward_pallas)

    mn = MappingNetwork(z_dim=512, c_dim=25, w_dim=512, num_ws=14)
    params = mn.init(jax.random.PRNGKey(0))
    params["w_avg"] = jax.random.normal(jax.random.PRNGKey(9), (512,)) * 0.1
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 512))
    c = jax.random.normal(jax.random.PRNGKey(2), (2, 25))
    for psi in (1.0, 0.6):
        ref = mn.apply(params, z, c, truncation_psi=psi)
        out = mapping_forward_pallas(mn, params, z, c, truncation_psi=psi)
        assert out.shape == ref.shape == (2, 14, 512)
        scale = np.abs(np.asarray(ref)).mean() + 1e-6
        err = np.abs(np.asarray(out) - np.asarray(ref)).max() / scale
        assert err < 5e-2, err

    # zero-camera decode convention (embed sees zeros)
    ref = mn.apply(params, z, jnp.zeros_like(c), truncation_psi=0.8)
    out = mapping_forward_pallas(mn, params, z, jnp.zeros_like(c),
                                 truncation_psi=0.8)
    scale = np.abs(np.asarray(ref)).mean() + 1e-6
    assert np.abs(np.asarray(out) - np.asarray(ref)).max() / scale < 5e-2


def test_decoder_pallas_mapping_flag():
    """synthesize_planes with pallas_mapping=True matches the XLA mapping
    path end-to-end through the planes (tiny generator, f32-dominated)."""
    import dataclasses
    import numpy as np
    from tests.test_models_triplane import tiny_generator
    from gaussian_gan_decoder_tpu.decoder.heads import GaussianDecoder

    gen = tiny_generator("panohead")
    dec = GaussianDecoder(generator=gen, decoder_type="sequential_reversed")
    params = dec.init(jax.random.PRNGKey(0),
                      generator_params=gen.init(jax.random.PRNGKey(1)))
    z = jax.random.normal(jax.random.PRNGKey(2), (1, 32))
    cp = jnp.ones((1, 25))
    ref, _ = dec.synthesize_planes(params, z, cp, 1.0)
    dec_pm = dataclasses.replace(dec, pallas_mapping=True)
    out, _ = dec_pm.synthesize_planes(params, z, cp, 1.0)
    scale = np.abs(np.asarray(ref)).mean() + 1e-6
    assert np.abs(np.asarray(out) - np.asarray(ref)).max() / scale < 5e-2
