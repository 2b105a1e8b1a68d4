"""Golden parity against the ACTUAL reference code on torch-cpu.

Unlike the torch-golden unit tests (which re-derive the math), these
instantiate the reference's own modules from /root/reference, pickle them
with the reference's own torch_utils.persistence, port the pickle through
port/torch_pickle.py, and assert activation parity. A systematic
misreading of any convention (grid_sample corners, plane axes, lr_mult
folding, w_avg lerp, noise buffers, SR ws indexing) fails here.

Covered reference surfaces:
  * PanoHead/training/triplane.py:87-263 (mapping / synthesis / sample_mixed)
  * main/decoder_models/sequential_decoder_reverse.py:38-87 (decoder fwd)
  * main/train_pano2gaussian_decoder.py:299-306 snapshot format round-trip

Stochastic depth jitter (renderer.py:250-260 torch.rand_like, :307
torch.rand) is pinned to 0.5 on BOTH sides for the full-synthesis test.
"""
import io
import os
import pickle
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "PanoHead")), reason="no reference checkout"
)

for p in (REF, os.path.join(REF, "PanoHead")):
    if p not in sys.path:
        sys.path.insert(0, p)

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from gaussian_gan_decoder_tpu.port.torch_pickle import (  # noqa: E402
    extract_state,
    generator_config_from_pickle,
    generator_params_from_state,
    load_decoder_pkl,
    load_reference_pickle,
)

RENDERING_KWARGS = {
    "image_resolution": 128,
    "disparity_space_sampling": False,
    "clamp_mode": "softplus",
    "superresolution_module": "training.superresolution.SuperresolutionHybrid2X",
    "c_gen_conditioning_zero": True,
    "gpc_reg_prob": 0.5,
    "c_scale": 1.0,
    "superresolution_noise_mode": "none",
    "density_reg": 0.25,
    "density_reg_p_dist": 0.004,
    "reg_type": "l1",
    "decoder_lr_mul": 1.0,
    "decoder_activation": "lrelu",
    "sr_antialias": True,
    "use_torgb_raw": True,
    "use_background": True,
    "triplane_size": 32,
    "triplane_depth": 3,
    "depth_resolution": 8,
    "depth_resolution_importance": 8,
    "ray_start": "auto",
    "ray_end": "auto",
    "box_warp": 1.0,
    "avg_camera_radius": 2.7,
    "avg_camera_pivot": [0, 0, 0.2],
    "white_back": False,
}


def _build_ref_generator(c_gen_conditioning_zero=True):
    import dnnlib
    from training.triplane import TriPlaneGenerator as RefG

    torch.manual_seed(0)
    rk = dict(RENDERING_KWARGS)
    rk["c_gen_conditioning_zero"] = c_gen_conditioning_zero
    G = RefG(
        z_dim=64, c_dim=25, w_dim=512, img_resolution=128, img_channels=3,
        sr_num_fp16_res=0,
        mapping_kwargs=dnnlib.EasyDict(num_layers=2),
        rendering_kwargs=rk,
        sr_kwargs=dnnlib.EasyDict(channel_base=1024, channel_max=64,
                                  fused_modconv_default="inference_only"),
        channel_base=1024, channel_max=64, num_fp16_res=0, conv_clamp=None,
    ).eval()
    with torch.no_grad():
        # non-trivial w_avg so truncation lerp is exercised
        G.backbone.mapping.w_avg.copy_(torch.randn(512) * 0.3)
    return G


def _camera(yaw=0.0):
    cam2world = np.eye(4, dtype=np.float32)
    cam2world[:3, :3] = np.diag([-1.0, 1.0, -1.0])
    cam2world[2, 3] = 2.7
    intr = np.array([[4.26, 0, 0.5], [0, 4.26, 0.5], [0, 0, 1]], np.float32)
    return np.concatenate([cam2world.reshape(-1), intr.reshape(-1)])[None].astype(np.float32)


@pytest.fixture(scope="module")
def ported():
    """(ref torch G, our config, our params) round-tripped through the
    reference's own persistence pickle."""
    G = _build_ref_generator()
    buf = pickle.dumps({"G_ema": G})
    data = load_reference_pickle(io.BytesIO(buf))
    stub = data["G_ema"]
    gen = generator_config_from_pickle(stub)
    params = generator_params_from_state(extract_state(stub))
    return G, gen, params


def test_config_port(ported):
    G, gen, params = ported
    assert gen.variant == "panohead"
    assert gen.num_ws == G.backbone.num_ws
    assert gen.z_dim == 64 and gen.w_dim == 512
    assert gen.rk["triplane_depth"] == 3
    # every reference parameter must land somewhere in our tree
    n_ref = sum(p.numel() for p in G.parameters()) + sum(
        b.numel() for b in G.buffers() if b.dtype.is_floating_point
    )
    n_ours = sum(int(np.prod(v.shape)) for v in jax.tree.leaves(params))
    # resample_filter constants are config (not params) on our side
    n_filters = sum(
        b.numel() for n, b in G.named_buffers() if n.endswith("resample_filter")
    )
    assert n_ours == n_ref - n_filters


def test_mapping_golden(ported):
    G, gen, params = ported
    z = np.random.RandomState(1).randn(1, 64).astype(np.float32)
    c = _camera()
    with torch.no_grad():
        ws_ref = G.mapping(torch.from_numpy(z), torch.from_numpy(c),
                           truncation_psi=0.7).numpy()
    ws = np.asarray(gen.mapping(params, jnp.asarray(z), jnp.asarray(c),
                                truncation_psi=0.7))
    np.testing.assert_allclose(ws, ws_ref, atol=5e-6)


def test_synthesis_planes_golden(ported):
    G, gen, params = ported
    ws = _ws(G)
    with torch.no_grad():
        planes_ref = G.backbone.synthesis(torch.from_numpy(ws), noise_mode="const").numpy()
    planes = np.asarray(gen.synthesis_planes(params, jnp.asarray(ws)))
    np.testing.assert_allclose(
        planes, planes_ref.reshape(planes.shape), atol=2e-4
    )


def _ws(G):
    z = np.random.RandomState(1).randn(1, 64).astype(np.float32)
    with torch.no_grad():
        return G.mapping(torch.from_numpy(z), torch.from_numpy(_camera()),
                         truncation_psi=0.7).numpy()


def test_sample_mixed_golden(ported):
    G, gen, params = ported
    ws = _ws(G)
    coords = (np.random.RandomState(2).rand(1, 1000, 3).astype(np.float32) - 0.5) * 0.9
    dirs = np.zeros_like(coords)
    with torch.no_grad():
        sm_ref = G.sample_mixed(torch.from_numpy(coords), torch.from_numpy(dirs),
                                torch.from_numpy(ws), noise_mode="const")
    sm = gen.sample_mixed(params, jnp.asarray(coords), jnp.asarray(dirs),
                          jnp.asarray(ws))
    np.testing.assert_allclose(np.asarray(sm["sigma"]), sm_ref["sigma"].numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(sm["rgb"]), sm_ref["rgb"].numpy(), atol=2e-4)


def _pin_jitter(monkeypatch):
    """Pin BOTH frameworks' depth jitter / importance u to 0.5."""
    monkeypatch.setattr(torch, "rand_like", lambda t: torch.full_like(t, 0.5))
    monkeypatch.setattr(
        torch, "rand",
        lambda *shape, **kw: torch.full(
            shape[0] if len(shape) == 1 and isinstance(shape[0], (tuple, list))
            else shape, 0.5,
            device=kw.get("device"), dtype=kw.get("dtype"),
        ),
    )
    real_uniform = jax.random.uniform

    def fake_uniform(key, shape=(), dtype=float, minval=0.0, maxval=1.0):
        del key
        return jnp.full(shape, 0.5, dtype if dtype is not float else jnp.float32)

    monkeypatch.setattr(jax.random, "uniform", fake_uniform)
    return real_uniform


def test_full_synthesis_golden(ported, monkeypatch):
    """image_raw / image / image_depth / image_mask with pinned jitter —
    covers ray sampling, tri-grid probe, OSG decoder, MipRayMarcher,
    background forcing, raw ToRGB and the SR stack end-to-end
    (ref triplane.py:128-225)."""
    G, gen, params = ported
    ws = _ws(G)
    c = _camera()
    _pin_jitter(monkeypatch)
    with torch.no_grad():
        out_ref = G.synthesis(torch.from_numpy(ws), torch.from_numpy(c),
                              noise_mode="const")
    out = gen.synthesis(params, jnp.asarray(ws), jnp.asarray(c),
                        neural_rendering_resolution=64)
    for k, atol in [("image_raw", 5e-4), ("image_depth", 5e-4),
                    ("image_mask", 5e-4), ("image", 1e-3)]:
        a = out_ref[k].numpy()
        b = np.asarray(out[k])
        assert a.shape == b.shape, k
        np.testing.assert_allclose(b, a, atol=atol, err_msg=k)


def test_forward_delta_c_golden(monkeypatch):
    """Full G.forward: mapping + t_mapping self-adaptive camera shift +
    synthesis (ref triplane.py:99-126, 265-293). Uses
    c_gen_conditioning_zero=False — the GAN-training config where the
    delta-c path yields a usable camera (with True, the reference
    rebinds c to zeros before cloning, rendering from a degenerate
    camera; see test_delta_c_zero_conditioning_quirk)."""
    G = _build_ref_generator(c_gen_conditioning_zero=False)
    buf = pickle.dumps({"G_ema": G})
    stub = load_reference_pickle(io.BytesIO(buf))["G_ema"]
    gen = generator_config_from_pickle(stub)
    params = generator_params_from_state(extract_state(stub))
    z = np.random.RandomState(3).randn(1, 64).astype(np.float32)
    c = _camera()
    _pin_jitter(monkeypatch)
    with torch.no_grad():
        out_ref = G(torch.from_numpy(z), torch.from_numpy(c),
                    truncation_psi=0.7, noise_mode="const")
    out = gen.apply(params, jnp.asarray(z), jnp.asarray(c), truncation_psi=0.7,
                    neural_rendering_resolution=64)
    np.testing.assert_allclose(
        np.asarray(out["image_raw"]), out_ref["image_raw"].numpy(), atol=5e-4
    )


def test_delta_c_zero_conditioning_quirk(ported):
    """With c_gen_conditioning_zero=True, apply_delta_c returns the
    ZEROED camera + delta translation — the reference rebinds c before
    cloning (triplane.py:109-124). Parity includes the quirk."""
    G, gen, params = ported
    z = np.random.RandomState(3).randn(1, 64).astype(np.float32)
    c = _camera()
    with torch.no_grad():
        c_ref, dc_ref = G.apply_delta_c(torch.from_numpy(z), torch.from_numpy(c),
                                        truncation_psi=0.7)
    c_new, dc = gen.apply_delta_c(params, jnp.asarray(z), jnp.asarray(c),
                                  truncation_psi=0.7)
    np.testing.assert_allclose(np.asarray(dc), dc_ref.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(c_new), c_ref.numpy(), atol=1e-5)
    # the quirk: everything except the delta translation is zero
    assert np.abs(np.asarray(c_new)[:, 16:]).max() == 0.0


# ----------------------------------------------------------------------------
# decoder snapshot round-trip (main/)


def _build_ref_decoder(use_xyz_embedding: bool):
    from main.decoder_models.sequential_decoder_reverse import (
        SequentialDecoderReverse,
    )

    G = _build_ref_generator()
    torch.manual_seed(7)
    dec = SequentialDecoderReverse(G, hidden_dim=32,
                                   use_xyz_embedding=use_xyz_embedding,
                                   use_gen_finetune=True, device="cpu").eval()
    # the reference train script sets this attr externally; forward reads it
    # (sequential_decoder_reverse.py:58 — the known dead-attribute defect)
    dec.triplane_sr = "None"
    return dec


def _assert_decoder_forward_parity(dec, cfg, params):
    z = np.random.RandomState(5).randn(1, 64).astype(np.float32)
    c = _camera()
    pos = ((np.random.RandomState(6).rand(500, 3) - 0.5) * 0.8).astype(np.float32)
    with torch.no_grad():
        ref_out = dec(torch.from_numpy(z), torch.from_numpy(c),
                      torch.from_numpy(pos), truncation_psi=0.8)
    out = cfg.apply(params, jnp.asarray(z), jnp.asarray(c), jnp.asarray(pos),
                    truncation_psi=0.8)
    for k in ["color", "opacity", "rotation", "scale", "xyz"]:
        np.testing.assert_allclose(
            np.asarray(out[k]), ref_out[k].numpy(), atol=5e-4, err_msg=k
        )


def test_decoder_snapshot_golden():
    """Snapshot-format round trip (train_pano2gaussian_decoder.py:299-306)
    + forward parity of the ported decoder.

    use_xyz_embedding=False: with the embedding on, the reference's own
    snapshot pickling crashes (Embedder.frequency_activation closures are
    unpicklable, main/decoder_utils/pos_encoding.py:44-47) — deployable
    reference snapshots necessarily avoid it or patch around it."""
    dec = _build_ref_decoder(use_xyz_embedding=False)
    buf = pickle.dumps({"decoder": dec, "training_options": {}})
    cfg, params = load_decoder_pkl(io.BytesIO(buf))
    assert cfg.decoder_type == "sequential_reversed"
    assert cfg.hidden_dim == 32
    assert not cfg.use_xyz_embedding
    assert cfg.use_gen_finetune
    assert cfg.generator.rk["triplane_depth"] == 3
    _assert_decoder_forward_parity(dec, cfg, params)


def test_ref_decoder_embedder_unconstructible():
    """Document the reference defect: SequentialDecoderReverse with
    use_xyz_embedding=True cannot even be CONSTRUCTED — persistence's
    init-time pickleability check (torch_utils/persistence.py:110)
    rejects Embedder.frequency_activation's closures
    (main/decoder_utils/pos_encoding.py:44-47). The reference train
    script only survives because --use_pos_encoding defaults to False.
    Our GaussianDecoder(use_xyz_embedding=True) has no such restriction
    (unit-tested in tests/test_decoder.py)."""
    with pytest.raises(AttributeError, match="frequency_activation"):
        _build_ref_decoder(use_xyz_embedding=True)


def test_embedder_golden():
    """Positional-encoding parity vs the reference Embedder class itself
    (main/decoder_utils/pos_encoding.py — linear band spacing)."""
    from main.decoder_utils.pos_encoding import Embedder as RefEmbedder

    from gaussian_gan_decoder_tpu.decoder.pos_encoding import Embedder

    ref = RefEmbedder(include_input=True, input_dims=3, num_freqs=10)
    ours = Embedder(include_input=True, input_dims=3, num_freqs=10)
    assert ours.out_dim == ref.out_dim == 63
    x = ((np.random.RandomState(8).rand(200, 3) - 0.5) * 2).astype(np.float32)
    a = ref(torch.from_numpy(x)).numpy()
    b = np.asarray(ours(jnp.asarray(x)))
    # fp32 rounding of x*freq at freq=512 shifts sin/cos by up to
    # ~eps*512 ≈ 6e-5 (torch stays f32; we compute the product in f64)
    np.testing.assert_allclose(b, a, atol=1e-4)


# ----------------------------------------------------------------------------
# discriminators + full GAN snapshot port (ref dual_discriminator.py,
# training_loop.py:430-444 snapshot layout)


def _build_ref_discriminators():
    from training.dual_discriminator import (
        DualDiscriminator,
        MaskDualDiscriminator,
    )

    torch.manual_seed(9)
    common = dict(
        channel_base=512, channel_max=32, num_fp16_res=0, conv_clamp=None,
        epilogue_kwargs={"mbstd_group_size": 2},
    )
    dual = DualDiscriminator(c_dim=25, img_resolution=32, img_channels=3,
                             disc_c_noise=0.0, **common).eval()
    mask = MaskDualDiscriminator(c_dim=25, img_resolution=32, img_channels=3,
                                 seg_resolution=16, seg_channels=1,
                                 disc_c_noise=0.0, **common).eval()
    return dual, mask


def _disc_inputs(with_mask):
    rng = np.random.RandomState(4)
    img = {
        "image": (rng.rand(2, 3, 32, 32) * 2 - 1).astype(np.float32),
        "image_raw": (rng.rand(2, 3, 16, 16) * 2 - 1).astype(np.float32),
    }
    if with_mask:
        img["image_mask"] = rng.rand(2, 1, 16, 16).astype(np.float32)
    c = np.concatenate([_camera(), _camera()], axis=0)
    return img, c


@pytest.mark.parametrize("which", ["dual", "mask_dual"])
def test_discriminator_golden(which):
    """Forward parity of the ported Dual/MaskDual discriminators — guards
    the GAN-training resume path (filtered_resizing, seg branch summation,
    mbstd epilogue, conditioning mapping)."""
    from gaussian_gan_decoder_tpu.port.torch_pickle import (
        discriminator_config_from_pickle,
        discriminator_params_from_state,
    )

    dual, mask = _build_ref_discriminators()
    ref_d = dual if which == "dual" else mask
    buf = pickle.dumps({"D": ref_d})
    stub = load_reference_pickle(io.BytesIO(buf))["D"]
    cfg = discriminator_config_from_pickle(stub)
    assert cfg.mode == which
    params = discriminator_params_from_state(extract_state(stub))
    img, c = _disc_inputs(with_mask=(which == "mask_dual"))
    with torch.no_grad():
        ref_logits = ref_d(
            {k: torch.from_numpy(v) for k, v in img.items()},
            torch.from_numpy(c),
        ).numpy()
    logits = np.asarray(cfg.apply(
        params, {k: jnp.asarray(v) for k, v in img.items()}, jnp.asarray(c)
    ))
    np.testing.assert_allclose(logits, ref_logits, atol=2e-4)


def test_gan_snapshot_port_roundtrip():
    """{'G','D','G_ema'} snapshot -> load_gan_snapshot_pkl -> configs +
    params; G_ema distinct from G; D config fields survive."""
    from gaussian_gan_decoder_tpu.port.torch_pickle import load_gan_snapshot_pkl

    G = _build_ref_generator()
    _, mask = _build_ref_discriminators()
    import copy

    G_ema = copy.deepcopy(G)
    with torch.no_grad():
        for p in G_ema.parameters():
            p.add_(0.01)
    buf = pickle.dumps({"G": G, "D": mask, "G_ema": G_ema})
    snap = load_gan_snapshot_pkl(io.BytesIO(buf))
    assert snap["G"].variant == "panohead"
    assert snap["D"].mode == "mask_dual"
    assert snap["D"].seg_resolution == 16
    assert snap["D"].mbstd_group_size == 2
    g0 = jax.tree.leaves(snap["g_params"])[0]
    e0 = jax.tree.leaves(snap["g_ema"])[0]
    assert not np.allclose(np.asarray(g0), np.asarray(e0))
    # trees must be jax-structural matches of fresh inits (resume contract)
    init_d = snap["D"].init(jax.random.PRNGKey(0))
    assert jax.tree.structure(init_d) == jax.tree.structure(snap["d_params"])
    init_g = snap["G"].init(jax.random.PRNGKey(0))
    assert jax.tree.structure(init_g) == jax.tree.structure(snap["g_params"])


# ----------------------------------------------------------------------------
# superresolution stack variants (ref PanoHead/training/superresolution.py).
# The triplane full-synthesis golden exercises only Hybrid2X; real 512^2
# PanoHead checkpoints ride Hybrid8XDC and LPFF/1024 ones 4XCustom — drive
# each variant's ported stack against the reference module directly.


_SR_CASES = [
    # (class, img_resolution, input_res_interp_from, atol)
    ("SuperresolutionHybrid8X", 512, 64, 2e-4),
    ("SuperresolutionHybrid8XDC", 512, 64, 2e-4),
    ("SuperresolutionHybrid4X", 256, 64, 2e-4),
    ("SuperresolutionHybrid2X", 128, 32, 2e-4),
]


@pytest.mark.parametrize("cls,img_res,in_res,atol", _SR_CASES)
def test_superresolution_variant_golden(cls, img_res, in_res, atol):
    import importlib

    from gaussian_gan_decoder_tpu.models.superresolution import make_superresolution

    ref_mod = importlib.import_module("training.superresolution")
    torch.manual_seed(13)
    ref = getattr(ref_mod, cls)(
        channels=32, img_resolution=img_res, sr_num_fp16_res=0,
        sr_antialias=True,
    ).eval()
    ours = make_superresolution(
        f"training.superresolution.{cls}", channels=32,
        img_resolution=img_res, sr_num_fp16_res=0, sr_antialias=True,
    )
    buf = pickle.dumps({"sr": ref})
    stub = load_reference_pickle(io.BytesIO(buf))["sr"]
    params = generator_params_from_state(extract_state(stub))
    # tree structural parity with a fresh init (resume/port contract)
    init = ours.init(jax.random.PRNGKey(0))
    assert jax.tree.structure(init) == jax.tree.structure(params)

    rng = np.random.RandomState(2)
    x = (rng.rand(1, 32, in_res, in_res) * 2 - 1).astype(np.float32)
    rgb = (rng.rand(1, 3, in_res, in_res) * 2 - 1).astype(np.float32)
    ws = rng.randn(1, 5, 512).astype(np.float32) * 0.1
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(rgb), torch.from_numpy(x),
                      torch.from_numpy(ws), noise_mode="none").numpy()
    out = np.asarray(ours.apply(params, jnp.asarray(rgb), jnp.asarray(x),
                                jnp.asarray(ws), noise_mode="none"))
    assert out.shape == ref_out.shape == (1, 3, img_res, img_res)
    np.testing.assert_allclose(out, ref_out, atol=atol, rtol=1e-3)


def test_superresolution_4xcustom_golden():
    """4XCustom (LPFF 1024^2 path) returns the FEATURE image, not rgb
    (ref superresolution.py:92-119 forward returns x)."""
    import importlib

    from gaussian_gan_decoder_tpu.models.superresolution import make_superresolution

    ref_mod = importlib.import_module("training.superresolution")
    torch.manual_seed(13)
    ref = ref_mod.SuperresolutionHybrid4XCustom(
        channels=32, img_resolution=1024, sr_num_fp16_res=0, sr_antialias=True,
    ).eval()
    ours = make_superresolution(
        "training.superresolution.SuperresolutionHybrid4XCustom", channels=32,
        img_resolution=1024, sr_num_fp16_res=0, sr_antialias=True,
    )
    buf = pickle.dumps({"sr": ref})
    stub = load_reference_pickle(io.BytesIO(buf))["sr"]
    params = generator_params_from_state(extract_state(stub))
    rng = np.random.RandomState(2)
    x = (rng.rand(1, 32, 128, 128) * 2 - 1).astype(np.float32)
    rgb = (rng.rand(1, 3, 128, 128) * 2 - 1).astype(np.float32)
    ws = rng.randn(1, 4, 512).astype(np.float32) * 0.1
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(rgb), torch.from_numpy(x),
                      torch.from_numpy(ws), noise_mode="none").numpy()
    out = np.asarray(ours.apply(params, jnp.asarray(rgb), jnp.asarray(x),
                                jnp.asarray(ws), noise_mode="none"))
    assert out.shape == ref_out.shape == (1, 96, 1024, 1024)  # features
    np.testing.assert_allclose(out, ref_out, atol=2e-4, rtol=1e-3)


def test_ref_superresolution_2xcustom_unusable_upstream():
    """Document the reference defect: SuperresolutionHybrid2XCustom
    declares its NoUp block0 at resolution=256 but interpolates inputs to
    input_resolution=64 (superresolution.py:130-136), so the block's own
    shape contract (assert_shape at :292) rejects every forward — the
    variant cannot run upstream. Our table keeps its declared geometry;
    make_superresolution constructs it without the crash."""
    import importlib

    from gaussian_gan_decoder_tpu.models.superresolution import make_superresolution

    ref_mod = importlib.import_module("training.superresolution")
    ref = ref_mod.SuperresolutionHybrid2XCustom(
        channels=32, img_resolution=512, sr_num_fp16_res=0, sr_antialias=True,
    ).eval()
    rng = np.random.RandomState(0)
    rgb = torch.from_numpy((rng.rand(1, 3, 64, 64) * 2 - 1).astype(np.float32))
    x = torch.from_numpy((rng.rand(1, 32, 64, 64) * 2 - 1).astype(np.float32))
    ws = torch.from_numpy(rng.randn(1, 3, 512).astype(np.float32))
    with pytest.raises(AssertionError), torch.no_grad():
        ref(rgb, x, ws, noise_mode="none")
    # ours constructs (and is exercised via make_superresolution table)
    make_superresolution(
        "training.superresolution.SuperresolutionHybrid2XCustom",
        channels=32, img_resolution=512,
    )


# ----------------------------------------------------------------------------
# checkpoint converter (apps/convert_checkpoint.py — the reference's
# resave_model.py migration role: reference pickle -> native artifacts)


def test_convert_checkpoint_gan_roundtrip(tmp_path):
    from gaussian_gan_decoder_tpu.apps.convert_checkpoint import (
        convert_gan,
        load_native_gan,
    )

    G = _build_ref_generator()
    pkl = tmp_path / "snap.pkl"
    with open(pkl, "wb") as f:
        pickle.dump({"G": G, "G_ema": G}, f)
    out = tmp_path / "native"
    info = convert_gan(str(pkl), str(out))
    assert "config.json" in info["files"] and "g_ema.npz" in info["files"]

    gen, params = load_native_gan(str(out))
    assert gen.variant == "panohead" and gen.z_dim == 64
    # ported-forward parity through the native roundtrip
    z = np.random.RandomState(1).randn(1, 64).astype(np.float32)
    c = _camera()
    with torch.no_grad():
        ws_ref = G.mapping(torch.from_numpy(z), torch.from_numpy(c),
                           truncation_psi=0.7).numpy()
    ws = np.asarray(gen.mapping(params, jnp.asarray(z), jnp.asarray(c),
                                truncation_psi=0.7))
    np.testing.assert_allclose(ws, ws_ref, atol=5e-6)


def test_convert_checkpoint_decoder_roundtrip(tmp_path):
    from gaussian_gan_decoder_tpu.apps.convert_checkpoint import convert_decoder
    from gaussian_gan_decoder_tpu.decoder.snapshot import load_decoder

    dec = _build_ref_decoder(use_xyz_embedding=False)
    pkl = tmp_path / "decoder.pkl"
    with open(pkl, "wb") as f:
        pickle.dump({"decoder": dec, "training_options": {}}, f)
    out = tmp_path / "native_dec"
    convert_decoder(str(pkl), str(out))
    cfg, params, configs = load_decoder(str(out))
    assert cfg.decoder_type == "sequential_reversed"
    _assert_decoder_forward_parity(dec, cfg, params)


def test_decoder_torch_export_roundtrip():
    """Reverse-port interop (port/torch_export.py): port a reference
    decoder, re-export it as a torch state dict, and load THAT into a
    fresh reference decoder instance — outputs must match the original.
    Missing keys may only be static resample-filter buffers (config, not
    params, on our side); unexpected keys must be empty."""
    from gaussian_gan_decoder_tpu.port.torch_export import decoder_state_dict

    dec = _build_ref_decoder(use_xyz_embedding=False)
    buf = pickle.dumps({"decoder": dec, "training_options": {}})
    cfg, params = load_decoder_pkl(io.BytesIO(buf))

    exported = {k: torch.from_numpy(v)
                for k, v in decoder_state_dict(cfg, params).items()}

    torch.manual_seed(123)  # fresh weights — exported must overwrite all
    dec2 = _build_ref_decoder(use_xyz_embedding=False)
    result = dec2.load_state_dict(exported, strict=False)
    assert not result.unexpected_keys, result.unexpected_keys
    for k in result.missing_keys:
        assert k.endswith(("resample_filter", "up_filter", "down_filter")), k

    z = np.random.RandomState(5).randn(1, 64).astype(np.float32)
    c = _camera()
    pos = ((np.random.RandomState(6).rand(500, 3) - 0.5) * 0.8).astype(np.float32)
    with torch.no_grad():
        ref_out = dec(torch.from_numpy(z), torch.from_numpy(c),
                      torch.from_numpy(pos), truncation_psi=0.8)
        out2 = dec2(torch.from_numpy(z), torch.from_numpy(c),
                    torch.from_numpy(pos), truncation_psi=0.8)
    for k in ["color", "opacity", "rotation", "scale", "xyz"]:
        np.testing.assert_allclose(
            out2[k].numpy(), ref_out[k].numpy(), atol=1e-5, err_msg=k)
