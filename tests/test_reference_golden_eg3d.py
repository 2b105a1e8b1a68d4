"""Golden parity against the ACTUAL eg3d reference code on torch-cpu.

The eg3d variant is BASELINE config #1 (the flagship EG3D ffhq512 path)
but differs from PanoHead in every convention the SURVEY flags:
plane-axis constants (eg3d/training/volumetric_rendering/renderer.py:35-37
keeps the original third-plane axis bug), 2D tri-plane grid_sample
(:55-64 vs PanoHead's 3D tri-grid), the ray marcher's rgb*2-1 mapping
(eg3d/.../ray_marcher.py:54), always-sigmoid OSGDecoder
(eg3d/training/triplane.py:137), and no t_mapping/background/raw-ToRGB.

These tests instantiate the reference's own eg3d modules on CPU, pickle
them with the reference's own persistence, port through
port/torch_pickle.py, and assert activation parity — including the
port of eg3d's OSGDecoder, which is NOT @persistent_class upstream
(eg3d/training/triplane.py:116) and therefore pickles as a plain torch
module.

eg3d and PanoHead share top-level module names (`training`, `dnnlib`,
`torch_utils`), so this module swaps sys.path/sys.modules around the
other reference-golden module (which imports the PanoHead copies).
"""
import io
import os
import pickle
import sys

import numpy as np
import pytest

REF = "/root/reference"
EG3D = os.path.join(REF, "eg3d")
pytestmark = pytest.mark.skipif(
    not os.path.isdir(EG3D), reason="no reference checkout"
)

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from gaussian_gan_decoder_tpu.port.torch_pickle import (  # noqa: E402
    extract_state,
    generator_config_from_pickle,
    generator_params_from_state,
    load_reference_pickle,
)

_REF_PREFIXES = ("training", "torch_utils", "dnnlib", "legacy", "metrics")


def _purge_ref_modules():
    for name in [m for m in sys.modules
                 if m.split(".")[0] in _REF_PREFIXES]:
        del sys.modules[name]


@pytest.fixture(scope="module")
def eg3d_modules():
    """Import the eg3d copies of training/dnnlib, shadowing PanoHead's."""
    saved_path = list(sys.path)
    _purge_ref_modules()
    sys.path = [p for p in sys.path
                if not p.startswith(os.path.join(REF, "PanoHead"))]
    for p in (EG3D,):
        if p not in sys.path:
            sys.path.insert(0, p)
    try:
        import dnnlib  # noqa: F401
        from training.triplane import TriPlaneGenerator as RefG

        yield RefG
    finally:
        _purge_ref_modules()
        sys.path = saved_path


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
    "sr_antialias": True,
    "depth_resolution": 8,
    "depth_resolution_importance": 8,
    "ray_start": 2.25,
    "ray_end": 3.3,
    "box_warp": 1.0,
    "avg_camera_radius": 2.7,
    "avg_camera_pivot": [0, 0, 0.2],
    "white_back": False,
}


def _build_ref_generator(RefG):
    import dnnlib

    torch.manual_seed(0)
    G = RefG(
        z_dim=64, c_dim=25, w_dim=512, img_resolution=128, img_channels=3,
        sr_num_fp16_res=0,
        mapping_kwargs=dnnlib.EasyDict(num_layers=2),
        rendering_kwargs=dict(RENDERING_KWARGS),
        sr_kwargs=dnnlib.EasyDict(channel_base=1024, channel_max=64,
                                  fused_modconv_default="inference_only"),
        channel_base=1024, channel_max=64, num_fp16_res=0, conv_clamp=None,
    ).eval()
    with torch.no_grad():
        G.backbone.mapping.w_avg.copy_(torch.randn(512) * 0.3)
    return G


def _camera():
    cam2world = np.eye(4, dtype=np.float32)
    cam2world[:3, :3] = np.diag([-1.0, 1.0, -1.0])
    cam2world[2, 3] = 2.7
    intr = np.array([[4.26, 0, 0.5], [0, 4.26, 0.5], [0, 0, 1]], np.float32)
    return np.concatenate([cam2world.reshape(-1), intr.reshape(-1)])[None].astype(
        np.float32
    )


@pytest.fixture(scope="module")
def ported(eg3d_modules):
    G = _build_ref_generator(eg3d_modules)
    buf = pickle.dumps({"G_ema": G})
    data = load_reference_pickle(io.BytesIO(buf))
    stub = data["G_ema"]
    gen = generator_config_from_pickle(stub)
    params = generator_params_from_state(extract_state(stub))
    return G, gen, params


def test_eg3d_config_port(ported):
    G, gen, params = ported
    assert gen.variant == "eg3d"
    assert gen.num_ws == G.backbone.num_ws
    # every reference parameter lands in our tree — including the
    # NON-persistent OSGDecoder's (the regression this file guards)
    n_ref = sum(p.numel() for p in G.parameters()) + sum(
        b.numel() for b in G.buffers() if b.dtype.is_floating_point
    )
    n_filters = sum(
        b.numel() for n, b in G.named_buffers() if n.endswith("resample_filter")
    )
    n_ours = sum(int(np.prod(v.shape)) for v in jax.tree.leaves(params))
    assert n_ours == n_ref - n_filters
    assert "fc0" in params["decoder"] and "fc1" in params["decoder"]


def _ws(G):
    z = np.random.RandomState(1).randn(1, 64).astype(np.float32)
    with torch.no_grad():
        return G.mapping(torch.from_numpy(z), torch.from_numpy(_camera()),
                         truncation_psi=0.7).numpy()


def test_eg3d_mapping_golden(ported):
    G, gen, params = ported
    z = np.random.RandomState(1).randn(1, 64).astype(np.float32)
    c = _camera()
    with torch.no_grad():
        ws_ref = G.mapping(torch.from_numpy(z), torch.from_numpy(c),
                           truncation_psi=0.7).numpy()
    ws = np.asarray(gen.mapping(params, jnp.asarray(z), jnp.asarray(c),
                                truncation_psi=0.7))
    np.testing.assert_allclose(ws, ws_ref, atol=5e-6)


def test_eg3d_sample_mixed_golden(ported):
    """Exercises the 2D tri-plane grid_sample with the eg3d plane-axis
    constants AND the always-sigmoid OSG decoder head."""
    G, gen, params = ported
    ws = _ws(G)
    coords = (np.random.RandomState(2).rand(1, 1000, 3).astype(np.float32) - 0.5) * 0.9
    dirs = np.zeros_like(coords)
    with torch.no_grad():
        sm_ref = G.sample_mixed(torch.from_numpy(coords), torch.from_numpy(dirs),
                                torch.from_numpy(ws), noise_mode="const")
    sm = gen.sample_mixed(params, jnp.asarray(coords), jnp.asarray(dirs),
                          jnp.asarray(ws))
    np.testing.assert_allclose(np.asarray(sm["sigma"]), sm_ref["sigma"].numpy(),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(sm["rgb"]), sm_ref["rgb"].numpy(),
                               atol=2e-4)


def test_eg3d_full_synthesis_golden(ported, monkeypatch):
    """image / image_raw / image_depth with pinned depth jitter — covers
    the eg3d ray marcher (rgb*2-1, eg3d ray_marcher.py:54) and fixed
    ray_start/ray_end stratified sampling end-to-end."""
    G, gen, params = ported
    ws = _ws(G)
    c = _camera()
    monkeypatch.setattr(torch, "rand_like", lambda t: torch.full_like(t, 0.5))
    monkeypatch.setattr(
        torch, "rand",
        lambda *shape, **kw: torch.full(
            shape[0] if len(shape) == 1 and isinstance(shape[0], (tuple, list))
            else shape, 0.5,
            device=kw.get("device"), dtype=kw.get("dtype"),
        ),
    )

    def fake_uniform(key, shape=(), dtype=float, minval=0.0, maxval=1.0):
        del key
        return jnp.full(shape, 0.5, dtype if dtype is not float else jnp.float32)

    monkeypatch.setattr(jax.random, "uniform", fake_uniform)
    with torch.no_grad():
        out_ref = G.synthesis(torch.from_numpy(ws), torch.from_numpy(c),
                              noise_mode="const")
    out = gen.synthesis(params, jnp.asarray(ws), jnp.asarray(c),
                        neural_rendering_resolution=64)
    for k, atol in [("image_raw", 5e-4), ("image_depth", 5e-4),
                    ("image", 1e-3)]:
        a = out_ref[k].numpy()
        b = np.asarray(out[k])
        assert a.shape == b.shape, (k, a.shape, b.shape)
        np.testing.assert_allclose(b, a, atol=atol, err_msg=k)
