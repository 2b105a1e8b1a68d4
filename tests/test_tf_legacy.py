"""TF-era pickle conversion: golden parity vs the reference's own
convert_tf_generator (/root/reference/PanoHead/legacy.py:109-215) run on
torch-cpu with identical synthetic TF variables."""
import io
import math
import os
import pickle
import sys
import types

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

from gaussian_gan_decoder_tpu.port.tf_legacy import (  # noqa: E402
    TFNetworkStub, convert_tf_generator, is_tf_pickle, load_tf_network_pkl)

RES = 32
FMAP_BASE = 128     # channels: min(fmap_base*2 // res, fmap_max)
FMAP_MAX = 32
Z_DIM = W_DIM = 16
N_MAP = 2


def _tf_vars(rng, arch="skip"):
    """Synthetic TF StyleGAN2 variable dict (TF shapes: dense (in, out),
    conv (kh, kw, in, out)). arch='orig' stores only the final ToRGB and
    no Skip convs, like a progressive-growing-era generator."""
    def ch(r):
        return min(FMAP_BASE * 2 // r, FMAP_MAX)

    v = {}
    v["dlatent_avg"] = rng.randn(W_DIM).astype(np.float32)
    dims = [Z_DIM] + [W_DIM] * N_MAP
    for i in range(N_MAP):
        v[f"mapping/Dense{i}/weight"] = rng.randn(dims[i], dims[i + 1]).astype(np.float32) * 0.3
        v[f"mapping/Dense{i}/bias"] = rng.randn(dims[i + 1]).astype(np.float32) * 0.1

    def conv(src, cin, cout, k=3, w_dim=W_DIM, noise=True):
        v[f"{src}/weight"] = rng.randn(k, k, cin, cout).astype(np.float32) * 0.2
        v[f"{src}/bias"] = rng.randn(cout).astype(np.float32) * 0.1
        v[f"{src}/mod_weight"] = rng.randn(w_dim, cin).astype(np.float32) * 0.2
        v[f"{src}/mod_bias"] = rng.randn(cin).astype(np.float32) * 0.1
        if noise:
            v[f"{src}/noise_strength"] = np.asarray(rng.randn() * 0.1, np.float32)

    v["synthesis/4x4/Const/const"] = rng.randn(1, ch(4), 4, 4).astype(np.float32)
    conv("synthesis/4x4/Conv", ch(4), ch(4))
    if arch == "skip":
        conv("synthesis/4x4/ToRGB", ch(4), 3, k=1, noise=False)
    n_noise = 1 + 2 * (int(math.log2(RES)) - 2)
    for i in range(n_noise):
        r = 4 * 2 ** ((i + 1) // 2)
        v[f"synthesis/noise{i}"] = rng.randn(1, 1, r, r).astype(np.float32)
    for r in [2 ** i for i in range(3, int(math.log2(RES)) + 1)]:
        conv(f"synthesis/{r}x{r}/Conv0_up", ch(r // 2), ch(r))
        conv(f"synthesis/{r}x{r}/Conv1", ch(r), ch(r))
        if arch == "skip" or r == RES:
            conv(f"synthesis/{r}x{r}/ToRGB", ch(r), 3, k=1, noise=False)
        if arch == "skip":
            v[f"synthesis/{r}x{r}/Skip/weight"] = rng.randn(1, 1, ch(r // 2), ch(r)).astype(np.float32) * 0.2
    return v


def _static_kwargs(**extra):
    return dict(
        latent_size=Z_DIM, dlatent_size=W_DIM, label_size=0,
        resolution=RES, num_channels=3,
        fmap_base=FMAP_BASE, fmap_max=FMAP_MAX,
        num_fp16_res=0, conv_clamp=None,
        mapping_layers=N_MAP, mapping_lrmul=0.01, w_avg_beta=0.995,
        **extra,
    )


def _stub(variables, **kw_extra):
    return TFNetworkStub(
        version=4, static_kwargs=_static_kwargs(**kw_extra),
        variables=list(variables.items()), components={},
    )


def test_convert_tf_generator_matches_reference():
    rng = np.random.RandomState(0)
    tf_vars = _tf_vars(rng)

    # reference conversion on torch-cpu
    import legacy as ref_legacy
    import dnnlib

    ref_stub = ref_legacy._TFNetworkStub(
        version=4, static_kwargs=dnnlib.EasyDict(_static_kwargs()),
        variables=list(tf_vars.items()), components=dnnlib.EasyDict(),
    )
    ref_G = ref_legacy.convert_tf_generator(ref_stub)

    gen, params = convert_tf_generator(_stub(tf_vars))
    assert gen.img_resolution == RES and gen.z_dim == Z_DIM

    z = rng.randn(2, Z_DIM).astype(np.float32)
    with torch.no_grad():
        ws_ref = ref_G.mapping(torch.from_numpy(z), None)
        img_ref = ref_G.synthesis(ws_ref, noise_mode="const", force_fp32=True)

    ws = gen.mapping.apply(params["mapping"], jnp.asarray(z), None)
    np.testing.assert_allclose(np.asarray(ws), ws_ref.numpy(), atol=2e-4)
    img = gen.synthesis.apply(params["synthesis"], ws, noise_mode="const")
    np.testing.assert_allclose(
        np.asarray(img, np.float32), img_ref.numpy(), atol=5e-3)


def test_convert_tf_generator_orig_matches_reference():
    """'orig' architecture declared in static_kwargs (single final ToRGB,
    no skips): golden vs the reference conversion, which handles this
    spelling fine — only its ToRGB_lod remap branch is broken."""
    rng = np.random.RandomState(2)
    tf_vars = _tf_vars(rng, arch="orig")

    import legacy as ref_legacy
    import dnnlib

    ref_stub = ref_legacy._TFNetworkStub(
        version=4, static_kwargs=dnnlib.EasyDict(_static_kwargs(architecture="orig")),
        variables=list(tf_vars.items()), components=dnnlib.EasyDict(),
    )
    ref_G = ref_legacy.convert_tf_generator(ref_stub)

    gen, params = convert_tf_generator(_stub(tf_vars, architecture="orig"))
    assert gen.architecture == "orig"
    assert gen.num_ws == ref_G.num_ws

    z = rng.randn(2, Z_DIM).astype(np.float32)
    with torch.no_grad():
        ws_ref = ref_G.mapping(torch.from_numpy(z), None)
        img_ref = ref_G.synthesis(ws_ref, noise_mode="const", force_fp32=True)
    ws = gen.mapping.apply(params["mapping"], jnp.asarray(z), None)
    img = gen.synthesis.apply(params["synthesis"], ws, noise_mode="const")
    np.testing.assert_allclose(
        np.asarray(img, np.float32), img_ref.numpy(), atol=5e-3)


def test_convert_tf_generator_progressive_lod_names():
    """Per-lod ToRGB names (progressive-growing pickles) flip the
    architecture to 'orig' and convert to the SAME params as the
    explicit-'orig' spelling. The reference's own branch for this input
    raises AttributeError (eg3d/legacy.py:166 references
    kwargs.synthesis.kwargs, which doesn't exist) — a documented
    reference defect we fix rather than replicate (SURVEY §7)."""
    rng = np.random.RandomState(2)           # same seed => same weights
    tf_vars = _tf_vars(rng, arch="orig")

    lod_vars = dict(tf_vars)
    top = f"synthesis/{RES}x{RES}/ToRGB"
    for suffix in ("weight", "bias", "mod_weight", "mod_bias"):
        lod_vars[f"ToRGB_lod0/{suffix}"] = lod_vars.pop(f"{top}/{suffix}")
    # stale lower-lod heads like real progressive pickles carry; unused
    lod_vars["ToRGB_lod1/weight"] = rng.randn(
        1, 1, min(FMAP_BASE * 2 // (RES // 2), FMAP_MAX), 3).astype(np.float32)

    gen, params = convert_tf_generator(_stub(lod_vars))
    gen_ref, params_ref = convert_tf_generator(_stub(tf_vars, architecture="orig"))
    assert gen == gen_ref
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        params, params_ref)

    # the reference crashes on the same input — pin the defect so this
    # divergence stays documented
    import legacy as ref_legacy
    import dnnlib

    ref_stub = ref_legacy._TFNetworkStub(
        version=4, static_kwargs=dnnlib.EasyDict(_static_kwargs()),
        variables=list(lod_vars.items()), components=dnnlib.EasyDict(),
    )
    with pytest.raises(AttributeError):
        ref_legacy.convert_tf_generator(ref_stub)


def test_load_tf_network_pkl_roundtrip():
    """A pickle whose Networks resolve from dnnlib.tflib.network loads
    through the stub unpickler and returns the converted G_ema."""
    rng = np.random.RandomState(1)
    tf_vars = _tf_vars(rng)

    # craft modules so pickle writes the dnnlib.tflib.network.Network path
    mod = types.ModuleType("dnnlib.tflib.network")

    class Network(dict):
        pass

    Network.__module__ = "dnnlib.tflib.network"
    Network.__qualname__ = "Network"
    mod.Network = Network
    saved = {k: sys.modules.get(k) for k in
             ("dnnlib", "dnnlib.tflib", "dnnlib.tflib.network")}
    import dnnlib as real_dnnlib
    tflib = types.ModuleType("dnnlib.tflib")
    tflib.network = mod
    sys.modules["dnnlib.tflib"] = tflib
    sys.modules["dnnlib.tflib.network"] = mod
    real_dnnlib.tflib = tflib
    try:
        net = Network(version=4, static_kwargs=_static_kwargs(),
                      variables=list(tf_vars.items()), components={})
        blob = pickle.dumps((net, net, net))
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
        if saved["dnnlib"] is not None and hasattr(real_dnnlib, "tflib"):
            del real_dnnlib.tflib

    from gaussian_gan_decoder_tpu.port.tf_legacy import load_tf_pickle

    data = load_tf_pickle(io.BytesIO(blob))
    assert is_tf_pickle(data)
    gen, params = load_tf_network_pkl(io.BytesIO(blob))
    img = gen.apply(params, jnp.asarray(np.zeros((1, Z_DIM), np.float32)),
                    None, noise_mode="const")
    assert img.shape == (1, 3, RES, RES)
    assert np.isfinite(np.asarray(img)).all()
