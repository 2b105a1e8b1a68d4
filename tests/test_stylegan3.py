"""StyleGAN3 alias-free layer: shape contract + filter design."""
import numpy as np
import jax
import jax.numpy as jnp

from gaussian_gan_decoder_tpu.models.stylegan3 import SynthesisLayer3, design_lowpass_filter


def test_lowpass_filter_design():
    f = design_lowpass_filter(12, cutoff=4.0, width=4.0, fs=32.0)
    assert f.shape == (12,)
    np.testing.assert_allclose(f.sum(), 1.0, rtol=1e-6)
    assert design_lowpass_filter(1, 1.0, 1.0, 2.0) is None
    fr = design_lowpass_filter(12, cutoff=4.0, width=4.0, fs=32.0, radial=True)
    assert fr.shape == (12, 12)
    np.testing.assert_allclose(fr.sum(), 1.0, rtol=1e-5)


def test_sg3_layer_resamples_to_out_size():
    layer = SynthesisLayer3(
        w_dim=16, in_channels=8, out_channels=8,
        in_size=16, out_size=32,
        in_sampling_rate=16, out_sampling_rate=32,
        in_cutoff=4, out_cutoff=8,
        in_half_width=4, out_half_width=8,
        conv_clamp=None,
    )
    p = layer.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 16, 16))
    w = jax.random.normal(jax.random.PRNGKey(2), (2, 16))
    y = layer.apply(p, x, w)
    assert y.shape == (2, 8, 32, 32), y.shape
    assert np.all(np.isfinite(np.asarray(y)))


def test_sg3_torgb_keeps_size():
    layer = SynthesisLayer3(
        w_dim=16, in_channels=8, out_channels=3,
        in_size=16, out_size=16,
        in_sampling_rate=16, out_sampling_rate=16,
        in_cutoff=8, out_cutoff=8,
        in_half_width=2, out_half_width=2,
        conv_kernel=1, is_torgb=True, conv_clamp=None,
    )
    p = layer.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 16, 16))
    w = jax.random.normal(jax.random.PRNGKey(2), (1, 16))
    y = layer.apply(p, x, w)
    assert y.shape == (1, 3, 16, 16), y.shape


# ----------------------------------------------------------------------------
# Torch-golden parity against the ACTUAL reference networks_stylegan3.py on
# CPU (the reference ops all carry CPU fallback paths — filtered_lrelu.py
# :114-118 ref impl, conv2d_gradfix plain-conv fallback).

import os
import sys

import pytest

REF = "/root/reference"


def _ref_sg3():
    for p in (REF, os.path.join(REF, "PanoHead")):
        if p not in sys.path:
            sys.path.insert(0, p)
    torch = pytest.importorskip("torch")
    if not os.path.isdir(os.path.join(REF, "PanoHead")):
        pytest.skip("no reference checkout")
    from training import networks_stylegan3 as ref_sg3  # noqa: E402

    return torch, ref_sg3


def _tiny_cfg():
    return dict(
        z_dim=32, c_dim=0, w_dim=32, img_resolution=32, img_channels=3,
        channel_base=1024, channel_max=32,
    )


def _build_pair(use_radial=False):
    """(ref torch Generator, our Generator3, ported params)."""
    import jax.numpy as jnp

    from gaussian_gan_decoder_tpu.models.stylegan3 import Generator3
    from gaussian_gan_decoder_tpu.port.torch_pickle import (
        extract_state,
        generator_params_from_state,
    )

    torch, ref_sg3 = _ref_sg3()
    cfg = _tiny_cfg()
    torch.manual_seed(7)
    G = ref_sg3.Generator(
        **cfg, num_layers=6, num_critical=2, margin_size=10,
        num_fp16_res=0, use_radial_filters=use_radial,
    ).eval()
    with torch.no_grad():
        G.mapping.w_avg.copy_(torch.randn(cfg["w_dim"]) * 0.2)
        # non-trivial magnitude EMAs so the input_gain path is exercised
        for name in G.synthesis.layer_names:
            getattr(G.synthesis, name).magnitude_ema.copy_(
                torch.rand(()) * 0.5 + 0.75
            )
    ours = Generator3(
        z_dim=cfg["z_dim"], c_dim=cfg["c_dim"], w_dim=cfg["w_dim"],
        img_resolution=cfg["img_resolution"], img_channels=cfg["img_channels"],
        synthesis_kwargs=(
            ("channel_base", cfg["channel_base"]),
            ("channel_max", cfg["channel_max"]),
            ("num_layers", 6), ("num_critical", 2), ("margin_size", 10),
            ("use_radial_filters", use_radial),
        ),
    )
    params = generator_params_from_state(extract_state(G))
    # every ported leaf must land on a config-declared slot
    init_tree = ours.init(__import__("jax").random.PRNGKey(0))
    flat_port = {p for p, _ in _leaves(params)}
    flat_init = {p for p, _ in _leaves(init_tree)}
    assert flat_port == flat_init, flat_port ^ flat_init
    del jnp
    return torch, G, ours, params


def _leaves(tree, prefix=""):
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from _leaves(v, prefix + k + ".")
        else:
            yield prefix + k, v


def test_sg3_generator_golden_vs_reference():
    import jax.numpy as jnp

    torch, G, ours, params = _build_pair()
    z = np.random.RandomState(11).randn(2, 32).astype(np.float32)
    with torch.no_grad():
        ref_img = G(torch.from_numpy(z), None, truncation_psi=0.7).numpy()
    img = np.asarray(
        ours.apply(params, jnp.asarray(z), None, truncation_psi=0.7)
    )
    assert img.shape == ref_img.shape == (2, 3, 32, 32)
    np.testing.assert_allclose(img, ref_img, atol=2e-4, rtol=1e-3)


def test_sg3_generator_golden_radial_filters():
    import jax.numpy as jnp

    torch, G, ours, params = _build_pair(use_radial=True)
    z = np.random.RandomState(3).randn(1, 32).astype(np.float32)
    with torch.no_grad():
        ref_img = G(torch.from_numpy(z), None).numpy()
    img = np.asarray(ours.apply(params, jnp.asarray(z), None))
    np.testing.assert_allclose(img, ref_img, atol=2e-4, rtol=1e-3)


def test_sg3_synthesis_input_golden():
    """SynthesisInput Fourier features parity, including a non-identity
    learned transform (random affine weights) and the out-of-band
    amplitude damping (ref networks_stylegan3.py:200-245)."""
    import jax.numpy as jnp

    from gaussian_gan_decoder_tpu.models.stylegan3 import SynthesisInput3
    from gaussian_gan_decoder_tpu.port.torch_pickle import (
        extract_state,
        generator_params_from_state,
    )

    torch, ref_sg3 = _ref_sg3()
    torch.manual_seed(5)
    ref = ref_sg3.SynthesisInput(
        w_dim=16, channels=24, size=20, sampling_rate=16, bandwidth=2
    ).eval()
    with torch.no_grad():
        # non-zero affine weight => real rotation/translation per sample
        ref.affine.weight.copy_(torch.randn_like(ref.affine.weight) * 0.3)
    ours = SynthesisInput3(w_dim=16, channels=24, size=20,
                           sampling_rate=16.0, bandwidth=2.0)
    params = generator_params_from_state(extract_state(ref))
    w = np.random.RandomState(0).randn(3, 16).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(w)).numpy()
    out = np.asarray(ours.apply(params, jnp.asarray(w)))
    assert out.shape == ref_out.shape == (3, 24, 20, 20)
    np.testing.assert_allclose(out, ref_out, atol=1e-5, rtol=1e-4)


def test_sg3_magnitude_ema_update_matches_reference_lerp():
    layer = SynthesisLayer3(
        w_dim=8, in_channels=4, out_channels=4,
        in_size=8, out_size=8,
        in_sampling_rate=8, out_sampling_rate=8,
        in_cutoff=2, out_cutoff=2,
        in_half_width=2, out_half_width=2, conv_clamp=None,
    )
    p = layer.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 8, 8)) * 3.0
    p2 = layer.update_magnitude_ema(p, x, beta=0.999)
    cur = float(jnp.mean(jnp.square(x)))
    expected = cur + (1.0 - cur) * 0.999  # lerp(cur, ema, beta)
    np.testing.assert_allclose(float(p2["magnitude_ema"]), expected, rtol=1e-6)
