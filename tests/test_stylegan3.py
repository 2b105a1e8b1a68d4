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
