"""GAN adversarial training step: discriminators + loss + EMA smoke."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gaussian_gan_decoder_tpu.models.discriminator import (
    Discriminator,
    filtered_resizing,
    minibatch_std,
)
from gaussian_gan_decoder_tpu.train.gan import (
    GANLossConfig,
    init_gan_state,
    make_gan_train_step,
)
from tests.test_models_triplane import tiny_generator


def test_minibatch_std_shapes(rng):
    x = jnp.asarray(rng.randn(4, 8, 5, 5).astype(np.float32))
    y = minibatch_std(x, group_size=2, num_channels=1)
    assert y.shape == (4, 9, 5, 5)
    np.testing.assert_allclose(np.asarray(y[:, :8]), np.asarray(x))


@pytest.mark.parametrize("mode", ["single", "dual", "mask_dual"])
def test_discriminator_forward(rng, mode):
    d = Discriminator(
        c_dim=25, img_resolution=32, img_channels=3, mode=mode,
        channel_base=512, channel_max=32, num_fp16_res=0, conv_clamp=None,
        seg_resolution=16, mbstd_group_size=2,
    )
    params = d.init(jax.random.PRNGKey(0))
    img = {
        "image": jnp.asarray(rng.randn(2, 3, 32, 32).astype(np.float32)),
        "image_raw": jnp.asarray(rng.randn(2, 3, 16, 16).astype(np.float32)),
        "image_mask": jnp.asarray(rng.rand(2, 1, 16, 16).astype(np.float32)),
    }
    c = jnp.asarray(rng.randn(2, 25).astype(np.float32))
    logits = d.apply(params, img, c)
    assert logits.shape == (2, 1)
    assert np.all(np.isfinite(np.asarray(logits)))


def test_gan_train_step_runs_and_learns():
    G = tiny_generator("panohead", c_gen_conditioning_zero=False)
    D = Discriminator(
        c_dim=25, img_resolution=16, img_channels=3, mode="mask_dual",
        channel_base=256, channel_max=32, num_fp16_res=0, conv_clamp=None,
        seg_resolution=8, mbstd_group_size=2,
    )
    cfg = GANLossConfig(
        neural_rendering_resolution_initial=16,
        g_reg_interval=2, d_reg_interval=2, batch_size=2,
        density_reg=0.25, r1_gamma=10.0, gpc_reg_prob=0.5,
    )
    state = init_gan_state(jax.random.PRNGKey(0), G, D, cfg)
    step, _ = make_gan_train_step(G, D, cfg)
    step = jax.jit(step)

    b = 2
    z = jax.random.normal(jax.random.PRNGKey(1), (b, 32))
    c = jax.random.normal(jax.random.PRNGKey(2), (b, 25)) * 0.1
    real = {
        "image": jax.random.uniform(jax.random.PRNGKey(3), (b, 3, 16, 16)) * 2 - 1,
        "image_raw": jax.random.uniform(jax.random.PRNGKey(4), (b, 3, 16, 16)) * 2 - 1,
        "image_mask": jax.random.uniform(jax.random.PRNGKey(5), (b, 1, 16, 16)),
    }

    g0 = jax.tree.leaves(state.g_params)[0].copy()
    for i in range(2):
        state, metrics = step(state, jax.random.PRNGKey(10 + i), z, c, real, c)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, float(v))
    assert int(state.step) == 2
    # params actually moved
    g1 = jax.tree.leaves(state.g_params)[0]
    assert not np.allclose(np.asarray(g0), np.asarray(g1))
    # EMA lags behind the live params
    e1 = jax.tree.leaves(state.g_ema)[0]
    assert not np.allclose(np.asarray(e1), np.asarray(g1))


def test_filtered_resizing_antialiased(rng):
    x = jnp.asarray(rng.randn(1, 3, 32, 32).astype(np.float32))
    y = filtered_resizing(x, 16, "antialiased")
    assert y.shape == (1, 3, 16, 16)


def test_gan_nrr_fade_single_program():
    """The nrr fade (ref loss.py:93-98) runs INSIDE one jitted step: a
    lax.switch over quantized levels — stepping cur_nimg through the fade
    changes Progress/nrr without retracing."""
    G = tiny_generator("panohead", c_gen_conditioning_zero=False)
    D = Discriminator(
        c_dim=25, img_resolution=16, img_channels=3, mode="dual",
        channel_base=256, channel_max=32, num_fp16_res=0, conv_clamp=None,
        mbstd_group_size=2,
    )
    cfg = GANLossConfig(
        neural_rendering_resolution_initial=8,
        neural_rendering_resolution_final=16,
        neural_rendering_resolution_fade_kimg=1.0,  # full fade over 1000 img
        g_reg_interval=2, d_reg_interval=2, batch_size=2,
        density_reg=0.25, r1_gamma=10.0, gpc_reg_prob=0.5,
    )
    state = init_gan_state(jax.random.PRNGKey(0), G, D, cfg)
    traces = {"n": 0}
    step_fn, _ = make_gan_train_step(G, D, cfg)

    def counting_step(*a):
        traces["n"] += 1
        return step_fn(*a)

    step = jax.jit(counting_step)
    b = 2
    z = jax.random.normal(jax.random.PRNGKey(1), (b, 32))
    c = jax.random.normal(jax.random.PRNGKey(2), (b, 25)) * 0.1
    real = {
        "image": jax.random.uniform(jax.random.PRNGKey(3), (b, 3, 16, 16)) * 2 - 1,
        "image_raw": jax.random.uniform(jax.random.PRNGKey(4), (b, 3, 16, 16)) * 2 - 1,
    }

    seen = []
    for nimg in (0.0, 500.0, 1500.0):
        s = state._replace(cur_nimg=jnp.asarray(nimg, jnp.float32))
        s2, metrics = step(s, jax.random.PRNGKey(9), z, c, real, c)
        seen.append(float(metrics["Progress/nrr"]))
        for k, v in metrics.items():
            assert np.isfinite(float(v)), (k, float(v))
    assert traces["n"] == 1, "fade must not retrace the step"
    assert seen[0] == 8.0 and seen[-1] == 16.0 and seen[1] in (8.0, 16.0)


def test_train_gan_cli_resume_roundtrip(tmp_path):
    """Smoke-train, snapshot, then resume from the orbax snapshot via
    --resume (the reference's --resume contract, PanoHead/train.py:138,
    training_loop.py:160-166)."""
    from gaussian_gan_decoder_tpu.apps.train_gan import main

    out1 = str(tmp_path / "run1")
    main(["--smoke", "--force_cpu", "--kimg", "0.002", "--batch", "2",
          "--outdir", out1, "--seed", "3"])
    import os

    snap = os.path.join(out1, "snapshot_final")
    assert os.path.isdir(snap)
    out2 = str(tmp_path / "run2")
    main(["--smoke", "--force_cpu", "--kimg", "0.002", "--batch", "2",
          "--outdir", out2, "--seed", "3", "--resume", snap])
    assert os.path.isdir(os.path.join(out2, "snapshot_final"))
