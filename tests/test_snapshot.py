"""Decoder snapshot round trip (orbax + config JSON) and npz export."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gaussian_gan_decoder_tpu.decoder.heads import GaussianDecoder
from gaussian_gan_decoder_tpu.decoder.snapshot import load_decoder, save_decoder
from gaussian_gan_decoder_tpu.decoder.target_pipeline import TargetSamplerConfig
from gaussian_gan_decoder_tpu.train import checkpoint
from tests.test_models_triplane import tiny_generator


def test_snapshot_roundtrip(tmp_path):
    gen = tiny_generator("panohead")
    gp = gen.init(jax.random.PRNGKey(0))
    dec = GaussianDecoder(generator=gen, decoder_type="sequential_reversed", hidden_dim=16)
    params = dec.init(jax.random.PRNGKey(1), generator_params=gp)
    tcfg = TargetSamplerConfig(shape_res=16, num_points=128)

    path = str(tmp_path / "snap")
    save_decoder(path, dec, params, frozen_generator_params=gp, target_cfg=tcfg)

    dec2, params2, configs = load_decoder(path)
    assert dec2 == dec                      # dataclass equality incl. generator
    assert configs["target_cfg"] == tcfg
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    frozen = configs["frozen_G_params"]
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(frozen)[0]), np.asarray(jax.tree.leaves(gp)[0])
    )


def test_npz_export_roundtrip(tmp_path):
    tree = {"a": {"b": jnp.arange(4.0)}, "c": jnp.ones((2, 2))}
    p = str(tmp_path / "x.npz")
    checkpoint.save_npz(p, tree)
    flat = checkpoint.load_npz(p)
    np.testing.assert_array_equal(flat["a/b"], np.arange(4.0))
    np.testing.assert_array_equal(flat["c"], np.ones((2, 2)))


def test_config_json_roundtrip_deep_tuples():
    """List-valued rendering kwargs (avg_camera_pivot in every shipped
    checkpoint) must come back as nested TUPLES — hashable and == the
    original — through the config JSON used by snapshots and
    convert_checkpoint."""
    import json

    from gaussian_gan_decoder_tpu.models.triplane import TriPlaneGenerator
    from gaussian_gan_decoder_tpu.train import checkpoint

    cfg = TriPlaneGenerator(
        z_dim=64, c_dim=25, w_dim=128, img_resolution=128,
        rendering_kwargs=(("avg_camera_pivot", (0.0, 0.0, 0.2)),
                          ("triplane_depth", 3)),
    )
    j = json.loads(json.dumps(checkpoint._config_to_json(cfg)))
    back = checkpoint._config_from_json(j)
    assert back == cfg
    hash(back)
