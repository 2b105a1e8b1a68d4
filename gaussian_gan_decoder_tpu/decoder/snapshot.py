"""Decoder snapshot save/load — the `load_decoder` public API.

Equivalent of /root/reference/main/load_decoder.py:12-43 (pickle of
{decoder, dataloader} re-instantiated through persistence) — here a
checkpoint of the params pytree plus a JSON config snapshot that rebuilds
every dataclass (train/checkpoint.py), so snapshots survive code changes
the same way the reference's source-embedding pickles do.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..gaussians.cameras import make_camera
from ..splat.rasterize import RasterizeConfig, render_simple
from ..train import checkpoint
from .heads import GaussianDecoder
from .target_pipeline import TargetSamplerConfig


def save_decoder(path: str, decoder: GaussianDecoder, params,
                 frozen_generator_params=None,
                 target_cfg: Optional[TargetSamplerConfig] = None,
                 extra_configs: Optional[Dict[str, Any]] = None) -> None:
    """Snapshot = decoder params (+ the FROZEN target generator, like the
    reference's pickled {decoder, dataloader} pair which carries both G
    copies) + dataclass configs as JSON."""
    configs = {"decoder": decoder}
    if target_cfg is not None:
        configs["target_cfg"] = target_cfg
    configs.update(extra_configs or {})
    tree = {"decoder": params}
    if frozen_generator_params is not None:
        tree["frozen_G"] = frozen_generator_params
    checkpoint.save(path, tree, configs=configs)


def load_decoder(path: str) -> Tuple[GaussianDecoder, Any, Dict[str, Any]]:
    """-> (decoder config, params, configs) (ref load_decoder.py:28-43).

    configs gains 'frozen_G_params' when the snapshot stored the frozen
    target generator."""
    configs = checkpoint.load_configs(path)
    decoder: GaussianDecoder = configs["decoder"]
    gen_params_shape = jax.eval_shape(
        lambda k: decoder.generator.init(k), jax.random.PRNGKey(0)
    )
    dec_shape = jax.eval_shape(
        lambda k: decoder.init(k, generator_params=gen_params_shape),
        jax.random.PRNGKey(0),
    )
    # try both layouts: {decoder, frozen_G} (new) and bare params (old)
    try:
        tree = checkpoint.restore(
            path, {"decoder": dec_shape, "frozen_G": gen_params_shape}
        )
        params = tree["decoder"]
        configs["frozen_G_params"] = tree["frozen_G"]
    except Exception:
        try:
            tree = checkpoint.restore(path, {"decoder": dec_shape})
            params = tree["decoder"]
        except Exception:
            params = checkpoint.restore(path, dec_shape)
    return decoder, params, configs


def render_with_decoder(
    decoder: GaussianDecoder,
    params,
    z,
    camera_params,
    cam2world,
    vertices,
    fov,
    image_size: int = 512,
    bg=(0.0, 0.0, 0.0),
    truncation_psi: float = 1.0,
    raster_cfg: RasterizeConfig = RasterizeConfig(),
    backend: str = "xla",
):
    """decode -> fill scene -> CustomCam -> render (ref load_decoder.py:12-26)."""
    decoded = decoder.apply(params, z, camera_params, vertices, truncation_psi)
    cam = make_camera(image_size, jnp.asarray(fov), cam2world)
    out = render_simple(
        cam, decoded, bg=jnp.asarray(bg, jnp.float32), config=raster_cfg,
        backend=backend,
    )
    return out["render"][:3], decoded
