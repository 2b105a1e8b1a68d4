"""Classic photogrammetric 3DGS training CLI.

Re-design of /root/reference/gaussian_splatting/train.py:31-226: COLMAP or
Blender scene in, densification schedule, .ply checkpoints out.
"""
from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--source_path", "-s", required=True)
    p.add_argument("--model_path", "-m", default="./gs_output")
    p.add_argument("--iterations", type=int, default=30_000)
    p.add_argument("--capacity", type=int, default=2 ** 20)
    p.add_argument("--sh_degree", type=int, default=3)
    p.add_argument("--white_background", action="store_true")
    p.add_argument("--image_size", type=int, default=512,
                   help="training render size (GT resized)")
    p.add_argument("--save_iterations", type=int, nargs="*", default=[7_000, 30_000])
    p.add_argument("--gui_port", type=int, default=0,
                   help=">0: serve the SIBR remote viewer while training "
                        "(ref gaussian_splatting/train.py:52-65)")
    p.add_argument("--force_cpu", action="store_true")
    args = p.parse_args(argv)
    if args.force_cpu:
        jax.config.update("jax_platforms", "cpu")

    from PIL import Image

    from ..data.scene_io import camera_to_render_inputs, read_blender_scene, read_colmap_scene
    from ..gaussians.cameras import make_camera
    from ..gaussians.densify import reset_opacity
    from ..gaussians.ply import save_ply
    from ..splat.rasterize import RasterizeConfig
    from ..train.gaussian_splatting import (
        GSOptimizationConfig, densify_step, init_gs_state, make_train_step,
    )
    from ..utils.stats import Collector

    if os.path.exists(os.path.join(args.source_path, "sparse")):
        info = read_colmap_scene(args.source_path)
    else:
        info = read_blender_scene(
            args.source_path, args.white_background,
            n_random_points=min(100_000, args.capacity // 2),
        )
    print(f"{len(info.cameras)} cameras, {len(info.points)} init points, "
          f"extent {info.extent:.2f}")

    cfg = GSOptimizationConfig(
        iterations=args.iterations, capacity=args.capacity, sh_degree=args.sh_degree,
    )
    rcfg = RasterizeConfig()
    state = init_gs_state(info.points, info.colors, cfg, spatial_lr_scale=info.extent)
    step, tx = make_train_step(cfg, rcfg, args.image_size, info.extent)
    jstep = jax.jit(step, static_argnames=("sh_degree",))

    bg = jnp.ones(3) if args.white_background else jnp.zeros(3)
    os.makedirs(args.model_path, exist_ok=True)
    stats = Collector(os.path.join(args.model_path, "stats.jsonl"))

    gui = None
    if args.gui_port > 0:
        from ..gaussians.network_gui import NetworkGUI

        gui = NetworkGUI("127.0.0.1", args.gui_port)
        print(f"network GUI on 127.0.0.1:{args.gui_port}")

    def gui_poll(scene, sh_deg):
        """Nonblocking viewer service (ref train.py:52-65: render the
        viewer's camera from the CURRENT gaussians, swallow socket
        errors)."""
        from ..splat.rasterize import rasterize

        if gui.conn is None:
            gui.try_connect()
            return
        try:
            gui.conn.settimeout(0.005)
            try:
                cam, _t, _k, smod, (w, h), _m = gui.receive()
            finally:
                gui.conn.settimeout(None)
            if cam is None:
                gui.send(None, args.source_path)
                return
            out = rasterize(
                cam, scene.get_xyz, scene.get_scaling, scene.get_rotation,
                scene.get_opacity, shs=scene.get_features,
                sh_degree=sh_deg, bg=bg, config=rcfg,
                scale_modifier=smod,
            )
            img = np.asarray(
                jnp.clip(out["render"] * 255, 0, 255)).astype(np.uint8)
            gui.send(img.transpose(1, 2, 0).tobytes(), args.source_path)
        except (BlockingIOError, TimeoutError):
            pass
        except (ConnectionError, BrokenPipeError, OSError, ValueError):
            # ValueError covers json decode of a half-read / closed socket
            gui.conn = None

    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(0)
    gt_cache = {}
    for i in range(args.iterations):
        if gui is not None and i % 5 == 0:
            gui_poll(state.scene, min(i // 1000, cfg.sh_degree))
        ci = int(rng.randint(len(info.cameras)))
        sc = info.cameras[ci]
        if ci not in gt_cache:
            img = Image.open(sc.image_path).convert("RGB").resize(
                (args.image_size, args.image_size), Image.LANCZOS)
            gt_cache[ci] = jnp.asarray(
                np.asarray(img, np.float32).transpose(2, 0, 1) / 255.0)
        cam2world, fov = camera_to_render_inputs(sc)
        cam = make_camera(args.image_size, jnp.asarray(fov), jnp.asarray(cam2world))
        sh_deg = min(i // 1000, cfg.sh_degree)  # oneupSHdegree schedule
        state, metrics = jstep(state, cam, gt_cache[ci], bg, sh_degree=sh_deg)
        stats.report({k: float(v) for k, v in metrics.items()})

        if cfg.densify_from_iter <= i < cfg.densify_until_iter:
            if i % cfg.densification_interval == 0 and i > 0:
                key, k = jax.random.split(key)
                mss = 20.0 if i > cfg.opacity_reset_interval else None
                state, dstats = densify_step(state, k, cfg, info.extent, mss, tx)
            if i % cfg.opacity_reset_interval == 0 and i > 0:
                state = state._replace(scene=reset_opacity(state.scene))

        if i % 100 == 0:
            row = stats.flush(i)
            print(f"[{i}] loss={row.get('loss', 0):.4f} n={int(metrics['n_valid'])}")
        if i in args.save_iterations:
            save_ply(state.scene, os.path.join(
                args.model_path, f"point_cloud/iteration_{i}/point_cloud.ply"))

    save_ply(state.scene, os.path.join(
        args.model_path, "point_cloud/final/point_cloud.ply"))
    print("done")


if __name__ == "__main__":
    main()
