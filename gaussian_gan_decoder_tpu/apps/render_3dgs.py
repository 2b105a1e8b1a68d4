"""Render train/test views from a trained 3DGS .ply + per-view metrics.

Re-design of /root/reference/gaussian_splatting/render.py:24 (render_set)
+ metrics.py:36 (evaluate: per-view SSIM/PSNR/LPIPS) + full_eval.py.
"""
from __future__ import annotations

import argparse
import json
import math
import os

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ply", required=True)
    p.add_argument("--source_path", "-s", required=True)
    p.add_argument("--out", default="./renders")
    p.add_argument("--image_size", type=int, default=512)
    p.add_argument("--sh_degree", type=int, default=3)
    p.add_argument("--max_views", type=int, default=0)
    p.add_argument("--white_background", action="store_true")
    p.add_argument("--skip_metrics", action="store_true")
    p.add_argument("--skip_lpips", action="store_true")
    p.add_argument("--vgg_weights", default="",
                   help="VGG16 LPIPS weights (.npz of torchvision keys); "
                        "without one, random-init features are used with a "
                        "warning (relative comparisons only — zero egress)")
    p.add_argument("--force_cpu", action="store_true")
    args = p.parse_args(argv)
    if args.force_cpu:
        jax.config.update("jax_platforms", "cpu")

    from PIL import Image

    from ..data.scene_io import camera_to_render_inputs, read_blender_scene, read_colmap_scene
    from ..gaussians.cameras import make_camera
    from ..gaussians.ply import load_ply
    from ..losses.image import l1_loss, ssim
    from ..losses.lpips import VGG16LPIPS
    from ..splat.rasterize import RasterizeConfig, rasterize

    scene = load_ply(args.ply, max_sh_degree=args.sh_degree)
    if os.path.exists(os.path.join(args.source_path, "sparse")):
        info = read_colmap_scene(args.source_path)
    else:
        info = read_blender_scene(args.source_path, args.white_background)

    bg = jnp.ones(3) if args.white_background else jnp.zeros(3)
    rcfg = RasterizeConfig()
    os.makedirs(args.out, exist_ok=True)

    @jax.jit
    def render(cam):
        return rasterize(
            cam, scene.get_xyz, scene.get_scaling, scene.get_rotation,
            scene.get_opacity, shs=scene.get_features,
            sh_degree=scene.active_sh_degree, bg=bg, config=rcfg,
        )["render"]

    # per-view LPIPS column (ref gaussian_splatting/metrics.py:36-55
    # reports SSIM/PSNR/LPIPS; lpipsPyTorch net_type='vgg')
    lpips_fn = None
    if not (args.skip_metrics or args.skip_lpips):
        vgg = VGG16LPIPS()
        if args.vgg_weights:
            # torchvision-style keys in an .npz (repo convention — see
            # train_decoder/eval_decoder/invert --vgg_weights)
            vgg_params = vgg.load_torch_state_dict(
                dict(np.load(args.vgg_weights)))
        else:
            print("WARNING: no --vgg_weights; LPIPS uses random-init VGG16 "
                  "features (valid for relative comparisons only)")
            vgg_params = vgg.init(jax.random.PRNGKey(0))

        @jax.jit
        def lpips_fn(a, b):
            # [0,1] images -> the VGG16 embedding's [0,255] domain; the
            # squared-diff-sum of embeddings IS the LPIPS distance
            d = vgg.embed(vgg_params, a[None] * 255.0) - \
                vgg.embed(vgg_params, b[None] * 255.0)
            return jnp.sum(jnp.square(d.astype(jnp.float32)))

    rows = []
    views = info.cameras[: args.max_views or None]
    for i, sc in enumerate(views):
        cam2world, fov = camera_to_render_inputs(sc)
        cam = make_camera(args.image_size, jnp.asarray(fov), jnp.asarray(cam2world))
        img = render(cam)
        arr = np.clip(np.asarray(img).transpose(1, 2, 0) * 255, 0, 255).astype(np.uint8)
        Image.fromarray(arr).save(os.path.join(args.out, f"{i:05d}.png"))
        if not args.skip_metrics and os.path.exists(sc.image_path):
            gt = Image.open(sc.image_path).convert("RGB").resize(
                (args.image_size, args.image_size), Image.LANCZOS)
            gt = jnp.asarray(np.asarray(gt, np.float32).transpose(2, 0, 1) / 255.0)
            mse = float(jnp.mean(jnp.square(img - gt)))
            row = {
                "view": i,
                "PSNR": 10 * math.log10(1.0 / max(mse, 1e-12)),
                "SSIM": float(ssim(img, gt)[0]),
                "L1": float(l1_loss(img, gt)),
            }
            if lpips_fn is not None:
                row["LPIPS"] = float(lpips_fn(img, gt))
            rows.append(row)
    if rows:
        cols = [k for k in ("PSNR", "SSIM", "L1", "LPIPS") if k in rows[0]]
        agg = {k: float(np.mean([r[k] for r in rows])) for k in cols}
        with open(os.path.join(args.out, "metrics.json"), "w") as f:
            json.dump({"per_view": rows, "mean": agg}, f, indent=2)
        print(json.dumps(agg, indent=2))
    print(f"rendered {len(views)} views to {args.out}")


if __name__ == "__main__":
    main()
