"""Sample images (and optional shapes) straight from a 3D GAN.

Re-design of /root/reference/PanoHead/gen_samples.py: per seed, render the
ported generator at given yaw/pitch offsets (volume rendering path), save
PNGs, optionally export the density shape (.mrc + .ply via gen_shapes
machinery).
"""
from __future__ import annotations

import argparse
import math
import os

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--network_pkl", default="", help="reference GAN .pkl to port")
    p.add_argument("--seeds", default="0,1,2")
    p.add_argument("--trunc", type=float, default=0.7)
    p.add_argument("--fov_deg", type=float, default=18.837)
    p.add_argument("--yaws", default="0.0", help="comma yaw offsets (rad)")
    p.add_argument("--random_views", type=int, default=0,
                   help=">0: per seed render N random views (yaw in "
                        "[-45,45] deg, pitch in [-0.2,0.2] deg) saved as "
                        "seedNNNN_i.png — ID-eval pairs (ref "
                        "gen_samples_forID.py:181-190)")
    p.add_argument("--outdir", default="out_samples")
    p.add_argument("--shapes", action="store_true")
    p.add_argument("--shape_res", type=int, default=128)
    p.add_argument("--smoke", action="store_true")
    p.add_argument("--force_cpu", action="store_true")
    args = p.parse_args(argv)
    if args.force_cpu:
        jax.config.update("jax_platforms", "cpu")

    from ..decoder.camera_sampling import FOV_to_intrinsics, _pose_from_hv

    if args.smoke:
        from ..models.triplane import TriPlaneGenerator

        gen = TriPlaneGenerator(
            z_dim=32, c_dim=25, w_dim=32, img_resolution=32, variant="panohead",
            without_sr=True, channel_base=512, channel_max=32,
            rendering_kwargs=(
                ("triplane_size", 16), ("depth_resolution", 4),
                ("depth_resolution_importance", 4),
            ),
        )
        gp = gen.init(jax.random.PRNGKey(0))
        nrr = 32
    else:
        from ..port import load_generator_pkl

        gen, gp = load_generator_pkl(args.network_pkl)
        nrr = 64

    os.makedirs(args.outdir, exist_ok=True)
    intr = FOV_to_intrinsics(jnp.asarray(args.fov_deg))

    @jax.jit
    def render(z, c):
        out = gen.apply(gp, z, c, truncation_psi=args.trunc,
                        neural_rendering_resolution=nrr,
                        key=jax.random.PRNGKey(0))
        img = out["image"] if "image" in out else out["image_raw"]
        return jnp.clip((img + 1) * 127.5, 0, 255)

    for seed in [int(s) for s in args.seeds.split(",")]:
        z = jax.random.normal(jax.random.PRNGKey(seed), (1, gen.z_dim))
        rnd = np.random.RandomState(seed)
        if args.random_views > 0:
            views = [
                ((-45 + 90 * rnd.random_sample()) / 180 * math.pi,
                 (-0.2 + 0.4 * rnd.random_sample()) / 180 * math.pi,
                 f"{i}")
                for i in range(args.random_views)
            ]
        else:
            views = [(float(y), 0.0, f"yaw{float(y):+.2f}")
                     for y in args.yaws.split(",")]
        for yaw, pitch, tag in views:
            pose = _pose_from_hv(
                jnp.asarray([[math.pi / 2 + yaw]]),
                jnp.asarray([[math.pi / 2 + pitch]]), 2.7
            )
            c = jnp.concatenate([pose.reshape(1, 16), intr.reshape(1, 9)], axis=1)
            img = np.asarray(render(z, c))[0].transpose(1, 2, 0).astype(np.uint8)
            path = os.path.join(args.outdir, f"seed{seed:04d}_{tag}.png")
            try:
                from PIL import Image

                Image.fromarray(img).save(path)
            except ImportError:
                np.save(path + ".npy", img)
            print(f"wrote {path}")

        if args.shapes:
            from ..decoder.surface import sigma_grid
            from ..gaussians.shape_export import save_mrc

            ws = gen.mapping(gp, z, jnp.zeros((1, gen.c_dim)), truncation_psi=args.trunc)
            planes = gen.synthesis_planes(gp, ws, noise_mode="const")
            sig = sigma_grid(gen, gp, planes, shape_res=args.shape_res,
                             chunk=min(2 ** 18, args.shape_res ** 3))
            save_mrc(os.path.join(args.outdir, f"seed{seed:04d}.mrc"), np.asarray(sig))
            print(f"wrote seed{seed:04d}.mrc")


if __name__ == "__main__":
    main()
