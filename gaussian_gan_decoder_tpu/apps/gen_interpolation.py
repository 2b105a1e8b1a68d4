"""Style-mixing interpolation grid between two seeds.

Re-design of /root/reference/PanoHead/gen_interpolation.py:87-196: map two
seeds to W+, build style-mixed latents (ws0 layers < cut, ws1 layers >=
cut for each cut in --cuts), synthesize each under frontal / side / back
conditioning cameras, and tile everything into ONE grid PNG
(rows = mixing cuts + the pure ws0 column, columns = the three views).
"""
from __future__ import annotations

import argparse
import math
import os

import jax
import jax.numpy as jnp
import numpy as np


def build_argparser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--network_pkl", default="")
    p.add_argument("--smoke", action="store_true",
                   help="tiny random generator instead of --network_pkl")
    p.add_argument("--seeds", default="521,329",
                   help="two comma seeds (ref defaults)")
    p.add_argument("--cuts", default="0,2,3,4,6,8",
                   help="style-mixing cut layers (ref interpolation_idx list)")
    p.add_argument("--trunc", type=float, default=0.7)
    p.add_argument("--pose_cond_deg", type=float, default=90.0)
    p.add_argument("--fov_deg", type=float, default=18.837)
    p.add_argument("--neural_rendering_resolution", type=int, default=64)
    p.add_argument("--outdir", default="interpolation_out")
    p.add_argument("--force_cpu", action="store_true")
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)
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
        args.neural_rendering_resolution = min(args.neural_rendering_resolution, 16)
    else:
        from ..port import load_generator_pkl

        assert args.network_pkl, "need --network_pkl (or --smoke)"
        gen, gp = load_generator_pkl(args.network_pkl)
    seed1, seed2 = (int(s) for s in args.seeds.split(","))
    cuts = [int(c) for c in args.cuts.split(",")]

    intr = FOV_to_intrinsics(jnp.asarray(args.fov_deg))
    pivot = jnp.zeros((1, 3))
    radius = gen.rk.get("avg_camera_radius", 2.7)

    def cam(yaw_rad):
        pose = _pose_from_hv(jnp.asarray([[yaw_rad]]),
                             jnp.asarray([[math.pi / 2]]), radius, lookat=pivot)
        return jnp.concatenate([pose.reshape(1, 16), intr.reshape(1, 9)], axis=1)

    pose_cond = args.pose_cond_deg / 180 * math.pi
    # frontal / side (45 deg) / back conditioning (ref :139-148)
    cams = [cam(pose_cond), cam(45 / 180 * math.pi), cam(-pose_cond)]

    z0 = jnp.asarray(np.random.RandomState(seed1).randn(1, gen.z_dim), jnp.float32)
    z1 = jnp.asarray(np.random.RandomState(seed2).randn(1, gen.z_dim), jnp.float32)
    ws0 = gen.mapping(gp, z0, cams[0], truncation_psi=args.trunc)
    ws1 = gen.mapping(gp, z1, cams[0], truncation_psi=args.trunc)

    @jax.jit
    def synth(ws, c):
        out = gen.synthesis(
            gp, ws, c,
            neural_rendering_resolution=args.neural_rendering_resolution,
        )
        img = (out["image"] if "image" in out else out["image_raw"])[0]
        return jnp.clip((img + 1) / 2, 0, 1)  # ref norm_range to [0,1]

    cols = []
    for c in cams:
        rows = []
        for cut in cuts:
            # ws_new: ws0 below the cut, ws1 from the cut on (ref :174-175)
            mask = (jnp.arange(gen.num_ws) >= cut)[None, :, None]
            ws_new = jnp.where(mask, ws1, ws0)
            rows.append(np.asarray(synth(ws_new, c)))
        rows.append(np.asarray(synth(ws0, c)))
        cols.append(np.concatenate(rows, axis=1))     # stack rows vertically
    grid = np.concatenate(cols, axis=2)               # views side by side

    os.makedirs(args.outdir, exist_ok=True)
    arr = np.clip(grid.transpose(1, 2, 0) * 255, 0, 255).astype(np.uint8)
    path = os.path.join(args.outdir,
                        f"img_interpolation_seed{seed1}_{seed2}.png")
    try:
        from PIL import Image

        Image.fromarray(arr).save(path)
    except ImportError:
        np.save(path + ".npy", arr)
    print(f"wrote {path} ({arr.shape[1]}x{arr.shape[0]})")


if __name__ == "__main__":
    main()
