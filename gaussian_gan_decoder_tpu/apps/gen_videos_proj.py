"""Orbit/sweep videos from PROJECTED latents (the PTI consumer).

Re-design of /root/reference/PanoHead/gen_videos_proj_withseg.py:68-198
(gen_interp_video): load a `projected_w.npz` (apps/invert.py output, or
several for a keyframe interpolation), optionally the PTI fine-tuned
generator, orbit/sweep the camera, synthesize every frame from the FIXED
ws (no mapping pass), and write frames + mp4 + the camera trajectory.

image_mode selects which synthesis output is rendered (image / image_raw
/ image_depth / image_mask — the reference's --image_mode), making this
also the depth/mask video generator.
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
    p.add_argument("--latents", required=True,
                   help="comma list of projected_w.npz files (keyframes)")
    p.add_argument("--network_pkl", default="", help="reference GAN .pkl to port")
    p.add_argument("--finetuned", default="",
                   help="PTI fine-tuned generator checkpoint (apps/invert.py)")
    p.add_argument("--mode", default="orbit", choices=["orbit", "sweep"],
                   help="orbit: full 360 yaw (ref cfg=Head); sweep: "
                        "yaw/pitch sinusoid (ref default)")
    p.add_argument("--w_frames", type=int, default=120,
                   help="frames per keyframe segment (ref 60*4)")
    p.add_argument("--image_mode", default="image",
                   choices=["image", "image_raw", "image_depth", "image_mask"])
    p.add_argument("--fov_deg", type=float, default=18.837,
                   help="ref gen_videos_proj_withseg intrinsics fov")
    p.add_argument("--outdir", default="proj_video")
    p.add_argument("--neural_rendering_resolution", type=int, default=64)
    p.add_argument("--force_cpu", action="store_true")
    return p


def _catmull_rom(p0, p1, p2, p3, t):
    t2, t3 = t * t, t * t * t
    return 0.5 * (
        2 * p1 + (-p0 + p2) * t
        + (2 * p0 - 5 * p1 + 4 * p2 - p3) * t2
        + (-p0 + 3 * p1 - 3 * p2 + p3) * t3
    )


def main(argv=None):
    args = build_argparser().parse_args(argv)
    if args.force_cpu:
        jax.config.update("jax_platforms", "cpu")

    from ..decoder.camera_sampling import FOV_to_intrinsics, _pose_from_hv
    from ..train import checkpoint

    # -- generator ------------------------------------------------------------
    if args.finetuned:
        configs = checkpoint.load_configs(args.finetuned)
        gen = configs["G"]
        template = jax.eval_shape(lambda: gen.init(jax.random.PRNGKey(0)))
        gp = checkpoint.restore(args.finetuned, template)
    else:
        from ..port import load_generator_pkl

        assert args.network_pkl, "need --network_pkl or --finetuned"
        gen, gp = load_generator_pkl(args.network_pkl)

    # -- keyframe latents (ref :289 np.load(latent)['w']) ---------------------
    ws_keys = []
    for path in args.latents.split(","):
        w = np.load(path)["w"]
        if w.ndim == 2:  # (num_ws, w_dim)
            w = w[None]
        ws_keys.append(w[0])
    ws_keys = np.stack(ws_keys)  # (K, num_ws, w_dim)
    K = len(ws_keys)

    intr = FOV_to_intrinsics(jnp.asarray(args.fov_deg))
    pivot = jnp.asarray(gen.rk.get("avg_camera_pivot", (0, 0, 0)), jnp.float32)

    @jax.jit
    def frame(ws, cp):
        out = gen.synthesis(
            gp, ws, cp,
            neural_rendering_resolution=args.neural_rendering_resolution,
        )
        img = out[args.image_mode] if args.image_mode in out else out["image_raw"]
        if args.image_mode == "image_depth":
            # normalize like the reference (-depth -> [-1,1] percentile-free)
            img = -img
            img = (img - img.min()) / jnp.maximum(img.max() - img.min(), 1e-8) * 2 - 1
        if img.shape[1] == 1:
            img = jnp.tile(img, (1, 3, 1, 1))
        return img[0]

    os.makedirs(args.outdir, exist_ok=True)
    n_total = K * args.w_frames
    files, poses = [], []
    for fidx in range(n_total):
        t = fidx / n_total
        if args.mode == "orbit":
            yaw = math.pi / 2 + 2 * math.pi * t
            pitch = math.pi / 2 - 0.05
        else:
            # ref :125-128 — yaw_range 1.5, pitch_range 0.25
            yaw = math.pi / 2 + 1.5 * math.sin(2 * math.pi * t)
            pitch = math.pi / 2 - 0.05 + 0.25 * math.cos(2 * math.pi * t)
        pose = _pose_from_hv(
            jnp.asarray([[yaw]]), jnp.asarray([[pitch]]), 2.7,
            lookat=pivot[None],
        )
        cp = jnp.concatenate([pose.reshape(1, 16), intr.reshape(1, 9)], axis=1)

        seg, ft = divmod(fidx, args.w_frames)
        tt = ft / args.w_frames
        wi = _catmull_rom(
            ws_keys[(seg - 1) % K], ws_keys[seg % K],
            ws_keys[(seg + 1) % K], ws_keys[(seg + 2) % K], tt,
        )[None]

        img = frame(jnp.asarray(wi, jnp.float32), cp)
        arr = np.asarray(img).transpose(1, 2, 0)
        arr = np.clip((arr + 1) * 127.5, 0, 255).astype(np.uint8)
        path = os.path.join(args.outdir, f"frame_{fidx:05d}.png")
        try:
            from PIL import Image

            Image.fromarray(arr).save(path)
        except ImportError:
            np.save(path + ".npy", arr)
        files.append(path)
        poses.append(np.asarray(pose).reshape(16))
        if fidx % 20 == 0:
            print(f"frame {fidx}/{n_total}")

    # trajectory sidecar (ref :197 *_trajectory.npy)
    np.save(os.path.join(args.outdir, "trajectory.npy"), np.stack(poses))

    try:  # optional mp4
        import imageio

        with imageio.get_writer(os.path.join(args.outdir, "video.mp4"),
                                fps=60) as w:
            for f in files:
                w.append_data(imageio.imread(f))
        print("wrote video.mp4")
    except Exception:
        print(f"wrote {len(files)} frames to {args.outdir} "
              f"(imageio/ffmpeg unavailable)")


if __name__ == "__main__":
    main()
