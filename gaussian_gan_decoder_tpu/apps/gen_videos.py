"""Latent-interpolation orbit videos from a decoder snapshot.

Re-design of the reference media generators (/root/reference/PanoHead/
gen_videos.py:69 — cubic-spline latent interpolation over seeds while the
camera orbits) driving OUR decode+splat path instead of NeRF volume
rendering — this is BASELINE config #5, the real-time editing stream.

Frames are written as PNGs (and an .mp4 when imageio+ffmpeg exist).
"""
from __future__ import annotations

import argparse
import math
import os

import jax
import jax.numpy as jnp
import numpy as np


def catmull_rom(p0, p1, p2, p3, t):
    """Cubic interpolation between p1 and p2 (gen_videos uses scipy cubic
    splines over seed grid; Catmull-Rom gives the same C1 interpolation
    without scipy)."""
    t2, t3 = t * t, t * t * t
    return 0.5 * (
        2 * p1
        + (-p0 + p2) * t
        + (2 * p0 - 5 * p1 + 4 * p2 - p3) * t2
        + (-p0 + 3 * p1 - 3 * p2 + p3) * t3
    )


def build_argparser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--seeds", default="0,1,2,3")
    p.add_argument("--frames_per_seed", type=int, default=30)
    p.add_argument("--fov_deg", type=float, default=13.0)
    p.add_argument("--yaw_amplitude", type=float, default=0.6)
    p.add_argument("--image_size", type=int, default=512)
    p.add_argument("--outdir", default="video_frames")
    p.add_argument("--truncation_psi", type=float, default=0.7)
    p.add_argument("--backend", default="xla", choices=["xla", "pallas"])
    p.add_argument("--force_cpu", action="store_true")
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)
    if args.force_cpu:
        jax.config.update("jax_platforms", "cpu")
    from ..decoder.camera_sampling import FOV_to_intrinsics, _pose_from_hv
    from ..decoder.snapshot import load_decoder, render_with_decoder
    from ..decoder.target_pipeline import sample_target

    decoder, params, configs = load_decoder(args.checkpoint)
    gen = decoder.generator
    tcfg = configs.get("target_cfg")
    seeds = [int(s) for s in args.seeds.split(",")]
    zs = np.stack(
        [np.asarray(jax.random.normal(jax.random.PRNGKey(s), (gen.z_dim,))) for s in seeds]
    )

    os.makedirs(args.outdir, exist_ok=True)
    intr = FOV_to_intrinsics(jnp.asarray(args.fov_deg))
    fov = jnp.deg2rad(args.fov_deg)

    @jax.jit
    def frame(z, cp, pose, vertices):
        img, _ = render_with_decoder(
            decoder, params, z, cp, pose, vertices, fov,
            image_size=args.image_size,
            truncation_psi=args.truncation_psi, backend=args.backend,
        )
        return img

    n_total = len(seeds) * args.frames_per_seed
    files = []
    for fidx in range(n_total):
        seg, t = divmod(fidx, args.frames_per_seed)
        t /= args.frames_per_seed
        zi = catmull_rom(
            zs[(seg - 1) % len(seeds)], zs[seg % len(seeds)],
            zs[(seg + 1) % len(seeds)], zs[(seg + 2) % len(seeds)], t,
        )[None]
        yaw = args.yaw_amplitude * math.sin(2 * math.pi * fidx / n_total)
        pose = _pose_from_hv(
            jnp.asarray([[math.pi / 2 + yaw]]), jnp.asarray([[math.pi / 2]]), 2.7
        )
        cp = jnp.concatenate([pose.reshape(1, 16), intr.reshape(1, 9)], axis=1)
        target = sample_target(
            jax.random.PRNGKey(fidx), gen,
            configs.get("frozen_G_params", params["G"]), jnp.asarray(zi),
            camera_params=cp, cfg=tcfg,
        )
        img = frame(jnp.asarray(zi), cp, pose[0], target.vertices)
        arr = np.clip(np.asarray(img).transpose(1, 2, 0) * 255, 0, 255).astype(np.uint8)
        path = os.path.join(args.outdir, f"frame_{fidx:05d}.png")
        try:
            from PIL import Image

            Image.fromarray(arr).save(path)
        except ImportError:
            np.save(path + ".npy", arr)
        files.append(path)
        if fidx % 10 == 0:
            print(f"frame {fidx}/{n_total}")

    try:  # optional mp4
        import imageio

        with imageio.get_writer(os.path.join(args.outdir, "video.mp4"), fps=30) as w:
            for f in files:
                w.append_data(imageio.imread(f))
        print("wrote video.mp4")
    except Exception:
        print(f"wrote {len(files)} frames to {args.outdir} (imageio/ffmpeg unavailable)")


if __name__ == "__main__":
    main()
