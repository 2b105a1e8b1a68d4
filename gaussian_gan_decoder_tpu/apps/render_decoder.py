"""Render / export from a trained decoder snapshot.

Covers the reference's inference surface: load_decoder +
render_with_decoder (/root/reference/main/load_decoder.py:12-43) and
GaussianModel.save_ply export for splatviz/SIBR viewers
(gaussian_splatting/scene/gaussian_model.py:281; README.md:52-70).

Usage:
  python -m gaussian_gan_decoder_tpu.apps.render_decoder \
      --checkpoint results/runX/decoder_final --seed 7 \
      --out head.png --ply head.ply
"""
from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np


def build_argparser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--fov_deg", type=float, default=13.0)
    p.add_argument("--yaw", type=float, default=0.0, help="radians off frontal")
    p.add_argument("--pitch", type=float, default=0.0)
    p.add_argument("--truncation_psi", type=float, default=1.0)
    p.add_argument("--image_size", type=int, default=512)
    p.add_argument("--out", default="render.png")
    p.add_argument("--ply", default="", help="optional .ply scene export")
    p.add_argument("--backend", default="xla", choices=["xla", "pallas"])
    p.add_argument("--force_cpu", action="store_true")
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)
    if args.force_cpu:
        jax.config.update("jax_platforms", "cpu")
    import math

    from ..decoder.camera_sampling import FOV_to_intrinsics, _pose_from_hv
    from ..decoder.snapshot import load_decoder, render_with_decoder
    from ..decoder.target_pipeline import sample_target
    from ..gaussians.model import gaussian_scene_from_decoded
    from ..gaussians.ply import save_ply

    decoder, params, configs = load_decoder(args.checkpoint)
    gen = decoder.generator
    tcfg = configs.get("target_cfg")

    key = jax.random.PRNGKey(args.seed)
    z = jax.random.normal(key, (1, gen.z_dim))

    pose = _pose_from_hv(
        jnp.asarray([[math.pi / 2 + args.yaw]]),
        jnp.asarray([[math.pi / 2 + args.pitch]]),
        radius=2.7,
    )
    intr = FOV_to_intrinsics(jnp.asarray(args.fov_deg))
    cp = jnp.concatenate([pose.reshape(1, 16), intr.reshape(1, 9)], axis=1)

    # surface init positions from the frozen target generator
    frozen = configs.get("frozen_G_params", params["G"])
    target = sample_target(
        jax.random.fold_in(key, 1), gen, frozen, z,
        camera_params=cp, cfg=tcfg,
    )
    fov = jnp.deg2rad(args.fov_deg)
    img, decoded = render_with_decoder(
        decoder, params, z, cp, pose[0], target.vertices, fov,
        image_size=args.image_size, truncation_psi=args.truncation_psi,
        backend=args.backend,
    )

    arr = np.clip(np.asarray(img).transpose(1, 2, 0) * 255, 0, 255).astype(np.uint8)
    try:
        from PIL import Image

        Image.fromarray(arr).save(args.out)
        print(f"wrote {args.out}")
    except ImportError:
        np.save(args.out + ".npy", arr)
        print(f"PIL unavailable; wrote {args.out}.npy")

    if args.ply:
        scene = gaussian_scene_from_decoded(
            {k: np.asarray(v) for k, v in decoded.items()}
        )
        save_ply(scene, args.ply)
        print(f"wrote {args.ply}")


if __name__ == "__main__":
    main()
