"""PTI inversion CLI: single image -> personalized generator + videos.

Re-design of /root/reference/PanoHead/projector_withseg.py::run_projection
+ gen_pti_script.sh: project to W, fine-tune G at the pivot, write
projected_w.npz and a fine-tuned generator snapshot.
"""
from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--network_pkl", default="", help="reference GAN .pkl to port")
    p.add_argument("--target", required=True, help="target image (png/jpg)")
    p.add_argument("--label", default="", help="25-float camera label file (.npy); frontal default")
    p.add_argument("--num_steps", type=int, default=1000)
    p.add_argument("--num_steps_pti", type=int, default=1000)
    p.add_argument("--outdir", default="pti_out")
    p.add_argument("--vgg_weights", default="")
    p.add_argument("--seed", type=int, default=303)
    p.add_argument("--smoke", action="store_true")
    p.add_argument("--force_cpu", action="store_true")
    args = p.parse_args(argv)
    if args.force_cpu:
        jax.config.update("jax_platforms", "cpu")

    from ..decoder.camera_sampling import FOV_to_intrinsics, sample_pose_lookat
    from ..losses import VGG16LPIPS
    from ..models.triplane import TriPlaneGenerator
    from ..train import checkpoint
    from ..train.inversion import ProjectConfig, project, project_pti

    if args.smoke:
        gen = TriPlaneGenerator(
            z_dim=32, c_dim=25, w_dim=32, img_resolution=32, variant="panohead",
            without_sr=True, channel_base=512, channel_max=32,
            rendering_kwargs=(
                ("triplane_size", 16), ("depth_resolution", 4),
                ("depth_resolution_importance", 4),
            ),
        )
        gp = gen.init(jax.random.PRNGKey(args.seed))
        res = 16
    else:
        from ..port import load_generator_pkl

        gen, gp = load_generator_pkl(args.network_pkl)
        res = gen.img_resolution

    from PIL import Image

    img = Image.open(args.target).convert("RGB").resize((res, res), Image.LANCZOS)
    target = jnp.asarray(np.asarray(img, np.float32).transpose(2, 0, 1))

    if args.label:
        c = jnp.asarray(np.load(args.label), jnp.float32).reshape(1, 25)
    else:
        pose, _, _ = sample_pose_lookat(jax.random.PRNGKey(0), jnp.pi / 2, jnp.pi / 2, radius=2.7)
        intr = FOV_to_intrinsics(jnp.asarray(13.0))
        c = jnp.concatenate([pose.reshape(1, 16), intr.reshape(1, 9)], axis=1)

    vgg = VGG16LPIPS()
    vgg_params = (
        vgg.load_torch_state_dict(dict(np.load(args.vgg_weights)))
        if args.vgg_weights else vgg.init(jax.random.PRNGKey(7))
    )

    cfg = ProjectConfig(
        num_steps=args.num_steps, pti_steps=args.num_steps_pti,
        w_avg_samples=500 if args.smoke else 10_000,
        neural_rendering_resolution=16 if args.smoke else 64,
    )
    os.makedirs(args.outdir, exist_ok=True)

    print("stage 1: W projection...")
    w_pivot, c_adj = project(gen, gp, target, c, vgg, vgg_params,
                             jax.random.PRNGKey(args.seed), cfg)
    np.savez(os.path.join(args.outdir, "projected_w.npz"), w=np.asarray(w_pivot))
    print("wrote projected_w.npz")

    print("stage 2: generator fine-tuning (PTI)...")
    gp_ft, losses = project_pti(gen, gp, w_pivot, target, c_adj, vgg, vgg_params,
                                jax.random.PRNGKey(args.seed + 1), cfg)
    checkpoint.save(os.path.join(args.outdir, "finetuned_generator"), gp_ft,
                    configs={"G": gen})
    print(f"wrote finetuned_generator (final loss {float(losses[-1]):.4f})")


if __name__ == "__main__":
    main()
