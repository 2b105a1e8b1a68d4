"""MBS: mask-based background-swap consistency metric.

Re-design of /root/reference/PanoHead/calc_mbs.py:84-187: render each
latent twice — identical foreground w, different background w
(`ws_bcg`) — segment the person in both, and report the mean squared
difference of the two masks. A background-disentangled generator scores
near zero.

Mask sources:
  * --mask_source gan (default): the generator's own `image_mask`
    (volume-rendering weights) — native to PanoHead synthesis, no
    external weights needed;
  * --mask_source deeplab --deeplab_weights <pth>: torchvision
    deeplabv3_resnet101 person class (the reference's segmenter; its
    pretrained weights must be supplied locally — zero-egress).

Note the shipped reference generator forces the rendered background to
-1 (training/triplane.py:184), which this port reproduces — on such
checkpoints the swap is a no-op and MBS is ~0 by construction, exactly
as it is for the reference code.
"""
from __future__ import annotations

import argparse
import json
import math

import jax
import jax.numpy as jnp
import numpy as np


def _deeplab_mask_fn(weights_path: str):
    import torch
    from torchvision.models.segmentation import deeplabv3_resnet101

    net = deeplabv3_resnet101(weights=None, progress=False, aux_loss=True)
    state = torch.load(weights_path, map_location="cpu")
    net.load_state_dict(state)
    net.eval().requires_grad_(False)
    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)

    def mask_fn(img01: np.ndarray) -> np.ndarray:
        """(N, 3, H, W) [0,1] -> (N, H, W) person mask (class 15)."""
        with torch.no_grad():
            x = (torch.from_numpy(img01) - mean) / std
            logits = net(x)["out"]
            return (logits.argmax(1) == 15).float().numpy()

    return mask_fn


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--network_pkl", default="", help="reference GAN .pkl to port")
    p.add_argument("--trunc", type=float, default=0.7)
    p.add_argument("--pose_cond", type=float, default=90.0, help="degrees")
    p.add_argument("--fov_deg", type=float, default=18.837)
    p.add_argument("--n_sample", type=int, default=64)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--mask_source", default="gan", choices=["gan", "deeplab"])
    p.add_argument("--deeplab_weights", default="")
    p.add_argument("--seed", type=int, default=0)
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

    mask_fn = None
    if args.mask_source == "deeplab":
        assert args.deeplab_weights, "--deeplab_weights required for deeplab"
        mask_fn = _deeplab_mask_fn(args.deeplab_weights)

    intr = FOV_to_intrinsics(jnp.asarray(args.fov_deg))
    pose = _pose_from_hv(
        jnp.asarray([[args.pose_cond / 180.0 * math.pi]]),
        jnp.asarray([[math.pi / 2]]), 2.7)
    c1 = jnp.concatenate([pose.reshape(1, 16), intr.reshape(1, 9)], axis=1)

    @jax.jit
    def render_pair(z0, z1):
        b = z0.shape[0]
        c = jnp.tile(c1, (b, 1))
        ws0 = gen.mapping(gp, z0, c, truncation_psi=args.trunc)
        ws1 = gen.mapping(gp, z1, c, truncation_psi=args.trunc)
        planes = gen.synthesis_planes(gp, ws0, noise_mode="const")
        out0 = gen.render_planes(gp, planes, ws0, c,
                                 neural_rendering_resolution=nrr,
                                 noise_mode="const", ws_bcg=ws0)
        out1 = gen.render_planes(gp, planes, ws0, c,
                                 neural_rendering_resolution=nrr,
                                 noise_mode="const", ws_bcg=ws1)

        def img01(o):
            im = o["image"] if "image" in o else o["image_raw"]
            return jnp.clip((im + 1) / 2, 0, 1)

        def gan_mask(o):
            return jnp.clip((o["image_mask"][:, 0] + 1) / 2, 0, 1)

        return (img01(out0), img01(out1), gan_mask(out0), gan_mask(out1))

    n = args.n_sample // args.batch * args.batch
    key = jax.random.PRNGKey(args.seed)
    mses = []
    for i in range(n // args.batch):
        k0, k1, key = jax.random.split(jax.random.fold_in(key, i), 3)
        z0 = jax.random.normal(k0, (args.batch, gen.z_dim))
        z1 = jax.random.normal(k1, (args.batch, gen.z_dim))
        im0, im1, m0, m1 = render_pair(z0, z1)
        if mask_fn is not None:
            m0 = mask_fn(np.asarray(im0, np.float32))
            m1 = mask_fn(np.asarray(im1, np.float32))
        mses.append(float(np.mean((np.asarray(m0) - np.asarray(m1)) ** 2)))

    mbs = float(np.mean(mses)) if mses else float("nan")
    print(json.dumps({"metric": "mbs", "value": mbs,
                      "n_sample": n, "mask_source": args.mask_source}))
    return mbs


if __name__ == "__main__":
    main()
