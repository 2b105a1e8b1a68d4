"""3D GAN adversarial training CLI.

Re-design of the reference launchers /root/reference/PanoHead/train.py and
eg3d/train.py (click CLIs -> training/training_loop.py:90). One process,
one jitted step; multi-chip via --batch_gpu sharding on the 'data' mesh
axis (replacing torch.multiprocessing.spawn + NCCL, ref train.py:24-97).

Usage (smoke):
  python -m gaussian_gan_decoder_tpu.apps.train_gan --smoke --force_cpu \
      --kimg 0.01 --outdir /tmp/gan
Real data:
  python -m gaussian_gan_decoder_tpu.apps.train_gan --data imgs.zip \
      --seg_data segs.zip --cfg ffhq --gpus 1 ...
"""
from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np


def build_argparser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--outdir", default="./gan_runs")
    p.add_argument("--data", default="", help="image zip/dir with dataset.json")
    p.add_argument("--seg_data", default="", help="segmentation zip (PanoHead)")
    p.add_argument("--cfg", default="ffhq", choices=["ffhq", "afhq", "shapenet"])
    p.add_argument("--variant", default="panohead", choices=["panohead", "eg3d"])
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--kimg", type=float, default=25000)
    p.add_argument("--glr", type=float, default=0.0025)
    p.add_argument("--dlr", type=float, default=0.002)
    p.add_argument("--gamma", type=float, default=1.0, help="R1 weight")
    # BooleanOptionalAction, not type=bool: bool("False") is True
    p.add_argument("--gen_pose_cond", action=argparse.BooleanOptionalAction,
                   default=True)
    p.add_argument("--gpc_reg_prob", type=float, default=0.5)
    p.add_argument("--density_reg", type=float, default=0.25)
    p.add_argument("--trans_reg", type=float, default=10.0)
    p.add_argument("--aug", default="noaug", choices=["noaug", "ada", "fixed"])
    p.add_argument("--ada_p", type=float, default=0.0)
    p.add_argument("--snap", type=int, default=50, help="snapshot every N ticks")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--img_resolution", type=int, default=512)
    # nrr fade (ref train.py:166-168); the fade runs INSIDE the jitted
    # step (train/gan.py lax.switch over quantized levels)
    p.add_argument("--neural_rendering_resolution_initial", type=int, default=64)
    p.add_argument("--neural_rendering_resolution_final", type=int, default=None)
    p.add_argument("--neural_rendering_resolution_fade_kimg", type=int, default=1000)
    p.add_argument("--num_fp16_res", type=int, default=4,
                   help="bf16 blocks at the top N resolutions (the "
                        "reference's mixed-precision scheme; bf16 on TPU)")
    p.add_argument("--resume", default="",
                   help="resume source: a reference GAN snapshot .pkl "
                        "(ports G/D/G_ema params, ref training_loop.py:"
                        "160-166) or an orbax snapshot dir written by "
                        "this trainer (restores the full train state)")
    p.add_argument("--smoke", action="store_true")
    p.add_argument("--force_cpu", action="store_true")
    return p


def _resume(path, state):
    """Fill `state` from a resume source (see --resume help)."""
    if path.endswith(".pkl"):
        from ..port.torch_pickle import load_gan_snapshot_pkl

        snap = load_gan_snapshot_pkl(path)

        def _take(ours, theirs, what):
            ts = jax.tree.structure(ours)
            ps = jax.tree.structure(theirs)
            assert ts == ps, (
                f"{what} param tree from {path} does not match the CLI "
                f"config — build G/D with the snapshot's shapes"
            )

            def leaf(o, t):
                assert o.shape == t.shape, (
                    f"{what} leaf shape {t.shape} from {path} != model "
                    f"shape {o.shape} — build G/D with the snapshot's shapes"
                )
                return jnp.asarray(t, o.dtype)

            return jax.tree.map(leaf, ours, theirs)

        state = state._replace(
            g_params=_take(state.g_params, snap["g_params"], "G"),
            g_ema=_take(state.g_ema, snap["g_ema"], "G_ema"),
        )
        if snap["d_params"] is not None:
            state = state._replace(
                d_params=_take(state.d_params, snap["d_params"], "D"))
        print(f"resumed G/D/G_ema params from reference pickle {path}")
        return state
    from ..train import checkpoint

    state = checkpoint.restore(path, state)
    print(f"resumed train state from {path} (step {int(state.step)})")
    return state


def main(argv=None):
    args = build_argparser().parse_args(argv)
    if args.force_cpu:
        jax.config.update("jax_platforms", "cpu")

    from ..models.discriminator import Discriminator
    from ..models.triplane import TriPlaneGenerator
    from ..train import checkpoint
    from ..train.augment import AugmentConfig, ada_update, augment_pipe
    from ..train.gan import GANLossConfig, init_gan_state, make_gan_train_step
    from ..utils.stats import Collector

    os.makedirs(args.outdir, exist_ok=True)

    if args.smoke:
        G = TriPlaneGenerator(
            z_dim=32, c_dim=25, w_dim=32, img_resolution=32, variant=args.variant,
            without_sr=True, channel_base=512, channel_max=32,
            rendering_kwargs=(
                ("triplane_size", 16), ("depth_resolution", 4),
                ("depth_resolution_importance", 4),
            ),
        )
        D = Discriminator(
            c_dim=25, img_resolution=16, img_channels=3,
            mode="mask_dual" if args.variant == "panohead" else "dual",
            channel_base=256, channel_max=32, num_fp16_res=0, conv_clamp=None,
            seg_resolution=8, mbstd_group_size=2,
        )
        nrr = 16
    else:
        G = TriPlaneGenerator(
            z_dim=512, c_dim=25, w_dim=512, img_resolution=args.img_resolution,
            variant=args.variant,
            num_fp16_res=args.num_fp16_res, sr_num_fp16_res=args.num_fp16_res,
        )
        D = Discriminator(
            c_dim=25, img_resolution=args.img_resolution, img_channels=3,
            mode="mask_dual" if args.variant == "panohead" else "dual",
            num_fp16_res=args.num_fp16_res,
        )
        nrr = args.neural_rendering_resolution_initial

    cfg = GANLossConfig(
        r1_gamma=args.gamma,
        trans_reg=args.trans_reg if args.variant == "panohead" else 0.0,
        density_reg=args.density_reg,
        gpc_reg_prob=args.gpc_reg_prob if args.gen_pose_cond else None,
        g_lr=args.glr, d_lr=args.dlr, batch_size=args.batch,
        neural_rendering_resolution_initial=nrr,
        neural_rendering_resolution_final=(
            None if args.smoke else args.neural_rendering_resolution_final),
        neural_rendering_resolution_fade_kimg=(
            args.neural_rendering_resolution_fade_kimg),
    )

    augment_fn = None
    ada_p = jnp.asarray(args.ada_p)
    if args.aug != "noaug":
        acfg = AugmentConfig()

        def augment_fn(key, img):  # noqa: F811
            out = dict(img)
            out["image"] = augment_pipe(key, img["image"], ada_p, acfg)
            return out

    state = init_gan_state(jax.random.PRNGKey(args.seed), G, D, cfg)
    if args.resume:
        state = _resume(args.resume, state)
    step_fn, _ = make_gan_train_step(G, D, cfg, augment_fn=augment_fn)
    step_fn = jax.jit(step_fn, donate_argnums=(0,))

    # -- data --------------------------------------------------------------------
    if args.data:
        from ..data import ImageFolderDataset, InfiniteSampler, MaskLabeledDataset
        from ..data.dataset import batch_iterator

        if args.seg_data:
            ds = MaskLabeledDataset(args.data, args.seg_data,
                                    resolution=G.img_resolution, xflip=True)
        else:
            ds = ImageFolderDataset(args.data, resolution=G.img_resolution, xflip=True)
        batches = batch_iterator(ds, args.batch, InfiniteSampler(len(ds), seed=args.seed))
    else:
        assert args.smoke, "--data required unless --smoke"

        def _fake():
            rng = np.random.RandomState(0)
            r = D.img_resolution
            while True:
                img = rng.rand(args.batch, 3, r, r) * 2 - 1
                seg = rng.rand(args.batch, 1, r, r)
                lab = rng.randn(args.batch, 25) * 0.1
                yield img.astype(np.float32), seg.astype(np.float32), lab.astype(np.float32)

        batches = _fake()

    stats = Collector(os.path.join(args.outdir, "stats.jsonl"))
    key = jax.random.PRNGKey(args.seed + 1)
    total_steps = max(int(args.kimg * 1000 / args.batch), 1)
    nrr_img = cfg.neural_rendering_resolution_initial

    # fixed-grid fake snapshots (ref training_loop.py:363-400: fakes_init
    # + fakes{kimg}.png) rendered from the EMA generator
    grid_n = 4
    grid_z = jax.random.normal(jax.random.PRNGKey(args.seed + 7),
                               (grid_n, G.z_dim))
    grid_c = jnp.tile(
        jnp.asarray(np.eye(4, dtype=np.float32).reshape(-1).tolist()
                    + [4.2647, 0, 0.5, 0, 4.2647, 0.5, 0, 0, 1])[None],
        (grid_n, 1))

    def save_fakes(tag, g_ema_params):
        try:
            from PIL import Image
        except ImportError:
            return
        outs = []
        for j in range(grid_n):
            o = G.synthesis(g_ema_params, G.mapping(
                g_ema_params, grid_z[j:j + 1], grid_c[j:j + 1]),
                grid_c[j:j + 1],
                neural_rendering_resolution=nrr_img)
            im = o["image"] if "image" in o else o["image_raw"]
            outs.append(np.asarray(im[0]))
        grid = np.concatenate(outs, axis=2)      # side by side
        arr = np.clip((grid.transpose(1, 2, 0) + 1) * 127.5, 0, 255
                      ).astype(np.uint8)
        Image.fromarray(arr).save(os.path.join(args.outdir, f"fakes_{tag}.png"))

    save_fakes("init", state.g_ema)

    for i in range(total_steps):
        batch = next(batches)
        if len(batch) == 3:
            img, seg, lab = batch
        else:
            img, lab = batch
            seg = np.ones((img.shape[0], 1) + img.shape[2:], np.float32)
        from ..models.discriminator import filtered_resizing

        real = {
            "image": jnp.asarray(img),
            "image_raw": filtered_resizing(jnp.asarray(img), nrr_img),
            "image_mask": filtered_resizing(jnp.asarray(seg), nrr_img),
        }
        key, kz, ks = jax.random.split(key, 3)
        z = jax.random.normal(kz, (img.shape[0], G.z_dim))
        c = jnp.asarray(lab)
        state, metrics = step_fn(state, ks, z, c, real, c)
        stats.report({k: float(v) for k, v in metrics.items()})
        if args.aug == "ada" and i % 4 == 0:
            rt = np.sign(stats.mean("Loss/scores/real"))
            ada_p = ada_update(ada_p, jnp.asarray(rt), args.batch)

        if i % 50 == 0:
            row = stats.flush(i)
            print(f"[{i}/{total_steps}] " + " ".join(
                f"{k.split('/')[-1]}={v:.3f}" for k, v in row.items()
                if k.startswith("Loss/")
            ))
        if args.snap > 0 and i > 0 and i % (args.snap * 100) == 0:
            checkpoint.save(os.path.join(args.outdir, f"snapshot_{i:06d}"), state,
                            configs={"G": G, "D": D, "loss_cfg": cfg})
            save_fakes(f"{i:06d}", state.g_ema)

    checkpoint.save(os.path.join(args.outdir, "snapshot_final"), state,
                    configs={"G": G, "D": D, "loss_cfg": cfg})
    save_fakes("final", state.g_ema)
    print("done; final snapshot written")


if __name__ == "__main__":
    main()
