"""Decoder evaluation CLI (ref main/eval.py run_eval, see train/eval.py)."""
from __future__ import annotations

import argparse
import json

import jax
import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--eval_steps", type=int, default=100)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--vgg_weights", default="")
    p.add_argument("--id_weights", default="")
    p.add_argument("--force_cpu", action="store_true")
    args = p.parse_args(argv)
    if args.force_cpu:
        jax.config.update("jax_platforms", "cpu")

    from ..decoder.snapshot import load_decoder
    from ..losses import IRSE50, VGG16LPIPS
    from ..train.distill import DistillConfig
    from ..train.eval import run_eval

    decoder, params, configs = load_decoder(args.checkpoint)
    tcfg = configs.get("target_cfg")
    cfg = configs.get("distill_cfg", DistillConfig())

    vgg = VGG16LPIPS()
    if args.vgg_weights:
        vgg_params = vgg.load_torch_state_dict(dict(np.load(args.vgg_weights)))
    else:
        vgg_params = vgg.init(jax.random.PRNGKey(7))
    irse = irse_params = None
    if args.id_weights:
        import torch

        irse = IRSE50()
        irse_params = irse.load_torch_state_dict(
            {k: v.numpy() for k, v in torch.load(args.id_weights, map_location="cpu").items()}
        )

    frozen = configs.get("frozen_G_params", params["G"])
    metrics = run_eval(
        jax.random.PRNGKey(args.seed), decoder, params, frozen,
        vgg, vgg_params, irse, irse_params,
        eval_steps=args.eval_steps, cfg=cfg, target_cfg=tcfg,
    )
    print(json.dumps(metrics, indent=2))


if __name__ == "__main__":
    main()
