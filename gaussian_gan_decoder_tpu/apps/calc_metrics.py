"""GAN / decoder metric CLI.

Re-design of /root/reference/eg3d/calc_metrics.py (:99-100 --use_decoder)
+ run_metric_pipeline.py batching: compute fid/kid/pr/is over a dataset
vs either a ported GAN or a decoder snapshot.
"""
from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--metrics", default="fid50k_full", help="comma list")
    p.add_argument("--data", required=True, help="real image zip/dir with labels")
    p.add_argument("--network_pkl", default="", help="ported GAN")
    p.add_argument("--checkpoint", default="", help="decoder snapshot (decoder-FID)")
    p.add_argument("--num_items", type=int, default=50_000)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--vgg_weights", default="", help="fallback embedder weights")
    p.add_argument("--inception", default="",
                   help="InceptionV3 state dict (.pth, pytorch-fid naming) — "
                        "makes fid/kid/pr comparable to published numbers "
                        "and enables is50k")
    p.add_argument("--force_cpu", action="store_true")
    args = p.parse_args(argv)
    if args.force_cpu:
        jax.config.update("jax_platforms", "cpu")

    from ..data import ImageFolderDataset, InfiniteSampler
    from ..losses import VGG16LPIPS
    from ..metrics.metric_main import (
        calc_metric, decoder_image_batches, generator_image_batches,
    )

    ds = ImageFolderDataset(args.data, use_labels=True)
    sampler = iter(InfiniteSampler(len(ds), seed=0))

    def real_batches():
        while True:
            imgs = np.stack([ds[next(sampler)][0] for _ in range(args.batch)])
            yield imgs.astype(np.float32)

    def c_source():
        while True:
            labs = np.stack([ds.get_label(next(sampler)) for _ in range(args.batch)])
            yield labs.astype(np.float32)

    logits_fn = None
    if args.inception:
        # the role the reference's torchscript Inception plays for every
        # metric (eg3d/metrics/metric_utils.py get_feature_detector)
        from ..metrics.inception import load_inception

        inet, iparams = load_inception(args.inception)
        feat = jax.jit(lambda x: inet.features(iparams, jnp.asarray(x, jnp.float32)))
        logits_fn = jax.jit(
            lambda x: inet.logits(iparams, jnp.asarray(x, jnp.float32))
        )
    else:
        vgg = VGG16LPIPS()
        vgg_params = (
            vgg.load_torch_state_dict(dict(np.load(args.vgg_weights)))
            if args.vgg_weights else vgg.init(jax.random.PRNGKey(7))
        )
        if not args.vgg_weights:
            print("WARNING: random-weight embedder — metric values are only "
                  "comparable across runs of THIS framework with the same seed")

        from ..losses.image import area_downsample

        @jax.jit
        def feat(x):
            x = jnp.asarray(x, jnp.float32)
            if x.shape[-1] > 256 and x.shape[-1] % 256 == 0:
                x = area_downsample(x, 256)
            return vgg.pooled_features(vgg_params, x)

    if args.checkpoint:
        from ..decoder.snapshot import load_decoder

        decoder, params, configs = load_decoder(args.checkpoint)
        gen_batches = decoder_image_batches(
            decoder, params, configs.get("frozen_G_params", params["G"]),
            configs.get("target_cfg"), jax.random.PRNGKey(1), c_source(),
        )
    else:
        from ..port import load_generator_pkl

        gen, gp = load_generator_pkl(args.network_pkl)
        gen_batches = generator_image_batches(
            gen, gp, jax.random.PRNGKey(1), args.batch, c_source()
        )

    out = {}
    for m in args.metrics.split(","):
        kwargs = {}
        if m == "ppl2_wend":
            # PPL needs direct mapping/synthesis access (GAN path only)
            assert not args.checkpoint, "ppl2_wend runs on a GAN, not a decoder"

            def mapping_fn(key, z, c):
                return gen.mapping(gp, z, c)

            def synthesis_fn(ws, c):
                # both PPL endpoints render under this SAME conditioning c
                # (ref perceptual_path_length.py renders the pair in one
                # batched synthesis call)
                return gen.synthesis(gp, ws, c)["image"]

            def dist_fn(a, b):
                # match the reference pipeline's feature input scale:
                # [-1,1] synthesis output -> [0,255] (feat() then area-
                # downsamples >256 inputs to 256 like the LPIPS path)
                fa = feat(jnp.clip((a + 1) * 127.5, 0, 255))
                fb = feat(jnp.clip((b + 1) * 127.5, 0, 255))
                return jnp.sum((fa - fb) ** 2, axis=-1)

            kwargs = dict(mapping_fn=mapping_fn, synthesis_fn=synthesis_fn,
                          dist_fn=dist_fn, c_source=c_source(),
                          num_samples=args.num_items, batch_size=args.batch,
                          z_dim=gen.z_dim, c_dim=gen.c_dim)
        r = calc_metric(m, real_batches=real_batches(), gen_batches=gen_batches,
                        feature_fn=feat, logits_fn=logits_fn,
                        num_items=args.num_items, **kwargs)
        out.update(r["results"])
        print(json.dumps(r))
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
