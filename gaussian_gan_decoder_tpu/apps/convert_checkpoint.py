"""Convert reference .pkl checkpoints to native artifacts.

The reference keeps a pickle-refresh tool (resave_model.py: load a legacy
network pickle, re-dump it under the current class source) because its
checkpoint compatibility story is source-embedding pickles. Our native
formats are dataclass-config JSON + flat .npz params (train/checkpoint.py)
and orbax decoder snapshots (decoder/snapshot.py) — this converter is the
equivalent one-time migration:

  * GAN snapshot {'G','D','G_ema'} (PanoHead/eg3d training pickles,
    ref training_loop.py:430-444)  ->  <out>/{config.json, g_ema.npz,
    g.npz, d.npz}
  * decoder snapshot {'decoder', ...} (ref
    train_pano2gaussian_decoder.py:299-306)  ->  a native decoder snapshot
    dir (orbax + config JSON) loadable by decoder.snapshot.load_decoder
    and every media app (--checkpoint).

Usage:
  python -m gaussian_gan_decoder_tpu.apps.convert_checkpoint \
      --input snapshot.pkl --out ./native_ckpt [--kind auto]
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os


def build_argparser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True, help="reference .pkl")
    p.add_argument("--out", required=True, help="output dir")
    p.add_argument("--kind", default="auto", choices=["auto", "gan", "decoder"])
    p.add_argument("--force_cpu", action="store_true")
    return p


def _detect_kind(data) -> str:
    """Kind from the top-level snapshot keys of an already-loaded pickle
    (GAN generators themselves contain a 'decoder' SUBMODULE, so byte
    sniffing would misclassify — inspect the real dict)."""
    if isinstance(data, dict) and "decoder" in data:
        return "decoder"
    return "gan"


def convert_gan(path_or_data, out: str) -> dict:
    from ..port.torch_pickle import load_gan_snapshot_pkl
    from ..train import checkpoint

    snap = load_gan_snapshot_pkl(path_or_data)
    os.makedirs(out, exist_ok=True)
    configs = {"G": snap["G"]}
    if snap["D"] is not None:
        configs["D"] = snap["D"]
    with open(os.path.join(out, "config.json"), "w") as f:
        json.dump({k: checkpoint._config_to_json(v) for k, v in configs.items()},
                  f, indent=2)
    checkpoint.save_npz(os.path.join(out, "g_ema.npz"), snap["g_ema"])
    checkpoint.save_npz(os.path.join(out, "g.npz"), snap["g_params"])
    if snap["d_params"] is not None:
        checkpoint.save_npz(os.path.join(out, "d.npz"), snap["d_params"])
    return {"kind": "gan", "files": sorted(os.listdir(out))}


def load_native_gan(out: str):
    """(G config, g_ema params-tree) from a convert_gan output dir."""
    import jax.numpy as jnp

    from ..train import checkpoint

    with open(os.path.join(out, "config.json")) as f:
        configs = {k: checkpoint._config_from_json(v)
                   for k, v in json.load(f).items()}
    flat = checkpoint.load_npz(os.path.join(out, "g_ema.npz"))
    tree: dict = {}
    for key, arr in flat.items():
        node = tree
        parts = key.split("/")
        for q in parts[:-1]:
            node = node.setdefault(q, {})
        node[parts[-1]] = jnp.asarray(arr)
    return configs["G"], tree


def convert_decoder(path_or_data, out: str) -> dict:
    from ..decoder.snapshot import save_decoder
    from ..port.torch_pickle import load_decoder_pkl

    cfg, params = load_decoder_pkl(path_or_data)
    save_decoder(out, cfg, params)
    return {"kind": "decoder", "out": out}


def main(argv=None):
    args = build_argparser().parse_args(argv)
    if args.force_cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    from ..port.torch_pickle import load_reference_pickle

    data = load_reference_pickle(args.input)  # ONE unpickle, reused below
    kind = args.kind if args.kind != "auto" else _detect_kind(data)
    if kind == "gan":
        info = convert_gan(data, args.out)
    else:
        info = convert_decoder(data, args.out)
    print(json.dumps(info))


if __name__ == "__main__":
    main()
