"""Export GAN geometry: density grid -> .mrc volume + .ply mesh.

Covers the reference's shape-export surface (PanoHead/gen_samples.py
--shapes + shape_utils.py): sample the generator's density on a cube,
run (on-device) marching tetrahedra, write the volume and mesh.
"""
from __future__ import annotations

import argparse
import sys

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--network_pkl", default="", help="reference GAN .pkl to port")
    p.add_argument("--checkpoint", default="", help="decoder snapshot (uses its frozen G)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--truncation_psi", type=float, default=0.7)
    p.add_argument("--shape_res", type=int, default=128)
    p.add_argument("--level", type=float, default=10.0)
    p.add_argument("--out", default="shape")
    p.add_argument("--force_cpu", action="store_true")
    args = p.parse_args(argv)
    if args.force_cpu:
        jax.config.update("jax_platforms", "cpu")

    from ..decoder.surface import marching_tetrahedra_faces, sigma_grid
    from ..gaussians.shape_export import save_mesh_ply, save_mrc

    if args.network_pkl:
        from ..port import load_generator_pkl

        gen, gp = load_generator_pkl(args.network_pkl)
    else:
        assert args.checkpoint
        from ..decoder.snapshot import load_decoder

        decoder, params, configs = load_decoder(args.checkpoint)
        gen = decoder.generator
        gp = configs.get("frozen_G_params", params["G"])

    z = jax.random.normal(jax.random.PRNGKey(args.seed), (1, gen.z_dim))
    ws = gen.mapping(gp, z, jnp.zeros((1, gen.c_dim)), truncation_psi=args.truncation_psi)
    planes = gen.synthesis_planes(gp, ws, noise_mode="const")
    sig = sigma_grid(gen, gp, planes, shape_res=args.shape_res,
                     chunk=min(2 ** 18, args.shape_res ** 3))
    sig_np = np.asarray(sig)
    save_mrc(args.out + ".mrc", sig_np)
    print(f"wrote {args.out}.mrc  (sigma range {sig_np.min():.2f}..{sig_np.max():.2f})")

    verts, n_faces, n_dropped = marching_tetrahedra_faces(
        sig, level=args.level,
        face_capacity=min(2 ** 21, 12 * (args.shape_res - 1) ** 3),
    )
    if int(n_dropped):
        print(f"WARNING: cube_capacity bound — {int(n_dropped)} crossed "
              "cubes dropped (mesh is spatially truncated)", file=sys.stderr)
    save_mesh_ply(args.out + ".ply", np.asarray(verts), int(n_faces))
    print(f"wrote {args.out}.ply  ({int(n_faces)} faces)")


if __name__ == "__main__":
    main()
