"""Dissect the fused heads+projection kernel cost inside the REAL frame.

Times the flagship frame truncated after the decoder kernel (same fori_loop
harness as profile_ablate.py — standalone stage jits mislead, PERFORMANCE.md
trap 11) across kernel variants: gelu flavor, block size, projection on/off,
compute dtype. Deltas vs the 'stagein' baseline (~19.5 ms r3) are the kernel
cost per variant.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from gaussian_gan_decoder_tpu.decoder.heads import _CHAINS
from gaussian_gan_decoder_tpu.decoder.pallas_heads import (
    decode_heads_pallas, decode_project_pallas)
from gaussian_gan_decoder_tpu.flagship import (
    default_camera_params, flagship_decoder, flagship_generator)
from gaussian_gan_decoder_tpu.gaussians.cameras import make_camera
from gaussian_gan_decoder_tpu.neuralfield.renderer import sample_from_planes

ITERS = int(os.environ.get("PROF_ITERS", 10))


def main():
    dec = flagship_decoder(gen=flagship_generator())
    params = dec.init(jax.random.PRNGKey(0),
                      generator_params=dec.generator.init(jax.random.PRNGKey(1)))
    cp, cam2world = default_camera_params()
    M = 500_000
    init_pos = (jax.random.uniform(jax.random.PRNGKey(2), (M, 3)) - 0.5) * 0.4
    cam = make_camera(512, jnp.asarray(0.227), cam2world)
    zs = jax.random.normal(jax.random.PRNGKey(3), (ITERS, 1, 512))
    g = dec.generator
    chain_spec = _CHAINS[dec.decoder_type]
    head_params = {name: params[name] for name, _ in chain_spec}

    def upto_staging(z):
        planes, _ = dec.synthesize_planes(params, z, cp, 1.0)
        feats = sample_from_planes(
            g.renderer.plane_axes, planes, init_pos[None],
            box_warp=g.rk["box_warp"], triplane_depth=g.triplane_depth,
            brick_dtype=dec._brick_dtype, pallas_build=True)[0]
        fm = jnp.mean(feats, axis=0).astype(jnp.float32)
        cond = dec.embedder(init_pos) if dec.use_xyz_embedding else init_pos
        return fm, cond

    def run(tag, frame):
        @jax.jit
        def stream(params_, zs_):
            def body(i, acc):
                return acc + frame(zs_[i])
            return jax.lax.fori_loop(0, ITERS, body, 0.0)

        float(stream(params, zs))
        t0 = time.perf_counter()
        float(stream(params, zs))
        dt = (time.perf_counter() - t0) / ITERS * 1e3
        print(f"{tag:45s}: {dt:7.2f} ms/frame", flush=True)

    # baseline: everything before the kernel
    def f_stagein(z):
        fm, cond = upto_staging(z)
        return jnp.sum(fm[::4097]) + jnp.sum(cond[::4097])
    run("stagein (pre-kernel baseline)", f_stagein)

    def proj_variant(gelu, block, cdtype, interleave=1):
        def f(z):
            fm, cond = upto_staging(z)
            rows, _ = decode_project_pallas(
                head_params, chain_spec, fm, cond, init_pos,
                dec.scale_offset, cam=cam, n_points=M,
                compute_dtype=cdtype, block=block, gelu=gelu,
                interleave=interleave)
            return jnp.sum(rows[:, :8])
        return f

    def heads_only_variant(gelu, block, cdtype):
        def f(z):
            fm, cond = upto_staging(z)
            out, _ = decode_heads_pallas(
                head_params, chain_spec, fm, cond, init_pos,
                dec.scale_offset, compute_dtype=cdtype, block=block,
                gelu=gelu, return_packed=True)
            return jnp.sum(out[::4097, :])
        return f

    bf16 = jnp.bfloat16
    variants = [
        ("proj gelu=poly block=1024 bf16 [prod]", proj_variant("poly", 1024, bf16)),
        ("proj poly block=2048 ilv=2", proj_variant("poly", 2048, bf16, 2)),
        ("proj poly block=4096 ilv=4", proj_variant("poly", 4096, bf16, 4)),
        ("proj poly block=4096 ilv=2", proj_variant("poly", 4096, bf16, 2)),
        ("proj poly block=8192 ilv=8", proj_variant("poly", 8192, bf16, 8)),
        ("proj none block=4096 ilv=4", proj_variant("none", 4096, bf16, 4)),
        ("proj tanh block=4096 ilv=4", proj_variant("tanh", 4096, bf16, 4)),
    ]
    if os.environ.get("HK_FULL"):
        variants += [
            ("proj gelu=none block=1024 bf16", proj_variant("none", 1024, bf16)),
            ("proj gelu=tanh block=1024 bf16", proj_variant("tanh", 1024, bf16)),
            ("heads-only gelu=poly block=1024 bf16", heads_only_variant("poly", 1024, bf16)),
            ("heads-only gelu=none block=1024 bf16", heads_only_variant("none", 1024, bf16)),
            ("proj gelu=poly block=512 bf16", proj_variant("poly", 512, bf16)),
            ("proj gelu=poly block=2048 bf16", proj_variant("poly", 2048, bf16)),
            ("proj gelu=poly block=4096 bf16", proj_variant("poly", 4096, bf16)),
            ("proj gelu=poly block=1024 f32", proj_variant("poly", 1024, jnp.float32)),
        ]
    for tag, f in variants:
        try:
            run(tag, f)
        except Exception as e:  # noqa: BLE001
            print(f"{tag:45s}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
