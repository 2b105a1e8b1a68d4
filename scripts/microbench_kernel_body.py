"""Standalone timing of the fused heads(+projection) kernel BODY.

The frame ablate attributes ~12.4 ms to the decode stage; the dependent-dot
chain alone runs at 83 TFLOP/s (~3.1 ms of MXU) and poly GELU ~2.9 ms. This
bench times the real pallas_call on a PRE-MATERIALIZED staging array, so the
delta vs the in-frame number is the XLA-side staging/mean/concat cost that
the frame ablate folds into 'decode'.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from gaussian_gan_decoder_tpu.decoder.heads import _CHAINS
from gaussian_gan_decoder_tpu.decoder import pallas_heads as ph
from gaussian_gan_decoder_tpu.flagship import default_camera_params
from gaussian_gan_decoder_tpu.gaussians.cameras import make_camera

ITERS = int(os.environ.get("PROF_ITERS", 20))
M = 500_000


def main():
    chain_spec = _CHAINS["sequential_reversed"]
    key = jax.random.PRNGKey(0)
    hp = {}
    for name, d in chain_spec:
        ks = jax.random.split(key, 9)
        key = ks[0]
        hp[name] = {f"fc{i}": {
            "weight": jax.random.normal(ks[i + 1], (128 if i < 3 else d, 128)) * 0.05,
            "bias": jax.random.normal(ks[i + 5], (128 if i < 3 else d,)) * 0.05,
        } for i in range(4)}
    _, cam2world = default_camera_params()
    cam = make_camera(512, jnp.asarray(0.227), cam2world)

    P = 63  # embedded cond width (flagship use_xyz_embedding)
    fm = jax.random.normal(jax.random.PRNGKey(1), (M, 32))
    cond = jax.random.normal(jax.random.PRNGKey(2), (M, P))
    init = (jax.random.uniform(jax.random.PRNGKey(3), (M, 3)) - 0.5) * 0.4

    # pre-built staging: isolates the kernel from the XLA concat
    staging, Mpad = ph._build_staging(fm, cond, init, chain_spec, 1024,
                                      jnp.bfloat16)

    def run(tag, fn, *args):
        @jax.jit
        def stream(*a):
            def body(i, acc):
                return acc + fn(*a)
            return jax.lax.fori_loop(0, ITERS, body, 0.0)

        float(stream(*args))
        t0 = time.perf_counter()
        float(stream(*args))
        dt = (time.perf_counter() - t0) / ITERS * 1e3
        print(f"{tag:52s}: {dt:7.2f} ms", flush=True)

    bf16 = jnp.bfloat16

    def full(gelu, staging_arr):
        # replicate decode_project_pallas but with staging precomputed
        weights, chain, layout = ph._pack_chain(hp, chain_spec, P, False, bf16)
        wv = cam.world_view_transform.astype(jnp.float32)
        pj = cam.full_proj_transform.astype(jnp.float32)
        import functools

        import jax.numpy as _jnp
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        consts = _jnp.stack([
            _jnp.asarray(cam.tanfovx, _jnp.float32),
            _jnp.asarray(cam.tanfovy, _jnp.float32),
            _jnp.asarray(M, _jnp.float32),
            _jnp.asarray(0.28209479177387814, _jnp.float32),
        ]).reshape(1, 4)
        consts = _jnp.pad(consts, ((0, 0), (0, 4)))
        rows = pl.pallas_call(
            functools.partial(
                ph._heads_project_kernel,
                chain=tuple(chain), scale_offset=-2.5,
                compute_dtype=bf16, gelu=ph._GELUS[gelu],
                image_w=cam.image_width, image_h=cam.image_height,
                block=1024, layout=layout, interleave=1,
            ),
            grid=(Mpad // 1024,),
            in_specs=[pl.BlockSpec((1024, ph.STAGE), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)]
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 11,
            out_specs=pl.BlockSpec((ph.NROWS, 1024), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((ph.NROWS, Mpad), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((1024, ph.STAGE), bf16),
                pltpu.VMEM((1024, ph.OUT_W), jnp.float32),
            ],
        )(staging_arr, *weights, wv, pj, consts)
        return jnp.sum(rows[:, :8])

    run("kernel body only (poly, prebuilt staging)", lambda s: full("poly", s), staging)
    run("kernel body only (none, prebuilt staging)", lambda s: full("none", s), staging)

    def staging_then_kernel(fm_, cond_, init_):
        s, _ = ph._build_staging(fm_, cond_, init_, chain_spec, 1024, bf16)
        return full("poly", s)

    run("staging build + kernel (poly)", staging_then_kernel, fm, cond, init)

    def staging_only(fm_, cond_, init_):
        s, _ = ph._build_staging(fm_, cond_, init_, chain_spec, 1024, bf16)
        return jnp.sum(s[::4097, :].astype(jnp.float32))

    run("staging build only (sampled sum)", staging_only, fm, cond, init)


if __name__ == "__main__":
    main()
