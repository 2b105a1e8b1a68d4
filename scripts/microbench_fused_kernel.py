"""Isolated timing of the gather-FUSED heads+projection kernel.

The r3 frame ablate measured the fused decode stage at ~20 ms vs ~17.5 ms
for the unfused chain — this bench separates the three suspects on
PREBUILT inputs: (a) the kernel body incl. the in-VMEM lerp (dots vs
bcast form), (b) the raw brick-row takes, (c) the channel-major weight /
aux staging build.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_gan_decoder_tpu.decoder import pallas_heads as ph
from gaussian_gan_decoder_tpu.decoder.heads import _CHAINS
from gaussian_gan_decoder_tpu.flagship import default_camera_params
from gaussian_gan_decoder_tpu.gaussians.cameras import make_camera

ITERS = int(os.environ.get("PROF_ITERS", 20))
M = 500_000
BLOCK = 1024
C, K = 32, 8


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

    Mpad = -(-M // BLOCK) * BLOCK
    init = (jax.random.uniform(jax.random.PRNGKey(3), (M, 3)) - 0.5) * 0.4
    rows = [jax.random.randint(jax.random.fold_in(key, p), (Mpad, K * C),
                               -127, 128, jnp.int8) for p in range(3)]
    wts = jax.random.uniform(jax.random.PRNGKey(5), (32, Mpad), jnp.float32)
    seg = np.zeros((K * C, C), np.float32)
    for c in range(K):
        seg[c * C:(c + 1) * C] = np.eye(C, dtype=np.float32)
    smats = jnp.asarray(seg)[None] * jnp.full((3, 1, 1), 0.01, jnp.float32)

    def run(tag, fn, *args):
        @jax.jit
        def stream(*a):
            def body(i, acc):
                return acc + fn(*a)
            return jax.lax.fori_loop(0, ITERS, body, 0.0)

        try:
            float(stream(*args))
        except Exception as e:  # noqa: BLE001
            print(f"{tag:52s}: FAILED {type(e).__name__}: {e}", flush=True)
            return
        t0 = time.perf_counter()
        float(stream(*args))
        dt = (time.perf_counter() - t0) / ITERS * 1e3
        print(f"{tag:52s}: {dt:7.2f} ms", flush=True)

    for mode in ("dots", "bcast"):
        def body(rows0, rows1, rows2, wts_, smats_, init_, mode=mode):
            out, _ = ph.decode_project_pallas_fused(
                hp, chain_spec, [rows0, rows1, rows2], wts_, smats_, K,
                init_, init_, -2.5, cam, M,
                compute_dtype=jnp.bfloat16, block=BLOCK,
                gelu="poly", lerp_mode=mode)
            return jnp.sum(out[:, :8])
        run(f"fused kernel, prebuilt inputs, lerp={mode}", body,
            *rows, wts, smats, init)

    # isolate the gather: same brick-row takes feeding a sum (fusible)
    # vs feeding the kernel (must materialise) — flagship-sized table
    NYT = 260
    table = jax.random.randint(jax.random.PRNGKey(8), (3, 4 * NYT * 257, K * C),
                               -127, 128, jnp.int8)
    idx = jax.random.randint(jax.random.PRNGKey(9), (3, Mpad), 0,
                             4 * NYT * 257, jnp.int32)

    def takes_sum(table_, idx_):
        return sum(jnp.sum(jnp.take(table_[p], idx_[p], axis=0)
                           .astype(jnp.float32)) for p in range(3))
    run("3x brick-row takes -> sum (fusible)", takes_sum, table, idx)

    def takes_kernel(table_, idx_, wts_, smats_, init_):
        r = [jnp.take(table_[p], idx_[p], axis=0) for p in range(3)]
        out, _ = ph.decode_project_pallas_fused(
            hp, chain_spec, r, wts_, smats_, K, init_, init_, -2.5, cam, M,
            compute_dtype=jnp.bfloat16, block=BLOCK, gelu="poly",
            lerp_mode="dots")
        return jnp.sum(out[:, :8])
    run("3x takes -> fused kernel (materialised)", takes_kernel,
        table, idx, wts, smats, init)

    # reference: unfused kernel on prebuilt staging (same harness)
    fm = jax.random.normal(jax.random.PRNGKey(7), (M, C), jnp.float32)

    def unfused(fm_, init_):
        out, _ = ph.decode_project_pallas(
            hp, chain_spec, fm_, init_, init_, -2.5, cam, M,
            compute_dtype=jnp.bfloat16, block=BLOCK, gelu="poly")
        return jnp.sum(out[:, :8])
    run("unfused kernel + staging build (fm prebuilt)", unfused, fm, init)


if __name__ == "__main__":
    main()
