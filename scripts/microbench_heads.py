"""Microbench: fused heads-chain kernel time vs point-block size.

The chain is 20 dependent (BLK,128)@(128,128) matmuls per block; at
BLK=1024 the measured 10.7 ms/frame matches single-MXU throughput
(~31 bf16 TFLOP/s). Larger blocks give Mosaic more independent M-tiles
per dot to spread across the 4 MXUs."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from gaussian_gan_decoder_tpu.decoder.heads import _CHAINS, GaussianDecoder
from gaussian_gan_decoder_tpu.decoder.pallas_heads import decode_heads_pallas

ITERS = 20
M = 500_000

def main():
    chain = _CHAINS["sequential_reversed"]
    key = jax.random.PRNGKey(0)
    hp = {}
    for name, out_dim in chain:
        k = jax.random.fold_in(key, hash(name) % 997)
        dims = [(32 + 3 + sum(d for n, d in chain[:i] if True), 128) for i in range(1)]
        hp[name] = {}
        n_in = 32 + 3 + sum(d for n, d in chain[:[n for n, _ in chain].index(name)])
        shapes = [(128, n_in), (128, 128), (128, 128), (out_dim, 128)]
        for li, shp in enumerate(shapes):
            hp[name][f"fc{li}"] = {
                "weight": jax.random.normal(jax.random.fold_in(k, li), shp) * 0.05,
                "bias": jnp.zeros((shp[0],)),
            }
    feats = jax.random.normal(jax.random.fold_in(key, 1), (M, 32))
    pos = (jax.random.uniform(jax.random.fold_in(key, 2), (M, 3)) - 0.5) * 0.4

    for block, gelu in ((1024, "exact"), (1024, "poly"), (1024, "none")):
        def run(feats, pos, block=block, gelu=gelu):
            def body(i, acc):
                out, _ = decode_heads_pallas(
                    hp, chain, feats + i * 0.0, pos, pos, -2.5,
                    compute_dtype=jnp.bfloat16, block=block, return_packed=True,
                    gelu=gelu)
                return acc + jnp.sum(out[:8])
            return jax.lax.fori_loop(0, ITERS, body, 0.0)
        f = jax.jit(run)
        float(f(feats, pos)); t0 = time.perf_counter(); float(f(feats, pos))
        dt = (time.perf_counter() - t0) / ITERS * 1e3
        print(f"block {block:5d} gelu={gelu:5s}: {dt:6.2f} ms", flush=True)

if __name__ == "__main__":
    main()
