"""Microbenchmark: where do the ~39 ms of bin_pairs_lexsort go?"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from gaussian_gan_decoder_tpu.splat.pallas_blend import ROW

ITERS = 10
N = 500_000
T = 1024
GRID = 32
COPIES = 2
OVER = 2 ** 18


def timed(name, fn, *args):
    f = jax.jit(fn)
    float(f(*args)); t0 = time.perf_counter(); s = float(f(*args))
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{name:46s} {dt:7.2f} ms")


def main():
    k = jax.random.PRNGKey(0)
    attrs = jax.random.normal(k, (N, 9), jnp.float32)
    x0 = jax.random.randint(jax.random.fold_in(k, 1), (N,), 0, GRID)
    y0 = jax.random.randint(jax.random.fold_in(k, 2), (N,), 0, GRID)
    rw = jax.random.randint(jax.random.fold_in(k, 3), (N,), 1, 3)
    rh = jax.random.randint(jax.random.fold_in(k, 4), (N,), 1, 2)
    depth = jax.random.uniform(jax.random.fold_in(k, 5), (N,), jnp.float32, 1.0, 4.0)
    vis = jax.random.uniform(jax.random.fold_in(k, 6), (N,)) > 0.2

    def static_part(attrs, x0, y0, rw, rh, depth, vis):
        def body(i, acc):
            area = rw * rh
            qd = jax.lax.bitcast_convert_type(depth + i, jnp.int32)
            tiles = []
            for kk in range(COPIES):
                cy = kk // jnp.maximum(rw, 1)
                cx = kk % jnp.maximum(rw, 1)
                tile_k = (y0 + cy) * GRID + (x0 + cx)
                tiles.append(jnp.where(vis & (kk < area), tile_k, T))
            tile_key = jnp.concatenate(tiles)
            qdd = jnp.tile(qd, (COPIES,))
            attrs_rep = jnp.tile(attrs, (COPIES, 1))
            return acc + jnp.sum(tile_key[:2]) + jnp.sum(attrs_rep[0]) + qdd[0]
        return jax.lax.fori_loop(0, ITERS, body, 0.0)
    timed("static copies (keys + tile attrs)", static_part, attrs, x0, y0, rw, rh, depth, vis)

    def overflow_part(attrs, x0, y0, rw, rh, depth, vis):
        def body(i, acc):
            area = rw * rh
            qd = jax.lax.bitcast_convert_type(depth + i, jnp.int32)
            counts = jnp.where(vis, jnp.maximum(area - COPIES, 0), 0)
            offs = jnp.cumsum(counts) - counts
            ids = jnp.repeat(jnp.arange(N, dtype=jnp.int32), counts, total_repeat_length=OVER)
            pos = jnp.arange(OVER, dtype=jnp.int32)
            lo = pos - offs[ids].astype(jnp.int32)
            cell = COPIES + lo
            rw_o = jnp.maximum(rw[ids], 1)
            tile_o = (y0[ids] + cell // rw_o) * GRID + (x0[ids] + cell % rw_o)
            qd_o = qd[ids]
            attrs_o = attrs[ids]
            return acc + jnp.sum(tile_o[:2]) + qd_o[0] + jnp.sum(attrs_o[0])
        return jax.lax.fori_loop(0, ITERS, body, 0.0)
    timed(f"overflow lane (repeat+gathers, {OVER})", overflow_part, attrs, x0, y0, rw, rh, depth, vis)

    P = COPIES * N + OVER
    tile_key = jax.random.randint(k, (P,), 0, T + 1)
    qd = jax.random.randint(jax.random.fold_in(k, 9), (P,), 0, 2 ** 30)
    attrs_rep = jax.random.normal(jax.random.fold_in(k, 8), (P, 9), jnp.float32)

    def sort_part(tile_key, qd, attrs_rep):
        def body(i, acc):
            ops = [tile_key + i, qd] + [attrs_rep[:, j] for j in range(9)]
            s = jax.lax.sort(ops, num_keys=2)
            return acc + s[0][0] + s[2][0]
        return jax.lax.fori_loop(0, ITERS, body, 0.0)
    timed("lexsort (2 keys + 9 payloads, 1.26M)", sort_part, tile_key, qd, attrs_rep)

    def post_part(tile_key, attrs_rep):
        def body(i, acc):
            st = jnp.sort(tile_key + i)
            sorted_attrs_t = jnp.concatenate(
                [attrs_rep.T, jnp.zeros((ROW - 9, P), jnp.float32)], axis=0)
            starts = jnp.searchsorted(st, jnp.arange(T + 1, dtype=jnp.int32)).astype(jnp.int32)
            slack = 1024 + 128
            out = jnp.concatenate([sorted_attrs_t, jnp.zeros((ROW, slack), jnp.float32)], axis=1)
            return acc + starts[0] + out[0, 0]
        return jax.lax.fori_loop(0, ITERS, body, 0.0)
    timed("post (T-transpose+searchsorted+pad)", post_part, tile_key, attrs_rep)


if __name__ == "__main__":
    main()
