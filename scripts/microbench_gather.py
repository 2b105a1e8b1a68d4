"""Microbenchmark: TPU gather row cost vs (row width, dtype, index locality).

Decides whether morton-sorting the decoder's point set (identity-static)
can speed the tri-grid brick gathers, and whether fp8/bf16 rows pay off.
All timing in-graph (fori_loop) to dodge the ~51 ms tunnel dispatch.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 20
M = 1_500_000          # gather rows per iteration (= 500k pts x 3 planes)
TABLE_ROWS = 66049     # 257*257 brick table


def timed(name, fn, *args):
    f = jax.jit(fn)
    float(f(*args))
    t0 = time.perf_counter()
    s = float(f(*args))
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    ns_row = dt * 1e6 / M
    print(f"{name:44s} {dt:7.2f} ms  {ns_row:6.2f} ns/row")


def run(width_bytes, dtype, idx, label):
    width = width_bytes // jnp.dtype(dtype).itemsize
    table = jax.random.normal(jax.random.PRNGKey(0), (TABLE_ROWS, width)).astype(dtype)

    def stage(table, idx):
        def body(i, acc):
            rows = jnp.take(table, (idx + i) % TABLE_ROWS, axis=0)
            return acc + jnp.sum(rows[0].astype(jnp.float32))

        return jax.lax.fori_loop(0, ITERS, body, 0.0)

    timed(f"{label} width={width_bytes}B dtype={jnp.dtype(dtype).name}", stage, table, idx)


def main():
    rng = np.random.default_rng(0)
    rand_idx = jnp.asarray(rng.integers(0, TABLE_ROWS, M), jnp.int32)
    sort_idx = jnp.sort(rand_idx)
    # clustered: simulate morton-local surface points — indices move in
    # small windows of 2048 rows
    base = np.repeat(rng.integers(0, TABLE_ROWS - 2048, M // 1024 + 1), 1024)[:M]
    clus_idx = jnp.asarray(base + rng.integers(0, 2048, M), jnp.int32)

    for width in (128, 256, 512, 1024):
        for dtype in (jnp.bfloat16,):
            run(width, dtype, rand_idx, "random ")
            run(width, dtype, sort_idx, "sorted ")
            run(width, dtype, clus_idx, "cluster")
    run(512, jnp.float32, rand_idx, "random ")
    run(512, jnp.float32, sort_idx, "sorted ")

    # int8 rows (fp8-style width)
    table8 = jax.random.normal(jax.random.PRNGKey(0), (TABLE_ROWS, 256))
    t8 = (table8 * 10).astype(jnp.int8)

    def stage8(t8, idx):
        def body(i, acc):
            rows = jnp.take(t8, (idx + i) % TABLE_ROWS, axis=0)
            return acc + jnp.sum(rows[0].astype(jnp.float32))
        return jax.lax.fori_loop(0, ITERS, body, 0.0)

    timed("random  width=256B dtype=int8", stage8, t8, rand_idx)


if __name__ == "__main__":
    main()
