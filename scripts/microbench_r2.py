"""Round-2 microbenches: gather row width/dtype rates, sort operand
count, single-key vs lexicographic sort, quantize-pass cost."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 20
M = 1_500_000        # flagship: 3 planes x 500k sample rows
ROWS = 786_432       # ~flagship brick-table rows per fused table


def timed(name, fn, *args):
    f = jax.jit(fn)
    float(f(*args))
    t0 = time.perf_counter()
    float(f(*args))
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{name:56s} {dt:7.2f} ms", flush=True)
    return dt


def gather_benches():
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, ROWS, M), jnp.int32)

    for name, width, dtype in (
        ("gather 256ch bf16 (512B rows)", 256, jnp.bfloat16),
        ("gather 256ch int8 (256B rows)", 256, jnp.int8),
        ("gather 64ch int32 (256B rows, 4x int8 packed)", 64, jnp.int32),
        ("gather 128ch bf16 (256B rows)", 128, jnp.bfloat16),
    ):
        if dtype == jnp.int8:
            table = jax.random.randint(
                jax.random.PRNGKey(0), (ROWS, width), -127, 127, jnp.int8)
        elif dtype == jnp.int32:
            table = jax.random.randint(
                jax.random.PRNGKey(0), (ROWS, width), -2**30, 2**30, jnp.int32)
        else:
            table = jax.random.normal(
                jax.random.PRNGKey(0), (ROWS, width)).astype(dtype)

        def stage(table, idx):
            def body(i, acc):
                r = jnp.take(table, (idx + i) % ROWS, axis=0)
                return acc + jnp.sum(r[0].astype(jnp.float32))
            return jax.lax.fori_loop(0, ITERS, body, 0.0)

        timed(name, stage, table, idx)

    # gather + full unpack-dequant consume (the real int8 sampling cost):
    # unpack 4x int8 from int32 lanes, dequant by per-channel scale, reduce
    packed = jax.random.randint(
        jax.random.PRNGKey(0), (ROWS, 64), -2**30, 2**30, jnp.int32)
    scales = jax.random.uniform(jax.random.PRNGKey(1), (256,), jnp.float32)

    def stage_unpack(table, idx, scales):
        def body(i, acc):
            r = jnp.take(table, (idx + i) % ROWS, axis=0)   # (M, 64) int32
            parts = []
            for s in range(4):
                v = ((r >> (8 * s)) & 0xFF).astype(jnp.int8).astype(jnp.float32)
                parts.append(v - 128.0)
            f = jnp.stack(parts, axis=-1).reshape(M, 256) * scales[None, :]
            return acc + jnp.sum(f[::4097])
        return jax.lax.fori_loop(0, ITERS, body, 0.0)

    timed("gather int32-packed + unpack-dequant consume", stage_unpack,
          packed, idx, scales)

    # plain int8 gather + dequant consume
    t8 = jax.random.randint(jax.random.PRNGKey(0), (ROWS, 256), -127, 127,
                            jnp.int8)

    def stage_i8(table, idx, scales):
        def body(i, acc):
            r = jnp.take(table, (idx + i) % ROWS, axis=0)
            f = r.astype(jnp.float32) * scales[None, :]
            return acc + jnp.sum(f[::4097])
        return jax.lax.fori_loop(0, ITERS, body, 0.0)

    timed("gather int8 + dequant consume", stage_i8, t8, idx, scales)


def quantize_bench():
    # cost of the out-of-kernel table quantize pass (202M bf16 -> int8)
    e = jax.random.normal(jax.random.PRNGKey(0), (3, 264_192, 256)).astype(
        jnp.bfloat16)
    inv = jax.random.uniform(jax.random.PRNGKey(1), (3, 256), jnp.float32)

    def stage(e, inv):
        def body(i, acc):
            q = e.astype(jnp.float32) * (inv[:, None, :] + i)
            qi = jnp.clip(jnp.round(q), -127, 127).astype(jnp.int8)
            return acc + jnp.sum(qi[:, ::8191, ::129].astype(jnp.float32))
        return jax.lax.fori_loop(0, ITERS, body, 0.0)

    timed("table quantize pass bf16->int8 (202M elements)", stage, e, inv)


def sort_benches():
    P = 1_130_496    # 2x500k + 2^17
    k = jax.random.PRNGKey(0)
    tile = jax.random.randint(k, (P,), 0, 1025, jnp.int32)
    qd = jax.random.randint(jax.random.fold_in(k, 1), (P,), 0, 2**30, jnp.int32)
    fields = [jax.random.normal(jax.random.fold_in(k, 10 + j), (P,), jnp.float32)
              for j in range(9)]

    def sort_n(n_payload):
        def stage(tile, qd, *fs):
            def body(i, acc):
                ops = jax.lax.sort([tile + i, qd] + list(fs[:n_payload]),
                                   num_keys=2)
                return acc + jnp.sum(ops[0][::4097]) + sum(
                    jnp.sum(o[::4097]) for o in ops[2:])
            return jax.lax.fori_loop(0, ITERS, body, 0.0)
        return stage

    for n in (9, 7, 5):
        timed(f"lexsort 2 keys + {n} payloads ({P} rows)", sort_n(n),
              tile, qd, *fields)

    # single fused key: tile(11 bits) << 21 | depth >> 11
    fused = (tile << 21) | (qd >> 11)

    def stage_single(fkey, *fs):
        def body(i, acc):
            ops = jax.lax.sort([fkey + i] + list(fs[:5]), num_keys=1)
            return acc + jnp.sum(ops[0][::4097]) + sum(
                jnp.sum(o[::4097]) for o in ops[1:])
        return jax.lax.fori_loop(0, ITERS, body, 0.0)

    timed("single fused key + 5 payloads", stage_single, fused, *fields)

    # row count scaling: same ops at 865k rows
    P2 = 865_000
    t2 = tile[:P2]
    q2 = qd[:P2]
    f2 = [f[:P2] for f in fields]

    def stage2(tile, qd, *fs):
        def body(i, acc):
            ops = jax.lax.sort([tile + i, qd] + list(fs[:7]), num_keys=2)
            return acc + jnp.sum(ops[0][::4097]) + sum(
                jnp.sum(o[::4097]) for o in ops[2:])
        return jax.lax.fori_loop(0, ITERS, body, 0.0)

    timed(f"lexsort 2 keys + 7 payloads ({P2} rows)", stage2, t2, q2, *f2)


if __name__ == "__main__":
    which = os.environ.get("BENCH", "gather,quant,sort").split(",")
    if "gather" in which:
        gather_benches()
    if "quant" in which:
        quantize_bench()
    if "sort" in which:
        sort_benches()
