"""Microbenchmark: tri-grid corner-brick expansion build strategies.

The sampling stage measures ~38.5 ms; gathers of 256-elem rows cost only
~4.4 ns/row (~6.6 ms for 1.5M). This isolates the expansion build and the
full sample to find where the rest goes.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

ITERS = 10
B, C, D, H, W = 3, 32, 3, 256, 256


def timed(name, fn, *args):
    f = jax.jit(fn)
    float(f(*args))
    t0 = time.perf_counter()
    s = float(f(*args))
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{name:44s} {dt:7.2f} ms   ({s})")


def build_current(feats):
    fcl = jnp.transpose(feats, (0, 2, 3, 4, 1))
    fcl = jnp.pad(fcl, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    parts = []
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                parts.append(fcl[:, dz:dz + D + 1, dy:dy + H + 1, dx:dx + W + 1])
    e = jnp.concatenate(parts, axis=-1)
    return e.reshape(B, (D + 1) * (H + 1) * (W + 1), 8 * C)


def build_barrier(feats):
    fcl = jnp.transpose(feats, (0, 2, 3, 4, 1))
    fcl = jnp.pad(fcl, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    fcl = jax.lax.optimization_barrier(fcl)
    parts = []
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                parts.append(fcl[:, dz:dz + D + 1, dy:dy + H + 1, dx:dx + W + 1])
    e = jnp.concatenate(parts, axis=-1)
    return jax.lax.optimization_barrier(e.reshape(B, (D + 1) * (H + 1) * (W + 1), 8 * C))


def build_xy_then_z(feats):
    # expand x first (concat last-dim of 2 shifted copies), then y, then z —
    # each stage doubles channels; all concats on the minor axis
    fcl = jnp.transpose(feats, (0, 2, 3, 4, 1))
    fcl = jnp.pad(fcl, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    ex = jnp.concatenate([fcl[:, :, :, :-1], fcl[:, :, :, 1:]], axis=-1)      # (B,D+2,H+2,W+1,2C)
    exy = jnp.concatenate([ex[:, :, :-1], ex[:, :, 1:]], axis=-1)             # (B,D+2,H+1,W+1,4C)
    exyz = jnp.concatenate([exy[:, :-1], exy[:, 1:]], axis=-1)                # (B,D+1,H+1,W+1,8C)
    # reorder channel groups to (dz,dy,dx)-major like build_current? group
    # order differs but is a fixed permutation — fine for benching
    return exyz.reshape(B, (D + 1) * (H + 1) * (W + 1), 8 * C)


def run_gather(e, idx):
    def stage(e, idx):
        def body(i, acc):
            rows = jax.vmap(lambda ee, ii: jnp.take(ee, ii, axis=0))(e, (idx + i) % e.shape[1])
            return acc + jnp.sum(rows[0, 0].astype(jnp.float32))
        return jax.lax.fori_loop(0, ITERS, body, 0.0)
    timed("gather 3x500k from table", stage, e, idx)


def main():
    feats = jax.random.normal(jax.random.PRNGKey(0), (B, C, D, H, W), jnp.bfloat16)

    for name, fn in [("build_current", build_current),
                     ("build_barrier", build_barrier),
                     ("build_xy_then_z", build_xy_then_z)]:
        def stage(feats, fn=fn):
            def body(i, acc):
                e = fn(feats + jnp.bfloat16(1e-3 * 0))  # keep feats live
                return acc + jnp.sum(e[:, i, :1].astype(jnp.float32))
            return jax.lax.fori_loop(0, ITERS, body, 0.0)
        timed(name, stage, feats)

    e = jax.jit(build_current)(feats)
    idx = jax.random.randint(jax.random.PRNGKey(1), (3, 500_000), 0, e.shape[1])
    run_gather(e, idx)

    # build + gather together (what sample_from_planes does per frame)
    def full(feats, idx):
        def body(i, acc):
            e = build_xy_then_z(feats)
            rows = jax.vmap(lambda ee, ii: jnp.take(ee, ii, axis=0))(e, (idx + i) % e.shape[1])
            return acc + jnp.sum(rows[0, 0].astype(jnp.float32))
        return jax.lax.fori_loop(0, ITERS, body, 0.0)
    timed("build_xy_then_z + gather", full, feats, idx)


if __name__ == "__main__":
    main()
