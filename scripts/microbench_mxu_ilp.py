"""Probe: does Mosaic overlap INDEPENDENT (1024,128)@(128,128) dots
(multi-MXU / pipelined issue), or serialize them like a dependent chain?
Decides whether software-pipelining the heads chain across point blocks
can beat its measured single-MXU throughput."""
import sys, os, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ITERS = 50
NDOT = 20
BLK = 1024

def make(kind):
    def kernel(x_ref, w_ref, o_ref):
        w = w_ref[:]
        if kind == "chain":
            a = x_ref[:]
            for _ in range(NDOT):
                a = jnp.dot(a, w, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
            o_ref[:] = a.astype(jnp.float32)
        else:  # independent: NDOT dots on disjoint row slices of x
            outs = []
            for k in range(NDOT):
                xk = x_ref[k * (BLK // NDOT):(k + 1) * (BLK // NDOT), :]
                # same FLOPs per dot as chain/NDOT? no — keep SAME total dots:
                outs.append(jnp.dot(x_ref[:], w * (1.0 + k),
                                    preferred_element_type=jnp.float32))
            acc = outs[0]
            for o in outs[1:]:
                acc = acc + o
            o_ref[:] = acc

    return pl.pallas_call(
        kernel,
        grid=(64,),
        in_specs=[pl.BlockSpec((BLK, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((BLK, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((64 * BLK, 128), jnp.float32),
    )

def main():
    x = jax.random.normal(jax.random.PRNGKey(0), (64 * BLK, 128)).astype(jnp.bfloat16)
    w = (jax.random.normal(jax.random.PRNGKey(1), (128, 128)) * 0.05).astype(jnp.bfloat16)
    for kind in ("chain", "indep"):
        call = make(kind)
        def run(x, w):
            def body(i, acc):
                return acc + jnp.sum(call(x, w)[:4, :4]) * 0 + acc * 0 + jnp.sum(call(x * (1 + 0 * i), w)[:2])
            return jax.lax.fori_loop(0, ITERS, body, 0.0)
        f = jax.jit(run)
        float(f(x, w)); t0 = time.perf_counter(); float(f(x, w))
        dt = (time.perf_counter() - t0) / ITERS * 1e3
        gf = 2 * 64 * BLK * 128 * 128 * NDOT * 2 / 1e9  # 2 calls per iter
        print(f"{kind:6s}: {dt:7.3f} ms  ({gf/dt:6.1f} TFLOP/s)", flush=True)

if __name__ == "__main__":
    main()
