"""Microbench: (a) full-consumption gather cost (rows[:,0] kills any
gather-narrowing DCE that rows[0] might allow), (b) ONE vmap'd/batched
gather over a (3, R, 256) table vs THREE unrolled plain takes — the
pipeline's tri-plane sampling uses the former and pays ~13 ns/row vs the
plain-take ~9.4."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
import numpy as np

ITERS = 20
M = 500_000
R = 262144  # 134 MB bf16 per plane

def timed(name, fn, *args):
    f = jax.jit(fn)
    float(f(*args)); t0 = time.perf_counter(); float(f(*args))
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{name:40s} {dt:7.2f} ms  ({dt*1e6/(3*M):5.2f} ns/row over 3M)", flush=True)

def main():
    rng = np.random.default_rng(0)
    t3 = jax.random.normal(jax.random.PRNGKey(0), (3, R, 256)).astype(jnp.bfloat16)
    idx3 = jnp.asarray(rng.integers(0, R, (3, M)), jnp.int32)

    def vmapped(t3, idx3):
        def body(i, acc):
            rows = jax.vmap(lambda t, ix: jnp.take(t, (ix + i) % R, axis=0))(t3, idx3)
            return acc + jnp.sum(rows[:, :, 0].astype(jnp.float32))
        return jax.lax.fori_loop(0, ITERS, body, 0.0)

    def unrolled(t3, idx3):
        def body(i, acc):
            for p in range(3):
                rows = jnp.take(t3[p], (idx3[p] + i) % R, axis=0)
                acc = acc + jnp.sum(rows[:, 0].astype(jnp.float32))
            return acc
        return jax.lax.fori_loop(0, ITERS, body, 0.0)

    def unrolled_weak(t3, idx3):
        def body(i, acc):
            for p in range(3):
                rows = jnp.take(t3[p], (idx3[p] + i) % R, axis=0)
                acc = acc + jnp.sum(rows[0].astype(jnp.float32))
            return acc
        return jax.lax.fori_loop(0, ITERS, body, 0.0)

    timed("vmap batched gather (3, M)", vmapped, t3, idx3)
    timed("3 unrolled takes, full consume", unrolled, t3, idx3)
    timed("3 unrolled takes, rows[0] consume", unrolled_weak, t3, idx3)

if __name__ == "__main__":
    main()
