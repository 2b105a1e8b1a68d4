"""Microbenchmark: gather ns/row vs TABLE SIZE at fixed 512B rows.

Decides whether splitting the 300+ MB brick table into per-plane (or
per-slab) subtables moves the tri-grid gather off the large-table floor
(~13 ns/row) toward the small-table rate (~4 ns/row)."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
import numpy as np

ITERS = 20
M = 500_000

def main():
    rng = np.random.default_rng(0)
    for rows in (65536, 131072, 262144, 409600, 786432):
        width = 256  # bf16 -> 512 B rows
        table = jax.random.normal(jax.random.PRNGKey(0), (rows, width)).astype(jnp.bfloat16)
        mb = rows * width * 2 / 1e6
        idx = jnp.asarray(rng.integers(0, rows, M), jnp.int32)

        def stage(table, idx, rows=rows):
            def body(i, acc):
                r = jnp.take(table, (idx + i) % rows, axis=0)
                return acc + jnp.sum(r[0].astype(jnp.float32))
            return jax.lax.fori_loop(0, ITERS, body, 0.0)

        f = jax.jit(stage)
        float(f(table, idx)); t0 = time.perf_counter(); float(f(table, idx))
        dt = (time.perf_counter() - t0) / ITERS * 1e3
        print(f"table {mb:7.1f} MB: {dt:6.2f} ms for {M} rows = {dt*1e6/M:5.2f} ns/row", flush=True)

if __name__ == "__main__":
    main()
