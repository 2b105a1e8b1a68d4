"""Training-throughput bench: grad of image loss through the rasterizer at
flagship scale (500k gaussians, 512^2), XLA scan blend vs the custom-VJP
Pallas blend (BASELINE config #4's hot half)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp

from gaussian_gan_decoder_tpu.flagship import default_camera_params
from gaussian_gan_decoder_tpu.gaussians.cameras import make_camera
from gaussian_gan_decoder_tpu.splat.rasterize import RasterizeConfig, render_simple

ITERS = int(os.environ.get("BT_ITERS", 5))

def main():
    cp, c2w = default_camera_params()
    cam = make_camera(512, jnp.asarray(0.227), c2w)
    N = 500_000
    k = jax.random.PRNGKey(0)
    decoded = dict(
        xyz=(jax.random.uniform(k, (N, 3)) - 0.5) * 0.4,
        scale=-jax.nn.softplus(jax.random.normal(jax.random.fold_in(k, 1), (N, 3)) + 5.0) - 2.5,
        rotation=jax.random.normal(jax.random.fold_in(k, 2), (N, 4)),
        opacity=jax.random.normal(jax.random.fold_in(k, 3), (N, 1)),
        color=jax.random.normal(jax.random.fold_in(k, 4), (N, 3)) * 0.3,
    )
    cfg = RasterizeConfig(tile_size=16, max_pairs=2 ** 21, tile_capacity=1024,
                          chunk=64, static_copies=2, overflow_budget=2 ** 16)
    bg = jnp.asarray([0.55717, 0.52256, 0.51045])
    tgt = jax.random.uniform(jax.random.fold_in(k, 9), (3, 512, 512))

    for backend in os.environ.get("BT_BACKENDS", "pallas_diff,xla").split(","):
        def stream(decoded, tgt, backend=backend):
            def loss(d):
                out = render_simple(cam, d, bg=bg, config=cfg, backend=backend)
                return jnp.sum((out["render"] - tgt) ** 2)
            def body(i, acc):
                g = jax.grad(loss)({kk: v + acc * 0 for kk, v in decoded.items()})
                return acc + g["xyz"][0, 0]
            return jax.lax.fori_loop(0, ITERS, body, 0.0)
        f = jax.jit(stream)
        float(f(decoded, tgt)); t0 = time.perf_counter(); float(f(decoded, tgt))
        dt = (time.perf_counter() - t0) / ITERS * 1e3
        print(f"{backend:12s}: {dt:8.2f} ms / fwd+bwd", flush=True)

if __name__ == "__main__":
    main()
