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

def sub_ablate():
    """Isolate the backward cost: (a) blend custom-VJP only, (b) + binning
    sort VJP, (c) full projection+binning+blend (= main())."""
    import functools

    from gaussian_gan_decoder_tpu.splat.fast_raster import (
        bin_pairs_lexsort_ch, build_pairs_ch)
    from gaussian_gan_decoder_tpu.splat.pallas_blend import (
        CHUNK, pallas_blend_diff)
    from gaussian_gan_decoder_tpu.splat.projection import project_channels

    cp, c2w = default_camera_params()
    cam = make_camera(512, jnp.asarray(0.227), c2w)
    N = 500_000
    k = jax.random.PRNGKey(0)
    cfg = RasterizeConfig(tile_size=16, max_pairs=2 ** 21, tile_capacity=1024,
                          chunk=64, static_copies=2, overflow_budget=2 ** 16)
    ts, gx, gy = 16, 32, 32
    xyz = (jax.random.uniform(k, (N, 3)) - 0.5) * 0.4
    scale = jnp.exp(-jax.nn.softplus(jax.random.normal(jax.random.fold_in(k, 1), (N, 3)) + 5.0) - 2.5)
    rot = jax.random.normal(jax.random.fold_in(k, 2), (N, 4))
    opa = jax.nn.sigmoid(jax.random.normal(jax.random.fold_in(k, 3), (N,)))
    col = jnp.maximum(jax.random.normal(jax.random.fold_in(k, 4), (N, 3)) * 0.3 + 0.5, 0)

    def make_fields(xyz, rot, scale, opa, col):
        ch = project_channels(cam, xyz[:, 0], xyz[:, 1], xyz[:, 2],
                              (rot[:, 0], rot[:, 1], rot[:, 2], rot[:, 3]),
                              (scale[:, 0], scale[:, 1], scale[:, 2]))
        fields = [ch["px"], ch["py"], ch["conic_a"], ch["conic_b"],
                  ch["conic_c"], opa, col[:, 0], col[:, 1], col[:, 2]]
        return ch, fields

    ch0, fields0 = jax.jit(make_fields)(xyz, rot, scale, opa, col)
    ts_, attrs0, _ = jax.jit(functools.partial(
        bin_pairs_lexsort_ch, grid_x=gx, grid_y=gy, tile_size=ts,
        static_copies=2, overflow_budget=2 ** 16))(ch0, fields0)
    slack = cfg.tile_capacity + CHUNK
    attrs0 = jnp.concatenate([attrs0, jnp.zeros((16, slack))], axis=1)

    def time_grad(name, lossfn, *args):
        import time as _t
        def stream(*a):
            def body(i, acc):
                g = jax.grad(lossfn)(a[0] + acc * 0, *a[1:])
                return acc + jnp.sum(g[0, :8]) if g.ndim > 1 else acc + jnp.sum(g[:8])
            return jax.lax.fori_loop(0, ITERS, body, 0.0)
        f = jax.jit(stream)
        float(f(*args)); t0 = _t.perf_counter(); float(f(*args))
        dt = (_t.perf_counter() - t0) / ITERS * 1e3
        print(f"{name:28s}: {dt:8.2f} ms / fwd+bwd", flush=True)

    def loss_blend(attrs, ts_):
        acc, tr = pallas_blend_diff(ts_, attrs, gx, gy, ts, cfg.tile_capacity)
        return jnp.sum(acc) + jnp.sum(tr)
    time_grad("blend only", loss_blend, attrs0, ts_)

    def loss_bin(f0, ch):
        fields = [f0[i] for i in range(9)]
        tstarts, attrs, _ = bin_pairs_lexsort_ch(
            ch, fields, gx, gy, ts, 2, 2 ** 16)
        attrs = jnp.concatenate([attrs, jnp.zeros((16, slack))], axis=1)
        acc, tr = pallas_blend_diff(tstarts, attrs, gx, gy, ts, cfg.tile_capacity)
        return jnp.sum(acc) + jnp.sum(tr)
    f0 = jnp.stack(fields0)
    time_grad("bin + blend", loss_bin, f0, ch0)


if __name__ == "__main__":
    if os.environ.get("BT_SUB"):
        sub_ablate()
    else:
        main()
