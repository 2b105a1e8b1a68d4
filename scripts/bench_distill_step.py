"""End-to-end distillation TRAINING step on the real chip (BASELINE
config #4): frozen-G target render + 128^3 sigma grid + marching
tetrahedra surface + 500k-point decode + splat + L1/L2/LPIPS/DSSIM/Sobel
+ Adam, one jitted step. RASTER=xla|pallas_diff selects the blend."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp

from gaussian_gan_decoder_tpu.decoder.target_pipeline import TargetSamplerConfig
from gaussian_gan_decoder_tpu.flagship import flagship_generator
from gaussian_gan_decoder_tpu.decoder.heads import GaussianDecoder
from gaussian_gan_decoder_tpu.losses import VGG16LPIPS
from gaussian_gan_decoder_tpu.splat.rasterize import RasterizeConfig
from gaussian_gan_decoder_tpu.train.distill import (
    DistillConfig, TrainState, make_optimizer, make_train_step)

ITERS = int(os.environ.get("DS_ITERS", 3))

def main():
    gen = flagship_generator()
    dec = GaussianDecoder(generator=gen, decoder_type="sequential_reversed",
                          use_gen_finetune=True)
    gp = gen.init(jax.random.PRNGKey(1))
    params = dec.init(jax.random.PRNGKey(0), generator_params=gp)
    vgg = VGG16LPIPS()
    vggp = vgg.init(jax.random.PRNGKey(2))
    backend = os.environ.get("RASTER", "pallas_diff")
    cfg = DistillConfig(raster_backend=backend)
    tcfg = TargetSamplerConfig()
    rcfg = RasterizeConfig(tile_size=16, max_pairs=2 ** 21, tile_capacity=1024,
                           chunk=64, static_copies=2, overflow_budget=2 ** 16)
    step = make_train_step(dec, gp, vgg, vggp, None, None, cfg, tcfg, rcfg)
    tx = make_optimizer(dec, cfg)
    state = TrainState(params, tx.init(params), jnp.asarray(0))

    @jax.jit
    def run(state, key):
        def body(i, st):
            k = jax.random.fold_in(key, i)
            z = jax.random.normal(jax.random.fold_in(k, 1), (1, 512))
            st, m, _ = step(st, k, z, st.step)
            return st
        return jax.lax.fori_loop(0, ITERS, body, state)

    s1 = run(state, jax.random.PRNGKey(3))
    float(jnp.sum(s1.step))
    t0 = time.perf_counter()
    s2 = run(state, jax.random.PRNGKey(4))
    float(jnp.sum(s2.step))
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{backend:12s}: {dt:9.1f} ms / full train step "
          f"({1000.0/dt:.2f} steps/s)", flush=True)

if __name__ == "__main__":
    main()
