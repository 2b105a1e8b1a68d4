"""End-to-end distillation TRAINING step on the real chip (BASELINE
config #4): frozen-G target render + 128^3 sigma grid + marching
tetrahedra surface + 500k-point decode + splat + L1/L2/LPIPS/DSSIM/Sobel
+ Adam, one jitted step. RASTER=xla|pallas_diff selects the blend."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp

# persistent compile cache, same rationale as bench.py: the tunnel compile
# helper costs tens of minutes per fresh train-step program — the round-3
# sweep rows died on exactly this (VERDICT r3 item 2). Entries key on HLO,
# so knob changes never read stale binaries. DS_NO_CACHE=1 disables.
if not os.environ.get("DS_NO_CACHE"):
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("DS_CACHE_DIR", "/root/.cache/ggd/jax_cache_distill"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from gaussian_gan_decoder_tpu.decoder.target_pipeline import TargetSamplerConfig
from gaussian_gan_decoder_tpu.flagship import flagship_generator
from gaussian_gan_decoder_tpu.decoder.heads import GaussianDecoder
from gaussian_gan_decoder_tpu.losses import VGG16LPIPS
from gaussian_gan_decoder_tpu.splat.rasterize import RasterizeConfig
from gaussian_gan_decoder_tpu.train.distill import (
    DistillConfig, TrainState, make_optimizer, make_train_step)

def _env_flag(name: str) -> bool:
    """'', '0', 'false' (any case) and unset are OFF — DS_X=0 must not
    silently enable X (bool("0") is True)."""
    return os.environ.get(name, "").strip().lower() not in ("", "0", "false", "no")


def _build_mode(name: str):
    """Pallas-build knobs additionally accept 'select' (channel-duplicated
    source kernel variant)."""
    v = os.environ.get(name, "").strip().lower()
    return "select" if v == "select" else v not in ("", "0", "false", "no")


ITERS = int(os.environ.get("DS_ITERS", 3))
SMOKE = _env_flag("DS_SMOKE")
if SMOKE:
    # smoke = plumbing validation; never claim the chip for it
    jax.config.update("jax_platforms", "cpu")


def _generator():
    """Flagship by default; DS_SMOKE=1 swaps in a tiny CPU-runnable config
    so the whole script's plumbing (all DS_* knob combinations) can be
    validated without the chip."""
    if SMOKE:
        from gaussian_gan_decoder_tpu.models.triplane import TriPlaneGenerator

        return TriPlaneGenerator(
            z_dim=32, c_dim=25, w_dim=32, img_resolution=64,
            variant="panohead", without_sr=True,
            channel_base=512, channel_max=32,
            rendering_kwargs=(("triplane_size", 16), ("depth_resolution", 4),
                              ("depth_resolution_importance", 4)),
        )
    return flagship_generator()



def main():
    gen = _generator()
    dec = GaussianDecoder(generator=gen, decoder_type="sequential_reversed",
                          use_gen_finetune=True,
                          pallas_heads_train=_env_flag("DS_PALLAS_HEADS"),
                          bf16_sampling=_env_flag("DS_BF16_SAMPLING"))
    gp = jax.jit(gen.init)(jax.random.PRNGKey(1))
    params = jax.jit(
        lambda g: dec.init(jax.random.PRNGKey(0), generator_params=g))(gp)
    vgg = VGG16LPIPS()
    vggp = jax.jit(vgg.init)(jax.random.PRNGKey(2))
    backend = os.environ.get("RASTER", "pallas_diff")
    cfg = DistillConfig(raster_backend=backend,
                        lpips_bf16=_env_flag("DS_BF16_LPIPS"),
                        **({"image_size": 64} if SMOKE else {}))
    tcfg = TargetSamplerConfig(
        bf16_probe=_env_flag("DS_BF16_PROBE"),
        int8_probe=_env_flag("DS_INT8_PROBE"),
        pallas_probe_build=_build_mode("DS_PALLAS_BUILD"),
        mt_two_stage=_env_flag("DS_MT2"),
        sigma_separable=_env_flag("DS_SIGMA_SEP"),
        **({"face_capacity": int(os.environ["DS_FACE_CAP"])}
           if os.environ.get("DS_FACE_CAP") else {}),
        **({"shape_res": 16, "num_points": 512, "sigma_chunk": 4096}
           if SMOKE else {}),
    )
    if SMOKE:
        rcfg = RasterizeConfig(tile_size=16, max_pairs=2 ** 12,
                               tile_capacity=64, chunk=32, static_copies=2,
                               overflow_budget=2 ** 10)
    else:
        rcfg = RasterizeConfig(tile_size=16, max_pairs=2 ** 21,
                               tile_capacity=1024, chunk=64, static_copies=2,
                               overflow_budget=2 ** 16)
    step = make_train_step(dec, gp, vgg, vggp, None, None, cfg, tcfg, rcfg)
    tx = make_optimizer(dec, cfg)
    state = TrainState(params, tx.init(params), jnp.asarray(0))

    @jax.jit
    def run(state, key):
        def body(i, st):
            k = jax.random.fold_in(key, i)
            z = jax.random.normal(jax.random.fold_in(k, 1), (1, gen.z_dim))
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

def stage_ablate():
    """Time the train step's pieces: target pipeline (no-grad), decode fwd,
    loss fwd, and the full step (the remainder = backward + Adam)."""
    from gaussian_gan_decoder_tpu.decoder.target_pipeline import sample_target
    from gaussian_gan_decoder_tpu.gaussians.cameras import make_camera
    from gaussian_gan_decoder_tpu.splat.rasterize import render_simple
    from gaussian_gan_decoder_tpu.losses import lpips_loss

    gen = _generator()
    # same decoder knobs as main() so the stage deltas describe the same
    # step the end-to-end timing measures
    dec = GaussianDecoder(generator=gen, decoder_type="sequential_reversed",
                          use_gen_finetune=True,
                          pallas_heads_train=_env_flag("DS_PALLAS_HEADS"),
                          bf16_sampling=_env_flag("DS_BF16_SAMPLING"))
    gp = jax.jit(gen.init)(jax.random.PRNGKey(1))
    params = jax.jit(
        lambda g: dec.init(jax.random.PRNGKey(0), generator_params=g))(gp)
    vgg = VGG16LPIPS()
    vggp = jax.jit(vgg.init)(jax.random.PRNGKey(2))
    tcfg = TargetSamplerConfig(
        bf16_probe=_env_flag("DS_BF16_PROBE"),
        int8_probe=_env_flag("DS_INT8_PROBE"),
        pallas_probe_build=_build_mode("DS_PALLAS_BUILD"),
        mt_two_stage=_env_flag("DS_MT2"),
        sigma_separable=_env_flag("DS_SIGMA_SEP"),
        **({"face_capacity": int(os.environ["DS_FACE_CAP"])}
           if os.environ.get("DS_FACE_CAP") else {}),
        **({"shape_res": 16, "num_points": 512, "sigma_chunk": 4096}
           if SMOKE else {}),
    )
    if SMOKE:
        rcfg = RasterizeConfig(tile_size=16, max_pairs=2 ** 12,
                               tile_capacity=64, chunk=32, static_copies=2,
                               overflow_budget=2 ** 10)
    else:
        rcfg = RasterizeConfig(tile_size=16, max_pairs=2 ** 21,
                               tile_capacity=1024, chunk=64, static_copies=2,
                               overflow_budget=2 ** 16)
    cfg = DistillConfig(raster_backend="pallas_diff",
                        **({"image_size": 64} if SMOKE else {}))

    def timed(name, fn):
        def stream(key):
            def body(i, acc):
                return acc + fn(jax.random.fold_in(key, i), i)
            return jax.lax.fori_loop(0, ITERS, body, 0.0)
        f = jax.jit(stream)
        float(f(jax.random.PRNGKey(3)))
        t0 = time.perf_counter(); float(f(jax.random.PRNGKey(4)))
        dt = (time.perf_counter() - t0) / ITERS * 1e3
        print(f"{name:26s}: {dt:8.1f} ms", flush=True)

    from gaussian_gan_decoder_tpu.decoder.surface import (
        marching_tetrahedra_sample, sigma_grid)

    def f_gan(k, i):
        z = jax.random.normal(jax.random.fold_in(k, 1), (1, gen.z_dim))
        t = sample_target(k, gen, gp, z, iteration=i, cfg=tcfg, only_gan=True)
        return jnp.sum(t.img[:, :, ::257, ::257])
    timed("frozen-G 512^2 render", f_gan)

    if os.environ.get("DS_STAGES") == "2":
        # finer frozen-render split: mapping / planes / volume render
        # (XLA DCEs the unconsumed SR) / +SR — the 224 ms stage has never
        # been internally attributed
        from gaussian_gan_decoder_tpu.decoder.camera_sampling import (
            sample_camera_params)

        def _parts(k):
            z = jax.random.normal(jax.random.fold_in(k, 1), (1, gen.z_dim))
            cp, _, _, _ = sample_camera_params(jax.random.fold_in(k, 2), 13.0)
            ws = gen.mapping(gp, z, jnp.zeros_like(cp), truncation_psi=1.0)
            return ws, cp

        def f_map(k, i):
            ws, _ = _parts(k)
            return jnp.sum(ws)
        timed("  mapping", f_map)

        def f_planes(k, i):
            ws, _ = _parts(k)
            planes = gen.synthesis_planes(gp, ws, noise_mode="const")
            return jnp.sum(planes[..., ::257].astype(jnp.float32))
        timed("  + synthesis planes", f_planes)

        def _render(k, consume):
            ws, cp = _parts(k)
            planes = gen.synthesis_planes(gp, ws, noise_mode="const")
            table = gen.build_sampling_table(
                planes,
                brick_dtype=(jnp.int8 if tcfg.int8_probe
                             else jnp.bfloat16 if tcfg.bf16_probe else None),
                pallas_build=tcfg.pallas_probe_build)
            out = gen.render_planes(
                gp, planes, ws, cp,
                neural_rendering_resolution=tcfg.neural_rendering_resolution,
                noise_mode="const", key=jax.random.fold_in(k, 3),
                plane_table=table)
            return jnp.sum(out[consume].astype(jnp.float32))

        def f_table(k, i):
            ws, _cp = _parts(k)
            planes = gen.synthesis_planes(gp, ws, noise_mode="const")
            table = gen.build_sampling_table(
                planes,
                brick_dtype=(jnp.int8 if tcfg.int8_probe
                             else jnp.bfloat16 if tcfg.bf16_probe else None),
                pallas_build=tcfg.pallas_probe_build)
            return jnp.sum(table[0][:, ::8193, ::129].astype(jnp.float32))
        timed("  + probe table", f_table)

        timed("  + volume render (raw)", lambda k, i: _render(k, "image_raw"))
        if not gen.without_sr:   # smoke generators skip the SR stack
            timed("  + superresolution", lambda k, i: _render(k, "image"))

    def _probe_table(planes):
        # the separable sigma grid samples raw planes — no table at all
        if tcfg.sigma_separable:
            return None
        return gen.build_sampling_table(
            planes,
            brick_dtype=(jnp.int8 if tcfg.int8_probe
                         else jnp.bfloat16 if tcfg.bf16_probe else None),
            pallas_build=tcfg.pallas_probe_build)

    def f_sigma(k, i):
        z = jax.random.normal(jax.random.fold_in(k, 1), (1, gen.z_dim))
        ws = gen.mapping(gp, z, jnp.zeros((1, 25)), truncation_psi=1.0)
        planes = gen.synthesis_planes(gp, ws, noise_mode="const")
        sig = sigma_grid(gen, gp, planes, shape_res=tcfg.shape_res,
                         chunk=tcfg.sigma_chunk, table=_probe_table(planes),
                         separable=tcfg.sigma_separable)
        return jnp.sum(sig[::31, ::31, ::31])
    timed("planes + sigma grid", f_sigma)

    def f_tetra(k, i):
        z = jax.random.normal(jax.random.fold_in(k, 1), (1, gen.z_dim))
        ws = gen.mapping(gp, z, jnp.zeros((1, 25)), truncation_psi=1.0)
        planes = gen.synthesis_planes(gp, ws, noise_mode="const")
        sig = sigma_grid(gen, gp, planes, shape_res=tcfg.shape_res,
                         chunk=tcfg.sigma_chunk, table=_probe_table(planes),
                         separable=tcfg.sigma_separable)
        v = marching_tetrahedra_sample(k, sig, level=tcfg.mc_level,
                                       n_points=tcfg.num_points,
                                       surface_thickness=tcfg.surface_thickness,
                                       face_capacity=tcfg.face_capacity,
                                       two_stage=tcfg.mt_two_stage)
        return jnp.sum(v[:8])
    timed("+ marching tetrahedra", f_tetra)

    def f_target(k, i):
        z = jax.random.normal(jax.random.fold_in(k, 1), (1, gen.z_dim))
        t = sample_target(k, gen, gp, z, iteration=i, cfg=tcfg)
        return jnp.sum(t.vertices[:8]) + jnp.sum(t.img[:, :, ::257, ::257])
    timed("target pipeline (no-grad)", f_target)

    def f_decode(k, i):
        z = jax.random.normal(jax.random.fold_in(k, 1), (1, gen.z_dim))
        t = sample_target(k, gen, gp, z, iteration=i, cfg=tcfg)
        d = dec.apply(params, t.z, t.gan_camera_params, t.vertices,
                      truncation_psi=t.truncation)
        return jnp.sum(d.xyz[:8]) + jnp.sum(t.img[:, :, ::257, ::257])
    timed("+ decode fwd (XLA heads)", f_decode)

    def f_loss(k, i):
        z = jax.random.normal(jax.random.fold_in(k, 1), (1, gen.z_dim))
        t = sample_target(k, gen, gp, z, iteration=i, cfg=tcfg)
        d = dec.apply(params, t.z, t.gan_camera_params, t.vertices,
                      truncation_psi=t.truncation)
        fov = t.fov_deg / 360.0 * 2 * jnp.pi
        cam = make_camera(64 if SMOKE else 512, fov, t.cam2world_pose[0])
        out = render_simple(cam, d, bg=jnp.zeros((3,)), config=rcfg,
                            backend="pallas_diff")
        img = out["render"][:3]
        return (jnp.mean(jnp.abs(img - t.img[0]))
                + lpips_loss(vgg, vggp, img[None], t.img[:1]))
    timed("+ raster + L1 + LPIPS fwd", f_loss)


if __name__ == "__main__":
    if os.environ.get("DS_STAGES"):
        stage_ablate()
    else:
        main()
