"""On-chip slab-vs-oracle PSNR (VERDICT r3 item 7, BASELINE.md acceptance).

Renders the SAME latent + template through
  (a) the slab fast path      (int8 volume + int8 lerp weights + poly6
                               GELU + packed_v2 Pallas raster),
  (b) the non-slab Pallas path (int8 bricks + pallas heads — the r2
                               default; isolates slab-specific error),
  (c) the f32 XLA oracle      (exact-erf GELU, f32 sampling, XLA scan
                               rasterizer — the in-repo stand-in for the
                               CUDA rasterizer, see PERFORMANCE.md
                               'CUDA-rasterizer PSNR caveat'),
and prints PSNR(a,c), PSNR(b,c), PSNR(a,b). Target: >= 39 dB vs the
oracle. Runs wherever jax.devices() points (TPU via the axon tunnel,
or CPU with PSNR_CPU=1 + tiny sizes for plumbing).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

if os.environ.get("PSNR_CPU"):
    jax.config.update("jax_platforms", "cpu")
if not os.environ.get("PSNR_NO_CACHE"):
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/ggd/jax_cache_psnr")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _camera_set(n_cams: int, fov_deg: float = 13.0):
    """Frontal + alternating yaw offsets (±0.35, ±0.7 rad ...) around the
    reference's pi/2 frontal orbit (target_dataloader.py:177-204 geometry).
    Returns a list of (camera_params (1,25), cam2world (4,4))."""
    import math

    from gaussian_gan_decoder_tpu.decoder.camera_sampling import (
        FOV_to_intrinsics, _pose_from_hv)

    intr = FOV_to_intrinsics(jnp.asarray(fov_deg, jnp.float32))
    offs = [0.0]
    step = 0.35
    while len(offs) < n_cams:
        k = (len(offs) + 1) // 2
        offs.append(step * k if len(offs) % 2 == 1 else -step * k)
    cams = []
    for dy in offs[:n_cams]:
        h = jnp.asarray([[math.pi / 2 + dy]], jnp.float32)
        v = jnp.asarray([[math.pi / 2]], jnp.float32)
        pose = _pose_from_hv(h, v, 2.7)
        cp = jnp.concatenate(
            [pose.reshape(1, 16), intr.reshape(1, 9).astype(pose.dtype)], axis=1)
        cams.append((cp, pose.reshape(4, 4)))
    return cams


def main():
    import dataclasses

    from gaussian_gan_decoder_tpu.flagship import (
        decode_and_render, default_camera_params, flagship_decoder,
        flagship_generator, flagship_raster_config)

    n_points = int(os.environ.get("PSNR_POINTS", 500_000))
    image_size = int(os.environ.get("PSNR_IMAGE", 512))
    n_latents = int(os.environ.get("PSNR_LATENTS", 4))
    n_cams = int(os.environ.get("PSNR_CAMERAS", 3))

    gen = flagship_generator()
    dec_fast = dataclasses.replace(
        flagship_decoder(gen=gen), slab_sampling=True,
        # bench.py ships pallas_mapping=True (BENCH_PALLAS_MAPPING default
        # "1") — the quality suite must measure the SAME stack
        pallas_mapping=not os.environ.get("PSNR_NO_PALLAS_MAPPING"),
        gelu=os.environ.get("PSNR_GELU", "poly6"),
        heads_bf16=not os.environ.get("PSNR_HEADS_F32"),
        slab_clip_q=float(os.environ.get("PSNR_CLIPQ", "0")))
    # oracle: every approximation off (f32 sampling, exact GELU, XLA heads)
    dec_ref = dataclasses.replace(
        dec_fast, slab_sampling=False, int8_sampling=False,
        bf16_sampling=False, pallas_heads=False, heads_bf16=False,
        pallas_sampling=False, pallas_mapping=False, gelu="exact")
    dec_mid = dataclasses.replace(dec_fast, slab_sampling=False)

    # ONE jitted init program (eager init = hundreds of per-op tunnel
    # round trips; see bench.py r5 stage-C attribution)
    params = jax.jit(lambda: dec_fast.init(
        jax.random.PRNGKey(0),
        generator_params=gen.init(jax.random.PRNGKey(1))))()
    cp, cam2world = default_camera_params()
    init_pos = (jax.random.uniform(jax.random.PRNGKey(2), (n_points, 3)) - 0.5) * 0.4
    fov = jnp.asarray(0.227)
    rcfg = flagship_raster_config()
    # fast-raster sweep knobs under test ride the FAST config only — the
    # oracle keeps the untruncated reference settings
    if os.environ.get("PSNR_TILE_CAP"):
        rcfg = dataclasses.replace(
            rcfg, tile_capacity=int(os.environ["PSNR_TILE_CAP"]))
    if os.environ.get("PSNR_RGB10"):
        rcfg = dataclasses.replace(rcfg, rgb10_payloads=True)
    if os.environ.get("PSNR_MXU_POWER"):
        rcfg = dataclasses.replace(rcfg, blend_mxu_power=True)
    if os.environ.get("PSNR_FUSED_KEY", "") != "":
        # full 32-bit depth two-key sort (fused key keeps 12 mantissa
        # bits -> massive ties at 500k density; see r5 root-cause note)
        rcfg = dataclasses.replace(
            rcfg, fused_sort_key=bool(int(os.environ["PSNR_FUSED_KEY"])))
    rcfg_ref = dataclasses.replace(
        flagship_raster_config(), packed_payloads=False,
        bf16_colors=False, fused_sort_key=False)
    zs = jax.random.normal(jax.random.PRNGKey(3), (n_latents, 1, 512))
    cams = _camera_set(n_cams)

    from gaussian_gan_decoder_tpu.utils import EasyDict

    ctx = None  # built lazily — the ablate mode never needs the slab pack

    def _merge(sa):
        if sa is None:
            return None
        merged = EasyDict(ctx)
        merged.update(sa)
        return merged

    def make_run(tag, dec, backend, cfg, slab=None):
        # cp/cam2world are traced args -> ONE compile across the view grid
        fn = jax.jit(
            lambda p, zz, cp_, c2w, sa: decode_and_render(
                dec, p, zz, cp_, c2w, init_pos, fov,
                image_size=image_size, raster_cfg=cfg, backend=backend,
                slab_ctx=_merge(sa))[0])

        def run(zz, cp_, c2w):
            t0 = time.perf_counter()
            img = fn(params, zz, cp_, c2w, slab)
            img = np.asarray(jnp.clip(img, 0.0, 1.0), np.float64)
            print(f"{tag}: {time.perf_counter() - t0:.1f}s", file=sys.stderr)
            return img

        return run

    if os.environ.get("PSNR_ABLATE"):
        # error-source ladder (1 latent x 1 camera): which shared knob of
        # the fast decode stack carries the ~38 dB full-path deviation?
        # (clip_q moved slab-vs-pallas but NOT vs-oracle: the culprit is
        # shared by the slab and non-slab pallas paths.)
        import json
        variants = {
            "mid_anchor": {},
            # the bf16 mapping kernel perturbs ws -> EVERY plane; isolate
            # it first (the r5 stage-B rungs exonerated GELU + brick
            # dtype + heads precision, so mapping and sampling-path
            # arithmetic are the prime suspects)
            "mapping_off": {"pallas_mapping": False},
            "gelu_exact": {"gelu": "exact"},
            "bf16_bricks": {"int8_sampling": False},
            "f32_bricks": {"int8_sampling": False, "bf16_sampling": False},
            "xla_sampling_f32": {"pallas_sampling": False,
                                 "int8_sampling": False,
                                 "bf16_sampling": False},
            "heads_f32": {"heads_bf16": False},
            "xla_heads": {"pallas_heads": False, "heads_bf16": False},
            "xla_heads_exact_gelu": {"pallas_heads": False,
                                     "heads_bf16": False, "gelu": "exact"},
            # pallas kernel with EVERY approximation off: separates
            # kernel-semantics error from the approximation knobs (the
            # r5 stage-D algebra: each knob individually ~0, xla chain
            # 62.9 -> a kernel-specific source must exist; this rung
            # measures it directly)
            "pallas_all_exact": {"heads_bf16": False, "gelu": "exact",
                                 "pallas_sampling": False,
                                 "int8_sampling": False,
                                 "bf16_sampling": False},
            # oracle decode settings rendered through the FAST raster
            # config: whatever dB this rung reads is the packed-raster
            # contribution at full-frame level (everything else exact)
            "all_exact_packed_raster": {
                "pallas_mapping": False, "pallas_heads": False,
                "heads_bf16": False, "gelu": "exact",
                "pallas_sampling": False, "int8_sampling": False,
                "bf16_sampling": False},
        }
        only = os.environ.get("PSNR_ABLATE_ONLY")
        if only:
            variants = {k: v for k, v in variants.items()
                        if k in only.split(",")}
        cp0, c2w0 = _camera_set(1)[0]
        z0 = zs[0]
        img_ref = make_run("oracle", dec_ref, "xla", rcfg_ref)(z0, cp0, c2w0)
        out = {}
        for name, kw in variants.items():
            d = dataclasses.replace(dec_mid, **kw)
            img = make_run(name, d, "pallas", rcfg)(z0, cp0, c2w0)
            mse_v = float(np.mean((img - img_ref) ** 2))
            out[name] = round(10 * np.log10(1.0 / max(mse_v, 1e-12)), 2)
            print(f"{name}: {out[name]} dB", file=sys.stderr)
        print(json.dumps({"psnr_ablate_vs_oracle_db": out}))
        return

    ctx = dec_fast.make_slab_context(init_pos, cache_dir="/root/.cache/ggd/slab_ctx_cache")
    slab_args = {k: ctx[k] for k in ("origins", "wzy", "axs", "aux")}
    run_slab = make_run("slab", dec_fast, "pallas", rcfg, slab=slab_args)
    run_mid = make_run("pallas non-slab", dec_mid, "pallas", rcfg)
    run_ref = make_run("f32 XLA oracle", dec_ref, "xla", rcfg_ref)

    # the BASELINE.md acceptance is rasterizer-vs-rasterizer on IDENTICAL
    # gaussian sets: decode once with the exact f32 oracle settings, then
    # render the SAME set through the fast Pallas raster (deployed config)
    # and the XLA reference raster
    from gaussian_gan_decoder_tpu.gaussians.cameras import make_camera
    from gaussian_gan_decoder_tpu.splat.rasterize import render_simple

    bgv = jnp.asarray((0.55717, 0.52256, 0.51045), jnp.float32)

    @jax.jit
    def raster_pair(p, zz, cp_, c2w):
        cam = make_camera(image_size, fov, c2w)
        d = dec_ref.apply(p, zz, cp_, init_pos, 1.0)
        a = render_simple(cam, d, bg=bgv, config=rcfg,
                          backend="pallas")["render"][:3]
        b = render_simple(cam, d, bg=bgv, config=rcfg_ref,
                          backend="xla")["render"][:3]
        return a, b

    def psnr_of(mses):
        return 10 * np.log10(1.0 / max(float(np.mean(mses)), 1e-12))

    # BASELINE.md secondary metric: LPIPS between the fast path / fast
    # raster and the oracle. Zero egress: random VGG16 weights unless
    # PSNR_LPIPS_WEIGHTS names a torchvision VGG16 state dict — random
    # weights still give a deterministic multi-scale perceptual distance
    # (label carries the caveat), and the plumbing is the pretrained one.
    from gaussian_gan_decoder_tpu.losses.lpips import VGG16LPIPS

    lp = VGG16LPIPS()
    wpath = os.environ.get("PSNR_LPIPS_WEIGHTS")
    if wpath:
        import torch

        lp_params = lp.load_torch_state_dict(
            {k: v.numpy() for k, v in torch.load(
                wpath, map_location="cpu", weights_only=True).items()})
        lp_tag = "lpips"
    else:
        lp_params = jax.jit(lp.init)(jax.random.PRNGKey(7))
        lp_tag = "lpips_random_vgg"

    @jax.jit
    def _lp_embed(img):                      # (3,H,W) in [0,1]
        return lp.embed(lp_params, img[None].astype(jnp.float32) * 255.0)

    def lp_dist(a, b):
        ea = _lp_embed(jnp.asarray(a))
        eb = _lp_embed(jnp.asarray(b))
        return float(jnp.sum((ea - eb) ** 2))

    mse = {"raster": [], "slab_ref": [], "mid_ref": [], "slab_mid": []}
    lpips_v = {"raster": [], "slab_ref": []}
    for li in range(n_latents):
        for ci, (cp_i, c2w_i) in enumerate(cams):
            z = zs[li]
            img_slab = run_slab(z, cp_i, c2w_i)
            img_mid = run_mid(z, cp_i, c2w_i)
            img_ref = run_ref(z, cp_i, c2w_i)
            t0 = time.perf_counter()
            ra, rb = raster_pair(params, z, cp_i, c2w_i)
            ra = np.asarray(jnp.clip(ra, 0, 1), np.float64)
            rb = np.asarray(jnp.clip(rb, 0, 1), np.float64)
            print(f"raster pair [{li},{ci}]: {time.perf_counter() - t0:.1f}s",
                  file=sys.stderr)
            mse["raster"].append(np.mean((ra - rb) ** 2))
            mse["slab_ref"].append(np.mean((img_slab - img_ref) ** 2))
            mse["mid_ref"].append(np.mean((img_mid - img_ref) ** 2))
            mse["slab_mid"].append(np.mean((img_slab - img_mid) ** 2))
            lpips_v["raster"].append(lp_dist(ra, rb))
            lpips_v["slab_ref"].append(lp_dist(img_slab, img_ref))
            print(f"frame[{li},{ci}] raster={psnr_of(mse['raster'][-1:]):.2f} "
                  f"slab_vs_oracle={psnr_of(mse['slab_ref'][-1:]):.2f}",
                  file=sys.stderr)

    import json
    print(json.dumps({
        "psnr_raster_identical_sets_db": round(psnr_of(mse["raster"]), 2),
        "psnr_raster_identical_sets_min_db": round(
            min(psnr_of([m]) for m in mse["raster"]), 2),
        "psnr_slab_vs_oracle_db": round(psnr_of(mse["slab_ref"]), 2),
        "psnr_slab_vs_oracle_min_db": round(
            min(psnr_of([m]) for m in mse["slab_ref"]), 2),
        "psnr_pallas_vs_oracle_db": round(psnr_of(mse["mid_ref"]), 2),
        "psnr_slab_vs_pallas_db": round(psnr_of(mse["slab_mid"]), 2),
        f"{lp_tag}_raster_identical_sets": round(
            float(np.mean(lpips_v["raster"])), 6),
        f"{lp_tag}_slab_vs_oracle": round(
            float(np.mean(lpips_v["slab_ref"])), 6),
        "image": image_size, "points": n_points,
        "latents": n_latents, "cameras": n_cams,
        "clip_q": dec_fast.slab_clip_q,
    }))


if __name__ == "__main__":
    main()
