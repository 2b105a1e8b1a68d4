"""Headline benchmark: decoded + rendered 512^2 head frames/sec/chip.

Runs the flagship PanoHead-shaped pipeline (BASELINE.md config #1/#5): per
frame, the full decoder forward (mapping -> 256^2 tri-grid synthesis ->
500k-point tri-grid sampling -> 5 MLP heads) followed by the differentiable
tile rasterizer at 512^2. Random weights (no pretrained checkpoints in this
environment) — identical FLOP/memory profile to deployed weights.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} with
vs_baseline relative to the 30 fps/chip target (BASELINE.md).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

# persistent compilation cache: the axon tunnel compile helper costs
# minutes per fresh program (slab context build measured 225-277 s, the
# frame stream a further ~4 min); cached re-runs skip straight to device
# execution. Cache entries key on HLO + compile flags, so code changes
# never read stale binaries. BENCH_NO_CACHE=1 disables (cold-compile
# timing studies). Rooted under /root/.cache (NOT /tmp): the host VM
# reboots between driver sessions and a wiped cache re-pays the cold
# slab build (~90 s of tunnel compile) on the driver's own bench run.
# BENCH_CPU=1: plumbing smoke tests without touching the (possibly busy)
# TPU — the axon sitecustomize pins the backend, so JAX_PLATFORMS env
# alone does not work; the config update after import does
if os.environ.get("BENCH_CPU"):
    jax.config.update("jax_platforms", "cpu")

if not os.environ.get("BENCH_NO_CACHE"):
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("BENCH_CACHE_DIR",
                                     "/root/.cache/ggd/jax_cache_bench"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    from gaussian_gan_decoder_tpu.flagship import (
        decode_and_render,
        default_camera_params,
        flagship_decoder,
        flagship_raster_config,
    )

    n_points = int(os.environ.get("BENCH_POINTS", 500_000))
    image_size = int(os.environ.get("BENCH_IMAGE", 512))
    # 32 frames per timed call (was 10 through r4): the fori_loop stream
    # is ONE device program either way, and the ~25 ms per-call host/
    # tunnel dispatch is a harness artifact — at 10 frames it inflated
    # frame time ~8% (31.5 -> 34.2 fps measured at iters=32, r5 stage C).
    # The JSON carries "iters" so readings are comparable.
    iters = int(os.environ.get("BENCH_ITERS", 32))
    variant = os.environ.get("BENCH_VARIANT", "panohead")  # or 'eg3d'

    from gaussian_gan_decoder_tpu.flagship import flagship_generator

    dec = flagship_decoder(
        gen=flagship_generator(variant=variant),
        fused_sampling=bool(int(os.environ.get("BENCH_FUSED_SAMPLING", "0"))),
    )
    if os.environ.get("BENCH_BRICK_SELECT", "").strip().lower() not in ("", "0", "false", "no"):
        # channel-duplicated brick-build source: masked-select stores
        # instead of lane rotations (sweep knob; PERFORMANCE.md roadmap)
        import dataclasses as _dcs

        dec = _dcs.replace(dec, pallas_sampling="select")
    if os.environ.get("BENCH_PALLAS_MAPPING", "1").strip().lower() not in (
            "0", "false", "no"):
        # fused VMEM mapping chain (the XLA 8-FC chain at batch 1 is pure
        # launch latency, ~2.4 ms/frame measured)
        import dataclasses as _dcsm

        dec = _dcsm.replace(dec, pallas_mapping=True)
    # ONE jitted init program: eager init dispatches hundreds of tiny ops,
    # each a tunnel round trip — the r5 stage-C entry stamp measured
    # 1399 s of pre-slab wall that was exactly this queue draining at the
    # first device->host sync (per-op tunnel latency degrades over a day
    # of sessions; one traced program is one round trip)
    params = jax.jit(lambda: dec.init(
        jax.random.PRNGKey(0),
        generator_params=dec.generator.init(jax.random.PRNGKey(1)),
    ))()
    cp, cam2world = default_camera_params()
    # HOST-materialised template (same values/cache key as ever):
    # make_slab_context consumes numpy, and a lazy device template would
    # force its d2h sync behind whatever is queued at that point — pay the
    # (now tiny) sync here instead, right after the single init program
    import numpy as _np
    init_pos = _np.asarray(
        (jax.random.uniform(jax.random.PRNGKey(2), (n_points, 3)) - 0.5)
        * 0.4)
    fov = jnp.asarray(0.227)
    rcfg = flagship_raster_config()

    backend = os.environ.get("BENCH_BACKEND", "pallas")
    # slab-gather decode DEFAULT ON (29.59 fps vs 20.93 brick-table path,
    # measured 2026-08-19); BENCH_SLAB=0 reverts. eg3d (depth-1) takes
    # the bilinear slab variant (2-D windows, no z-slab).
    slab_on = (os.environ.get("BENCH_SLAB", "1").strip().lower()
               not in ("0", "false", "no") and backend == "pallas")
    # slab default fb=1: the batched lax.map stream with the slab kernel
    # compiles pathologically (>10 min) through the tunnel helper, and
    # fb=4 measured no gain over fb=1 on the non-slab path anyway
    frame_batch = int(os.environ.get("BENCH_FRAME_BATCH",
                                     "1" if slab_on else "4"))

    # raster-config sweep knobs (PERFORMANCE.md round-2 roadmap: the sort
    # is the largest raster cost; copies->overflow rebalance shrinks the
    # sorted rows, fused_sort_key halves the key operands)
    import dataclasses as _dc

    overrides = {}
    if "BENCH_COPIES" in os.environ:
        overrides["static_copies"] = int(os.environ["BENCH_COPIES"])
    if "BENCH_OVERFLOW" in os.environ:
        overrides["overflow_budget"] = int(os.environ["BENCH_OVERFLOW"])
    if "BENCH_FUSED_KEY" in os.environ:
        overrides["fused_sort_key"] = bool(int(os.environ["BENCH_FUSED_KEY"]))
    if "BENCH_TILE_CAP" in os.environ:
        # blend cost is proportional to tile_capacity (fixed-trip chunk
        # loop); pairs beyond it in a tile are truncated back-to-front
        overrides["tile_capacity"] = int(os.environ["BENCH_TILE_CAP"])
    if "BENCH_RGB10" in os.environ:
        # packed_v3: 4 payload words (cc|op f16 pair, rgb 10-bit word)
        overrides["rgb10_payloads"] = bool(int(os.environ["BENCH_RGB10"]))
    if "BENCH_MXU_POWER" in os.environ:
        # quadratic-basis MXU falloff in the blend kernel
        overrides["blend_mxu_power"] = bool(
            int(os.environ["BENCH_MXU_POWER"]))
    if overrides:
        rcfg = _dc.replace(rcfg, **overrides)
    rcfg_base = rcfg  # sweep-mode rows derive from the post-env config

    # slab-gather decode: Morton-pack the static template once, decode
    # each frame with the slab kernel (no brick table, no HBM row gather)
    slab_ctx = None
    if slab_on:
        import dataclasses as _dcs2

        # poly6 GELU default on the slab path: 27.98 vs 27.27 fps measured;
        # its 1.8e-3 approx error sits under the int8 features' 2^-7 floor
        dec = _dcs2.replace(dec, slab_sampling=True,
                            gelu=os.environ.get("BENCH_GELU", "poly6"),
                            # BENCH_HEADS_F32=1: f32 matmuls in the fused
                            # chain (quality-ladder fps cost probe)
                            heads_bf16=not os.environ.get("BENCH_HEADS_F32"),
                            slab_clip_q=float(
                                os.environ.get("BENCH_SLAB_CLIPQ", "0")))
        # host-pack disk cache (warm start skips the greedy pack; the jit
        # compile cache above skips the tunnel compile). BENCH_SLAB_CACHE=0
        # disables for cold-build timing studies.
        cache_dir = os.environ.get("BENCH_SLAB_CACHE", "/root/.cache/ggd/slab_ctx_cache")
        if cache_dir.strip().lower() in ("0", "false", "no"):
            cache_dir = None
        t0 = time.perf_counter()
        # the r4 eg3d run died here once with a TPU FailedPrecondition on
        # a device->host transfer (backend/tunnel unhealthy after the cold
        # ctx compile): retry once on a fresh attempt, and degrade to the
        # non-slab path instead of zeroing the benchmark
        slab_ctx = None
        verbose_slab = bool(os.environ.get("GGD_SLAB_VERBOSE"))
        for attempt in (1, 2):
            try:
                # outer stamps bracket the INTERNAL ones (heads.py
                # _stamp): the r5 stage-B warm run showed host pack 0.0 s
                # + device build 2.0 s against a 368 s wall — these pin
                # whether the gap is inside the call or in the final
                # block_until_ready (tunnel stall attribution)
                t_call = time.perf_counter()
                slab_ctx = dec.make_slab_context(init_pos,
                                                 cache_dir=cache_dir)
                if verbose_slab:
                    print(f"slab outer: make_slab_context returned "
                          f"{time.perf_counter() - t_call:.1f}s",
                          file=sys.stderr)
                jax.block_until_ready(slab_ctx.wzy)
                if verbose_slab:
                    print(f"slab outer: wzy ready "
                          f"{time.perf_counter() - t_call:.1f}s",
                          file=sys.stderr)
                break
            except Exception as e:  # noqa: BLE001
                print(f"slab context build attempt {attempt} failed "
                      f"({type(e).__name__}: {e})", file=sys.stderr)
                slab_ctx = None
        if slab_ctx is None:
            print("slab context unavailable — falling back to the "
                  "brick-table path", file=sys.stderr)
            import dataclasses as _dcs3

            dec = _dcs3.replace(dec, slab_sampling=False)
            slab_on = False
        else:
            slab_build_s = round(time.perf_counter() - t0, 1)
            print(f"slab context build: {slab_build_s}s "
                  f"(one-time per template)", file=sys.stderr)
    # the ~440 MB wzy must reach jit as an ARGUMENT (constant-embedded
    # HLO hangs the tunnel compile helper); statics stay in the closure
    slab_arr = (None if slab_ctx is None else
                {k: slab_ctx[k] for k in ("origins", "wzy", "axs", "aux")})

    def _ctx(sa):
        if sa is None:
            return None
        from gaussian_gan_decoder_tpu.utils import EasyDict

        merged = EasyDict(slab_ctx)
        merged.update(sa)
        return merged

    zs = jax.random.normal(jax.random.PRNGKey(3), (iters, 1, 512))

    def make_stream(fb, rcfg_s):
        if backend == "pallas" and fb > 1 and iters % fb == 0:
            from gaussian_gan_decoder_tpu.flagship import (
                decode_and_render_stream)

            @jax.jit
            def frame_stream(params, zs, sa):
                # backbone batched fb at a time, per-frame tail sequential
                # (memory) — still iters distinct frames
                imgs = decode_and_render_stream(
                    dec, params, zs, cp, cam2world, init_pos, fov,
                    image_size=image_size, raster_cfg=rcfg_s,
                    frame_batch=fb, slab_ctx=_ctx(sa),
                )
                return jnp.sum(imgs[:, :, ::257, ::257])
        else:
            @jax.jit
            def frame_stream(params, zs, sa):
                # all frames in ONE device program: measures frames/sec/
                # chip (per-call host/tunnel dispatch latency is a harness
                # artifact, not renderer throughput)
                def body(i, acc):
                    img, _ = decode_and_render(
                        dec, params, zs[i], cp, cam2world, init_pos, fov,
                        image_size=image_size, raster_cfg=rcfg_s,
                        backend=backend, slab_ctx=_ctx(sa),
                    )
                    # scalar checksum forces full execution
                    return acc + jnp.sum(img)

                return jax.lax.fori_loop(0, iters, body, 0.0)
        return frame_stream

    # fallback cascade: batched stream -> per-frame loop -> legacy
    # bf16_colors payload format (a compile failure in a newer path must
    # not zero the benchmark)
    import dataclasses

    frame_stream = None
    path_ran = None
    used_arr = None
    cascade = [(frame_batch, True, slab_ctx is not None)]
    if slab_ctx is not None:   # a slab-specific failure must not zero it
        cascade.append((1, True, False))
    if frame_batch > 1:
        cascade.append((1, True, False))
    cascade.append((1, False, False))
    fb_ran = 1
    for fb, packed, use_slab in cascade:
        try:
            if not packed:
                rcfg = dataclasses.replace(
                    rcfg, packed_payloads=False, fused_sort_key=False)
            sa = slab_arr if use_slab else None
            candidate = make_stream(fb, rcfg)
            float(candidate(params, zs, sa))  # compile + warmup
            frame_stream = candidate
            used_arr = sa
            fb_ran = fb
            path_ran = (f"frame_batch={fb},packed={packed}"
                        + (",slab" if use_slab else ""))
            break
        except Exception as e:  # noqa: BLE001
            print(f"frame_batch={fb} packed={packed} slab={use_slab} path "
                  f"failed ({type(e).__name__}: {e}); falling back",
                  file=sys.stderr)
    assert frame_stream is not None, "no benchmark path compiled"
    if used_arr is None:
        slab_ctx = None   # keep the aux/n_dropped check on the same path

    t0 = time.perf_counter()
    float(frame_stream(params, zs, used_arr))
    dt = (time.perf_counter() - t0) / iters
    fps = 1.0 / dt

    # budget-exhaustion diagnostic: overflow-lane drops cause holes in
    # deployed renders; surface them instead of silently benchmarking them
    _, _, aux = decode_and_render(
        dec, params, zs[0], cp, cam2world, init_pos, fov,
        image_size=image_size, raster_cfg=rcfg, backend=backend,
        return_aux=True, slab_ctx=slab_ctx,
    )
    nd = int(aux["n_dropped"])
    if nd > 0:
        print(f"WARNING: n_dropped={nd} tile pairs exceeded "
              f"overflow_budget={rcfg.overflow_budget}", file=sys.stderr)

    rec = {
        "metric": f"decode+splat render {image_size}^2, {n_points} gaussians, frames/sec/chip",
        "value": round(fps, 3),
        "unit": "fps",
        "vs_baseline": round(fps / 30.0, 3),
        # which cascade path actually ran: a regression in the fast path
        # must show up as a visible fallback, not a quiet fps drop
        "path": path_ran,
        "iters": iters,
    }
    if slab_ctx is not None and used_arr is not None:
        # one-time template setup cost (VERDICT r3 item 4): visible in the
        # record, not just a stderr print
        rec["slab_build_s"] = slab_build_s
    print(json.dumps(rec))
    sys.stdout.flush()

    # --- sweep mode: BENCH_SWEEP="tile_cap=640;rgb10=0;overflow=65536" ----
    # Each ';'-separated spec is a comma-separated list of raster knobs
    # applied over the post-env base config, measured IN THIS PROCESS with
    # the shared slab context. One JSON line per spec. Rationale: the r5
    # stage-B batch paid 180-370 s of unattributed per-process wall per
    # row (fresh tunnel session + ctx rebuild); raster-knob ablations
    # don't need a new process at all.
    sweep = os.environ.get("BENCH_SWEEP", "").strip()
    if sweep:
        knob_map = {
            "copies": ("static_copies", int),
            "overflow": ("overflow_budget", int),
            "fused_key": ("fused_sort_key", lambda v: bool(int(v))),
            "tile_cap": ("tile_capacity", int),
            "rgb10": ("rgb10_payloads", lambda v: bool(int(v))),
            "mxu_power": ("blend_mxu_power", lambda v: bool(int(v))),
        }
        for spec in filter(None, (s.strip() for s in sweep.split(";"))):
            ovr = {}
            for kv in spec.split(","):
                k, _, v = kv.partition("=")
                field, conv = knob_map[k.strip()]
                ovr[field] = conv(v.strip())
            rcfg_s = dataclasses.replace(rcfg_base, **ovr)
            try:
                stream_s = make_stream(fb_ran, rcfg_s)
                float(stream_s(params, zs, used_arr))  # compile + warmup
                t0 = time.perf_counter()
                float(stream_s(params, zs, used_arr))
                fps_s = iters / (time.perf_counter() - t0)
            except Exception as e:  # noqa: BLE001
                print(f"sweep spec '{spec}' failed "
                      f"({type(e).__name__}: {e})", file=sys.stderr)
                continue
            srec = {
                "metric": rec["metric"], "value": round(fps_s, 3),
                "unit": "fps", "vs_baseline": round(fps_s / 30.0, 3),
                "path": path_ran, "sweep": spec,
            }
            if ("static_copies" in ovr or "overflow_budget" in ovr):
                # replication-budget specs are only admissible at
                # n_dropped=0 — run the aux frame so the row carries it
                try:
                    _, _, aux_s = decode_and_render(
                        dec, params, zs[0], cp, cam2world, init_pos, fov,
                        image_size=image_size, raster_cfg=rcfg_s,
                        backend=backend, return_aux=True, slab_ctx=slab_ctx)
                    srec["n_dropped"] = int(aux_s["n_dropped"])
                except Exception as e:  # noqa: BLE001
                    print(f"sweep spec '{spec}' aux check failed "
                          f"({type(e).__name__}: {e})", file=sys.stderr)
            print(json.dumps(srec))
            sys.stdout.flush()


if __name__ == "__main__":
    main()
