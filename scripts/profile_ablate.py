"""Frame-stream ablation profiler: time the flagship frame with the
pipeline truncated after each stage (same fori_loop harness as bench.py,
which is known to compile). Stage costs = successive deltas."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

# same persistent compile cache rationale as bench.py (tunnel compiles
# cost minutes per fresh stage program)
if not os.environ.get("PROF_NO_CACHE"):
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("PROF_CACHE_DIR", "/root/.cache/ggd/jax_cache_ablate"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from gaussian_gan_decoder_tpu.flagship import (
    default_camera_params, flagship_decoder, flagship_generator,
    flagship_raster_config,
)
from gaussian_gan_decoder_tpu.gaussians.cameras import make_camera
from gaussian_gan_decoder_tpu.splat.pallas_blend import CHUNK, ROW, pallas_blend

ITERS = int(os.environ.get("PROF_ITERS", 10))


def main():
    dec = flagship_decoder(
        gen=flagship_generator(),
        fused_sampling=bool(int(os.environ.get("FUSED_SAMPLING", "0"))))
    if os.environ.get("FUSED_LERP"):
        import dataclasses
        dec = dataclasses.replace(dec, fused_lerp=os.environ["FUSED_LERP"])
    if os.environ.get("PROF_SLAB"):
        import dataclasses
        dec = dataclasses.replace(dec, slab_sampling=True)
    params = dec.init(jax.random.PRNGKey(0),
                      generator_params=dec.generator.init(jax.random.PRNGKey(1)))
    cp, cam2world = default_camera_params()
    init_pos = (jax.random.uniform(jax.random.PRNGKey(2), (500_000, 3)) - 0.5) * 0.4
    slab_ctx = (dec.make_slab_context(init_pos,
                                      cache_dir="/root/.cache/ggd/slab_ctx_cache")
                if dec.slab_sampling else None)
    # the ~440 MB wzy must be a jit ARGUMENT (constant-embedded HLO hangs
    # the tunnel compile helper)
    slab_arr = (None if slab_ctx is None else
                {k: slab_ctx[k] for k in ("origins", "wzy", "axs", "aux")})

    def _ctx(sa):
        if sa is None:
            return None
        from gaussian_gan_decoder_tpu.utils import EasyDict
        merged = EasyDict(slab_ctx)
        merged.update(sa)
        return merged
    rcfg = flagship_raster_config()
    if os.environ.get("PROF_RGB10"):
        import dataclasses
        rcfg = dataclasses.replace(rcfg, rgb10_payloads=True)
    if os.environ.get("PROF_TILE_CAP"):
        import dataclasses
        rcfg = dataclasses.replace(
            rcfg, tile_capacity=int(os.environ["PROF_TILE_CAP"]))
    if os.environ.get("PROF_MXU_POWER"):
        import dataclasses
        rcfg = dataclasses.replace(rcfg, blend_mxu_power=True)
    cam = make_camera(512, jnp.asarray(0.227), cam2world)
    ts = rcfg.tile_size
    gx = gy = 512 // ts
    zs = jax.random.normal(jax.random.PRNGKey(3), (ITERS, 1, 512))
    bg = jnp.asarray([0.55717, 0.52256, 0.51045], jnp.float32)

    from gaussian_gan_decoder_tpu.gaussians.sh import SH_C0
    from gaussian_gan_decoder_tpu.splat.fast_raster import bin_pairs_lexsort_ch
    from gaussian_gan_decoder_tpu.splat.projection import project_channels

    M = 500_000

    def frame(params, z, stage, sa=None):
        if stage == "slab_vol":
            # per-frame slab-path input: pad/transpose/quantize the raw
            # volume (no brick expansion)
            from gaussian_gan_decoder_tpu.neuralfield.renderer import (
                build_slab_volume)
            planes, _ = dec.synthesize_planes(params, z, cp, 1.0)
            vol, scales = build_slab_volume(planes, dec.generator.triplane_depth)
            return (jnp.sum(vol[:, :, ::37, ::513].astype(jnp.float32))
                    + jnp.sum(scales))
        if stage in ("sample_full", "stagein_full"):
            # FULL consumption: the sampled-sum variants let XLA slim the
            # gather (it fuses the stride into the take indices), so their
            # deltas under-count the gather and over-count the next stage
            # (r3 finding: the decode kernel alone measures 1.7 ms
            # standalone but 11.5 ms by sampled-sum deltas)
            planes, _ = dec.synthesize_planes(params, z, cp, 1.0)
            g = dec.generator
            from gaussian_gan_decoder_tpu.neuralfield.renderer import (
                sample_from_planes)
            feats = sample_from_planes(
                g.renderer.plane_axes, planes, init_pos[None],
                box_warp=g.rk["box_warp"], triplane_depth=g.triplane_depth,
                brick_dtype=dec._brick_dtype, pallas_build=True)[0]
            if stage == "sample_full":
                return jnp.sum(feats.astype(jnp.float32))
            fm = jnp.mean(feats, axis=0).astype(jnp.float32)
            cond = (dec.embedder(init_pos) if dec.use_xyz_embedding
                    else init_pos)
            from gaussian_gan_decoder_tpu.decoder.pallas_heads import (
                _build_staging)
            staging, _ = _build_staging(
                fm, cond, init_pos,
                [(n, d) for n, d in
                 __import__("gaussian_gan_decoder_tpu.decoder.heads",
                            fromlist=["_CHAINS"])._CHAINS[dec.decoder_type]],
                1024, jnp.bfloat16)
            return jnp.sum(staging.astype(jnp.float32))
        if stage == "mapping":
            ws = dec.generator.mapping(params["G"], z,
                                       jnp.zeros_like(cp), truncation_psi=1.0)
            return jnp.sum(ws)
        if stage in ("synth", "table", "table_q", "sample"):
            planes, _ = dec.synthesize_planes(params, z, cp, 1.0)
            if stage == "synth":
                return jnp.sum(planes[..., ::257].astype(jnp.float32))
            g = dec.generator
            if stage == "table_q":
                from gaussian_gan_decoder_tpu.neuralfield.renderer import (
                    build_plane_table)
                tq = build_plane_table(planes, g.triplane_depth,
                                       brick_dtype=dec._brick_dtype,
                                       pallas_build=True)
                return jnp.sum(tq[0][:, ::8193, ::129].astype(jnp.float32))
            if stage == "sample":
                from gaussian_gan_decoder_tpu.neuralfield.renderer import (
                    sample_from_planes)
                feats = sample_from_planes(
                    g.renderer.plane_axes, planes, init_pos[None],
                    box_warp=g.rk["box_warp"], triplane_depth=g.triplane_depth,
                    brick_dtype=dec._brick_dtype, pallas_build=True)[0]
                return jnp.sum(feats[:, ::4097].astype(jnp.float32))
            from gaussian_gan_decoder_tpu.neuralfield.pallas_expand import (
                build_brick_table)
            _N, n_planes, CD, H, W = planes.shape
            D = g.triplane_depth
            feats5 = planes.astype(jnp.bfloat16).reshape(
                n_planes, CD // D, D, H, W)
            e, _NY = build_brick_table(feats5)
            return jnp.sum(e[:, ::8193, ::129].astype(jnp.float32))
        if stage == "fused_in":
            # XLA side of the gather-fused decode: takes + channel-major
            # weights + aux staging, all sum-consumed (the takes cannot be
            # slimmed by a full sum)
            planes, _ = dec.synthesize_planes(params, z, cp, 1.0)
            g = dec.generator
            from gaussian_gan_decoder_tpu.neuralfield.renderer import (
                sample_fused_inputs)
            Mpad = -(-M // 1024) * 1024
            rows_in, wts, smats, K = sample_fused_inputs(
                g.renderer.plane_axes, planes, init_pos[None],
                box_warp=g.rk["box_warp"], triplane_depth=g.triplane_depth,
                brick_dtype=dec._brick_dtype, pallas_build=True,
                pad_to=Mpad)
            from gaussian_gan_decoder_tpu.decoder.pallas_heads import (
                _build_staging)
            cond = (dec.embedder(init_pos) if dec.use_xyz_embedding
                    else init_pos)
            aux, _ = _build_staging(
                jnp.zeros((M, 32), jnp.float32), cond, init_pos,
                [(n, d) for n, d in
                 __import__("gaussian_gan_decoder_tpu.decoder.heads",
                            fromlist=["_CHAINS"])._CHAINS[dec.decoder_type]],
                1024, jnp.bfloat16)
            return (sum(jnp.sum(r.astype(jnp.float32)) for r in rows_in)
                    + jnp.sum(wts) + jnp.sum(smats)
                    + jnp.sum(aux.astype(jnp.float32)))
        if stage == "stagein":
            # mean + embedder + staging concat (the fused-heads kernel input)
            planes, _ = dec.synthesize_planes(params, z, cp, 1.0)
            g = dec.generator
            from gaussian_gan_decoder_tpu.neuralfield.renderer import (
                sample_from_planes)
            feats = sample_from_planes(
                g.renderer.plane_axes, planes, init_pos[None],
                box_warp=g.rk["box_warp"], triplane_depth=g.triplane_depth,
                brick_dtype=dec._brick_dtype, pallas_build=True)[0]
            fm = jnp.mean(feats, axis=0).astype(jnp.float32)
            cond = (dec.embedder(init_pos) if dec.use_xyz_embedding
                    else init_pos)
            staging = jnp.concatenate(
                [fm, cond.astype(jnp.float32),
                 jnp.zeros((fm.shape[0], 128 - 32 - cond.shape[1] - 3)),
                 init_pos.astype(jnp.float32)], axis=1).astype(jnp.bfloat16)
            return jnp.sum(staging[::4097, :].astype(jnp.float32))
        # v2 hot path: fused heads+projection kernel (matches flagship)
        from gaussian_gan_decoder_tpu.decoder.pallas_heads import PROJ_ROWS
        if sa is not None:
            planes, _ = dec.synthesize_planes(params, z, cp, 1.0)
            rows, layout = dec.decode_project(
                params, planes, init_pos, cam, slab_ctx=_ctx(sa))
        else:
            rows, layout = dec.apply_project(params, z, cp, init_pos, cam, 1.0)
        if stage == "decode":
            return jnp.sum(rows[:, :8])
        r = {k: rows[v] for k, v in PROJ_ROWS.items()}
        ch = dict(px=r["px"], py=r["py"], depth=r["depth"],
                  radius_f=r["radius_f"], visible=r["visible"] > 0.5)
        fields = [r["px"], r["py"], r["conic_a"], r["conic_b"], r["conic_c"],
                  r["opac"], r["col_r"], r["col_g"], r["col_b"]]
        if "barrier" not in os.environ.get("PROF_NO_BARRIER", ""):
            ch, fields = jax.lax.optimization_barrier((ch, fields))
        if stage == "fields":
            return sum(jnp.sum(f[::4097]) for f in fields)
        if stage in ("rects", "ids", "pairs_static", "pairs"):
            from gaussian_gan_decoder_tpu.splat.fast_raster import (
                _tile_rects_ch, build_pairs_ch)
            if stage == "pairs":
                tile_key, qd, fields_rep, _nd = build_pairs_ch(
                    ch, fields, gx, gy, ts, rcfg.static_copies,
                    rcfg.overflow_budget)
                return (jnp.sum(tile_key[::4097].astype(jnp.float32))
                        + jnp.sum(qd[::4097].astype(jnp.float32))
                        + sum(jnp.sum(f[::4097]) for f in fields_rep))
            x0, y0, rw, rh = _tile_rects_ch(
                ch["px"].astype(jnp.float32), ch["py"].astype(jnp.float32),
                ch["radius_f"].astype(jnp.float32), gx, gy, ts)
            area = rw * rh
            vis = ch["visible"] & (area > 0)
            if stage == "rects":
                return (jnp.sum(area[::4097].astype(jnp.float32))
                        + jnp.sum(vis[::4097].astype(jnp.float32))
                        + sum(jnp.sum(f[::4097]) for f in fields))
            if stage == "ids":
                counts = jnp.where(vis, jnp.maximum(area - rcfg.static_copies, 0), 0)
                offs = jnp.cumsum(counts) - counts
                ids = jnp.repeat(jnp.arange(area.shape[0], dtype=jnp.int32),
                                 counts, total_repeat_length=rcfg.overflow_budget)
                return (jnp.sum(ids.astype(jnp.float32))
                        + jnp.sum(offs[::4097].astype(jnp.float32))
                        + sum(jnp.sum(f[::4097]) for f in fields))
            # pairs_static: tiling/copies lanes only, no overflow machinery
            T = gx * gy
            rw1 = jnp.maximum(rw, 1)
            base = y0 * gx + x0
            qdepth = jax.lax.bitcast_convert_type(
                jnp.maximum(ch["depth"], 1e-6).astype(jnp.float32), jnp.int32)
            tiles = []
            for k in range(rcfg.static_copies):
                tile_k = base + (k // rw1) * gx + k % rw1
                tiles.append(jnp.where(vis & (k < area), tile_k, T))
            tile_key = jnp.concatenate(tiles)
            qd = jnp.tile(qdepth, (rcfg.static_copies,))
            fields_rep = [jnp.tile(f.astype(jnp.float32), (rcfg.static_copies,))
                          for f in fields]
            return (jnp.sum(tile_key[::4097].astype(jnp.float32))
                    + jnp.sum(qd[::4097].astype(jnp.float32))
                    + sum(jnp.sum(f[::4097]) for f in fields_rep))
        tile_starts, attrs_t, nd = bin_pairs_lexsort_ch(
            ch, fields, gx, gy, ts, rcfg.static_copies, rcfg.overflow_budget,
            bf16_colors=rcfg.bf16_colors,
            packed_payloads=rcfg.packed_payloads,
            fused_sort_key=rcfg.fused_sort_key, rgb10=rcfg.rgb10_payloads)
        if stage == "bin":
            return jnp.sum(tile_starts[:8].astype(jnp.float32)) + attrs_t[0, 0]
        if stage == "bin_all":
            # consume EVERY sorted payload row: XLA's sort simplifier strips
            # operands whose outputs are unused, so the plain "bin" stage
            # under-counts — this stage is the honest pre-blend baseline
            return (jnp.sum(tile_starts[:8].astype(jnp.float32))
                    + jnp.sum(attrs_t[:, ::4097]))
        slack = rcfg.tile_capacity + CHUNK
        attrs_t = jnp.concatenate(
            [attrs_t, jnp.zeros((attrs_t.shape[0], slack), jnp.float32)], axis=1)
        fmt = ("packed_v3" if rcfg.packed_payloads and rcfg.rgb10_payloads
               else "packed_v2" if rcfg.packed_payloads
               else "bf16_colors" if rcfg.bf16_colors else "f32")
        accum, trans = pallas_blend(tile_starts, attrs_t, gx, gy, ts,
                                    max_k=rcfg.tile_capacity,
                                    payload_format=fmt,
                                    mxu_power=rcfg.blend_mxu_power)
        img = accum + trans[:, :, None] * bg[None, None, :]
        return jnp.sum(img[:4])

    prev = 0.0
    stages = os.environ.get(
        "PROF_STAGES",
        "decode,fields,pairs,bin,bin_all,full").split(",")
    for stage in stages:
        @jax.jit
        def stream(params, zs, sa, stage=stage):
            def body(i, acc):
                return acc + frame(params, zs[i], stage, sa)
            return jax.lax.fori_loop(0, ITERS, body, 0.0)

        sa = slab_arr if stage not in (
            "synth", "table", "table_q", "sample", "sample_full",
            "stagein_full", "stagein", "fused_in", "slab_vol") else None
        float(stream(params, zs, sa))
        t0 = time.perf_counter()
        float(stream(params, zs, sa))
        dt = (time.perf_counter() - t0) / ITERS * 1e3
        print(f"through {stage:8s}: {dt:7.2f} ms/frame   (delta {dt - prev:+7.2f})",
              flush=True)
        prev = dt


if __name__ == "__main__":
    main()
