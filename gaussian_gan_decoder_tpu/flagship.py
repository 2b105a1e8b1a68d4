"""Flagship model builders shared by bench.py / __graft_entry__.py / apps.

The flagship configuration mirrors the PanoHead easy-khair deployment the
reference decoder trains against (SURVEY §6: 512^2 targets, 500k gaussians,
tri-grid depth 3, 256^2 planes) — same network shapes, random init unless
ported weights are supplied.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .decoder.heads import GaussianDecoder
from .gaussians.cameras import make_camera
from .models.triplane import TriPlaneGenerator
from .splat.rasterize import RasterizeConfig, render_simple


def flagship_generator(variant: str = "panohead", img_resolution: int = 512) -> TriPlaneGenerator:
    # num_fp16_res=4 mirrors the reference deployment (bf16 blocks at the
    # top 4 resolutions; plane features already consumed as bf16 bricks)
    return TriPlaneGenerator(
        z_dim=512, c_dim=25, w_dim=512,
        img_resolution=img_resolution, img_channels=3,
        variant=variant, num_fp16_res=4, sr_num_fp16_res=4,
    )


def flagship_decoder(
    gen: Optional[TriPlaneGenerator] = None, hidden_dim: int = 128,
    bf16_sampling: bool = True, pallas_heads: bool = True,
    fused_sampling: Optional[bool] = None,
) -> GaussianDecoder:
    """bf16_sampling halves the tri-grid brick bytes (~10 ms/frame) at
    ~2^-8 relative feature error; pallas_heads runs the 5-head chain in
    one VMEM-resident kernel (57 ms -> a few ms). Both off = the pure
    XLA parity path."""
    return GaussianDecoder(
        generator=gen or flagship_generator(),
        decoder_type="sequential_reversed",
        hidden_dim=hidden_dim,
        bf16_sampling=bf16_sampling,
        # int8 bricks: 256B gather rows run ~1.7x faster than bf16 512B
        # rows (row-rate is byte-bound at the 280k-row flagship tables);
        # ~2^-7 relative feature error (error-budget test in
        # tests/test_neuralfield.py)
        int8_sampling=pallas_heads,
        pallas_heads=pallas_heads,
        heads_bf16=pallas_heads,
        pallas_sampling=pallas_heads,
        # polynomial GELU: 1.2e-4 max dev from exact erf, no VPU
        # transcendentals — the erf path costs 5.5 ms/frame in the chain
        gelu="poly" if pallas_heads else "exact",
        # gather-fused decode_project: the dequant+lerp+plane-mean move
        # into the heads kernel (see decoder/pallas_heads.py); default
        # OFF until hardware-measured (PERFORMANCE.md protocol)
        fused_sampling=bool(fused_sampling),
    )


def flagship_raster_config() -> RasterizeConfig:
    # decoder scales are tiny (exp(-softplus(s+5)-2.5) world units), so rect
    # areas are almost always 1-2 tiles: 2 structural copies + overflow lane
    return RasterizeConfig(
        # tile_capacity 640 (was 1024): blend cost is proportional to the
        # fixed-trip chunk loop. 640 measured 32.10/31.52 fps across two
        # sessions (vs 31.6 at 768, 30.49 at 1024 anchors) and its
        # quality gate reads 56.1 dB raster-isolated with rgb10 (>= 39
        # acceptance, r5 stage C 2026-08-20) — truncation at flagship
        # density is invisible. Denser scenes raise it.
        tile_size=16, max_pairs=2 ** 21, tile_capacity=640, chunk=64,
        # overflow demand measured ~96.4k pairs at copies=2 (area histogram
        # is {1: 47%, 2: 43%, 4: 10%}): 114688 = 19% headroom, n_dropped=0,
        # and trimming the budget from 2^17 measured +0.8 fps (r5 stage C,
        # 32.4 vs 31.6 at tile_cap 640; budget is pure allocation — with
        # zero drops the rendered image is bit-identical). Scenes denser
        # than the flagship template should raise it (n_dropped is
        # surfaced by bench.py and render aux).
        static_copies=2, overflow_budget=114688, bf16_colors=True,
        # packed_v2: int16 tile-local pixel coords + f16 conics + bf16
        # colors -> 2 keys + 5 sort payloads (vs 9 channels f32); error
        # budget validated by tests/test_fast_raster.py packed-v2 parity
        packed_payloads=True,
        # packed_v3 on top: rgb as ONE 10-bit-per-channel word -> 4 sort
        # payloads. Measured 31.577/31.136/31.117 fps across two sessions
        # vs 30.491 anchor (r5, 2026-08-20); CPU-interpret parity in
        # tests/test_fast_raster.py. BENCH_RGB10=0 reverts.
        rgb10_payloads=True,
        # fused uint32 sort key (tile<<21 | depth>>11): ONE key operand,
        # 2^-12 relative depth resolution. Measured +0.85 fps on the slab
        # path (29.6 -> 30.5, r4 sweep 2026-08-19); closeness test
        # test_fast_raster.test_fused_sort_key_close
        fused_sort_key=True,
        # blend_mxu_power stays OFF: 29.089 fps alone vs 30.491 anchor
        # (r5 stage B row 4) — the quadratic-basis MXU falloff loses to
        # the fused VPU transcendental at this tile occupancy
    )


def default_camera_params(fov_deg: float = 13.0, dtype=jnp.float32) -> Tuple[jax.Array, jax.Array]:
    """Frontal orbit camera -> (camera_params (1,25), cam2world (4,4))."""
    cam2world = np.eye(4, dtype=np.float32)
    cam2world[:3, :3] = np.diag([-1.0, 1.0, -1.0])
    cam2world[2, 3] = 2.7
    focal = 1.0 / (2.0 * np.tan(np.deg2rad(fov_deg) / 2))
    intr = np.array([[focal, 0, 0.5], [0, focal, 0.5], [0, 0, 1]], np.float32)
    cp = jnp.asarray(np.concatenate([cam2world.reshape(-1), intr.reshape(-1)])[None], dtype)
    return cp, jnp.asarray(cam2world, dtype)


def decode_and_render_stream(
    decoder: GaussianDecoder,
    params,
    zs: jax.Array,               # (F, 1, z_dim) latent stream
    camera_params: jax.Array,
    cam2world: jax.Array,
    init_position: jax.Array,
    fov,
    image_size: int = 512,
    bg=(0.55717, 0.52256, 0.51045),
    raster_cfg: Optional[RasterizeConfig] = None,
    truncation_psi: float = 1.0,
    frame_batch: int = 4,
    slab_ctx=None,
):
    """Decode+render F frames with the BACKBONE batched frame_batch at a
    time (mapping + 256^2 synthesis at batch 1 runs the MXU at a few
    percent utilization; batching amortizes it) while the memory-heavy
    per-frame tail (brick table -> gather -> heads -> binning -> blend)
    runs sequentially under lax.map so peak HBM stays single-frame.

    slab_ctx (decoder.make_slab_context output) switches the per-frame
    tail to the slab-gather kernel. NOTE: its large static arrays (wzy is
    ~440 MB at flagship) must reach the surrounding jit as ARGUMENTS, not
    closure constants — the tunnel compile-helper chokes serialising
    constant-embedded HLO.

    -> (F, 3, H, W) frames. Requires the Pallas fast path."""
    assert decoder.pallas_heads, "stream path uses the fused kernel"
    from .splat.fast_raster import render_rows

    F = zs.shape[0]
    assert F % frame_batch == 0, (F, frame_batch)
    cam = make_camera(image_size, jnp.asarray(fov), cam2world)
    cfg = raster_cfg or flagship_raster_config()
    bgv = jnp.asarray(bg, jnp.float32)
    M = init_position.shape[0]

    cp_b = jnp.tile(camera_params, (frame_batch, 1))

    def group(zb):                       # (frame_batch, 1, z_dim)
        planes, _ = decoder.synthesize_planes(
            params, zb[:, 0, :], cp_b, truncation_psi)

        def one(pl_1):
            rows, layout = decoder.decode_project(
                params, pl_1[None], init_position, cam, slab_ctx=slab_ctx)
            out = render_rows(cam, rows, layout, M, bg=bgv, config=cfg)
            return out["render"][:3]

        return jax.lax.map(one, planes)

    zg = zs.reshape(F // frame_batch, frame_batch, 1, zs.shape[-1])
    return jax.lax.map(group, zg).reshape(F, 3, image_size, image_size)


def decode_and_render(
    decoder: GaussianDecoder,
    params,
    z: jax.Array,
    camera_params: jax.Array,
    cam2world: jax.Array,
    init_position: jax.Array,
    fov: float | jax.Array,
    image_size: int = 512,
    bg=(0.55717, 0.52256, 0.51045),
    raster_cfg: Optional[RasterizeConfig] = None,
    truncation_psi: float = 1.0,
    backend: str = "xla",
    return_aux: bool = False,
    slab_ctx=None,
):
    """The real-time editing hot path: latent -> gaussians -> 512^2 frame
    (ref load_decoder.render_with_decoder, main/load_decoder.py:12-26).

    return_aux=True additionally returns the raw rasterizer output dict —
    callers on the deploy path should watch aux["n_dropped"] (tile pairs
    lost to overflow_budget exhaustion => popping/holes in renders)."""
    cam = make_camera(image_size, jnp.asarray(fov), cam2world)
    cfg = raster_cfg or flagship_raster_config()
    if backend == "pallas" and decoder.pallas_heads:
        # fused decoder+projection kernel -> channel-major rows; the
        # rasterizer only bins and blends (splat/fast_raster.render_rows)
        from .splat.fast_raster import render_rows
        from .utils import EasyDict

        planes, _ = decoder.synthesize_planes(
            params, z, camera_params, truncation_psi)
        rows, layout = decoder.decode_project(
            params, planes, init_position, cam, slab_ctx=slab_ctx)
        out = render_rows(
            cam, rows, layout, init_position.shape[0],
            bg=jnp.asarray(bg, jnp.float32), config=cfg,
        )
        M = init_position.shape[0]
        if slab_ctx is not None:
            # slab rows are in packed/permuted slot order — map back
            r16 = rows[:16, :][:, slab_ctx.inv_slot]
            decoded = EasyDict({
                name: r16[c:c + d].T for name, (c, d) in layout.items()
            })
            # aux radii/visibility_filter come out of render_rows sliced
            # [:n_points] in SLOT order (pad slots included) — rebuild
            # them from the full Mpad rows in template order so they stay
            # consistent with `decoded`
            from .decoder.pallas_heads import PROJ_ROWS

            out["radii"] = (rows[PROJ_ROWS["radius_f"]][slab_ctx.inv_slot]
                            .astype(jnp.int32))
            out["visibility_filter"] = (
                rows[PROJ_ROWS["visible"]] > 0.5)[slab_ctx.inv_slot]
        else:
            decoded = EasyDict({
                name: rows[c:c + d, :M].T for name, (c, d) in layout.items()
            })
        if return_aux:
            return out["render"][:3], decoded, out
        return out["render"][:3], decoded
    decoded = decoder.apply(params, z, camera_params, init_position, truncation_psi)
    out = render_simple(
        cam, decoded, bg=jnp.asarray(bg, jnp.float32),
        config=cfg,
        backend=backend,
    )
    if return_aux:
        return out["render"][:3], decoded, out
    return out["render"][:3], decoded
