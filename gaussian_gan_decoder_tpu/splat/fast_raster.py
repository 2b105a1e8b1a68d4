"""Fast TPU rasterization path: gather-free binning + Pallas blend.

The generic path (rasterize.py) builds a dense (tiles, capacity) index
matrix and blends with an XLA scan — fully differentiable, runs anywhere,
but pays for index gathers and HBM round-trips of (tiles x chunk x pixels)
intermediates. This module is the speed-of-light forward for inference /
real-time editing (BASELINE config #5):

  * CHANNEL-MAJOR throughout: every per-gaussian quantity is a 1-D (N,)
    vector. (N, small-k) arrays are poison on TPU — the tiled layout pads
    the minor dim to 128 lanes, so a fusion iterating over (N, 3) wastes
    125/128 of every VPU pass (measured 20-30 ms per stage at N=500k);
  * duplication by STATIC COPIES: gaussian attributes are replicated
    `static_copies` times structurally (concat — streams, no gather), one
    copy per potential rect cell; rare large gaussians (rect area >
    static_copies) spill into a dynamic overflow lane that pays ONE
    packed gather;
  * ONE lexicographic `lax.sort` by (tile, depth-bits) carries the 9 live
    attribute channels into per-tile depth order — TPU variadic sorts
    move payloads at streaming bandwidth where index gathers cost
    ~13ns/row;
  * depth ordering uses the IEEE-754 trick: positive f32 depths compare
    identically as int32 bit patterns (the CUDA rasterizer's 64-bit
    tile|depth radix key, ref N1);
  * per-tile segment blending happens in VMEM (pallas_blend.py).
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..gaussians.cameras import Camera
from ..gaussians.sh import SH_C0, sh_to_color
from .pallas_blend import CHUNK, ROW, pallas_blend
from .projection import project_channels
from .rasterize import RasterizeConfig


def _expand_ids(counts, budget):
    """Overflow-lane id expansion: slot p -> the gaussian i owning it
    (offs[i] <= p < offs[i]+counts[i]), exactly `jnp.repeat(arange(N),
    counts, total_repeat_length=budget)` — but via ONE merge-sort
    (searchsorted method='sort') instead of repeat's scatter+gather
    lowering. The scatter of N ones into the budget lane measured ~6 ms
    at flagship (500k counts -> 2^17 slots); the (N+budget)-row sort
    runs at streaming bandwidth (~1 ms). Returns (ids, offs, over_total);
    slots past over_total hold N-1 — a finite garbage row exactly like
    repeat's trailing pad (id N would make jnp.take's default 'fill' mode
    emit NaN rows, and the blend kernel's masked-by-multiply reads turn
    NaN * 0 into NaN)."""
    cum = jnp.cumsum(counts)
    offs = cum - counts
    ids = jnp.searchsorted(
        cum, jnp.arange(budget, dtype=counts.dtype), side="right",
        method="sort",
    ).astype(jnp.int32)
    return jnp.minimum(ids, counts.shape[0] - 1), offs, cum[-1]


def _tile_rects_ch(px, py, radius_f, grid_x, grid_y, tile_size):
    """CUDA getRect on channel vectors: clamped tile spans."""
    x0 = jnp.clip(((px - radius_f) / tile_size).astype(jnp.int32), 0, grid_x)
    y0 = jnp.clip(((py - radius_f) / tile_size).astype(jnp.int32), 0, grid_y)
    x1 = jnp.clip(((px + radius_f + tile_size - 1) / tile_size).astype(jnp.int32), 0, grid_x)
    y1 = jnp.clip(((py + radius_f + tile_size - 1) / tile_size).astype(jnp.int32), 0, grid_y)
    return x0, y0, jnp.maximum(x1 - x0, 0), jnp.maximum(y1 - y0, 0)


def build_pairs_ch(
    ch: Dict[str, jax.Array],          # project_channels output
    fields,                            # 9 (N,) payload channels (blend ROW order)
    grid_x: int, grid_y: int, tile_size: int,
    static_copies: int = 4, overflow_budget: int = 2 ** 17,
):
    """-> (tile_key (Ptot,), qd (Ptot,), fields_rep [9 x (Ptot,)], n_dropped).

    Pre-sort pair construction on 1-D channel vectors; the overflow lane
    pays ONE packed (N, 13) gather — measured FASTER than 13 narrow 1-D
    takes (96 vs 102 ms/frame): per-row gather cost dominates, so fewer
    wider rows win even though building the row-major pack relayouts."""
    fields = [f.astype(jnp.float32) for f in fields]
    N = fields[0].shape[0]
    T = grid_x * grid_y
    x0, y0, rw, rh = _tile_rects_ch(
        ch["px"].astype(jnp.float32), ch["py"].astype(jnp.float32),
        ch["radius_f"].astype(jnp.float32), grid_x, grid_y, tile_size
    )
    area = rw * rh
    vis = ch["visible"] & (area > 0)
    # positive f32 bit pattern sorts like the float (depth > 0.2 after cull)
    depth_pos = jnp.maximum(ch["depth"], 1e-6).astype(jnp.float32)
    qdepth = jax.lax.bitcast_convert_type(depth_pos, jnp.int32)

    # -- static copies: copy k covers rect cell (k // rw, k % rw) ------------
    rw1 = jnp.maximum(rw, 1)
    base = y0 * grid_x + x0                                  # (N,) first tile
    tiles = []
    for k in range(static_copies):
        cy = k // rw1
        cx = k % rw1
        tile_k = base + cy * grid_x + cx
        valid_k = vis & (k < area)
        tiles.append(jnp.where(valid_k, tile_k, T))
    tile_key = jnp.concatenate(tiles)                        # (C*N,)
    qd = jnp.tile(qdepth, (static_copies,))
    fields_rep = [jnp.tile(f, (static_copies,)) for f in fields]

    # -- overflow lane for rect area > static_copies --------------------------
    # ONE packed gather for all per-gaussian quantities (13 separate narrow
    # takes measured ~5 ms slower — per-row cost dominates gather time)
    counts_over = jnp.where(vis, jnp.maximum(area - static_copies, 0), 0)
    ids, offs, over_total = _expand_ids(counts_over, overflow_budget)
    n_dropped = jnp.maximum(0, over_total - overflow_budget)
    # small ints and offsets are exact in f32 (< 2^24); depth rides as f32
    pack = jnp.stack(
        [base.astype(jnp.float32), rw1.astype(jnp.float32),
         offs.astype(jnp.float32), depth_pos] + list(fields),
        axis=1,
    )  # (N, 13)
    rows = jnp.take(pack, ids, axis=0)  # (overflow_budget, 13)
    pos = jnp.arange(overflow_budget, dtype=jnp.int32)
    cell = static_copies + (pos - rows[:, 2].astype(jnp.int32))
    rw_o = rows[:, 1].astype(jnp.int32)
    tile_o = rows[:, 0].astype(jnp.int32) + (cell // rw_o) * grid_x + cell % rw_o
    valid_o = pos < over_total
    tile_key = jnp.concatenate([tile_key, jnp.where(valid_o, tile_o, T)])
    qd = jnp.concatenate(
        [qd, jax.lax.bitcast_convert_type(rows[:, 3], jnp.int32)]
    )
    fields_rep = [
        jnp.concatenate([fr, rows[:, 4 + i]]) for i, fr in enumerate(fields_rep)
    ]
    return tile_key, qd, fields_rep, n_dropped


@jax.custom_vjp
def _sort_pairs(tile_key, qd, fields):
    """lax.sort by (tile, depth) carrying the payload fields, with a cheap
    VJP: autodiff through lax.sort scatters each payload cotangent through
    the permutation (9 separate ~1M-row scatters, measured ~80 ms/frame);
    routing a permutation's cotangents is itself a permutation, so the
    backward is ONE more variadic sort keyed by the saved original
    positions (~8 ms)."""
    return tuple(jax.lax.sort([tile_key, qd] + list(fields), num_keys=2))


def _sort_pairs_fwd(tile_key, qd, fields):
    pos = jnp.arange(tile_key.shape[0], dtype=jnp.int32)
    ops = jax.lax.sort([tile_key, qd, pos] + list(fields), num_keys=2)
    out = (ops[0], ops[1]) + tuple(ops[3:])
    return out, ops[2]


def _sort_pairs_bwd(pos, cts):
    import numpy as np

    f0 = lambda a: np.zeros(a.shape, jax.dtypes.float0)  # noqa: E731
    d_fields = jax.lax.sort([pos] + [jnp.asarray(c) for c in cts[2:]],
                            num_keys=1)[1:]
    return (f0(pos), f0(pos), tuple(d_fields))


_sort_pairs.defvjp(_sort_pairs_fwd, _sort_pairs_bwd)


def _sort_pairs_fused(fkey, fields):
    """Single-key variant (fused uint32 tile|depth key; fwd-only path)."""
    return tuple(jax.lax.sort([fkey] + list(fields), num_keys=1))



def _bf16_pack_pair(a, b):
    """Two f32 vectors -> one f32-bitcast word of (bf16(a) | bf16(b)):
    a in the high 16 bits, b in the low. Round-half-up via +0x8000."""
    def bits(v):
        return (jax.lax.bitcast_convert_type(v.astype(jnp.float32), jnp.int32)
                + 0x8000)
    hi = bits(a) & jnp.int32(-65536)
    lo = (bits(b) >> 16) & jnp.int32(0xFFFF)
    return jax.lax.bitcast_convert_type(hi | lo, jnp.float32)


# fixed-point step for packed tile-local pixel coords: 1/32 px resolution,
# +-1024 px range (see _i16_pack_pair)
PXY_SCALE = 32.0

# conic f16 pre-scale: f16 normals cover [6.1e-5, 65504]; conic entries lie
# in (0, ~3.4] (EWA dilation bounds eigenvalues by 1/0.3) but flat giants
# reach ~1e-6 — scaling by 2^12 shifts the representable window to
# [1.5e-8, 16], so no flagship conic ever lands subnormal
CONIC_SCALE = 4096.0


def _i16_pack_pair(a, b, scale=PXY_SCALE):
    """Two f32 vectors -> one f32-bitcast word of two int16 fixed-point
    values (a high, b low), step 1/scale. Range +-(32767/scale)."""
    ai = jnp.clip(jnp.round(a * scale), -32767, 32767).astype(jnp.int32)
    bi = jnp.clip(jnp.round(b * scale), -32767, 32767).astype(jnp.int32)
    return jax.lax.bitcast_convert_type((ai << 16) | (bi & 0xFFFF), jnp.float32)


def _f16_pack_pair(a, b, scale=CONIC_SCALE):
    """Two f32 vectors -> one f32-bitcast word of two IEEE-half values of
    (x * scale) (a high, b low). Manual encode — the blend kernel decodes
    with integer ops only (Mosaic has no f16 compute), folding the inverse
    scale into the exponent re-bias. Subnormals flush to zero."""
    def half_bits(x):
        y = jnp.clip(x * scale, -65504.0, 65504.0)
        bjj = jax.lax.bitcast_convert_type(y.astype(jnp.float32), jnp.int32)
        s = (bjj >> 16) & 0x8000
        babs = (bjj & 0x7FFFFFFF) + 0x1000        # round-half-up at bit 13
        e = (babs >> 23) - 112                    # f16 exponent
        m = (babs >> 13) & 0x3FF
        bits = jnp.where(e <= 0, 0, (e << 10) | m)
        bits = jnp.where(e >= 31, 0x7BFF, bits)   # clamp to max finite
        return s | bits
    return jax.lax.bitcast_convert_type(
        (half_bits(a) << 16) | half_bits(b), jnp.float32)


RGB10_SCALE = 256.0   # packed_v3 color step 1/256 over [0, 1023/256)


def _rgb10_pack(r, g, b):
    """Three color channels -> one word of 10-bit fixed point each
    (r high, b low), step 1/RGB10_SCALE. Colors are clamp(SH_C0*c+0.5, 0)
    — non-negative, almost always < 2; the 1/256 step equals the 8-bit
    output quantization (quality bound: ~64 dB color-noise floor, far
    above the 39 dB acceptance — measured in tests/test_fast_raster)."""
    def q(v):
        return jnp.clip(jnp.round(v * RGB10_SCALE), 0, 1023).astype(jnp.int32)
    return jax.lax.bitcast_convert_type(
        (q(r) << 20) | (q(g) << 10) | q(b), jnp.float32)


def build_pairs_packed(
    ch: Dict[str, jax.Array],          # project_channels output
    fields,                            # 9 (N,) payload channels (blend ROW order)
    grid_x: int, grid_y: int, tile_size: int,
    static_copies: int = 2, overflow_budget: int = 2 ** 17,
    rgb10: bool = False,
):
    """Packed-payload pair construction: 5 payload words per pair instead
    of 9 f32 channels (sort traffic and replication traffic both shrink):

      0  pxl|pyl  int16 fixed-point (1/32 px), LOCAL to the pair's tile
      1  ca|cb    f16 pairs of conic*4096
      2  cc       f32
      3  r|g      bf16 pair
      4  b|op     bf16 pair

    Tile-local pixel coords let 16 bits carry f32-grade precision (the
    blend kernel subtracts its own tile origin from nothing — it uses the
    local pixel iota directly). Packing happens BEFORE replication, so the
    static copies stream 5 channels, not 9, and the overflow gather rows
    are 10 wide, not 13.

    rgb10=True (packed_v3) narrows to 4 words: word 2 becomes cc|op (f16
    pair, same *4096 pre-scale) and word 3 one rgb 10-bit fixed-point
    word (_rgb10_pack); overflow rows are 9 wide."""
    px, py, ca, cb, cc, op, r, g, b = [f.astype(jnp.float32) for f in fields]
    N = px.shape[0]
    T = grid_x * grid_y
    x0, y0, rw, rh = _tile_rects_ch(
        ch["px"].astype(jnp.float32), ch["py"].astype(jnp.float32),
        ch["radius_f"].astype(jnp.float32), grid_x, grid_y, tile_size
    )
    area = rw * rh
    vis = ch["visible"] & (area > 0)
    depth_pos = jnp.maximum(ch["depth"], 1e-6).astype(jnp.float32)
    qdepth = jax.lax.bitcast_convert_type(depth_pos, jnp.int32)

    w_cacb = _f16_pack_pair(ca, cb)
    if rgb10:
        # 4 payload words: cc rides with opacity (both f16 *4096); rgb in
        # ONE 10-bit fixed-point word
        tail_words = [_f16_pack_pair(cc, op), _rgb10_pack(r, g, b)]
    else:
        tail_words = [cc, _bf16_pack_pair(r, g), _bf16_pack_pair(b, op)]

    # -- static copies --------------------------------------------------------
    rw1 = jnp.maximum(rw, 1)
    base = y0 * grid_x + x0
    tiles, pxys = [], []
    for k in range(static_copies):
        cy = k // rw1
        cx = k % rw1
        tile_k = base + cy * grid_x + cx
        valid_k = vis & (k < area)
        tiles.append(jnp.where(valid_k, tile_k, T))
        txk = ((x0 + cx) * tile_size).astype(jnp.float32)
        tyk = ((y0 + cy) * tile_size).astype(jnp.float32)
        pxys.append(_i16_pack_pair(px - txk, py - tyk))
    tile_key = jnp.concatenate(tiles)
    qd = jnp.tile(qdepth, (static_copies,))
    f_pxy = jnp.concatenate(pxys)
    f_cacb = jnp.tile(w_cacb, (static_copies,))
    f_tail = [jnp.tile(w, (static_copies,)) for w in tail_words]

    # -- overflow lane --------------------------------------------------------
    counts_over = jnp.where(vis, jnp.maximum(area - static_copies, 0), 0)
    ids, offs, over_total = _expand_ids(counts_over, overflow_budget)
    n_dropped = jnp.maximum(0, over_total - overflow_budget)
    pack = jnp.stack(
        [base.astype(jnp.float32), rw1.astype(jnp.float32),
         offs.astype(jnp.float32), depth_pos, px, py, w_cacb] + tail_words,
        axis=1,
    )  # (N, 10) / (N, 9) with rgb10
    rows = jnp.take(pack, ids, axis=0)
    pos = jnp.arange(overflow_budget, dtype=jnp.int32)
    cell = static_copies + (pos - rows[:, 2].astype(jnp.int32))
    rw_o = rows[:, 1].astype(jnp.int32)
    base_o = rows[:, 0].astype(jnp.int32)
    tile_o = base_o + (cell // rw_o) * grid_x + cell % rw_o
    txo = ((tile_o % grid_x) * tile_size).astype(jnp.float32)
    tyo = ((tile_o // grid_x) * tile_size).astype(jnp.float32)
    valid_o = pos < over_total
    tile_key = jnp.concatenate([tile_key, jnp.where(valid_o, tile_o, T)])
    qd = jnp.concatenate(
        [qd, jax.lax.bitcast_convert_type(rows[:, 3], jnp.int32)]
    )
    f_pxy = jnp.concatenate(
        [f_pxy, _i16_pack_pair(rows[:, 4] - txo, rows[:, 5] - tyo)])
    f_cacb = jnp.concatenate([f_cacb, rows[:, 6]])
    f_tail = [jnp.concatenate([ft, rows[:, 7 + i]])
              for i, ft in enumerate(f_tail)]
    return tile_key, qd, [f_pxy, f_cacb] + f_tail, n_dropped


def _build_pairs_any(
    ch, fields, grid_x, grid_y, tile_size,
    static_copies, overflow_budget, bf16_colors, packed_payloads,
    rgb10=False,
):
    """Pair construction shared by the replicated binning
    (bin_pairs_lexsort_ch) and the tile-sharded multi-chip binning
    (parallel/render.py): -> (tile_key, qd, fields_rep, n_rows, n_dropped)
    with the payload packing applied per the config flags."""
    if packed_payloads:
        tile_key, qd, fields_rep, n_dropped = build_pairs_packed(
            ch, fields, grid_x, grid_y, tile_size, static_copies,
            overflow_budget, rgb10=rgb10)
        return tile_key, qd, fields_rep, 8, n_dropped
    tile_key, qd, fields_rep, n_dropped = build_pairs_ch(
        ch, fields, grid_x, grid_y, tile_size, static_copies,
        overflow_budget)
    if bf16_colors:
        fields_rep = fields_rep[:5] + [
            _bf16_pack_pair(fields_rep[6], fields_rep[7]),   # r | g
            _bf16_pack_pair(fields_rep[8], fields_rep[5]),   # b | opacity
        ]
        return tile_key, qd, fields_rep, 8, n_dropped
    return tile_key, qd, fields_rep, ROW, n_dropped


def bin_pairs_lexsort_ch(
    ch: Dict[str, jax.Array],          # project_channels output
    fields,                            # 9 (N,) payload channels (blend ROW order)
    grid_x: int, grid_y: int, tile_size: int,
    static_copies: int = 4, overflow_budget: int = 2 ** 17,
    bf16_colors: bool = False, packed_payloads: bool = False,
    fused_sort_key: bool = False, rgb10: bool = False,
):
    """-> (tile_starts (T+2,), sorted_attrs (n_rows, Ptot), n_dropped).

    n_rows = ROW (9 live f32 fields), 8 when bf16_colors packs (r,g)
    and (b,opacity) into bf16 pairs (7 sort payloads), or 8 with 5 live
    rows when packed_payloads packs everything (build_pairs_packed) — the
    fastest sort (2 keys + 5 payloads; 1 fused uint32 key + 5 with
    fused_sort_key, 4 with rgb10 — see RasterizeConfig)."""
    T = grid_x * grid_y
    tile_key, qd, fields_rep, n_rows, n_dropped = _build_pairs_any(
        ch, fields, grid_x, grid_y, tile_size, static_copies,
        overflow_budget, bf16_colors, packed_payloads, rgb10=rgb10)
    if packed_payloads:
        if fused_sort_key:
            # tile fits 11 bits (T <= 1024 incl. the T sentinel); keep the
            # top 21 bits of the positive-f32 depth pattern (sign+exp+12
            # mantissa => 2^-12 relative depth resolution)
            fkey = ((tile_key.astype(jnp.uint32) << 21)
                    | (qd.astype(jnp.uint32) >> 11))
            sorted_ops = _sort_pairs_fused(fkey, tuple(fields_rep))
            sorted_tile = (sorted_ops[0] >> 21).astype(jnp.int32)
            ptot = sorted_tile.shape[0]
            sorted_attrs_t = jnp.concatenate(
                [jnp.stack(sorted_ops[1:], axis=0),
                 jnp.zeros((n_rows - len(fields_rep), ptot), jnp.float32)],
                axis=0,
            )
            tile_starts = jnp.searchsorted(
                sorted_tile, jnp.arange(T + 1, dtype=jnp.int32)
            ).astype(jnp.int32)
            return tile_starts, sorted_attrs_t, n_dropped

    # -- one lexicographic sort: (tile, depth-bits) + the live payloads -------
    sorted_ops = _sort_pairs(tile_key, qd, tuple(fields_rep))
    sorted_tile = sorted_ops[0]
    # field-major directly (the blend kernel's DMA layout) — no transpose;
    # dead row padding appended post-sort
    ptot = sorted_tile.shape[0]
    sorted_attrs_t = jnp.concatenate(
        [jnp.stack(sorted_ops[2:], axis=0),
         jnp.zeros((n_rows - len(fields_rep), ptot), jnp.float32)],
        axis=0,
    )  # (n_rows, Ptot)

    tile_starts = jnp.searchsorted(
        sorted_tile, jnp.arange(T + 1, dtype=jnp.int32)
    ).astype(jnp.int32)
    return tile_starts, sorted_attrs_t, n_dropped


def _blend_and_assemble(tile_starts, attrs_t, grid_x, grid_y, ts, bg, config,
                        interpret=None, differentiable=False):
    slack = config.tile_capacity + CHUNK
    attrs_t = jnp.concatenate(
        [attrs_t, jnp.zeros((attrs_t.shape[0], slack), jnp.float32)], axis=1
    )
    if differentiable:
        from .pallas_blend import pallas_blend_diff

        # the training kernel reads unpacked f32 rows; rasterize_fast
        # disables the packed formats in binning when differentiable=True
        accum, trans = pallas_blend_diff(
            tile_starts, attrs_t, grid_x, grid_y, ts,
            config.tile_capacity, interpret,
        )
    else:
        fmt = ("packed_v3" if config.packed_payloads and config.rgb10_payloads
               else "packed_v2" if config.packed_payloads
               else "bf16_colors" if config.bf16_colors else "f32")
        # (packed formats are only produced on the non-differentiable path)
        accum, trans = pallas_blend(
            tile_starts, attrs_t, grid_x, grid_y, ts,
            max_k=config.tile_capacity, interpret=interpret,
            payload_format=fmt,
            mxu_power=config.blend_mxu_power and config.packed_payloads,
        )
    H, W = grid_y * ts, grid_x * ts
    img = accum + trans[:, :, None] * bg[None, None, :]
    img = img.reshape(grid_y, grid_x, ts, ts, 3)
    img = jnp.transpose(img, (0, 2, 1, 3, 4)).reshape(H, W, 3)
    alpha_img = (1.0 - trans).reshape(grid_y, grid_x, ts, ts)
    alpha_img = jnp.transpose(alpha_img, (0, 2, 1, 3)).reshape(H, W)
    return img, alpha_img


def render_packed(
    cam: Camera,
    out16: jax.Array,         # (Mpad, 16) packed raw head outputs
    layout: Dict[str, tuple],  # name -> (col, dim); scale pre-activated
    n_points: int,
    bg: jax.Array,
    config: RasterizeConfig = RasterizeConfig(),
    interpret: bool | None = None,
) -> Dict[str, jax.Array]:
    """Flagship hot path: decoder's packed output -> frame.

    ONE transpose turns the (Mpad, 16) head output into 16 clean channel
    vectors; everything downstream stays 1-D. Rows >= n_points are padding
    from the heads kernel and are culled via the visibility mask.
    """
    H, W = cam.image_height, cam.image_width
    ts = config.tile_size
    grid_x, grid_y = W // ts, H // ts
    o = out16.T  # (16, Mpad) — the single relayout
    Mpad = o.shape[1]

    c0, _ = layout["color"]
    op0, _ = layout["opacity"]
    r0, _ = layout["rotation"]
    s0, _ = layout["scale"]
    x0, _ = layout["xyz"]

    ch = project_channels(
        cam, o[x0], o[x0 + 1], o[x0 + 2],
        (o[r0], o[r0 + 1], o[r0 + 2], o[r0 + 3]),
        (jnp.exp(o[s0]), jnp.exp(o[s0 + 1]), jnp.exp(o[s0 + 2])),
    )
    valid = jnp.arange(Mpad, dtype=jnp.int32) < n_points
    ch["visible"] = ch["visible"] & valid

    opac = jax.nn.sigmoid(o[op0])
    # degree-0 SH -> rgb (CUDA computeColorFromSH: C0*c + 0.5, clamp >= 0)
    cols = [jnp.maximum(SH_C0 * o[c0 + i] + 0.5, 0.0) for i in range(3)]

    fields = [ch["px"], ch["py"], ch["conic_a"], ch["conic_b"], ch["conic_c"],
              opac] + cols
    # materialize the channel vectors ONCE: without the barrier XLA fuses
    # the (Mpad,16) transpose + projection math into each of the ~11
    # tile/concat consumers in pair building, re-reading the lane-padded
    # 256 MB transpose input every time (measured +19 ms in pairs alone)
    ch, fields = jax.lax.optimization_barrier((ch, fields))
    tile_starts, attrs_t, n_dropped = bin_pairs_lexsort_ch(
        ch, fields, grid_x, grid_y, ts,
        config.static_copies, config.overflow_budget,
        bf16_colors=config.bf16_colors, packed_payloads=config.packed_payloads,
        fused_sort_key=config.fused_sort_key, rgb10=config.rgb10_payloads,
    )
    img, alpha_img = _blend_and_assemble(
        tile_starts, attrs_t, grid_x, grid_y, ts, bg, config, interpret
    )
    return {
        "render": jnp.transpose(img, (2, 0, 1)),
        "alpha": alpha_img[None],
        "radii": ch["radius_f"][:n_points].astype(jnp.int32),
        "visibility_filter": ch["visible"][:n_points],
        "n_dropped": n_dropped,
    }


def bin_pairs_lexsort(
    proj, attrs, grid_x: int, grid_y: int, tile_size: int,
    static_copies: int = 4, overflow_budget: int = 2 ** 17,
):
    """Row-major compatibility wrapper over bin_pairs_lexsort_ch.

    proj: ProjectedGaussians; attrs: (N, 9) packed payload columns."""
    ch = dict(
        px=proj.pix_xy[:, 0], py=proj.pix_xy[:, 1], depth=proj.depth,
        radius_f=proj.radius.astype(jnp.float32), visible=proj.visible,
    )
    fields = [attrs[:, i] for i in range(attrs.shape[1])]
    return bin_pairs_lexsort_ch(
        ch, fields, grid_x, grid_y, tile_size, static_copies, overflow_budget
    )


def rasterize_fast(
    cam: Camera,
    means3d: jax.Array,
    scales: jax.Array,
    rotations: jax.Array,
    opacities: jax.Array,
    colors_precomp: Optional[jax.Array] = None,
    shs: Optional[jax.Array] = None,
    sh_degree: int = 0,
    bg: Optional[jax.Array] = None,
    scale_modifier: float = 1.0,
    config: RasterizeConfig = RasterizeConfig(),
    static_copies: Optional[int] = None,
    overflow_budget: Optional[int] = None,
    interpret: bool | None = None,
    differentiable: bool = False,
) -> Dict[str, jax.Array]:
    """Fast tiled rasterizer (Pallas blend). Same outputs as rasterize().

    differentiable=True swaps in the custom-VJP blend (pallas_blend_diff,
    the CUDA backward analogue) — gradients flow to every input through
    the binning sort; requires bf16_colors off."""
    H, W = cam.image_height, cam.image_width
    ts = config.tile_size
    grid_x, grid_y = W // ts, H // ts
    if opacities.ndim == 2:
        opacities = opacities[:, 0]
    if bg is None:
        bg = jnp.zeros((3,), jnp.float32)

    ch = project_channels(
        cam, means3d[:, 0], means3d[:, 1], means3d[:, 2],
        (rotations[:, 0], rotations[:, 1], rotations[:, 2], rotations[:, 3]),
        (scales[:, 0] * scale_modifier, scales[:, 1] * scale_modifier,
         scales[:, 2] * scale_modifier),
    )
    if colors_precomp is None:
        colors = sh_to_color(
            sh_degree, jnp.swapaxes(shs, 1, 2), means3d, cam.camera_center
        )
    else:
        colors = colors_precomp

    fields = [ch["px"], ch["py"], ch["conic_a"], ch["conic_b"], ch["conic_c"],
              opacities, colors[:, 0], colors[:, 1], colors[:, 2]]
    tile_starts, attrs_t, n_dropped = bin_pairs_lexsort_ch(
        ch, fields, grid_x, grid_y, ts,
        static_copies if static_copies is not None else config.static_copies,
        overflow_budget if overflow_budget is not None else config.overflow_budget,
        bf16_colors=config.bf16_colors and not differentiable,
        packed_payloads=config.packed_payloads and not differentiable,
        fused_sort_key=config.fused_sort_key and not differentiable,
        rgb10=config.rgb10_payloads and not differentiable,
    )
    img, alpha_img = _blend_and_assemble(
        tile_starts, attrs_t, grid_x, grid_y, ts, bg, config, interpret,
        differentiable=differentiable,
    )
    return {
        "render": jnp.transpose(img, (2, 0, 1)),
        "alpha": alpha_img[None],
        "radii": ch["radius_f"].astype(jnp.int32),
        "visibility_filter": ch["visible"],
        "n_dropped": n_dropped,
    }


def render_rows(
    cam: Camera,
    rows: jax.Array,           # (NROWS, Mpad) decode_project_pallas output
    layout: Dict[str, tuple],  # name -> (col, dim) inside rows[0:16]
    n_points: int,
    bg: jax.Array,
    config: RasterizeConfig = RasterizeConfig(),
    interpret: bool | None = None,
) -> Dict[str, jax.Array]:
    """Flagship hot path v2: fused decoder+projection rows -> frame.

    The kernel already emitted every per-gaussian quantity channel-major
    (decoder/pallas_heads.py PROJ_ROWS) — this is just binning + blend."""
    from ..decoder.pallas_heads import PROJ_ROWS

    H, W = cam.image_height, cam.image_width
    ts = config.tile_size
    grid_x, grid_y = W // ts, H // ts

    r = {k: rows[v] for k, v in PROJ_ROWS.items()}
    ch = dict(
        px=r["px"], py=r["py"], depth=r["depth"],
        radius_f=r["radius_f"], visible=r["visible"] > 0.5,
    )
    fields = [r["px"], r["py"], r["conic_a"], r["conic_b"], r["conic_c"],
              r["opac"], r["col_r"], r["col_g"], r["col_b"]]
    # materialize once — see render_packed note on producer re-fusion
    ch, fields = jax.lax.optimization_barrier((ch, fields))
    tile_starts, attrs_t, n_dropped = bin_pairs_lexsort_ch(
        ch, fields, grid_x, grid_y, ts,
        config.static_copies, config.overflow_budget,
        bf16_colors=config.bf16_colors, packed_payloads=config.packed_payloads,
        fused_sort_key=config.fused_sort_key, rgb10=config.rgb10_payloads,
    )
    img, alpha_img = _blend_and_assemble(
        tile_starts, attrs_t, grid_x, grid_y, ts, bg, config, interpret
    )
    return {
        "render": jnp.transpose(img, (2, 0, 1)),
        "alpha": alpha_img[None],
        "radii": r["radius_f"][:n_points].astype(jnp.int32),
        "visibility_filter": (r["visible"] > 0.5)[:n_points],
        "n_dropped": n_dropped,
    }
