"""Pallas TPU kernel: per-tile front-to-back alpha blending.

The hot op of the 3DGS rasterizer (replaces the CUDA renderCUDA kernel of
diff-gaussian-rasterization, ref consumed at /root/reference/
gaussian_splatting/gaussian_renderer/__init__.py:139-175).

Dataflow: pairs (gaussian duplicated per touched tile) arrive LEXSORTED by
(tile, depth) as a FIELD-MAJOR (ROW, Ppad) f32 array in HBM — field-major
so a chunk DMA slices only the (lane-aligned) pair axis. Each grid step =
one 16x16 tile: its pairs are a contiguous segment [start, end), streamed
into VMEM in double-buffered (ROW, CHUNK) chunks and composited against
the tile's 256 pixels on the VPU in (pixels, chunk) orientation — no
(tiles x capacity x pixels) tensor ever touches HBM, which is what makes
this ~10x cheaper than the XLA scan blend.

Field order (rows of the field-major array):
  0 pix_x, 1 pix_y, 2 conic_a, 3 conic_b, 4 conic_c,
  5 opacity, 6 r, 7 g, 8 b, 9..15 pad

Saturation math identical to CUDA: alpha clamp 0.99, 1/255 cutoff,
power>0 cutoff. The CUDA per-pixel T<1e-4 early stop has NO profitable
TPU analogue (see the note above the fori_loop): saturated work is
bounded by max_k instead.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW = 16          # packed fields per pair (field-major rows)
CHUNK = 128       # pair columns blended per inner step


def _cumprod_lanes(x):
    """Inclusive cumprod along the minor (lane) axis via Hillis-Steele
    doubling (Pallas TPU has no cumprod primitive)."""
    n = x.shape[-1]
    d = 1
    while d < n:
        shifted = jnp.concatenate(
            [jnp.ones_like(x[..., :d]), x[..., :-d]], axis=-1
        )
        x = x * shifted
        d *= 2
    return x


def _blend_kernel(
    # scalar prefetch
    start_ref,      # (T+1,) int32 segment starts (pairs lexsorted by tile)
    # inputs
    attrs_hbm,      # (n_rows, Ppad) f32 field-major in ANY/HBM
    # outputs
    out_ref,        # (1, 256, 4) f32: rgb accum + transmittance
    # scratch
    buf,            # (2, n_rows, CHUNK) VMEM
    sem,            # (2,) DMA semaphores
    *,
    grid_x: int,
    tile_size: int,
    max_k: int,
    packed_colors: bool,
):
    t = pl.program_id(0)
    P = tile_size * tile_size
    start = start_ref[t]
    end = start_ref[t + 1]
    count = jnp.minimum(end - start, max_k)
    # lane-dim DMA offsets must be 128-aligned: fetch from the aligned
    # floor of the segment and mask the prefix columns
    astart = pl.multiple_of((start // CHUNK) * CHUNK, CHUNK)
    offset = start - astart
    n_chunks = pl.cdiv(offset + count, jnp.int32(CHUNK))

    # tile pixel coords (P, 1); pixel p = y*ts + x (row-major)
    tx = (t % grid_x) * tile_size
    ty = (t // grid_x) * tile_size
    p_iota = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    pixx = (tx + p_iota % tile_size).astype(jnp.float32)
    pixy = (ty + p_iota // tile_size).astype(jnp.float32)

    def dma(slot, chunk_idx):
        return pltpu.make_async_copy(
            attrs_hbm.at[:, pl.ds(astart + chunk_idx * CHUNK, CHUNK)],
            buf.at[slot],
            sem.at[slot],
        )

    @pl.when(n_chunks > 0)
    def _():
        dma(0, 0).start()

    def body(ci, carry):
        accum, trans = carry  # (P, 3), (P, 1)
        slot = ci % 2

        @pl.when(ci + 1 < n_chunks)
        def _():
            dma((ci + 1) % 2, ci + 1).start()

        dma(slot, ci).wait()
        rows = buf[slot]                       # (ROW, CHUNK)
        cidx = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
        gcol = cidx + ci * CHUNK               # column relative to astart
        valid = (gcol >= offset) & (gcol < offset + count)  # (1, CHUNK)

        gx = rows[0:1, :]                      # (1, CHUNK)
        gy = rows[1:2, :]
        ca = rows[2:3, :]
        cb = rows[3:4, :]
        cc = rows[4:5, :]
        if packed_colors:
            # rows 5,6 carry bf16 pairs in f32-bitcast int32 words:
            # row5 = r|g, row6 = b|opacity (hi|lo 16 bits). A bf16 value
            # IS its f32 pattern with the low mantissa zeroed, so unpack
            # = mask / shift + bitcast — no conversions.
            w5 = jax.lax.bitcast_convert_type(rows[5:6, :], jnp.int32)
            w6 = jax.lax.bitcast_convert_type(rows[6:7, :], jnp.int32)
            f = lambda v: jax.lax.bitcast_convert_type(v, jnp.float32)  # noqa: E731
            hi_mask = jnp.int32(-65536)        # 0xFFFF0000
            r_ = f(w5 & hi_mask)
            g_ = f(w5 << 16)
            b_ = f(w6 & hi_mask)
            op = f(w6 << 16)
            col = jnp.concatenate([r_, g_, b_], axis=0)
        else:
            op = rows[5:6, :]
            col = rows[6:9, :]                 # (3, CHUNK)

        dx = pixx - gx                         # (P, CHUNK) — sign-symmetric
        dy = pixy - gy
        power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
        alpha = jnp.minimum(0.99, op * jnp.exp(power))
        alpha = jnp.where(
            (power > 0.0) | (alpha < (1.0 / 255.0)) | (~valid), 0.0, alpha
        )

        one_minus = 1.0 - alpha                # (P, CHUNK)
        cp = _cumprod_lanes(one_minus)
        t_within = jnp.concatenate(
            [jnp.ones_like(cp[:, :1]), cp[:, :-1]], axis=1
        )
        w = alpha * t_within * trans           # (P, CHUNK)
        accum = accum + jax.lax.dot_general(
            w, col,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (P, 3)
        trans = trans * cp[:, -1:]
        return accum, trans

    # NOTE on the CUDA per-pixel T<1e-4 early stop: both attempted TPU
    # equivalents LOSE — a data-dependent while_loop serializes the DMA
    # pipeline (+27 ms), and a per-chunk lax.cond gated on max(trans)
    # creates a loop-carried scalar reduction that stalls the VPU just as
    # badly (measured identically +27 ms). The unconditional fixed-trip
    # loop is the fast form; saturation work-skip must come from capping
    # max_k / tile_capacity instead.
    accum0 = jnp.zeros((P, 3), jnp.float32)
    trans0 = jnp.ones((P, 1), jnp.float32)
    accum, trans = jax.lax.fori_loop(0, n_chunks, body, (accum0, trans0))

    out_ref[0, :, :3] = accum
    out_ref[0, :, 3] = trans[:, 0]


def pallas_blend(
    tile_starts: jax.Array,   # (T+1,) int32
    pair_attrs_t: jax.Array,  # (n_rows, Ppad) f32 field-major
    grid_x: int,
    grid_y: int,
    tile_size: int = 16,
    max_k: int = 4096,
    interpret: bool | None = None,
    packed_colors: bool = False,
):
    """-> (accum (T, 256, 3), trans (T, 256))."""
    if interpret is None:  # CPU (tests / dry runs): no Mosaic — interpret
        interpret = jax.default_backend() == "cpu"
    n_rows = pair_attrs_t.shape[0]
    T = grid_x * grid_y
    P = tile_size * tile_size
    out = pl.pallas_call(
        functools.partial(
            _blend_kernel, grid_x=grid_x, tile_size=tile_size, max_k=max_k,
            packed_colors=packed_colors,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(T,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(
                (1, P, 4), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[
                pltpu.VMEM((2, n_rows, CHUNK), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((T, P, 4), jnp.float32),
        interpret=interpret,
    )(tile_starts, pair_attrs_t)
    return out[:, :, :3], out[:, :, 3]
