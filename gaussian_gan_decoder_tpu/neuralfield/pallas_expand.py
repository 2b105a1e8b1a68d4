"""Pallas TPU kernel: tri-grid corner-brick table build.

sample_from_planes pre-expands the (C, D, H, W) tri-grid volume into a
"brick table": row (z, y, x) holds the 2x2x2 neighbourhood's channels so
each sample point costs ONE wide gather (see neuralfield/renderer.py).
XLA lowers the 8-slice concat formulation at ~15 ms/frame (flagship
config) because assembling 32-channel pieces into 256-channel rows is a
lane-misaligned copy storm; this kernel streams the padded channels-last
volume through VMEM once and writes the 8-corner rows directly.

Mosaic layout constraints shape the design:
  * the padded source volume carries its channel dim pre-padded to 128
    lanes (DMA slices must cover whole lane tiles);
  * y-blocks DMA (2 z-slabs, YB+8 rows, full x) windows — sizes rounded
    to sublane (8) multiples, with the volume over-padded so windows
    never clamp;
  * output rows are padded to NY (>= H+1) y-positions so the y-block
    loop needs no edge handling — garbage rows are never indexed (the
    gather's row stride uses NY).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

YB = 16    # output y rows per grid step
LANE = 128


def _round_up(v, m):
    return (v + m - 1) // m * m


def _dma_pipeline(fp_hbm, win, sem, *, nz: int, nyb: int, yb: int):
    # grid: (B, D+1, NY//YB); out block row b*(D+1)+z.
    # The window DMA for program i+1 is started while program i computes
    # (double-buffered on grid-step parity) — a synchronous start/wait per
    # program exposes ~200 full DMA latencies (~5 ms/frame at flagship).
    b = pl.program_id(0)
    z = pl.program_id(1)
    ybi = pl.program_id(2)
    step = (b * nz + z) * nyb + ybi
    n_steps = pl.num_programs(0) * nz * nyb
    slot = step % 2

    def dma(s, st):
        bb = st // (nz * nyb)
        zz = (st // nyb) % nz
        yy = st % nyb
        return pltpu.make_async_copy(
            fp_hbm.at[bb, pl.ds(zz, 2), pl.ds(yy * yb, yb + 8)],
            win.at[s],
            sem.at[s],
        )

    @pl.when(step == 0)
    def _():
        dma(0, 0).start()

    @pl.when(step + 1 < n_steps)
    def _():
        dma((step + 1) % 2, step + 1).start()

    dma(slot, step).wait()
    return slot


def _expand_kernel(fp_hbm, out_ref, win, sem, *, C: int, W: int, D: int,
                   nz: int, nyb: int, yb: int):
    # 8 sub-tile stores: write lanes g*C:(g+1)*C from source lanes 0:C —
    # each store is a lane ROTATION (C=32 is not tile-aligned).
    slot = _dma_pipeline(fp_hbm, win, sem, nz=nz, nyb=nyb, yb=yb)

    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                g = (dz * 2 + dy) * 2 + dx
                out_ref[0, :, :, g * C:(g + 1) * C] = (
                    win[slot, dz, dy:dy + yb, dx:dx + W + 1, :C]
                )


def _expand_kernel_select(fp_hbm, out_ref, win, sem, *, C: int, W: int,
                          D: int, nz: int, nyb: int, yb: int):
    # Channel-DUPLICATED source (each 128-lane row = LANE//C copies of the
    # C channels): corner group g reads its channels at the SAME lanes it
    # writes, so the 8 rotated sub-tile stores become lane-group masked
    # selects combined into ONE aligned full-tile store per 128 lanes.
    slot = _dma_pipeline(fp_hbm, win, sem, nz=nz, nyb=nyb, yb=yb)

    gpt = LANE // C            # corner groups per 128-lane output tile
    lane_grp = jax.lax.broadcasted_iota(
        jnp.int32, (yb, W + 1, LANE), 2) // C
    for t in range(8 * C // LANE):
        acc = None
        for j in range(gpt):
            g = t * gpt + j
            dz, dy, dx = g >> 2, (g >> 1) & 1, g & 1
            v = win[slot, dz, dy:dy + yb, dx:dx + W + 1, :]
            acc = v if acc is None else jnp.where(lane_grp == j, v, acc)
        out_ref[0, :, :, t * LANE:(t + 1) * LANE] = acc


def build_brick_table(feats: jax.Array, dtype=None, interpret: bool | None = None,
                      select: bool = False):
    """(B, C, D, H, W) volume -> (table (B, (D+1)*NY*(W+1), 8C), NY).

    Row index of logical brick (z0, y0, x0) is (z0 * NY + y0) * (W + 1) + x0
    with NY = round_up(H + 1, yb) (yb = 16, or 8 for 4-byte bricks).
    Rows with y0 > H exist but hold garbage
    (never indexed: y0 <= H by construction of the sampler).

    select=True uses the channel-duplicated-source kernel (lane-aligned
    masked-select stores instead of 8 lane rotations; same HBM bytes — the
    zero lane padding becomes duplicate channels). Requires C | 128 and
    128 | 8C; falls back to the rotate kernel otherwise.
    """
    B, C, D, H, W = feats.shape
    if dtype is not None:
        feats = feats.astype(dtype)
    if interpret is None:  # CPU (tests / dry runs): no Mosaic — interpret
        interpret = jax.default_backend() == "cpu"
    select = select and LANE % C == 0 and (8 * C) % LANE == 0
    # y rows per grid step: 16 for <=2-byte bricks; 8 for f32 — the out
    # block + double-buffered DMA window scratch must fit the 16 MB scoped
    # VMEM limit (f32 at YB=16 needs ~21 MB: observed compile OOM on the
    # PSNR ablate ladder's f32_bricks rung, 2026-08-20)
    yb = YB if jnp.dtype(feats.dtype).itemsize < 4 else YB // 2
    NY = _round_up(H + 1, yb)
    NX = _round_up(W + 2, 8)
    # channels-last; pad: z 1+1, y 1 + (NY+8-1-H) [DMA windows read YB+8
    # rows], x 1 + (NX-W-1), c to full 128 lanes
    fcl = jnp.transpose(feats, (0, 2, 3, 4, 1))           # (B, D, H, W, C)
    if select:
        fcl = jnp.tile(fcl, (1, 1, 1, 1, LANE // C))
        cpad = 0
    else:
        cpad = LANE - C
    fp = jnp.pad(
        fcl,
        ((0, 0), (1, 1), (1, NY + 8 - 1 - H), (1, NX - W - 1), (0, cpad)),
    )
    # fp: (B, D+2, NY+8, NX, 128)

    out = pl.pallas_call(
        functools.partial(
            _expand_kernel_select if select else _expand_kernel,
            C=C, W=W, D=D, nz=D + 1, nyb=NY // yb, yb=yb),
        grid=(B, D + 1, NY // yb),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, yb, W + 1, 8 * C),
            lambda b, z, yb: (b * (D + 1) + z, yb, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B * (D + 1), NY, W + 1, 8 * C), feats.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, 2, yb + 8, NX, LANE), feats.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(fp)
    return out.reshape(B, (D + 1) * NY * (W + 1), 8 * C), NY
