"""Microbench: slab-gather tri-grid sampling prototype.

The flagship frame's decode superblock (tri-grid gather + trilinear lerp
+ staging + heads kernel) measures ~17.5 ms while the heads-kernel body
alone is 1.7 ms: the XLA row-gather runs at ~9 ns/row (~28 GB/s), ~17x
off HBM bandwidth, and the brick table exists only to feed it. This
prototypes the replacement: template positions are STATIC across frames,
so points are Morton-sorted once into blocks whose per-plane tri-grid
footprint fits a small slab window; per block the kernel

  1. DMAs the 3 per-plane slabs (DZW, EY, EX*C) from the padded raw
     channels-last volume (double-buffered, dynamic tile-aligned origin),
  2. contracts (z, y) with a per-point 4-nonzero weight matrix Wzy on
     the MXU (trilinear z/y weights at one-hot positions; one partial
     dot per z slice so no sublane-concat relayout is needed),
  3. multiplies by the x-weight expansion Ax and contracts x (+ dequant
     scale + plane mean) with a constant segment matrix.

No brick table, no HBM gather: the volume streams at DMA bandwidth and
the "gather" is a few MXU dots per plane per block. First-dot FLOPs =
points x slab_cells x 2, so the extents (ey, ex) are the cost knobs.

Run on TPU for timing; --interpret checks parity on CPU.
"""
import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C = 32          # feature channels per plane
DZ = 5          # padded depth axis (D=3 + halo)
X_ALIGN = 4     # x origin alignment (4 cells * 32 ch = 128 lanes)
Y_ALIGN = 8     # y origin alignment (int8 DMA sublane granule)


def _slab_kernel(origins, idxw, seg, vol, out_ref, slab, sems, *,
                 blk, ey, exc, dzw, variant="fma"):
    """origins (nb, 12) i32 SMEM (zt, yt, xt per plane, tile units);
    idxw (32, BLK) f32; seg (3, EXC, C) f32; vol (3, DZ, YP, XPC) int8
    ANY; out (BLK, C) f32. slab (2, 3, dzw, ey, exc) int8; sems
    (2, 3, dzw).

    The z window is dzw slices starting at zt: a block spans <= 2 depth
    buckets (bucket width ~H/3 cells >> block extent), so dzw=3 always
    suffices with no packer constraint."""
    i = pl.program_id(0)
    nb = pl.num_programs(0)

    def dma(b, slot, p):
        # origins hold TILE indices (y in 8-sublane units, x in 4-cell =
        # 128-lane units) so Mosaic can prove the DMA slice alignment;
        # ONE 3D strided copy per plane (12 per-z copies measured issue-
        # overhead bound: ~11 us/block of non-MXU time)
        zt = origins[b, 3 * p]
        yt = origins[b, 3 * p + 1]
        xt = origins[b, 3 * p + 2]
        return pltpu.make_async_copy(
            vol.at[p, pl.ds(zt, dzw), pl.ds(yt * Y_ALIGN, ey),
                   pl.ds(xt * 128, exc)],
            slab.at[slot, p],
            sems.at[slot, p],
        )

    @pl.when(i == 0)
    def _():
        for p in range(3):
            dma(0, 0, p).start()

    @pl.when(i + 1 < nb)
    def _():
        for p in range(3):
            dma(i + 1, (i + 1) % 2, p).start()

    slot = i % 2
    for p in range(3):
        dma(i, slot, p).wait()

    xw = jnp.transpose(idxw[:])                    # (BLK, 32) f32
    kr = dzw * ey                                  # slab rows (= 128)
    riota = jax.lax.broadcasted_iota(jnp.int32, (blk, kr), 1)
    ziota = (riota // ey).astype(jnp.float32)
    yriota = (riota % ey).astype(jnp.float32)
    ex = exc // C
    xeiota = ((jax.lax.broadcasted_iota(jnp.int32, (ex, exc), 1) // C)
              == jax.lax.broadcasted_iota(jnp.int32, (ex, exc), 0)
              ).astype(jnp.bfloat16)                # (EX, EXC) expander

    acc = jnp.zeros((blk, C), jnp.float32)
    for p in range(3):
        c0 = p * 9
        col = lambda k: xw[:, c0 + k:c0 + k + 1]   # noqa: E731
        ixg, wxa, wxb = col(0), col(1), col(2)
        iyg, wya, wyb = col(3), col(4), col(5)
        izg, wza, wzb = col(6), col(7), col(8)
        z0 = origins[i, 3 * p].astype(jnp.float32)
        y0 = origins[i, 3 * p + 1].astype(jnp.float32) * Y_ALIGN
        x0 = origins[i, 3 * p + 2].astype(jnp.float32) * X_ALIGN
        iyl = iyg - y0
        ixl = ixg - x0
        izl = izg - z0
        # one (BLK, KR=128) weight matrix over the whole (z, y) slab:
        # row r = z*EY + y; 4 nonzeros per point (2 z-corners x 2 y)
        wz = (jnp.where(ziota == izl, wza, 0.0)
              + jnp.where(ziota == izl + 1.0, wzb, 0.0))
        wy = (jnp.where(yriota == iyl, wya, 0.0)
              + jnp.where(yriota == iyl + 1.0, wyb, 0.0))
        wzy = (wz * wy).astype(jnp.bfloat16)
        sl = slab[slot, p].reshape(kr, exc).astype(jnp.bfloat16)
        t = jnp.dot(wzy, sl, preferred_element_type=jnp.float32)
        xsio = jax.lax.broadcasted_iota(
            jnp.int32, (blk, ex), 1).astype(jnp.float32)
        axs = (jnp.where(xsio == ixl, wxa, 0.0)
               + jnp.where(xsio == ixl + 1.0, wxb, 0.0))
        if variant == "fma":
            # contract x as EX broadcast-FMAs on 32-lane slices of t:
            # out_c = sum_x axs[:, x] * t[:, x*C + c] — no (BLK, EXC)
            # weight expansion, no N=32 MXU dot
            xsum = jnp.zeros((blk, C), jnp.float32)
            for x in range(ex):
                xsum = xsum + axs[:, x:x + 1] * t[:, x * C:(x + 1) * C]
            scale_row = jnp.sum(seg[p, 0:C, :], axis=0, keepdims=True)
            acc = acc + xsum * scale_row
        elif variant == "vpux":
            # build the (BLK, EXC) expanded x-weights directly with lane-
            # iota compares (VPU) — skips the ax-expander MXU dot, keeping
            # two dots/plane (wzy + segment contraction)
            xcell = (jax.lax.broadcasted_iota(jnp.int32, (blk, exc), 1)
                     // C).astype(jnp.float32)
            axf = (jnp.where(xcell == ixl, wxa, 0.0)
                   + jnp.where(xcell == ixl + 1.0, wxb, 0.0))
            prod = (t * axf).astype(jnp.bfloat16)
            acc = acc + jnp.dot(prod, seg[p].astype(jnp.bfloat16),
                                preferred_element_type=jnp.float32)
        else:  # 'dots': MXU ax expansion + segment-matrix contraction
            ax = jnp.dot(axs.astype(jnp.bfloat16), xeiota,
                         preferred_element_type=jnp.float32)
            prod = (t * ax).astype(jnp.bfloat16)
            acc = acc + jnp.dot(prod, seg[p].astype(jnp.bfloat16),
                                preferred_element_type=jnp.float32)
    out_ref[:] = acc


def _slab_kernel_pre(origins, wzy, axs, seg, vol, out_ref, slab, sems, *,
                     blk, ey, exc, dzw):
    """Precomputed-weights variant: the (z,y) trilinear weight matrix and
    the x corner weights depend only on the STATIC template positions, so
    they are built once on the host and streamed per block — the kernel is
    pure DMA + 3 MXU dots per plane (no VPU weight construction).

    wzy (3, Mpad, KR) bf16; axs (3, Mpad, EX) bf16 (blocked along M)."""
    i = pl.program_id(0)
    nb = pl.num_programs(0)

    def dma(b, slot, p):
        zt = origins[b, 3 * p]
        yt = origins[b, 3 * p + 1]
        xt = origins[b, 3 * p + 2]
        return pltpu.make_async_copy(
            vol.at[p, pl.ds(zt, dzw), pl.ds(yt * Y_ALIGN, ey),
                   pl.ds(xt * 128, exc)],
            slab.at[slot, p],
            sems.at[slot, p],
        )

    @pl.when(i == 0)
    def _():
        for p in range(3):
            dma(0, 0, p).start()

    @pl.when(i + 1 < nb)
    def _():
        for p in range(3):
            dma(i + 1, (i + 1) % 2, p).start()

    slot = i % 2
    for p in range(3):
        dma(i, slot, p).wait()

    kr = dzw * ey
    ex = exc // C
    xeiota = ((jax.lax.broadcasted_iota(jnp.int32, (ex, exc), 1) // C)
              == jax.lax.broadcasted_iota(jnp.int32, (ex, exc), 0)
              ).astype(jnp.bfloat16)
    acc = jnp.zeros((blk, C), jnp.float32)
    for p in range(3):
        sl = slab[slot, p].reshape(kr, exc).astype(jnp.bfloat16)
        t = jnp.dot(wzy[p], sl, preferred_element_type=jnp.float32)
        ax = jnp.dot(axs[p], xeiota,
                     preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        prod = t.astype(jnp.bfloat16) * ax
        acc = acc + jnp.dot(prod, seg[p].astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
    out_ref[:] = acc


def _slab_kernel_pre8(origins, wzy, axs, seg, vol, out_ref, slab, sems, *,
                      blk, ey, exc, dzw, ilv=1):
    """int8-weights variant: wzy quantized x127 to int8 -> the (z,y)
    contraction runs s8 x s8 -> s32 at 2x the bf16 MXU rate and half the
    weight-stream bytes; the 1/127 dequant folds into seg. ilv>1
    interleaves row-chunks so chunk B's VPU mul overlaps chunk A's dots."""
    i = pl.program_id(0)
    nb = pl.num_programs(0)

    def dma(b, slot, p):
        zt = origins[b, 3 * p]
        yt = origins[b, 3 * p + 1]
        xt = origins[b, 3 * p + 2]
        return pltpu.make_async_copy(
            vol.at[p, pl.ds(zt, dzw), pl.ds(yt * Y_ALIGN, ey),
                   pl.ds(xt * 128, exc)],
            slab.at[slot, p],
            sems.at[slot, p],
        )

    @pl.when(i == 0)
    def _():
        for p in range(3):
            dma(0, 0, p).start()

    @pl.when(i + 1 < nb)
    def _():
        for p in range(3):
            dma(i + 1, (i + 1) % 2, p).start()

    slot = i % 2
    for p in range(3):
        dma(i, slot, p).wait()

    kr = dzw * ey
    ex = exc // C
    xeiota = ((jax.lax.broadcasted_iota(jnp.int32, (ex, exc), 1) // C)
              == jax.lax.broadcasted_iota(jnp.int32, (ex, exc), 0)
              ).astype(jnp.bfloat16)
    S = blk // ilv
    for g in range(ilv):
        sl_r = slice(g * S, (g + 1) * S)
        acc = jnp.zeros((S, C), jnp.float32)
        for p in range(3):
            sl = slab[slot, p].reshape(kr, exc)
            t = jnp.dot(wzy[p, sl_r], sl,
                        preferred_element_type=jnp.int32)
            ax = jnp.dot(axs[sl_r, p * ex:(p + 1) * ex], xeiota,
                         preferred_element_type=jnp.float32
                         ).astype(jnp.bfloat16)
            prod = t.astype(jnp.bfloat16) * ax
            acc = acc + jnp.dot(prod, seg[p].astype(jnp.bfloat16),
                                preferred_element_type=jnp.float32)
        out_ref[sl_r] = acc


def slab_gather_pre8(origins, wzy8, axs, seg, vol, *, blk, ey, exc, dzw,
                     interpret, ilv=1):
    nb = origins.shape[0]
    kr = dzw * ey
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((3, blk, kr), lambda i, *_: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, 64), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((blk, C), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 3, dzw, ey, exc), jnp.int8),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_slab_kernel_pre8, blk=blk, ey=ey, exc=exc,
                          dzw=dzw, ilv=ilv),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb * blk, C), jnp.float32),
        interpret=interpret,
    )(origins, wzy8, axs, seg, vol)


def slab_gather_pre(origins, wzy, axs, seg, vol, *, blk, ey, exc, dzw,
                    interpret):
    nb = origins.shape[0]
    kr = dzw * ey
    ex = exc // C
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((3, blk, kr), lambda i, *_: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, blk, ex), lambda i, *_: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((blk, C), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 3, dzw, ey, exc), jnp.int8),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_slab_kernel_pre, blk=blk, ey=ey, exc=exc, dzw=dzw),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb * blk, C), jnp.float32),
        interpret=interpret,
    )(origins, wzy, axs, seg, vol)


def build_pre_weights(origins, xw, nb, blk, ey, ex, dzw):
    """Static weight build ON DEVICE (one-time setup; a host-numpy build +
    440 MB tunnel transfer measured minutes): wzy (3, M, KR) bf16,
    axs (3, M, EX) bf16."""
    kr = dzw * ey

    @jax.jit
    def build(origins, xw):
        blk_of = jnp.repeat(jnp.arange(nb), blk)
        r = jnp.arange(kr)
        zi = (r // ey).astype(jnp.float32)[None]
        yi = (r % ey).astype(jnp.float32)[None]
        xi = jnp.arange(ex, dtype=jnp.float32)[None]
        wzys, axss = [], []
        for p in range(3):
            c0 = p * 9
            z0 = origins[blk_of, 3 * p].astype(jnp.float32)
            y0 = origins[blk_of, 3 * p + 1].astype(jnp.float32) * Y_ALIGN
            x0 = origins[blk_of, 3 * p + 2].astype(jnp.float32) * X_ALIGN
            izl = (xw[c0 + 6] - z0)[:, None]
            iyl = (xw[c0 + 3] - y0)[:, None]
            ixl = (xw[c0 + 0] - x0)[:, None]
            wz = (jnp.where(zi == izl, xw[c0 + 7][:, None], 0.0)
                  + jnp.where(zi == izl + 1, xw[c0 + 8][:, None], 0.0))
            wy = (jnp.where(yi == iyl, xw[c0 + 4][:, None], 0.0)
                  + jnp.where(yi == iyl + 1, xw[c0 + 5][:, None], 0.0))
            wzys.append((wz * wy).astype(jnp.bfloat16))
            axss.append((jnp.where(xi == ixl, xw[c0 + 1][:, None], 0.0)
                         + jnp.where(xi == ixl + 1,
                                     xw[c0 + 2][:, None], 0.0)
                         ).astype(jnp.bfloat16))
        return jnp.stack(wzys), jnp.stack(axss)

    return build(jnp.asarray(origins), jnp.asarray(xw))


def slab_gather(origins, idxw, seg, vol, *, blk, ey, exc, dzw, interpret,
                variant="fma"):
    nb = origins.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((32, blk), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((blk, C), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 3, dzw, ey, exc), jnp.int8),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_slab_kernel, blk=blk, ey=ey, exc=exc, dzw=dzw,
                          variant=variant),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb * blk, C), jnp.float32),
        interpret=interpret,
    )(origins, idxw, seg, vol)


def reference(origins, idxw, seg_scale, vol5):
    """fm via plain indexing: vol5 (3, DZ, YP, XP, C) f32."""
    nb = origins.shape[0]
    blk = idxw.shape[1] // nb
    out = np.zeros((nb * blk, C), np.float32)
    xw = np.asarray(idxw).T  # (M, 32)
    for p in range(3):
        c0 = p * 9
        ix, wxa, wxb = xw[:, c0], xw[:, c0 + 1], xw[:, c0 + 2]
        iy, wya, wyb = xw[:, c0 + 3], xw[:, c0 + 4], xw[:, c0 + 5]
        iz, wza, wzb = xw[:, c0 + 6], xw[:, c0 + 7], xw[:, c0 + 8]
        ix, iy, iz = ix.astype(int), iy.astype(int), iz.astype(int)
        v = np.asarray(vol5[p], np.float32)
        acc = 0.0
        for dz, wzc in ((0, wza), (1, wzb)):
            for dy, wyc in ((0, wya), (1, wyb)):
                for dx, wxc in ((0, wxa), (1, wxb)):
                    acc = acc + (v[iz + dz, iy + dy, ix + dx]
                                 * (wzc * wyc * wxc)[:, None])
        out += acc * seg_scale[p][None, :]
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--interpret", action="store_true")
    ap.add_argument("--blocks", type=int, default=560)
    ap.add_argument("--blk", type=int, default=1024)
    ap.add_argument("--ey", type=int, default=32)
    ap.add_argument("--ex", type=int, default=16)
    ap.add_argument("--dzw", type=int, default=4)
    ap.add_argument("--variant", default="fma")
    args = ap.parse_args()
    if args.interpret:
        jax.config.update("jax_platforms", "cpu")

    YP, XP = 264, 260            # padded H/W axes (Y/X origin-aligned)
    nb, blk, ey, ex, dzw = args.blocks, args.blk, args.ey, args.ex, args.dzw
    exc = ex * C
    rng = np.random.RandomState(0)

    vol5 = rng.randint(-127, 128, (3, DZ, YP, XP, C)).astype(np.int8)
    vol = jnp.asarray(vol5.reshape(3, DZ, YP, XP * C))

    # synthetic blocks: random TILE-aligned origins, indices inside windows
    z0 = rng.randint(0, DZ - dzw + 1, (nb, 3))
    y0 = rng.randint(0, (YP - ey) // Y_ALIGN, (nb, 3)) * Y_ALIGN
    x0 = (rng.randint(0, (XP - ex) // X_ALIGN, (nb, 3))) * X_ALIGN
    origins = np.zeros((nb, 12), np.int32)
    origins[:, 0:9:3] = z0
    origins[:, 1:9:3] = y0 // Y_ALIGN
    origins[:, 2:9:3] = x0 // X_ALIGN
    M = nb * blk
    xw = np.zeros((32, M), np.float32)
    for p in range(3):
        c0 = p * 9
        xw[c0 + 0] = (np.repeat(x0[:, p], blk)
                      + rng.randint(0, ex - 1, M))           # ix global
        xw[c0 + 3] = np.repeat(y0[:, p], blk) + rng.randint(0, ey - 1, M)
        xw[c0 + 6] = np.repeat(z0[:, p], blk) + rng.randint(0, dzw - 1, M)
        for k in (1, 2, 4, 5, 7, 8):
            xw[c0 + k] = rng.rand(M).astype(np.float32)
    idxw = jnp.asarray(xw)

    seg_scale = rng.rand(3, C).astype(np.float32) * 0.02
    seg = np.zeros((3, exc, C), np.float32)
    for p in range(3):
        for x in range(ex):
            seg[p, x * C + np.arange(C), np.arange(C)] = seg_scale[p]
    seg = jnp.asarray(seg)

    # every large array rides as a jit ARGUMENT: constant-embedded HLO
    # >~100 MB hangs the tunnel compile helper
    og = jnp.asarray(origins)
    if args.variant.startswith("pre"):
        wzy, axs = build_pre_weights(origins, xw, nb, blk, ey, ex, dzw)
        axs_pk = jnp.pad(axs.transpose(1, 0, 2).reshape(M, 3 * ex),
                         ((0, 0), (0, 64 - 3 * ex)))
        if args.variant.startswith("pre8"):
            ilv = int(args.variant[5:]) if len(args.variant) > 5 else 1
            wzy8 = jnp.clip(jnp.round(wzy.astype(jnp.float32) * 127.0),
                            -127, 127).astype(jnp.int8)
            call = functools.partial(
                slab_gather_pre8, blk=blk, ey=ey, exc=exc, dzw=dzw,
                interpret=args.interpret, ilv=ilv)
            arrs = (og, wzy8, axs_pk, seg / 127.0, vol)
        else:
            call = functools.partial(
                slab_gather_pre, blk=blk, ey=ey, exc=exc, dzw=dzw,
                interpret=args.interpret)
            arrs = (og, wzy, axs, seg, vol)
    else:
        call = functools.partial(
            slab_gather, blk=blk, ey=ey, exc=exc, dzw=dzw,
            interpret=args.interpret, variant=args.variant)
        arrs = (og, idxw, seg, vol)
    out = np.asarray(jax.jit(call)(*arrs))
    ref = reference(origins, xw.reshape(32, M), seg_scale, vol5)
    err = np.max(np.abs(out - ref)) / np.max(np.abs(ref))
    budget = 3e-2 if args.variant.startswith("pre8") else 2e-2
    print(f"parity: max err / max |ref| = {err:.2e} (budget {budget:.0e})")
    assert err < budget, err

    if not args.interpret:
        IT = 20

        @jax.jit
        def loop(*arrs):
            def body(j, acc):
                a = list(arrs)
                a[-2] = a[-2] * (1.0 + 1e-6 * j)  # defeat CSE (seg operand)
                out = call(*a)
                return acc + out[0, 0] + out[-1, -1]
            return jax.lax.fori_loop(0, IT, body, 0.0)

        float(loop(*arrs))  # compile + warm
        t0 = time.perf_counter()
        float(loop(*arrs))
        dt = (time.perf_counter() - t0) / IT * 1e3
        rows = nb * blk * 3
        print(f"slab gather+lerp ({nb} blocks x {blk}, ey={ey} ex={ex} "
              f"dzw={dzw} {args.variant}): {dt:7.3f} ms  "
              f"({dt * 1e6 / rows:.2f} ns/row-equiv)")


if __name__ == "__main__":
    main()
