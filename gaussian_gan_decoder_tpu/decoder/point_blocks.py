"""Static point-block packing for the slab-gather decode path.

The flagship inference frame decodes a FIXED template of points every
frame (only the latent changes; ref main/load_decoder.py:12-26 renders
from the checkpoint's saved positions). The tri-grid gather is therefore
a STATIC access pattern — instead of 1.5M random HBM row-gathers per
frame (~9 ns/row, ~17x off bandwidth), we Morton-sort the template once
and pack consecutive points into blocks whose per-plane tri-grid
footprint fits a fixed slab window (DZW z-slices x EY rows x EX cells).
The decode kernel then DMAs 3 tiny slabs per block and performs the
gather+trilinear-lerp as dense MXU contractions (decoder/pallas_heads.py
decode_project_pallas_slab).

Point order is irrelevant downstream (gaussians are depth-sorted by the
rasterizer), so the permutation is applied once to the template and
never undone on the render path.

Index/weight semantics mirror neuralfield/renderer.py _corner_weights_1d
exactly (grid_sample align_corners=False + zeros padding, validity
folded into the corner weights); quantization scale/mean folding follows
build_plane_table's int8 contract.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

C = 32           # feature channels per plane
DZW = 4          # slab z window (DZW * EY must be 128: one MXU K-tile)
EY = 32          # slab y rows
EX = 20          # slab x cells (EX*C = 640 lanes; Morton cubes of 1024
#                  flagship points span ~16 cells/axis — ex=16 usable
#                  width is 12 after alignment and fragments 5x)
Y_ALIGN = 8      # y origin alignment (int8 DMA sublane granule)
X_ALIGN = 4      # x origin alignment (4 cells * 32 ch = 128 lanes)


def _corner_1d(g: np.ndarray, size: int):
    """Mirror renderer._corner_weights_1d: padded-axis index + the two
    validity-folded corner weights."""
    x = ((g + 1.0) * size - 1.0) * 0.5
    x0 = np.floor(x).astype(np.int64)
    w1 = (x - x0).astype(np.float32)
    v0 = (x0 >= 0) & (x0 < size)
    v1 = (x0 + 1 >= 0) & (x0 + 1 < size)
    idxp = np.clip(x0 + 1, 0, size)
    return idxp, ((1.0 - w1) * v0).astype(np.float32), (w1 * v1).astype(np.float32)


def _morton3(ix, iy, iz, bits=9):
    code = np.zeros(ix.shape, np.int64)
    for b in range(bits):
        code |= ((ix >> b) & 1).astype(np.int64) << (3 * b)
        code |= ((iy >> b) & 1).astype(np.int64) << (3 * b + 1)
        code |= ((iz >> b) & 1).astype(np.int64) << (3 * b + 2)
    return code


class _RangeMinMax:
    """O(1) min/max over index ranges (sparse table) for the greedy
    block search."""

    def __init__(self, v: np.ndarray):
        n = len(v)
        k = max(1, int(np.floor(np.log2(max(n, 1)))) + 1)
        self.mins = [v]
        self.maxs = [v]
        for j in range(1, k):
            half = 1 << (j - 1)
            prev_min, prev_max = self.mins[-1], self.maxs[-1]
            if len(prev_min) <= half:
                break
            self.mins.append(np.minimum(prev_min[:-half], prev_min[half:]))
            self.maxs.append(np.maximum(prev_max[:-half], prev_max[half:]))

    def query(self, lo: int, hi: int):  # [lo, hi)
        j = max(0, (hi - lo).bit_length() - 1)
        j = min(j, len(self.mins) - 1)
        half = 1 << j
        a, b = lo, hi - half
        return (min(self.mins[j][a], self.mins[j][b]),
                max(self.maxs[j][a], self.maxs[j][b]))


@dataclass(frozen=True)
class PointBlocks:
    """Static packing of a point template for the slab decode kernel."""
    perm: np.ndarray        # (M,) Morton sort order: perm[k] = original
    #                         index of the k-th packed REAL point (slots
    #                         include padding, so this is not per-slot)
    positions: np.ndarray   # (Mpad, 3) f32 permuted + zero-padded template
    origins: np.ndarray     # (n_blocks, 12) i32 (zt, yt, xt) per plane
    idxw: np.ndarray        # (32, Mpad) f32 per-point idx/weight rows
    #                         (None when reconstructed from a compact
    #                         cache — the device build then needs idx16)
    valid: np.ndarray       # (Mpad,) f32 1.0 real / 0.0 pad
    n_points: int           # real point count M
    block: int
    ey: int = EY
    ex: int = EX

    @property
    def n_blocks(self) -> int:
        return self.origins.shape[0]

    @property
    def m_padded(self) -> int:
        return self.positions.shape[0]


def compact_indices(pb: PointBlocks, plane_axes, box_warp, sizes,
                    bilinear: bool = False) -> np.ndarray:
    """(Mpad, 12) int16 compact host payload: per plane (ix, iy, iz)
    padded-axis indices + one int16 of the 6 host validity bits
    (vx0 vx1 vy0 vy1 vz0 vz1).

    Validity must be the HOST's, recomputed from the TRUE (unclipped)
    floor with the same math as the packer: where _corner_weights_1d's
    clip binds (point far outside the grid) idxp - 1 is NOT the true
    floor, so a device-side in-range check on it would wrongly validate
    a garbage corner — the host bits zero those corners exactly.

    This is the only host product the device weight build needs beyond
    (origins, positions); it is what the slab-context disk cache stores
    instead of the 32-row idxw block."""
    D, H, W = sizes
    inv = np.linalg.inv(plane_axes).astype(np.float32)
    g_h = (2.0 / box_warp) * pb.positions
    idx16 = np.zeros((pb.m_padded, 12), np.int16)
    for p in range(3):
        c0 = p * 9
        idx16[:, 4 * p + 0] = pb.idxw[c0 + 0].astype(np.int16)
        idx16[:, 4 * p + 1] = pb.idxw[c0 + 3].astype(np.int16)
        idx16[:, 4 * p + 2] = pb.idxw[c0 + 6].astype(np.int16)
        proj_h = g_h @ inv[p]
        bits = np.zeros(pb.m_padded, np.int16)
        axes = ((0, W), (1, H)) if bilinear else ((0, W), (1, H), (2, D))
        for ax, size in axes:
            x0t = np.floor(((proj_h[:, ax] + 1.0) * size - 1.0) * 0.5
                           ).astype(np.int64)
            v0 = (x0t >= 0) & (x0t < size)
            v1 = (x0t + 1 >= 0) & (x0t + 1 < size)
            bits = bits | (v0.astype(np.int16) << (2 * ax))
            bits = bits | (v1.astype(np.int16) << (2 * ax + 1))
        if bilinear:
            bits = bits | (1 << 4)   # single z "corner" always valid
        idx16[:, 4 * p + 3] = bits
    return idx16


def build_slab_weights(pb: PointBlocks, plane_axes=None, box_warp=None,
                       sizes=None, idx16=None, dzw: int = DZW,
                       bilinear: bool = False, as_fn: bool = False):
    """On-device build of the static per-point interpolation operands the
    slab kernel consumes (built once per template; a host-numpy build +
    tunnel transfer of the ~440 MB wzy measured minutes):

      wzy (3, Mpad, DZW*EY) bf16 — per-plane (z, y) trilinear weight matrix
          over the block's slab rows (4 nonzeros: 2 z-corners x 2 y-corners,
          validity folded — mirrors renderer._corner_weights_1d);
      axs (Mpad, 64) bf16 — per-plane x corner weights at block-local cell
          columns, packed [p*EX:(p+1)*EX).

    Everything is expressed in BLOCK-LOCAL coordinates relative to
    pb.origins, so the kernel needs no per-point index arithmetic.

    When (plane_axes, box_warp, sizes) are given, only the COMPACT int16
    padded indices ship to the device (~13 MB at flagship vs 73 MB for the
    full idxw rows — the tunnel transfer dominates context-build time);
    fracs and validity recompute on device from pb.positions. The host's
    integer indices stay authoritative (they define the packing windows);
    a device-side frac that lands 1 ulp across a cell boundary merely
    extrapolates the lerp by ~1e-6 — harmless — whereas a device-side
    floor could violate the window invariant."""
    import jax
    import jax.numpy as jnp

    nb, blk, ey, ex = pb.n_blocks, pb.block, pb.ey, pb.ex
    kr = dzw * ey
    assert 3 * ex <= 64, ex
    assert not bilinear or dzw == 1, (bilinear, dzw)

    if plane_axes is None:
        assert not as_fn, "as_fn requires the compact-idx16 path"
        # legacy full-idxw path (tests / callers without the projection)
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
            axs = jnp.concatenate(axss, axis=1)
            axs = jnp.pad(axs, ((0, 0), (0, 64 - 3 * ex)))
            return jnp.stack(wzys), axs

        return build(jnp.asarray(pb.origins), jnp.asarray(pb.idxw))

    D, H, W = sizes
    if idx16 is None:
        idx16 = compact_indices(pb, plane_axes, box_warp, sizes,
                                bilinear=bilinear)
    import numpy as np
    inv = np.linalg.inv(plane_axes).astype(np.float32)

    def build(origins, idx16, positions):
        blk_of = jnp.repeat(jnp.arange(nb), blk)
        r = jnp.arange(kr)
        zi = (r // ey).astype(jnp.float32)[None]
        yi = (r % ey).astype(jnp.float32)[None]
        xi = jnp.arange(ex, dtype=jnp.float32)[None]
        g = (2.0 / box_warp) * positions                # (Mpad, 3)
        wzys, axss = [], []
        for p in range(3):
            proj = g @ jnp.asarray(inv[p])
            ip = idx16[:, 4 * p:4 * p + 3].astype(jnp.float32)
            vbits = idx16[:, 4 * p + 3].astype(jnp.int32)

            def corner(x_cont, idxp, size, v0, v1):
                x = ((x_cont + 1.0) * size - 1.0) * 0.5
                w1 = x - (idxp - 1.0)
                return ((1.0 - w1) * v0, w1 * v1)

            def vbit(k):
                return ((vbits >> k) & 1).astype(jnp.float32)

            wxa, wxb = corner(proj[:, 0], ip[:, 0], W, vbit(0), vbit(1))
            wya, wyb = corner(proj[:, 1], ip[:, 1], H, vbit(2), vbit(3))
            if bilinear:
                # depth-1 planes: 2-D grid_sample semantics — no z lerp,
                # the single window row carries weight 1 (vbit 4 is set
                # by compact_indices; proj[:, 2] is NOT a z coordinate)
                wza, wzb = vbit(4), vbit(5)
            else:
                wza, wzb = corner(proj[:, 2], ip[:, 2], D, vbit(4), vbit(5))
            z0 = origins[blk_of, 3 * p].astype(jnp.float32)
            y0 = origins[blk_of, 3 * p + 1].astype(jnp.float32) * Y_ALIGN
            x0 = origins[blk_of, 3 * p + 2].astype(jnp.float32) * X_ALIGN
            izl = (ip[:, 2] - z0)[:, None]
            iyl = (ip[:, 1] - y0)[:, None]
            ixl = (ip[:, 0] - x0)[:, None]
            wz = (jnp.where(zi == izl, wza[:, None], 0.0)
                  + jnp.where(zi == izl + 1, wzb[:, None], 0.0))
            wy = (jnp.where(yi == iyl, wya[:, None], 0.0)
                  + jnp.where(yi == iyl + 1, wyb[:, None], 0.0))
            wzys.append((wz * wy).astype(jnp.bfloat16))
            axss.append((jnp.where(xi == ixl, wxa[:, None], 0.0)
                         + jnp.where(xi == ixl + 1, wxb[:, None], 0.0)
                         ).astype(jnp.bfloat16))
        axs = jnp.concatenate(axss, axis=1)
        axs = jnp.pad(axs, ((0, 0), (0, 64 - 3 * ex)))
        return jnp.stack(wzys), axs

    if as_fn:
        # traceable builder for callers composing a LARGER jit (e.g.
        # make_slab_context fuses build + quant/staging into ONE program:
        # each tunnel compile costs minutes on a cold cache)
        return build
    return jax.jit(build)(jnp.asarray(pb.origins), jnp.asarray(idx16),
                          jnp.asarray(pb.positions))


def build_point_blocks(
    init_position: np.ndarray,    # (M, 3) world coords
    plane_axes: np.ndarray,       # (3, 3, 3) generate_planes() output
    box_warp: float,
    sizes: tuple,                 # (D, H, W) tri-grid dims
    block: int = 1024,
    ey: int = EY,
    ex: int = EX,
    bilinear: bool = False,
) -> PointBlocks:
    """Morton-sort + greedy-pack the template into slab-fitting blocks.

    Per plane p the padded-axis indices (ix, iy, iz) of every point must
    fit a window: z in [zt, zt+DZW-1] (zt <= DZ-DZW), y in
    [8*yt, 8*yt+ey-1], x in [4*xt, 4*xt+ex-1], with room for the +1
    corner. The greedy walk binary-searches the longest sorted run that
    fits (O(1) range-min/max), so worst case it splits at Morton
    boundary crossings; pads each block to `block` slots.

    bilinear=True packs for the DEPTH-1 (EG3D tri-plane) kernel variant:
    2-D (y, x) windows only — there is no z interpolation (the reference
    samples depth-1 planes with 2-D grid_sample), so the z corner weights
    degenerate to (1, 0) at window row z=0 and the z fit constraint
    drops. Pair with ey=128 so the kernel's K-tile stays 1*128."""
    D, H, W = sizes
    M = init_position.shape[0]
    pos = np.asarray(init_position, np.float32)
    inv = np.linalg.inv(plane_axes).astype(np.float32)  # (3, 3, 3)
    g = (2.0 / box_warp) * pos                          # (M, 3) in [-1, 1]

    ix = np.zeros((3, M), np.int64)
    iy = np.zeros((3, M), np.int64)
    iz = np.zeros((3, M), np.int64)
    wts = np.zeros((3, 6, M), np.float32)  # (wxa wxb wya wyb wza wzb)
    for p in range(3):
        proj = g @ inv[p]                               # (M, 3)
        ix[p], wts[p, 0], wts[p, 1] = _corner_1d(proj[:, 0], W)
        iy[p], wts[p, 2], wts[p, 3] = _corner_1d(proj[:, 1], H)
        if bilinear:
            wts[p, 4] = 1.0   # single z "corner" at window row 0
        else:
            iz[p], wts[p, 4], wts[p, 5] = _corner_1d(proj[:, 2], D)

    # Morton order on the clamped world grid (the SAME clamped indices
    # that drive the windows, so clustering bounds the windows). Shift
    # each axis so the OCCUPIED region starts at a Morton-aligned corner:
    # greedy blocks then split at Morton-cube boundaries instead of
    # mid-cube (unshifted, the walk fragmented 5x on the flagship
    # template — 449% padding).
    gq = np.clip(((g + 1.0) * 0.5 * (W - 1)).astype(np.int64), 0, W - 1)
    gq = gq - gq.min(axis=0)
    order = np.argsort(_morton3(gq[:, 0], gq[:, 1], gq[:, 2]),
                       kind="stable")

    ixs, iys, izs = ix[:, order], iy[:, order], iz[:, order]
    rmm = [[_RangeMinMax(a[p]) for a in (ixs, iys, izs)] for p in range(3)]

    DZ = D + 2
    YP = _round_up(H + 2, Y_ALIGN)
    XP = _round_up(W + 2, X_ALIGN)

    def fits(lo: int, hi: int) -> bool:
        for p in range(3):
            xmin, xmax = rmm[p][0].query(lo, hi)
            x0 = min((xmin // X_ALIGN) * X_ALIGN, XP - ex)
            if xmax + 1 > x0 + ex - 1:
                return False
            ymin, ymax = rmm[p][1].query(lo, hi)
            y0 = min((ymin // Y_ALIGN) * Y_ALIGN, YP - ey)
            if ymax + 1 > y0 + ey - 1:
                return False
            if not bilinear:
                zmin, zmax = rmm[p][2].query(lo, hi)
                zt = min(zmin, DZ - DZW)
                if zmax + 1 > zt + DZW - 1:
                    return False
        return True

    starts = []
    ends = []
    lo = 0
    while lo < M:
        # largest hi in (lo, lo+block] with fits(lo, hi)
        hi_max = min(lo + block, M)
        if fits(lo, hi_max):
            hi = hi_max
        else:
            a, b = lo + 1, hi_max       # fits(lo, a) trivially true
            while a < b - 1:
                mid = (a + b) // 2
                if fits(lo, mid):
                    a = mid
                else:
                    b = mid
            hi = a
        starts.append(lo)
        ends.append(hi)
        lo = hi

    nb = len(starts)
    Mpad = nb * block
    perm = order
    positions = np.zeros((Mpad, 3), np.float32)
    idxw = np.zeros((32, Mpad), np.float32)
    valid = np.zeros((Mpad,), np.float32)
    origins = np.zeros((nb, 12), np.int32)
    for b, (s, e) in enumerate(zip(starts, ends)):
        sl = slice(b * block, b * block + (e - s))
        positions[sl] = pos[order[s:e]]
        valid[sl] = 1.0
        for p in range(3):
            xmin = ixs[p, s:e].min()
            ymin = iys[p, s:e].min()
            x0 = min((xmin // X_ALIGN) * X_ALIGN, XP - ex)
            y0 = min((ymin // Y_ALIGN) * Y_ALIGN, YP - ey)
            zt = 0 if bilinear else min(izs[p, s:e].min(), DZ - DZW)
            origins[b, 3 * p:3 * p + 3] = (zt, y0 // Y_ALIGN, x0 // X_ALIGN)
            c0 = p * 9
            idxw[c0 + 0, sl] = ixs[p, s:e]
            idxw[c0 + 1, sl] = wts[p, 0, order[s:e]]
            idxw[c0 + 2, sl] = wts[p, 1, order[s:e]]
            idxw[c0 + 3, sl] = iys[p, s:e]
            idxw[c0 + 4, sl] = wts[p, 2, order[s:e]]
            idxw[c0 + 5, sl] = wts[p, 3, order[s:e]]
            idxw[c0 + 6, sl] = izs[p, s:e]
            idxw[c0 + 7, sl] = wts[p, 4, order[s:e]]
            idxw[c0 + 8, sl] = wts[p, 5, order[s:e]]

    return PointBlocks(
        perm=perm, positions=positions, origins=origins, idxw=idxw,
        valid=valid, n_points=M, block=block, ey=ey, ex=ex)


def _round_up(v: int, m: int) -> int:
    return (v + m - 1) // m * m
