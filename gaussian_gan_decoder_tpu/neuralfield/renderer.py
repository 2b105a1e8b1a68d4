"""Tri-plane / tri-grid feature sampling + two-pass importance renderer.

Re-design of both reference variants:
  * PanoHead tri-grid (/root/reference/PanoHead/training/volumetric_rendering/
    renderer.py): 3D grid_sample over (C, D, H, W) sub-volumes, xyz composited
    alongside rgb, triplane-crop / cull-clouds density masking.
  * EG3D tri-plane (/root/reference/eg3d/training/volumetric_rendering/
    renderer.py): 2D grid_sample, and the fork's different third-plane axes
    (EG3D :35-37 vs PanoHead :27-29 — PanoHead fixed the axis bug; both are
    reproduced bit-exactly via `plane_variant`).

TPU notes: everything is static-shape; per-ray sorting uses a single
`jnp.sort`/`take_along_axis` (lowered to XLA variadic sort); stochastic
sampling takes explicit PRNG keys.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import grid_sample_2d, grid_sample_3d
from .math_utils import get_ray_limits_box, linspace_batch
from .ray_marcher import mip_ray_march


def generate_planes(variant: str = "panohead") -> np.ndarray:
    """Plane axis triples. variant in {'panohead', 'eg3d'}."""
    if variant == "panohead":
        # ref PanoHead renderer.py:21-29
        return np.array(
            [
                [[1, 0, 0], [0, 1, 0], [0, 0, 1]],
                [[1, 0, 0], [0, 0, 1], [0, 1, 0]],
                [[0, 1, 0], [0, 0, 1], [1, 0, 0]],
            ],
            dtype=np.float32,
        )
    # ref eg3d renderer.py:29-37 (kept for checkpoint parity)
    return np.array(
        [
            [[1, 0, 0], [0, 1, 0], [0, 0, 1]],
            [[1, 0, 0], [0, 0, 1], [0, 1, 0]],
            [[0, 0, 1], [1, 0, 0], [0, 1, 0]],
        ],
        dtype=np.float32,
    )


def project_onto_planes(plane_axes: np.ndarray, coordinates: jax.Array) -> jax.Array:
    """(N, M, 3) coords -> (N, n_planes, M, 3) plane-local coords
    (ref renderer.py:31-45; the reference flattens N*n_planes, we keep the
    plane axis explicit)."""
    inv = jnp.asarray(np.linalg.inv(plane_axes), coordinates.dtype)  # (P, 3, 3)
    return jnp.einsum("nmc,pcd->npmd", coordinates, inv)


def build_plane_table(
    plane_features: jax.Array,   # (N, 3, C*D, H, W)
    triplane_depth: int = 1,
    brick_dtype=None,
    pallas_build: bool = False,
):
    """Precompute the corner-brick expansion once so repeated probes of the
    SAME planes (sigma grid chunks, coarse+importance render passes) skip
    the rebuild — inside a lax.map/scan body XLA does NOT reliably hoist
    the loop-invariant expansion, so each chunk would pay it again.

    brick_dtype=jnp.int8 quantizes the tri-grid table rows with per
    (plane, channel) symmetric scales: the 256-byte rows gather at
    ~9.7 ms/frame vs 16.2 ms for 512-byte bf16 rows at flagship scale
    (TPU gathers are row-rate bound; bytes set the rate) — at ~2^-7
    relative feature error. Scales ride in the table tuple."""
    N, n_planes, CD, H, W = plane_features.shape
    C, D = CD // triplane_depth, triplane_depth
    int8 = brick_dtype == jnp.int8
    if int8:
        assert triplane_depth > 1, "int8 bricks: tri-grid path only"
        # quantize the SMALL raw volume (B*C*D*H*W elements) and stream
        # int8 through the expansion — ~10x cheaper than quantizing the
        # 8x-expanded table, and the build kernel moves half the bytes
        feats = plane_features.astype(jnp.float32).reshape(
            N * n_planes, C, D, H, W)
        absmax = jnp.max(jnp.abs(feats), axis=(2, 3, 4))
        scales = jnp.maximum(absmax / 127.0, 1e-12)        # (B, C)
        q = feats * (1.0 / scales)[:, :, None, None, None]
        q8 = jnp.clip(jnp.round(q), -127, 127).astype(jnp.int8)
        e, NY = _trilinear_table(q8, pallas_build)
        return (e, NY, scales)
    if brick_dtype is not None:
        plane_features = plane_features.astype(brick_dtype)
    if triplane_depth == 1:
        feats = plane_features.reshape(N * n_planes, C, H, W)
        return _bilinear_table(feats)
    feats = plane_features.reshape(N * n_planes, C, D, H, W)
    e, NY = _trilinear_table(
        feats, pallas_build if triplane_depth > 1 else False)
    return (e, NY)


def sample_from_planes(
    plane_axes: np.ndarray,
    plane_features: jax.Array,   # (N, 3, C*D, H, W)
    coordinates: jax.Array,      # (N, M, 3)
    box_warp: float,
    triplane_depth: int = 1,
    brick_dtype=None,            # e.g. jnp.bfloat16: halve the expanded-
    # volume bytes (build/transpose/gather); lerp still accumulates in the
    # input dtype. ~2^-8 relative feature error — OFF by default (parity).
    pallas_build: bool = False,  # Pallas streaming brick-table build
    # (tri-grid only; ~4x faster than the XLA 8-slice concat on TPU)
    table=None,                  # build_plane_table output: reuse across calls
) -> jax.Array:
    """Probe the tri-plane/tri-grid at world coords (ref renderer.py:47-58).

    Returns (N, n_planes, M, C). triplane_depth == 1 uses 2D bilinear taps
    (EG3D); > 1 uses trilinear taps over the depth-stacked sub-volumes
    (PanoHead tri-grid). Semantics identical to torch grid_sample with
    align_corners=False / zeros padding (parity-tested).

    TPU implementation: gathers on TPU cost ~constant per ROW regardless of
    row width, so instead of 8 (or 4) separate corner gathers per tap we
    pre-expand the volume into "corner bricks": E[p] = concat of the
    2x2x2 (or 2x2) neighbourhood's channels, giving ONE wide gather per
    (point, plane) — ~8x fewer gather rows at the HBM-bandwidth limit.
    """
    N, n_planes, CD, H, W = plane_features.shape
    M = coordinates.shape[1]
    C, D = CD // triplane_depth, triplane_depth

    coordinates = (2.0 / box_warp) * coordinates
    proj = project_onto_planes(plane_axes, coordinates)  # (N, P, M, 3)
    proj = proj.reshape(N * n_planes, M, 3)

    out_dtype = (jnp.float32 if brick_dtype == jnp.int8
                 else plane_features.dtype)
    if table is None:
        table = build_plane_table(
            plane_features.reshape(N, n_planes, CD, H, W), triplane_depth,
            brick_dtype=brick_dtype, pallas_build=pallas_build,
        )
    if triplane_depth == 1:
        out = _bilinear_sample_table(table, C, H, W, proj[..., :2])
    else:
        out = _trilinear_sample_table(table, C, D, H, W, proj)
    return out.reshape(N, n_planes, M, C).astype(out_dtype)


def _unnorm(g, size):
    # align_corners=False: x = ((g + 1) * size - 1) / 2
    return ((g + 1.0) * size - 1.0) * 0.5


def _corner_weights_1d(g, size):
    x = _unnorm(g, size)
    x0 = jnp.floor(x).astype(jnp.int32)
    w1 = x - x0
    v0 = (x0 >= 0) & (x0 < size)
    v1 = (x0 + 1 >= 0) & (x0 + 1 < size)
    # clamped index into the zero-padded (+1 shifted) axis
    idxp = jnp.clip(x0 + 1, 0, size)
    return idxp, w1, v0, v1


def _bilinear_table(feats):
    """feats (B, C, H, W) -> (e (B, (H+1)*(W+1), 4C),) corner-brick table."""
    B, C, H, W = feats.shape
    # zero-pad one voxel on each side, channels-last
    fp = jnp.pad(feats, ((0, 0), (0, 0), (1, 1), (1, 1)))
    fcl = jnp.transpose(fp, (0, 2, 3, 1))  # (B, H+2, W+2, C)
    # corner-brick expansion: E[y, x] = [f[y, x], f[y, x+1], f[y+1, x], f[y+1, x+1]]
    e = jnp.concatenate(
        [
            fcl[:, :-1, :-1], fcl[:, :-1, 1:],
            fcl[:, 1:, :-1], fcl[:, 1:, 1:],
        ],
        axis=-1,
    )  # (B, H+1, W+1, 4C)
    return (e.reshape(B, (H + 1) * (W + 1), 4 * C),)


def _bilinear_sample_table(table, C, H, W, grid):
    """table from _bilinear_table; grid (B, M, 2) in [-1,1] -> (B, M, C)."""
    (e,) = table
    B = e.shape[0]
    ix, wx, vx0, vx1 = _corner_weights_1d(grid[..., 0], W)
    iy, wy, vy0, vy1 = _corner_weights_1d(grid[..., 1], H)
    idx = iy * (W + 1) + ix

    def combine(rows, wxb, wyb, vx0b, vx1b, vy0b, vy1b):
        c00, c01, c10, c11 = jnp.split(rows, 4, axis=-1)
        wxb = wxb[..., None]
        wyb = wyb[..., None]
        m = lambda v: v[..., None].astype(rows.dtype)  # noqa: E731
        return (
            c00 * m(vy0b & vx0b) * (1 - wxb) * (1 - wyb)
            + c01 * m(vy0b & vx1b) * wxb * (1 - wyb)
            + c10 * m(vy1b & vx0b) * (1 - wxb) * wyb
            + c11 * m(vy1b & vx1b) * wxb * wyb
        )

    wargs = (wx, wy, vx0, vx1, vy0, vy1)
    if B <= 12:
        # unrolled plain takes beat one batched gather (see trilinear note)
        return jnp.stack(
            [combine(jnp.take(e[b], idx[b], axis=0), *(a[b] for a in wargs))
             for b in range(B)]
        )
    rows = jax.vmap(lambda ee, ii: jnp.take(ee, ii, axis=0))(e, idx)  # (B, M, 4C)
    return jax.vmap(combine)(rows, *wargs)


def _trilinear_table(feats, pallas_build=False):
    """feats (B, C, D, H, W) -> (e, NY) corner-brick table.

    pallas_build: False (XLA 8-slice concat) | True (Pallas streaming
    build) | 'select' (Pallas build with the channel-duplicated source:
    lane-aligned masked-select stores instead of lane rotations)."""
    B, C, D, H, W = feats.shape
    if pallas_build:
        from .pallas_expand import build_brick_table

        e, NY = build_brick_table(feats, select=pallas_build == "select")
    else:
        # transpose the UNPADDED volume (smaller + better-shaped), pad after
        fcl = jnp.transpose(feats, (0, 2, 3, 4, 1))   # (B, D, H, W, C)
        fcl = jnp.pad(fcl, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
        parts = []
        for dz in (0, 1):
            for dy in (0, 1):
                for dx in (0, 1):
                    parts.append(
                        fcl[
                            :,
                            dz: dz + D + 1,
                            dy: dy + H + 1,
                            dx: dx + W + 1,
                        ]
                    )
        e = jnp.concatenate(parts, axis=-1)  # (B, D+1, H+1, W+1, 8C)
        e = e.reshape(B, (D + 1) * (H + 1) * (W + 1), 8 * C)
        NY = H + 1
    return (e, NY)


def build_slab_volume(
    plane_features: jax.Array,   # (1, n_planes, C*D, H, W)
    triplane_depth: int,
    y_align: int = 8,
    x_align: int = 4,
    clip_quantile: float = 0.0,
):
    """Per-frame channels-last int8 volume for the slab decode kernel
    (decoder/pallas_heads.decode_project_pallas_slab): NO corner-brick
    expansion — the kernel DMAs raw slabs and performs the trilinear lerp
    as MXU contractions, so the volume stays at 1x (vs 8x) the feature
    bytes.

    Layout matches the padded-axis contract of _corner_weights_1d
    (align_corners=False + zeros padding; padded index = clip(x0+1, 0,
    size)): one zero voxel of leading pad per axis, trailing pad rounded
    up to the DMA alignment granule (y: 8 sublanes int8, x: 4 cells * 32
    ch = 128 lanes).

    -> (vol (P, D+2, YP, XP*C) int8, scales (P, C) f32) with
    YP = roundup(H+2, y_align), XP = roundup(W+2, x_align). Quantization
    identical to build_plane_table's int8 path (same absmax scales).

    triplane_depth == 1 (EG3D tri-planes, 2-D grid_sample semantics —
    no z interpolation) emits (P, 1, YP, XP*C): a single z layer with no
    z padding, matching the bilinear packer's zt = 0 window."""
    N, n_planes, CD, H, W = plane_features.shape
    assert N == 1, "slab volume is a per-frame (batch-1) structure"
    D = triplane_depth
    C = CD // D
    feats = plane_features.astype(jnp.float32).reshape(n_planes, C, D, H, W)
    if clip_quantile and clip_quantile < 1.0:
        # percentile scales: a handful of outlier features otherwise set
        # the whole channel's quantization step; clipping the top
        # (1-q) tail roughly halves the step (~+6 dB feature SNR) at the
        # cost of saturating those outliers
        absmax = jnp.quantile(
            jnp.abs(feats.reshape(n_planes, C, -1)), clip_quantile, axis=2)
    else:
        absmax = jnp.max(jnp.abs(feats), axis=(2, 3, 4))
    scales = jnp.maximum(absmax / 127.0, 1e-12)          # (P, C)
    q = feats * (1.0 / scales)[:, :, None, None, None]
    q8 = jnp.clip(jnp.round(q), -127, 127).astype(jnp.int8)
    YP = -(-(H + 2) // y_align) * y_align
    XP = -(-(W + 2) // x_align) * x_align
    fcl = jnp.transpose(q8, (0, 2, 3, 4, 1))             # (P, D, H, W, C)
    zpad = (0, 0) if D == 1 else (1, 1)
    fcl = jnp.pad(fcl, ((0, 0), zpad, (1, YP - H - 1), (1, XP - W - 1),
                        (0, 0)))
    dz = 1 if D == 1 else D + 2
    return fcl.reshape(n_planes, dz, YP, XP * C), scales


def _trilinear_sample_table(table, C, D, H, W, grid):
    """table from build_plane_table ((e, NY) float or (e, NY, scales)
    int8); grid (B, M, 3) in [-1,1] -> (B, M, C)."""
    e, NY = table[0], table[1]
    scales = table[2] if len(table) > 2 else None   # (B, C) int8 dequant
    B = e.shape[0]
    ix, wx, vx0, vx1 = _corner_weights_1d(grid[..., 0], W)
    iy, wy, vy0, vy1 = _corner_weights_1d(grid[..., 1], H)
    iz, wz, vz0, vz1 = _corner_weights_1d(grid[..., 2], D)
    idx = (iz * NY + iy) * (W + 1) + ix

    wdt = jnp.float32 if scales is not None else e.dtype

    def combine(rows, wxb, wyb, wzb, vx0b, vx1b, vy0b, vy1b, vz0b, vz1b,
                scale_b=None):
        # NO barrier before the 8-corner combine: XLA keeps it as one
        # fusion over a single gather; materializing rows (768 MB at
        # flagship) measured +13 ms
        cs = jnp.split(rows, 8, axis=-1)  # order (dz, dy, dx)
        wxb = wxb[..., None]
        wyb = wyb[..., None]
        wzb = wzb[..., None]
        m = lambda v: v[..., None].astype(wdt)  # noqa: E731
        vz = (vz0b, vz1b)
        vy = (vy0b, vy1b)
        vx = (vx0b, vx1b)
        wzs = (1 - wzb, wzb)
        wys = (1 - wyb, wyb)
        wxs = (1 - wxb, wxb)
        out = 0.0
        k = 0
        for dz in (0, 1):
            for dy in (0, 1):
                for dx in (0, 1):
                    out = out + (cs[k].astype(wdt)
                                 * m(vz[dz] & vy[dy] & vx[dx])
                                 * wzs[dz] * wys[dy] * wxs[dx])
                    k += 1
        if scale_b is not None:  # int8 dequant (per plane, channel)
            out = out * scale_b[None, :]
        return out

    wargs = (wx, wy, wz, vx0, vx1, vy0, vy1, vz0, vz1)
    if B <= 12:
        # unrolled per-plane takes: a batched (vmap'd) gather measured
        # 13.1 ns/row vs 9.1 ns/row for plain takes — ~6 ms/frame at
        # flagship (3 planes x 500k rows)
        return jnp.stack(
            [combine(jnp.take(e[b], idx[b], axis=0), *(a[b] for a in wargs),
                     scale_b=None if scales is None else scales[b])
             for b in range(B)]
        )
    assert scales is None, "int8 path uses the unrolled per-plane takes"
    rows = jax.vmap(lambda ee, ii: jnp.take(ee, ii, axis=0))(e, idx)  # (B, M, 8C)
    return jax.vmap(combine)(rows, *wargs)


def sample_fused_inputs(
    plane_axes: np.ndarray,
    plane_features: jax.Array,   # (1, n_planes, C*D, H, W)
    coordinates: jax.Array,      # (1, M, 3)
    box_warp: float,
    triplane_depth: int = 1,
    brick_dtype=None,
    pallas_build: bool = False,
    table=None,
    pad_to: Optional[int] = None,
):
    """XLA-side inputs for the gather-fused heads kernel
    (decoder/pallas_heads.decode_project_pallas_fused).

    The lerp/dequant/plane-mean of sample_from_planes moves INTO the Pallas
    heads kernel: feeding the opaque pallas_call forces XLA to materialise
    every intermediate of the gather->lerp->mean->concat chain (measured
    ~+8 ms/frame over the same math fused into a reduction), so the XLA
    side here is only what MUST materialise — the per-plane brick-row
    takes — plus cheap 1-D index/weight vectors.

    Returns (rows, wts_cm, smats, K):
      rows   — list of n_planes (Mpad, K*C) brick-row takes (table dtype);
      wts_cm — (WR, Mpad) f32 CHANNEL-MAJOR corner weights, row p*K+c =
               mask-folded corner weight (same f32 products
               _trilinear_sample_table uses); WR = round_up(n_planes*K, 8);
      smats  — (n_planes, K*C, C) f32 segment-sum matrices with the int8
               dequant scales and the 1/n_planes mean folded in, so
               fm = sum_p (rows_p * expand(w8_p)) @ smats[p]
               == mean_p(lerp_sample(plane p)) (f32 accumulation);
      K      — corners per tap (8 tri-grid, 4 tri-plane).
    """
    N, n_planes, CD, H, W = plane_features.shape
    assert N == 1, "fused sampling is single-scene (decode hot path)"
    M = coordinates.shape[1]
    C, D = CD // triplane_depth, triplane_depth
    Mpad = pad_to if pad_to is not None else M
    assert Mpad >= M

    coords = (2.0 / box_warp) * coordinates
    proj = project_onto_planes(plane_axes, coords).reshape(n_planes, M, 3)

    if table is None:
        table = build_plane_table(
            plane_features, triplane_depth,
            brick_dtype=brick_dtype, pallas_build=pallas_build,
        )
    e = table[0]
    if triplane_depth == 1:
        K, NY, scales = 4, None, None
    else:
        K, NY = 8, table[1]
        scales = table[2] if len(table) > 2 else None

    def w01(w, v0, v1):
        return (jnp.where(v0, 1.0 - w, 0.0), jnp.where(v1, w, 0.0))

    rows, wcols = [], []
    for b in range(n_planes):
        g = proj[b]
        ix, wx, vx0, vx1 = _corner_weights_1d(g[:, 0], W)
        iy, wy, vy0, vy1 = _corner_weights_1d(g[:, 1], H)
        ax, ay = w01(wx, vx0, vx1), w01(wy, vy0, vy1)
        if K == 8:
            iz, wz, vz0, vz1 = _corner_weights_1d(g[:, 2], D)
            az = w01(wz, vz0, vz1)
            idx = (iz * NY + iy) * (W + 1) + ix
            for dz in (0, 1):
                for dy in (0, 1):
                    for dx in (0, 1):
                        wcols.append(az[dz] * ay[dy] * ax[dx])
        else:
            idx = iy * (W + 1) + ix
            for dy in (0, 1):
                for dx in (0, 1):
                    wcols.append(ay[dy] * ax[dx])
        if Mpad != M:  # pad the INDEX (cheap) so the take emits (Mpad, K*C)
            idx = jnp.pad(idx, (0, Mpad - M))
        rows.append(jnp.take(e[b], idx, axis=0))

    wts = jnp.stack([w.astype(jnp.float32) for w in wcols])  # (n_planes*K, M)
    WR = -(-(n_planes * K) // 8) * 8
    wts = jnp.pad(wts, ((0, WR - n_planes * K), (0, Mpad - M)))

    seg = np.zeros((K * C, C), np.float32)
    for c in range(K):
        seg[c * C:(c + 1) * C] = np.eye(C, dtype=np.float32)
    seg_j = jnp.asarray(seg)
    if scales is None:
        smats = jnp.broadcast_to(seg_j / n_planes, (n_planes, K * C, C))
    else:  # int8: per-(plane, channel) dequant scale on the output channel
        smats = seg_j[None] * (scales[:, None, :] / n_planes)
    return rows, wts, smats, K


def sample_from_3dgrid(grid: jax.Array, coordinates: jax.Array) -> jax.Array:
    """(1|N, C, H, W, D) dense grid probe (ref renderer.py:60-73)."""
    N, M, _ = coordinates.shape
    vol = jnp.broadcast_to(grid, (N,) + grid.shape[1:])
    # torch grid_sample 5D: input (N,C,D,H,W); ref passes (N,C,H,W,D) and a
    # (N,1,1,M,3) grid, relying on torch's (x,y,z)->(W,H,D) convention.
    vol = jnp.transpose(vol, (0, 1, 4, 2, 3))  # -> (N, C, D=W? ...) — keep torch order
    g = coordinates[:, None, None, :, :]
    out = grid_sample_3d(vol, g)[:, :, 0, 0]  # (N, C, M)
    return jnp.transpose(out, (0, 2, 1))


def triplane_crop_mask(xyz: jax.Array, thresh: float, boxwarp: float, allow_bottom: bool = True):
    """Density mask outside the cropped box (ref renderer.py:75-86)."""
    flip = jnp.asarray([-1.0, 1.0, -1.0], xyz.dtype)
    p = xyz * flip
    lim = boxwarp / 2 - thresh
    inside_xz = jnp.all(jnp.abs(p[..., [0, 2]]) <= lim, axis=-1, keepdims=True)
    ans = inside_xz
    if allow_bottom:
        ans = ans | ((p[..., 1:2] <= -lim) & inside_xz)
    return ~ans


def cull_clouds_mask(densities: jax.Array, thresh: float):
    """(ref renderer.py:87-90)"""
    d = jax.nn.softplus(densities - 1)
    alpha = 1 - jnp.exp(-d)
    return alpha < thresh


@dataclass(frozen=True)
class ImportanceRenderer:
    """Two-pass (coarse + importance) volume renderer.

    plane_variant selects the plane-axis constants AND the marcher's rgb
    range convention ('eg3d' maps composited rgb to (-1,1), ref
    eg3d/.../ray_marcher.py:54).
    """

    plane_variant: str = "panohead"

    @property
    def plane_axes(self) -> np.ndarray:
        return generate_planes(self.plane_variant)

    # -- model probe --------------------------------------------------------

    def run_model(self, planes, decoder_fn, sample_coordinates, sample_directions, options) -> Dict:
        """Probe planes + decode (ref renderer.py:198-205).

        decoder_fn(features (N,P,M,C), directions (N,M,3)) -> {'rgb','sigma'}.
        options['plane_table'] (build_plane_table output) skips the
        per-call brick expansion."""
        feats = sample_from_planes(
            self.plane_axes, planes, sample_coordinates,
            box_warp=options["box_warp"],
            triplane_depth=options.get("triplane_depth", 1),
            table=options.get("plane_table"),
        )
        out = decoder_fn(feats, sample_directions)
        if options.get("density_noise", 0) > 0:
            key = options.get("density_noise_key")
            assert key is not None, "density_noise needs 'density_noise_key'"
            out["sigma"] = out["sigma"] + (
                jax.random.normal(key, out["sigma"].shape, out["sigma"].dtype)
                * options["density_noise"]
            )
        out["xyz"] = sample_coordinates
        return out

    # -- depth proposal ------------------------------------------------------

    def sample_stratified(
        self, key, ray_origins, ray_start, ray_end, depth_resolution,
        disparity_space_sampling=False,
    ):
        """(ref renderer.py:239-262) -> (N, R, S, 1) jittered depths."""
        N, R, _ = ray_origins.shape
        S = depth_resolution
        if disparity_space_sampling:
            base = jnp.linspace(0.0, 1.0, S, dtype=ray_origins.dtype)
            base = jnp.broadcast_to(base.reshape(1, 1, S, 1), (N, R, S, 1))
            delta = 1.0 / (S - 1)
            u = jax.random.uniform(key, (N, R, S, 1), ray_origins.dtype)
            d = base + u * delta
            return 1.0 / (1.0 / ray_start * (1.0 - d) + 1.0 / ray_end * d)
        if isinstance(ray_start, jax.Array) and ray_start.ndim > 0:
            # per-ray limits: linspace over (N,R,1) tensors -> (S,N,R,1)
            d = linspace_batch(ray_start, ray_end, S)
            d = jnp.transpose(d, (1, 2, 0, 3))  # (N, R, S, 1)
            delta = (ray_end - ray_start) / (S - 1)  # (N, R, 1)
            u = jax.random.uniform(key, d.shape, d.dtype)
            return d + u * delta[..., None]
        base = jnp.linspace(ray_start, ray_end, S, dtype=ray_origins.dtype)
        base = jnp.broadcast_to(base.reshape(1, 1, S, 1), (N, R, S, 1))
        delta = (ray_end - ray_start) / (S - 1)
        u = jax.random.uniform(key, base.shape, base.dtype)
        return base + u * delta

    def sample_importance(self, key, z_vals, weights, n_importance):
        """PDF importance resampling (ref renderer.py:264-282)."""
        N, R, S, _ = z_vals.shape
        z = z_vals.reshape(N * R, S)
        w = weights.reshape(N * R, -1)
        # smooth: max_pool1d(2, stride 1, pad 1) then avg_pool1d(2, stride 1);
        # torch max-pool pads with -inf
        w_pad = jnp.concatenate(
            [jnp.full_like(w[:, :1], -jnp.inf), w, jnp.full_like(w[:, :1], -jnp.inf)],
            axis=1,
        )
        w_max = jnp.maximum(w_pad[:, :-1], w_pad[:, 1:])  # (NR, S)
        w_smooth = (w_max[:, :-1] + w_max[:, 1:]) / 2
        w_smooth = w_smooth + 0.01

        z_mid = (z[:, :-1] + z[:, 1:]) / 2
        samples = sample_pdf(key, z_mid, w_smooth[:, 1:-1], n_importance)
        return jax.lax.stop_gradient(samples).reshape(N, R, n_importance, 1)

    # -- full two-pass forward ----------------------------------------------

    def __call__(
        self,
        key,
        planes,
        decoder_fn: Callable,
        ray_origins,
        ray_directions,
        rendering_options: Dict,
        triplane_crop: Optional[float] = 0.1,
        cull_clouds: Optional[float] = None,
        binarize_clouds: Optional[float] = None,
    ):
        """-> (rgb_final (N,R,C), depth_final (N,R,1), weight_sum (N,R,1))

        (ref renderer.py:100-196). For plane_variant='eg3d' the xyz/crop
        machinery is disabled (the EG3D fork never tracks xyz).
        """
        opts = rendering_options
        if "plane_table" not in opts:
            # build the brick table ONCE for the coarse + importance passes
            opts = dict(opts)
            opts["plane_table"] = build_plane_table(
                planes, opts.get("triplane_depth", 1),
                brick_dtype=opts.get("probe_brick_dtype"),
                pallas_build=opts.get("probe_pallas_build", False),
            )
        track_xyz = self.plane_variant == "panohead"
        k_strat, k_imp = jax.random.split(key)

        if opts["ray_start"] == opts["ray_end"] == "auto":
            ray_start, ray_end = get_ray_limits_box(
                ray_origins, ray_directions, box_side_length=opts["box_warp"]
            )
            is_valid = ray_end > ray_start
            any_valid = jnp.any(is_valid)
            rs_min = jnp.min(jnp.where(is_valid, ray_start, jnp.inf))
            rs_max = jnp.max(jnp.where(is_valid, ray_start, -jnp.inf))
            ray_start = jnp.where(is_valid, ray_start, jnp.where(any_valid, rs_min, ray_start))
            ray_end = jnp.where(is_valid, ray_end, jnp.where(any_valid, rs_max, ray_end))
            depths_coarse = self.sample_stratified(
                k_strat, ray_origins, ray_start, ray_end,
                opts["depth_resolution"], opts.get("disparity_space_sampling", False),
            )
        else:
            depths_coarse = self.sample_stratified(
                k_strat, ray_origins, opts["ray_start"], opts["ray_end"],
                opts["depth_resolution"], opts.get("disparity_space_sampling", False),
            )

        N, R, S, _ = depths_coarse.shape

        def probe(depths, n_samples):
            coords = (
                ray_origins[:, :, None, :] + depths * ray_directions[:, :, None, :]
            ).reshape(N, -1, 3)
            dirs = jnp.broadcast_to(
                ray_directions[:, :, None, :], (N, R, n_samples, 3)
            ).reshape(N, -1, 3)
            out = self.run_model(planes, decoder_fn, coords, dirs, opts)
            colors = out["rgb"]
            densities = out["sigma"]
            xyz = out["xyz"]
            if track_xyz:
                if triplane_crop:
                    mask = triplane_crop_mask(xyz, triplane_crop, opts["box_warp"])
                    densities = jnp.where(mask, -1e3, densities)
                if binarize_clouds:
                    m = cull_clouds_mask(densities, binarize_clouds)
                    densities = jnp.where(m, -1e3, 1e3)
                elif cull_clouds:
                    m = cull_clouds_mask(densities, cull_clouds)
                    densities = jnp.where(m, -1e3, densities)
            colors = colors.reshape(N, R, n_samples, -1)
            densities = densities.reshape(N, R, n_samples, 1)
            xyz = xyz.reshape(N, R, n_samples, 3)
            return colors, densities, xyz

        colors_c, densities_c, xyz_c = probe(depths_coarse, S)

        n_imp = opts["depth_resolution_importance"]
        if n_imp > 0:
            _, _, weights = mip_ray_march(
                colors_c, densities_c, depths_coarse,
                clamp_mode=opts["clamp_mode"], white_back=opts.get("white_back", False),
            )
            depths_fine = self.sample_importance(k_imp, depths_coarse, weights, n_imp)
            colors_f, densities_f, xyz_f = probe(depths_fine, n_imp)

            all_depths, all_colors, all_densities, all_xyz = unify_samples(
                depths_coarse, colors_c, densities_c, xyz_c,
                depths_fine, colors_f, densities_f, xyz_f,
            )
        else:
            all_depths, all_colors, all_densities, all_xyz = (
                depths_coarse, colors_c, densities_c, xyz_c,
            )

        if track_xyz:
            blended = jnp.concatenate([all_colors, all_xyz], axis=-1)
        else:
            blended = all_colors
        rgb_final, depth_final, weights = mip_ray_march(
            blended, all_densities, all_depths,
            clamp_mode=opts["clamp_mode"], white_back=opts.get("white_back", False),
            rgb_to_minus1_1=(self.plane_variant == "eg3d"),
        )
        if track_xyz:
            rgb_final = rgb_final[..., :-3]
        return rgb_final, depth_final, jnp.sum(weights, axis=2)


def unify_samples(d1, c1, s1, x1, d2, c2, s2, x2):
    """Merge + depth-sort coarse and fine samples (ref renderer.py:225-237)."""
    d = jnp.concatenate([d1, d2], axis=-2)
    c = jnp.concatenate([c1, c2], axis=-2)
    x = jnp.concatenate([x1, x2], axis=-2)
    s = jnp.concatenate([s1, s2], axis=-2)
    idx = jnp.argsort(d, axis=-2)  # (..., 2S, 1)

    def gather(a):
        return jnp.take_along_axis(
            a, jnp.broadcast_to(idx, a.shape[:-1] + (1,)).repeat(a.shape[-1], axis=-1),
            axis=-2,
        )

    return gather(d), gather(c), gather(s), gather(x)


def sample_pdf(key, bins, weights, n_importance, det=False, eps=1e-5):
    """Inverse-CDF sampling (ref renderer.py:284-323).

    bins: (B, S+1)-ish mid-bin positions; weights: (B, S)."""
    B, S = weights.shape
    weights = weights + eps
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[:, :1]), cdf], axis=-1)  # (B, S+1)

    if det:
        u = jnp.broadcast_to(
            jnp.linspace(0.0, 1.0, n_importance, dtype=bins.dtype), (B, n_importance)
        )
    else:
        u = jax.random.uniform(key, (B, n_importance), bins.dtype)

    inds = jax.vmap(lambda c, uu: jnp.searchsorted(c, uu, side="right"))(cdf, u)
    below = jnp.maximum(inds - 1, 0)
    above = jnp.minimum(inds, S)

    cdf_b = jnp.take_along_axis(cdf, below, axis=1)
    cdf_a = jnp.take_along_axis(cdf, above, axis=1)
    bins_b = jnp.take_along_axis(bins, below, axis=1)
    bins_a = jnp.take_along_axis(bins, above, axis=1)

    denom = cdf_a - cdf_b
    denom = jnp.where(denom < eps, 1.0, denom)
    return bins_b + (u - cdf_b) / denom * (bins_a - bins_b)
