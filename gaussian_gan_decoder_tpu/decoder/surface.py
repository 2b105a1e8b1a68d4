"""Iso-surface point sampling from a density grid — fully on device.

Replaces the reference's target-surface pipeline
(/root/reference/main/decoder_utils/target_dataloader.py:104-176 +
main/marching_cube/sample.py:5-26): 128^3 sigma grid -> marching cubes on
the **CPU** (skimage) -> trimesh -> barycentric resampling back on GPU.
That device->host->device round trip happens EVERY training step.

TPU-first redesign: **marching tetrahedra in pure JAX** with static
shapes. Each grid cube splits into 6 Kuhn tetrahedra; the 16 sign cases
per tet are derivable without the classic 256-entry MC tables. Output is
a fixed-capacity triangle soup (validity-counted), from which the target
point cloud is sampled exactly like the reference: per-face uniform
choice, sum-normalised random barycentric weights
(target_dataloader.py:108-112 — NOT area-weighted, replicated), and
Gaussian "thickness" shrink jitter (:115-118).

Deviations (documented):
  * marching tetrahedra instead of marching cubes — same iso-surface,
    finer triangulation (more, smaller triangles across each cube);
  * faces are chosen by uniform RANDOM index instead of the reference's
    deterministic cyclic repetition until 500k (statistically identical).

Coordinate convention replicated exactly: vertex index-space coords are
divided by res and shifted by -0.5 (target_dataloader.py:101-103),
including the reference's res/(res-1) scale quirk.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def create_samples(samples_per_axis: int = 256, cube_length: float = 1.0) -> jnp.ndarray:
    """(1, R^3, 3) world-coord grid, index order i(x) slow, k(z) fast
    (ref marching_cube/sample.py:5-26, voxel_origin = 0)."""
    r = samples_per_axis
    vs = cube_length / (r - 1)
    idx = np.arange(r, dtype=np.float32) * vs - cube_length / 2
    ii, jj, kk = np.meshgrid(idx, idx, idx, indexing="ij")
    pts = np.stack([ii, jj, kk], axis=-1).reshape(1, r ** 3, 3)
    return jnp.asarray(pts)


# --- Kuhn 6-tet decomposition; corner id = 4i + 2j + k ----------------------

_TETS = np.array(
    [
        [0, 1, 3, 7],
        [0, 3, 2, 7],
        [0, 2, 6, 7],
        [0, 6, 4, 7],
        [0, 4, 5, 7],
        [0, 5, 1, 7],
    ],
    dtype=np.int32,
)
_CORNER_OFFS = np.array(
    [[i, j, k] for i in (0, 1) for j in (0, 1) for k in (0, 1)], dtype=np.int32
)  # corner id 4i+2j+k


def _tet_case_tables():
    """Derive the 16-case (triangles as local-vertex edge pairs) tables."""
    tri_a = np.zeros((16, 2, 3), np.int32)
    tri_b = np.zeros((16, 2, 3), np.int32)
    tri_valid = np.zeros((16, 2), bool)
    for case in range(16):
        ins = [i for i in range(4) if case & (1 << i)]
        outs = [i for i in range(4) if not case & (1 << i)]
        tris = []
        if len(ins) == 1:
            a = ins[0]
            tris = [[(a, outs[0]), (a, outs[1]), (a, outs[2])]]
        elif len(ins) == 3:
            a = outs[0]
            tris = [[(a, ins[0]), (a, ins[1]), (a, ins[2])]]
        elif len(ins) == 2:
            a0, a1 = ins
            b0, b1 = outs
            tris = [
                [(a0, b0), (a0, b1), (a1, b1)],
                [(a0, b0), (a1, b1), (a1, b0)],
            ]
        for t, tri in enumerate(tris):
            tri_valid[case, t] = True
            for v, (ea, eb) in enumerate(tri):
                tri_a[case, t, v] = ea
                tri_b[case, t, v] = eb
    return tri_a, tri_b, tri_valid


_TRI_A, _TRI_B, _TRI_VALID = _tet_case_tables()


@partial(jax.jit, static_argnames=("face_capacity", "two_stage"))
def marching_tetrahedra_faces(
    sigmas: jax.Array,      # (R, R, R)
    level: float = 10.0,
    face_capacity: int = 2 ** 20,
    two_stage: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """-> (verts (face_capacity, 3, 3) normalised coords, n_faces scalar,
    n_dropped_cubes scalar — two-stage cube-capacity overflow, 0 when the
    capacity did not bind).

    Vertex coords follow the reference normalisation idx/R - 0.5."""
    packed, n_faces, n_dropped = _marching_tetrahedra_packed(
        sigmas, level, face_capacity, two_stage=two_stage)
    R = sigmas.shape[0]
    verts = packed[:, :9].reshape(-1, 3, 3) / R - 0.5
    return verts, n_faces, n_dropped


def _combo_table():
    """Static per-(tet, tri, case, vert) data: edge-end corner offsets (6
    f32) + corner ids (2), 8 columns per vertex -> (192, 24) f32."""
    tab = np.zeros((6 * 2 * 16, 24), np.float32)
    for tet in range(6):
        for tri in range(2):
            for case in range(16):
                row = tab[(tet * 2 + tri) * 16 + case]
                for vv in range(3):
                    la = _TRI_A[case, tri, vv]
                    lb = _TRI_B[case, tri, vv]
                    ca = _TETS[tet, la]
                    cb = _TETS[tet, lb]
                    row[vv * 8 + 0: vv * 8 + 3] = _CORNER_OFFS[ca]
                    row[vv * 8 + 3: vv * 8 + 6] = _CORNER_OFFS[cb]
                    row[vv * 8 + 6] = ca
                    row[vv * 8 + 7] = cb
    return tab


_COMBO_TAB = _combo_table()


def _corner_values(sigmas):
    """(8, C) corner sigma vectors over the (R-1)^3 cubes."""
    R = sigmas.shape[0]
    C = (R - 1) ** 3
    slices = []
    for i in (0, 1):
        for j in (0, 1):
            for k in (0, 1):
                slices.append(
                    jax.lax.slice(sigmas, (i, j, k), (i + R - 1, j + R - 1, k + R - 1))
                )
    return jnp.stack([s.reshape(C) for s in slices], axis=0)


def _marching_tetrahedra_packed(sigmas, level, face_capacity,
                                two_stage=False, cube_capacity=2 ** 18):
    """-> (packed (F, 16) f32: cols 0..8 = the 3 vertices' xyz in INDEX
    space, 9.. zero; n_faces; n_dropped_cubes).

    n_dropped_cubes is the two-stage overflow signal: crossed cubes
    beyond cube_capacity are dropped BEFORE face enumeration (their
    faces never reach n_faces), and the ascending-id compaction keeps a
    spatially biased low-index corner of the volume — so the drop count
    must be observable, matching the repo's n_dropped convention
    elsewhere. Always 0 on the single-stage path (whose only loss is
    the face_capacity clamp, visible via n_faces > face_capacity).

    Channel-major/packed implementation: the straightforward (F, 3, 3)
    formulation materialises rank-3 arrays whose (3, 3) minor dims pad to
    (8, 128) tiles — gigabytes of physical traffic per intermediate — and
    does ~12 scalar-row gathers per face (measured ~420 ms/step at
    flagship). Here every per-face quantity is a (F,) vector; all static
    per-(tet, tri, case, vert) lookups collapse into ONE (192, 24)
    combo-row gather and the 8 corner sigmas of each face's cube arrive
    in ONE (F, 8) row gather.

    two_stage=True is the fast variant (PERFORMANCE.md r4): compact the
    CROSSED CUBES first (one 1-operand sort over C = 2.05M rows at 128^3),
    then compact faces over 12*cube_capacity = 3.1M slots instead of the
    12*C = 24.6M slot space, carrying (combo, cube id) as sort PAYLOADS —
    which also deletes the post-sort cases[tt//2, cube] 2-D gather (the
    multi-dim-gather 100x trap, PERFORMANCE.md cost model #3). Crossed
    cubes beyond cube_capacity are dropped (and excluded from n_faces);
    a closed 128^3 head surface crosses ~100k cubes vs the 2^18 default.
    """
    R = sigmas.shape[0]
    C = (R - 1) ** 3
    INF = jnp.int32(0x7FFFFFFF)

    v = _corner_values(sigmas)                            # (8, C)

    if two_stage:
        assert C < (1 << 23), (C, "cube<<8 payload packing needs int32")
        CC = min(cube_capacity, C)
        inside8 = [(v[c] > level).astype(jnp.int32) for c in range(8)]
        n_in8 = sum(inside8)
        crossed = (n_in8 > 0) & (n_in8 < 8)
        n_crossed = jnp.sum(crossed.astype(jnp.int32))
        n_dropped_cubes = jnp.maximum(n_crossed - CC, 0)
        iota_c = jnp.arange(C, dtype=jnp.int32)
        key_a = jnp.where(crossed, iota_c, INF)
        cube_ids_raw = jax.lax.sort([key_a], num_keys=1)[0][:CC]
        cube_fill = cube_ids_raw == INF
        cube_ids = jnp.where(cube_fill, 0, cube_ids_raw)

        v8 = jnp.take(v.T, cube_ids, axis=0)             # (CC, 8)
        ins = [(v8[:, c] > level).astype(jnp.int32) for c in range(8)]
        keys, payloads = [], []
        base = jnp.arange(CC, dtype=jnp.int32)
        for tt in range(12):
            t, tri = tt // 2, tt % 2
            b = [ins[_TETS[t, i]] for i in range(4)]
            case_t = b[0] + (b[1] << 1) + (b[2] << 2) + (b[3] << 3)
            n_in = b[0] + b[1] + b[2] + b[3]
            val = ((n_in > 0) & (n_in < 4)) if tri == 0 else (n_in == 2)
            val = val & ~cube_fill
            keys.append(jnp.where(val, tt * CC + base, INF))
            # ONE packed payload (cube << 8 | combo): sorts move each
            # operand at streaming bandwidth, so fewer operands = less
            # moved. combo < 192 fits 8 bits; cube < (R-1)^3 < 2^23.
            payloads.append((cube_ids << 8) | (tt * 16 + case_t))
        key_b = jnp.concatenate(keys)
        n_faces = jnp.sum((key_b != INF).astype(jnp.int32))
        k_s, packed_pc = jax.lax.sort(
            [key_b, jnp.concatenate(payloads)], num_keys=1)
        fill = k_s[:face_capacity] == INF
        packed_pc = jnp.where(fill, 0, packed_pc[:face_capacity])
        combo = packed_pc & 0xFF
        cube = packed_pc >> 8
        # combo-row lookup as one-hot x (192, 24) MXU matmul: a
        # face_capacity-row gather costs ~9 ns/row (~9 ms at 2^20) while
        # the equivalent (F, 192)@(192, 24) runs in well under 1 ms; the
        # table values (offsets 0/1, corner ids 0..7) are exact in bf16
        onehot = (combo[:, None] == jnp.arange(192, dtype=jnp.int32)[None, :]
                  ).astype(jnp.bfloat16)
        crow = jnp.dot(onehot, jnp.asarray(_COMBO_TAB, jnp.bfloat16),
                       preferred_element_type=jnp.float32)
    else:
        inside = v > level
        # cases + validity per tet, (6, C) — validity via POPCOUNT
        # arithmetic: a table lookup _TRI_VALID[cases] is 12.3M scalar-row
        # gathers
        n_dropped_cubes = jnp.int32(0)
        cases = jnp.zeros((6, C), jnp.int32)
        valid0 = jnp.zeros((6, C), jnp.bool_)
        valid1 = jnp.zeros((6, C), jnp.bool_)
        for t in range(6):
            b = [inside[_TETS[t, i]].astype(jnp.int32) for i in range(4)]
            case_t = b[0] + (b[1] << 1) + (b[2] << 2) + (b[3] << 3)
            n_in = b[0] + b[1] + b[2] + b[3]
            cases = cases.at[t].set(case_t)
            valid0 = valid0.at[t].set((n_in > 0) & (n_in < 4))
            valid1 = valid1.at[t].set(n_in == 2)
        flat_valid = jnp.concatenate(
            [x.reshape(-1) for pair in zip(valid0, valid1) for x in pair]
        )  # order (tet, tri, cube) — cube fastest, matches tri_idx decode
        n_faces = jnp.sum(flat_valid.astype(jnp.int32))

        # fixed-capacity compaction by SORT, not jnp.nonzero: nonzero
        # lowers to a 24.6M-row element scatter (~hundreds of ms); a sort
        # moves the indices at streaming bandwidth
        iota = jnp.arange(flat_valid.shape[0], dtype=jnp.int32)
        inv_key = jnp.where(flat_valid, iota, INF)
        tri_idx = jax.lax.sort([inv_key], num_keys=1)[0][:face_capacity]
        tri_idx = jnp.where(tri_idx == INF, 0, tri_idx)
        cube = tri_idx % C
        tt = tri_idx // C
        combo = tt * 16 + cases[tt // 2, cube]           # (tet*2+tri)*16+case
        crow = jnp.take(jnp.asarray(_COMBO_TAB), combo, axis=0)  # (F, 24)

    vrow = jnp.take(v.T, cube, axis=0)                   # (F, 8) corner sigmas

    # cube base (i, j, k): i slow, k fast (matches create_samples)
    r1 = R - 1
    f32 = sigmas.dtype
    bi = (cube // (r1 * r1)).astype(f32)
    bj = ((cube // r1) % r1).astype(f32)
    bk = (cube % r1).astype(f32)

    def corner_val(cid):                                 # (F,) int corner id
        out = vrow[:, 0]
        for c in range(1, 8):
            out = jnp.where(cid == c, vrow[:, c], out)
        return out

    cols = []
    for vv in range(3):
        oa = [crow[:, vv * 8 + k] for k in range(3)]
        ob = [crow[:, vv * 8 + 3 + k] for k in range(3)]
        ca = crow[:, vv * 8 + 6].astype(jnp.int32)
        cb = crow[:, vv * 8 + 7].astype(jnp.int32)
        sa = corner_val(ca)
        sb = corner_val(cb)
        denom = sb - sa
        denom = jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
        # crossings live on the edge; the clamp also bounds capacity-fill rows
        t_lerp = jnp.clip((level - sa) / denom, 0.0, 1.0)
        base = (bi, bj, bk)
        for k in range(3):
            pa = base[k] + oa[k]
            pb = base[k] + ob[k]
            cols.append(pa + t_lerp * (pb - pa))          # index space

    packed = jnp.stack(cols + [jnp.zeros_like(cols[0])] * 7, axis=1)  # (F, 16)
    return packed, n_faces, n_dropped_cubes


def marching_tetrahedra_sample(
    key,
    sigmas: jax.Array,
    level: float = 10.0,
    n_points: int = 500_000,
    surface_thickness: float = 0.1,
    face_capacity: int = 2 ** 20,
    two_stage: bool = False,
) -> jax.Array:
    """Surface point cloud (n_points, 3) like the reference's
    marching-cubes + barycentric + thickness pipeline."""
    kf, kw, ks = jax.random.split(key, 3)
    packed, n_faces, _ = _marching_tetrahedra_packed(
        sigmas, level, face_capacity, two_stage=two_stage)
    R = sigmas.shape[0]
    n_eff = jnp.maximum(jnp.minimum(n_faces, face_capacity), 1)

    fidx = jnp.floor(
        jax.random.uniform(kf, (n_points,)) * n_eff.astype(jnp.float32)
    ).astype(jnp.int32)
    fidx = jnp.minimum(fidx, n_eff - 1)
    rows = jnp.take(packed, fidx, axis=0)                # (P, 16) ONE gather

    w = jax.random.uniform(kw, (n_points, 3), packed.dtype)
    w = w / jnp.sum(w, axis=1, keepdims=True)            # ref's sum-normalised weights
    scale = jnp.clip(
        jax.random.normal(ks, (n_points,), packed.dtype) * surface_thickness + 1.0,
        0.0, 1.0,
    )
    # barycentric + normalisation + thickness on (P,) channel vectors
    pts = []
    for k in range(3):
        coord = (rows[:, k] * w[:, 0] + rows[:, 3 + k] * w[:, 1]
                 + rows[:, 6 + k] * w[:, 2])
        pts.append((coord / R - 0.5) * scale)
    return jnp.stack(pts, axis=1)


def sigma_grid_separable(generator, gen_params, planes,
                         shape_res: int = 128) -> jax.Array:
    """(R, R, R) sigma via SEPARABLE lattice resampling — no gathers.

    The probe points (create_samples) form a PRODUCT lattice whose
    normalized per-axis values are linspace(-1, 1, R) on every axis, and
    generate_planes' axes are permutation matrices, so each plane's
    trilinear sample of the lattice factorizes into three dense
    interpolation matmuls (W, H, then depth) — ~10 GFLOPs of MXU work
    replacing ~3*R^3 table-row gathers (the gather path runs at the
    ~6.5 ns/row floor: ~40 ms at 128^3 flagship vs ~1 ms here; also no
    brick table and no int8 quantization error on this path).

    Bit-equivalent semantics to sigma_grid's gather path with a float
    table (grid_sample align_corners=False + zeros padding: the
    validity-folded corner weights become rows of the interp matrices).
    """
    g = generator
    D = g.triplane_depth
    R = shape_res
    N, n_planes, CD, H, W = planes.shape
    assert N == 1
    C = CD // D
    vals = jnp.linspace(-1.0, 1.0, R)   # == (2/box_warp) * create_samples

    def interp_matrix(size):
        x = ((vals + 1.0) * size - 1.0) * 0.5
        x0 = jnp.floor(x).astype(jnp.int32)
        w1 = x - x0
        v0 = (x0 >= 0) & (x0 < size)
        v1 = (x0 + 1 >= 0) & (x0 + 1 < size)
        cols = jnp.arange(size)[None, :]
        a = jnp.where((cols == jnp.clip(x0, 0, size - 1)[:, None]) & v0[:, None],
                      (1.0 - w1)[:, None], 0.0)
        b = jnp.where((cols == jnp.clip(x0 + 1, 0, size - 1)[:, None]) & v1[:, None],
                      w1[:, None], 0.0)
        return a + b                     # (R, size)

    A_W, A_H = interp_matrix(W), interp_matrix(H)
    # depth-1 (EG3D) planes sample with 2-D grid_sample — no depth lerp:
    # the "interp" over the single layer is an identity take
    A_D = jnp.ones((R, 1)) if D == 1 else interp_matrix(D)
    vol = planes.astype(jnp.float32).reshape(n_planes, C, D, H, W)
    inv = np.linalg.inv(g.renderer.plane_axes)          # (P, 3, 3) permutations

    acc = jnp.zeros((C, R, R, R), jnp.float32)
    for p in range(n_planes):
        t1 = jnp.einsum("cdhw,aw->cdha", vol[p], A_W)   # plane-x resample
        t2 = jnp.einsum("cdha,bh->cdba", t1, A_H)       # plane-y resample
        t3 = jnp.einsum("cdba,ed->ceba", t2, A_D)       # plane-depth resample
        # t3 axes (c, e=col2, b=col1, a=col0); world axis m feeds the
        # plane column col with inv[p][m, col] == 1 — transpose (e, b, a)
        # into world (i, j, k) lattice order
        col_of_world = [int(np.argmax(inv[p][m])) for m in range(3)]
        src_pos = {0: 3, 1: 2, 2: 1}                    # col -> t3 axis
        perm = [0] + [src_pos[col_of_world[m]] for m in range(3)]
        acc = acc + jnp.transpose(t3, perm)

    feats = jnp.transpose(acc.reshape(C, R ** 3) / n_planes)  # (R^3, C)
    out = g.decoder.apply(gen_params["decoder"], feats[None, None])
    return out["sigma"][0, :, 0].reshape(R, R, R)


def sigma_grid(
    generator, gen_params, planes, shape_res: int = 128, chunk: int = 2 ** 18,
    table=None, separable: bool = False,
) -> jax.Array:
    """Chunked density probe over the sampling cube -> (R, R, R).

    Equivalent of pano_get_target_sigma_color's sigma loop
    (ref target_dataloader.py:134-169): directions fixed to (0,0,-1).
    Chunked with lax.map so the 2.1M-point probe never materialises the
    full intermediate feature tensor. separable=True dispatches to
    sigma_grid_separable (lattice-resampling formulation), which samples
    the RAW planes — a pre-built brick `table` (and its bf16/int8 probe
    quantization) would be silently ignored, so passing one is an error:
    build the table only on the gather path (ADVICE r4).
    """
    if separable:
        assert table is None, (
            "sigma_grid(separable=True) samples the raw planes directly; "
            "a brick table (and any bf16/int8 probe quantization baked "
            "into it) would be ignored — skip build_sampling_table on "
            "this path")
        return sigma_grid_separable(generator, gen_params, planes,
                                    shape_res=shape_res)
    samples = create_samples(shape_res, generator.rk["box_warp"])  # (1, R^3, 3)
    n = samples.shape[1]
    assert n % chunk == 0, (n, chunk)
    coords = samples.reshape(-1, chunk, 3)

    if table is None:
        # build the brick expansion ONCE outside the chunk loop: XLA does
        # not reliably hoist it out of the lax.map body, so every chunk
        # would rebuild it (measured: most of the sigma-grid cost)
        table = generator.build_sampling_table(planes)

    def probe(c):
        dirs = jnp.zeros_like(c).at[..., 2].set(-1.0)
        out = generator.sample_mixed_from_planes(
            gen_params, planes, c[None], dirs[None], table=table)
        return out["sigma"][0, :, 0]

    sig = jax.lax.map(probe, coords)  # (n/chunk, chunk)
    return sig.reshape(shape_res, shape_res, shape_res)
