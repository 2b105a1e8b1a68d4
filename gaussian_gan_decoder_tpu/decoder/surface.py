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


@partial(jax.jit, static_argnames=("face_capacity",))
def marching_tetrahedra_faces(
    sigmas: jax.Array,      # (R, R, R)
    level: float = 10.0,
    face_capacity: int = 2 ** 20,
) -> Tuple[jax.Array, jax.Array]:
    """-> (verts (face_capacity, 3, 3) normalised coords, n_faces scalar).

    Vertex coords follow the reference normalisation idx/R - 0.5."""
    R = sigmas.shape[0]
    C = (R - 1) ** 3

    # corner values (8, C)
    slices = []
    for i in (0, 1):
        for j in (0, 1):
            for k in (0, 1):
                slices.append(
                    jax.lax.slice(sigmas, (i, j, k), (i + R - 1, j + R - 1, k + R - 1))
                )
    v = jnp.stack([s.reshape(C) for s in slices], axis=0)  # (8, C)
    inside = v > level

    tets = jnp.asarray(_TETS)
    # cases (6, C)
    cases = jnp.zeros((6, C), jnp.int32)
    for t in range(6):
        case_t = (
            inside[_TETS[t, 0]].astype(jnp.int32)
            + (inside[_TETS[t, 1]].astype(jnp.int32) << 1)
            + (inside[_TETS[t, 2]].astype(jnp.int32) << 2)
            + (inside[_TETS[t, 3]].astype(jnp.int32) << 3)
        )
        cases = cases.at[t].set(case_t)

    tri_valid = jnp.asarray(_TRI_VALID)[cases]          # (6, C, 2)
    flat_valid = jnp.transpose(tri_valid, (0, 2, 1)).reshape(-1)  # (6*2*C,) cube fastest
    n_faces = jnp.sum(flat_valid.astype(jnp.int32))

    (tri_idx,) = jnp.nonzero(flat_valid, size=face_capacity, fill_value=0)
    cube = tri_idx % C
    tt = tri_idx // C
    tet = tt // 2
    tri = tt % 2

    case = cases[tet, cube]                              # (F,)
    ea = jnp.asarray(_TRI_A)[case, tri]                  # (F, 3) local vert idx
    eb = jnp.asarray(_TRI_B)[case, tri]
    ca = tets[tet[:, None], ea]                          # (F, 3) corner ids
    cb = tets[tet[:, None], eb]

    sa = v[ca, cube[:, None]]                            # (F, 3)
    sb = v[cb, cube[:, None]]

    # cube base (i, j, k): i slow, k fast (matches create_samples)
    r1 = R - 1
    bi = cube // (r1 * r1)
    bj = (cube // r1) % r1
    bk = cube % r1
    base = jnp.stack([bi, bj, bk], axis=-1).astype(sigmas.dtype)  # (F, 3)
    offs = jnp.asarray(_CORNER_OFFS, sigmas.dtype)
    pa = base[:, None, :] + offs[ca]                     # (F, 3verts, 3)
    pb = base[:, None, :] + offs[cb]

    denom = sb - sa
    denom = jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    # crossings live on the edge; the clamp also bounds the fill rows that
    # pad the capacity when fewer than face_capacity faces exist
    t_lerp = jnp.clip((level - sa) / denom, 0.0, 1.0)
    verts = pa + t_lerp[..., None] * (pb - pa)           # (F, 3, 3) index space

    verts = verts / R - 0.5                              # ref normalisation
    return verts, n_faces


def marching_tetrahedra_sample(
    key,
    sigmas: jax.Array,
    level: float = 10.0,
    n_points: int = 500_000,
    surface_thickness: float = 0.1,
    face_capacity: int = 2 ** 20,
) -> jax.Array:
    """Surface point cloud (n_points, 3) like the reference's
    marching-cubes + barycentric + thickness pipeline."""
    kf, kw, ks = jax.random.split(key, 3)
    verts, n_faces = marching_tetrahedra_faces(sigmas, level, face_capacity)
    n_eff = jnp.maximum(jnp.minimum(n_faces, face_capacity), 1)

    fidx = jnp.floor(
        jax.random.uniform(kf, (n_points,)) * n_eff.astype(jnp.float32)
    ).astype(jnp.int32)
    fidx = jnp.minimum(fidx, n_eff - 1)
    face_coords = verts[fidx]                            # (P, 3, 3)

    w = jax.random.uniform(kw, (n_points, 3), verts.dtype)
    w = w / jnp.sum(w, axis=1, keepdims=True)            # ref's sum-normalised weights
    pts = jnp.sum(face_coords * w[..., None], axis=1)

    scale = jnp.clip(
        jax.random.normal(ks, (n_points, 1), pts.dtype) * surface_thickness + 1.0,
        0.0, 1.0,
    )
    return pts * scale


def sigma_grid(
    generator, gen_params, planes, shape_res: int = 128, chunk: int = 2 ** 18
) -> jax.Array:
    """Chunked density probe over the sampling cube -> (R, R, R).

    Equivalent of pano_get_target_sigma_color's sigma loop
    (ref target_dataloader.py:134-169): directions fixed to (0,0,-1).
    Chunked with lax.map so the 2.1M-point probe never materialises the
    full intermediate feature tensor.
    """
    samples = create_samples(shape_res, generator.rk["box_warp"])  # (1, R^3, 3)
    n = samples.shape[1]
    assert n % chunk == 0, (n, chunk)
    coords = samples.reshape(-1, chunk, 3)

    def probe(c):
        dirs = jnp.zeros_like(c).at[..., 2].set(-1.0)
        out = generator.sample_mixed_from_planes(gen_params, planes, c[None], dirs[None])
        return out["sigma"][0, :, 0]

    sig = jax.lax.map(probe, coords)  # (n/chunk, chunk)
    return sig.reshape(shape_res, shape_res, shape_res)
