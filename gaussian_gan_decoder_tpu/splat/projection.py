"""3DGS projection: world Gaussians -> screen-space conics.

TPU-native re-implementation of the preprocess stage of the
`diff-gaussian-rasterization` CUDA extension (reference consumes it at
/root/reference/gaussian_splatting/gaussian_renderer/__init__.py:14,139-175;
math follows Zwicker et al. EWA splatting as used by INRIA 3DGS):

  view  = p @ W                     (row-vector convention, W = world_view)
  clip  = p @ P_full;  ndc = clip.xyz / (clip.w + 1e-7)
  pix   = ((ndc + 1) * size - 1) / 2
  Sigma = R S S^T R^T;  Sigma2D = J V Sigma V^T J^T + 0.3 I
  conic = inv(Sigma2D);  radius = ceil(3 sqrt(max eigenvalue))

Everything is a dense vmapped computation over the N axis — pure MXU/VPU
work with static shapes. Frustum culling is a mask, not a compaction.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..gaussians.cameras import Camera


def build_rotation(q: jax.Array) -> jax.Array:
    """Normalized quaternion (w,x,y,z) -> rotation matrix (..., 3, 3).

    Matches /root/reference/gaussian_splatting/utils/general_utils.py:78-98.
    """
    norm = jnp.sqrt(jnp.sum(jnp.square(q), axis=-1, keepdims=True))
    q = q / (norm + 1e-12)
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R = jnp.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y),
            2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x),
            2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    )
    return R.reshape(q.shape[:-1] + (3, 3))


def build_cov3d(scales: jax.Array, rotations: jax.Array, scale_modifier: float = 1.0):
    """(N,3) activated scales + (N,4) quats -> (N,3,3) covariance.

    Sigma = R S S^T R^T (ref gaussian_model.py:28-33 via build_scaling_rotation).
    """
    R = build_rotation(rotations)
    S = scales * scale_modifier  # (N, 3)
    RS = R * S[..., None, :]      # R @ diag(S)
    return RS @ jnp.swapaxes(RS, -1, -2)


class ProjectedGaussians(NamedTuple):
    pix_xy: jax.Array      # (N, 2) pixel coords of means
    depth: jax.Array       # (N,) view-space z
    conic: jax.Array       # (N, 3) inverse 2D covariance (a, b, c)
    radius: jax.Array      # (N,) int32 screen radius, 0 = culled
    visible: jax.Array     # (N,) bool


def project_channels(
    cam: Camera,
    mx, my, mz,              # (N,) world means
    q,                       # tuple of 4 (N,) quaternion rows (w,x,y,z)
    s,                       # tuple of 3 (N,) activated scales
    scale_modifier: float = 1.0,
    cov3d6=None,             # optional 6-tuple of (N,) upper-tri cov rows
):
    """Channel-major projection core -> dict of (N,) vectors.

    ALL hot-path math runs on 1-D (N,) channel vectors: any (N, small-k)
    intermediate gets its minor dim padded to 128 lanes by the TPU tiled
    layout, turning a ~120-flop fusion into dozens of 97%-dead-lane
    passes (measured 20-30 ms at N=500k; this form is ~2 ms).
    """
    W = cam.world_view_transform  # (4,4) row-vector
    P = cam.full_proj_transform

    def xform(Mt):
        return tuple(
            mx * Mt[0, j] + my * Mt[1, j] + mz * Mt[2, j] + Mt[3, j]
            for j in range(4)
        )

    view_x, view_y, view_z, _ = xform(W)
    clip_x, clip_y, clip_z, clip_w = xform(P)
    p_w = 1.0 / (clip_w + 1e-7)

    in_front = view_z > 0.2       # CUDA in_frustum near-plane cull

    px = ((clip_x * p_w + 1) * cam.image_width - 1) * 0.5
    py = ((clip_y * p_w + 1) * cam.image_height - 1) * 0.5

    # --- EWA 2D covariance --------------------------------------------------
    # All channel-wise math over N: XLA lowers (N,2,3)@(N,3,3) batched tiny
    # matmuls catastrophically on TPU (measured 21 ms for N=500k); the
    # explicit per-entry formulation below is a single ~120-flop elementwise
    # fusion (<1 ms).
    focal_x = cam.image_width / (2.0 * cam.tanfovx)
    focal_y = cam.image_height / (2.0 * cam.tanfovy)

    tz = view_z
    tz_safe = jnp.where(jnp.abs(tz) < 1e-6, 1e-6, tz)
    limx = 1.3 * cam.tanfovx
    limy = 1.3 * cam.tanfovy
    tx = jnp.clip(view_x / tz_safe, -limx, limx) * tz_safe
    ty = jnp.clip(view_y / tz_safe, -limy, limy) * tz_safe

    # J rows: d(pix)/d(view); V = view rotation (col-vector convention =
    # transpose of the row-vector world_view 3x3 block).
    # Row r of JW (r in {0,1}): jw_r = J[r, :] @ V with J sparse:
    #   J[0] = (fx/tz, 0, -fx*tx/tz^2);  J[1] = (0, fy/tz, -fy*ty/tz^2)
    V = W[:3, :3].T  # (3, 3) col-vector view rotation (static)
    inv_z = 1.0 / tz_safe
    j00 = focal_x * inv_z
    j02 = -(focal_x * tx) * inv_z * inv_z
    j11 = focal_y * inv_z
    j12 = -(focal_y * ty) * inv_z * inv_z
    # jw0_k = j00*V[0,k] + j02*V[2,k];  jw1_k = j11*V[1,k] + j12*V[2,k]
    u0 = j00 * V[0, 0] + j02 * V[2, 0]
    u1 = j00 * V[0, 1] + j02 * V[2, 1]
    u2 = j00 * V[0, 2] + j02 * V[2, 2]
    v0 = j11 * V[1, 0] + j12 * V[2, 0]
    v1 = j11 * V[1, 1] + j12 * V[2, 1]
    v2 = j11 * V[1, 2] + j12 * V[2, 2]

    # Sigma entries (6 unique) from M = R diag(S): sigma_ab = sum_j M_aj M_bj
    if cov3d6 is None:
        r, x, y, z = q
        norm = jnp.sqrt(r * r + x * x + y * y + z * z) + 1e-12
        r, x, y, z = r / norm, x / norm, y / norm, z / norm
        r00 = 1 - 2 * (y * y + z * z)
        r01 = 2 * (x * y - r * z)
        r02 = 2 * (x * z + r * y)
        r10 = 2 * (x * y + r * z)
        r11 = 1 - 2 * (x * x + z * z)
        r12 = 2 * (y * z - r * x)
        r20 = 2 * (x * z - r * y)
        r21 = 2 * (y * z + r * x)
        r22 = 1 - 2 * (x * x + y * y)
        s0 = s[0] * scale_modifier
        s1 = s[1] * scale_modifier
        s2 = s[2] * scale_modifier
        m00, m01, m02 = r00 * s0, r01 * s1, r02 * s2
        m10, m11, m12 = r10 * s0, r11 * s1, r12 * s2
        m20, m21, m22 = r20 * s0, r21 * s1, r22 * s2
        s_00 = m00 * m00 + m01 * m01 + m02 * m02
        s_01 = m00 * m10 + m01 * m11 + m02 * m12
        s_02 = m00 * m20 + m01 * m21 + m02 * m22
        s_11 = m10 * m10 + m11 * m11 + m12 * m12
        s_12 = m10 * m20 + m11 * m21 + m12 * m22
        s_22 = m20 * m20 + m21 * m21 + m22 * m22
    else:
        s_00, s_01, s_02, s_11, s_12, s_22 = cov3d6

    # cov2d = JW Sigma JW^T: a = u.Sigma.u, b = u.Sigma.v, c = v.Sigma.v
    su0 = s_00 * u0 + s_01 * u1 + s_02 * u2
    su1 = s_01 * u0 + s_11 * u1 + s_12 * u2
    su2 = s_02 * u0 + s_12 * u1 + s_22 * u2
    sv0 = s_00 * v0 + s_01 * v1 + s_02 * v2
    sv1 = s_01 * v0 + s_11 * v1 + s_12 * v2
    sv2 = s_02 * v0 + s_12 * v1 + s_22 * v2
    cov_a = u0 * su0 + u1 * su1 + u2 * su2 + 0.3
    cov_b = v0 * su0 + v1 * su1 + v2 * su2
    cov_c = v0 * sv0 + v1 * sv1 + v2 * sv2 + 0.3

    det = cov_a * cov_c - cov_b * cov_b
    det_ok = det > 0.0
    det_inv = 1.0 / jnp.where(det_ok, det, 1.0)

    mid = 0.5 * (cov_a + cov_c)
    lam = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius_f = jnp.ceil(3.0 * jnp.sqrt(lam))

    visible = in_front & det_ok
    radius_f = jnp.where(visible, radius_f, 0.0)

    return dict(
        px=px, py=py, depth=view_z,
        conic_a=cov_c * det_inv, conic_b=-cov_b * det_inv, conic_c=cov_a * det_inv,
        radius_f=radius_f, visible=visible & (radius_f > 0),
    )


def project_gaussians(
    cam: Camera,
    means3d: jax.Array,      # (N, 3)
    scales: jax.Array,       # (N, 3) activated (exp'd)
    rotations: jax.Array,    # (N, 4)
    scale_modifier: float = 1.0,
    cov3d_precomp: jax.Array | None = None,  # (N, 3, 3) optional
) -> ProjectedGaussians:
    """Row-major API over project_channels (generic/differentiable path)."""
    cov6 = None
    if cov3d_precomp is not None:
        cov6 = (cov3d_precomp[:, 0, 0], cov3d_precomp[:, 0, 1],
                cov3d_precomp[:, 0, 2], cov3d_precomp[:, 1, 1],
                cov3d_precomp[:, 1, 2], cov3d_precomp[:, 2, 2])
    ch = project_channels(
        cam, means3d[:, 0], means3d[:, 1], means3d[:, 2],
        (rotations[:, 0], rotations[:, 1], rotations[:, 2], rotations[:, 3]),
        (scales[:, 0], scales[:, 1], scales[:, 2]),
        scale_modifier, cov3d6=cov6,
    )
    return ProjectedGaussians(
        pix_xy=jnp.stack([ch["px"], ch["py"]], axis=1),
        depth=ch["depth"],
        conic=jnp.stack([ch["conic_a"], ch["conic_b"], ch["conic_c"]], axis=1),
        radius=ch["radius_f"].astype(jnp.int32),
        visible=ch["visible"],
    )
