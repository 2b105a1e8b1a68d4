"""Camera pose/intrinsics samplers (y-up origin-orbit).

Re-design of /root/reference/main/camera_utils.py:27-167 with explicit
PRNG keys. The coordinate conventions (y-up, azimuth measured via
cos(pi - theta), polar angle remapped through arccos(1 - 2 v/pi)) are
replicated exactly so ported GANs see the same pose distribution.
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def normalize_vecs(v, eps=0.0):
    return v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + eps)


def create_cam2world_matrix(forward_vector: jax.Array, origin: jax.Array) -> jax.Array:
    """(ref camera_utils.py:137-156) y-up, no roll."""
    forward = normalize_vecs(forward_vector)
    up = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0], forward.dtype), forward.shape)
    right = -normalize_vecs(jnp.cross(up, forward))
    up2 = normalize_vecs(jnp.cross(forward, right))
    n = forward.shape[0]
    rot = jnp.broadcast_to(jnp.eye(4, dtype=forward.dtype), (n, 4, 4))
    rot = rot.at[:, :3, :3].set(jnp.stack([right, up2, forward], axis=-1))
    tr = jnp.broadcast_to(jnp.eye(4, dtype=forward.dtype), (n, 4, 4))
    tr = tr.at[:, :3, 3].set(origin)
    return tr @ rot


def _origin_from_hv(h, v, radius):
    v = jnp.clip(v, 1e-5, math.pi - 1e-5)
    theta = h
    phi = jnp.arccos(1 - 2 * (v / math.pi))
    x = radius * jnp.sin(phi) * jnp.cos(math.pi - theta)
    z = radius * jnp.sin(phi) * jnp.sin(math.pi - theta)
    y = radius * jnp.cos(phi)
    return jnp.concatenate([x, y, z], axis=-1)


def _pose_from_hv(h, v, radius, lookat=None):
    origin = _origin_from_hv(h, v, radius)
    target = jnp.zeros_like(origin) if lookat is None else lookat
    forward = normalize_vecs(target - origin)
    return create_cam2world_matrix(forward, origin)


def sample_pose_gaussian(key, horizontal_mean, vertical_mean,
                         horizontal_stddev=0.0, vertical_stddev=0.0,
                         radius=1.0, batch_size=1):
    """(ref GaussianCameraPoseSampler.sample :45-60)"""
    kh, kv = jax.random.split(key)
    h = jax.random.normal(kh, (batch_size, 1)) * horizontal_stddev + horizontal_mean
    v = jax.random.normal(kv, (batch_size, 1)) * vertical_stddev + vertical_mean
    return _pose_from_hv(h, v, radius), h, v


def sample_pose_lookat(key, horizontal_mean, vertical_mean,
                       horizontal_stddev=0.0, vertical_stddev=0.0,
                       radius=1.0, batch_size=1, lookat=None):
    """(ref LookAtPoseSampler.sample :76-97)"""
    kh, kv = jax.random.split(key)
    h = jax.random.normal(kh, (batch_size, 1)) * horizontal_stddev + horizontal_mean
    v = jax.random.normal(kv, (batch_size, 1)) * vertical_stddev + vertical_mean
    return _pose_from_hv(h, v, radius, lookat), h, v


def sample_pose_uniform(key, horizontal_mean=math.pi / 2, vertical_mean=math.pi / 2,
                        horizontal_stddev=0.0, vertical_stddev=0.0,
                        radius=1.0, batch_size=1):
    """(ref UniformCameraPoseSampler.sample :110-131): U(+-stddev)."""
    kh, kv = jax.random.split(key)
    h = (jax.random.uniform(kh, (batch_size, 1)) * 2 - 1) * horizontal_stddev + horizontal_mean
    v = (jax.random.uniform(kv, (batch_size, 1)) * 2 - 1) * vertical_stddev + vertical_mean
    return _pose_from_hv(h, v, radius), h, v


def FOV_to_intrinsics(fov_degrees, imsize: float = 1.0):
    """Normalized intrinsics (ref camera_utils.py:159-167 — keeps the
    reference's 3.14159 pi truncation for bit parity)."""
    fov_rad = fov_degrees * 2 * 3.14159 / 360
    focal = imsize / (2 * jnp.tan(fov_rad / 2))
    z = jnp.zeros_like(jnp.asarray(focal))
    o = jnp.ones_like(z)
    return jnp.stack([
        jnp.stack([focal, z, 0.5 * o], -1),
        jnp.stack([z, focal, 0.5 * o], -1),
        jnp.stack([z, z, o], -1),
    ], -2)


def sample_camera_params(
    key,
    fov_deg,
    camera_sampling: str = "normal",
    horizontal_stddev: float = 1.0,
    vertical_stddev: float = 0.3,
    radius: float = 2.7,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """-> (camera_params (1,25), cam2world (1,4,4), h, v).

    Equivalent of TargetDataloader.get_cam + the 25-dim concat
    (ref target_dataloader.py:71-73,177-204; decoder_utils/camera.py:6-35).
    stddevs are given in units of pi like the reference CLI flags.
    """
    intr = FOV_to_intrinsics(jnp.asarray(fov_deg, jnp.float32))
    sampler = {"uniform": sample_pose_uniform, "normal": sample_pose_lookat}[camera_sampling]
    pose, h, v = sampler(
        key, math.pi / 2, math.pi / 2,
        horizontal_stddev=math.pi * horizontal_stddev,
        vertical_stddev=math.pi * vertical_stddev,
        radius=radius,
    )
    cp = jnp.concatenate(
        [pose.reshape(1, 16), intr.reshape(1, 9).astype(pose.dtype)], axis=1
    )
    return cp, pose, h, v
