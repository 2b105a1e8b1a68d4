"""Explicit 3DGS scene as a JAX pytree.

Functional re-design of the reference GaussianModel
(/root/reference/gaussian_splatting/scene/gaussian_model.py:26-563). The
torch class mixes parameters, activations, optimizer surgery and IO in one
mutable object; here the scene is an immutable NamedTuple of RAW (pre-
activation) tensors plus pure helpers. Densify/clone/split/prune operate
at fixed capacity with a validity mask (JAX static shapes) — see
`densify_and_prune`.

Raw storage conventions (identical to the reference):
  _xyz (N,3), _features_dc (N,1,3), _features_rest (N,K-1,3),
  _scaling (N,3) log-scale, _rotation (N,4) unnormalized quat,
  _opacity (N,1) logit.
Activations: exp / normalize / sigmoid (ref :35-44).
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..ops import mean_sq_dist_to_knn
from .sh import rgb_to_sh


def inverse_sigmoid(x):
    return jnp.log(x / (1 - x))


class GaussianScene(NamedTuple):
    xyz: jax.Array            # (N, 3)
    features_dc: jax.Array    # (N, 1, 3)
    features_rest: jax.Array  # (N, K-1, 3)
    scaling: jax.Array        # (N, 3) log
    rotation: jax.Array       # (N, 4)
    opacity: jax.Array        # (N, 1) logit
    valid: jax.Array          # (N,) bool — capacity mask
    max_sh_degree: int = 0
    active_sh_degree: int = 0

    # -- activated views (ref gaussian_model.py:99-124) ----------------------

    @property
    def get_scaling(self):
        return jnp.exp(self.scaling)

    @property
    def get_rotation(self):
        return self.rotation / (
            jnp.linalg.norm(self.rotation, axis=-1, keepdims=True) + 1e-12
        )

    @property
    def get_xyz(self):
        return self.xyz

    @property
    def get_features(self):
        if self.active_sh_degree == 0:
            return self.features_dc
        return jnp.concatenate([self.features_dc, self.features_rest], axis=1)

    @property
    def get_opacity(self):
        # invalid slots render as fully transparent
        o = jax.nn.sigmoid(self.opacity)
        return o * self.valid[:, None].astype(o.dtype)

    @property
    def num_points(self):
        return self.xyz.shape[0]


def gaussian_scene_from_decoded(decoded: Dict[str, jax.Array], sh_degree: int = 0) -> GaussianScene:
    """Fill a scene from raw decoder outputs, exactly like the training loop
    (/root/reference/main/train_pano2gaussian_decoder.py:222-227)."""
    n = decoded["xyz"].shape[0]
    k = (sh_degree + 1) ** 2
    return GaussianScene(
        xyz=decoded["xyz"],
        features_dc=decoded["color"][:, None, :],
        features_rest=jnp.zeros((n, k - 1, 3), decoded["color"].dtype),
        scaling=decoded["scale"],
        rotation=decoded["rotation"],
        opacity=decoded["opacity"],
        valid=jnp.ones((n,), bool),
        max_sh_degree=sh_degree,
        active_sh_degree=0,
    )


def create_from_points(
    points: jax.Array,
    colors: Optional[jax.Array] = None,
    sh_degree: int = 0,
    opacity_init: float = 0.1,
) -> GaussianScene:
    """Point-cloud initialisation (ref create_from_pcd, gaussian_model.py:130-152):
    log-scale from mean 3-NN squared distance, identity rotations,
    inverse-sigmoid(0.1) opacity."""
    n = points.shape[0]
    k = (sh_degree + 1) ** 2
    if colors is None:
        colors = jnp.full((n, 3), 0.5, points.dtype)
    fused_color = rgb_to_sh(jnp.clip(colors, 0, 1))
    dist2 = jnp.maximum(mean_sq_dist_to_knn(points, k=3), 1e-7)
    scales = jnp.log(jnp.sqrt(dist2))[:, None].repeat(3, axis=1)
    rots = jnp.zeros((n, 4), points.dtype).at[:, 0].set(1.0)
    opac = inverse_sigmoid(jnp.full((n, 1), opacity_init, points.dtype))
    return GaussianScene(
        xyz=points,
        features_dc=fused_color[:, None, :],
        features_rest=jnp.zeros((n, k - 1, 3), points.dtype),
        scaling=scales,
        rotation=rots,
        opacity=opac,
        valid=jnp.ones((n,), bool),
        max_sh_degree=sh_degree,
        active_sh_degree=0,
    )


def build_covariance(scene: GaussianScene, scaling_modifier: float = 1.0) -> jax.Array:
    """Symmetric-upper (N, 6) covariance like ref get_covariance (:28-33,126)."""
    from ..splat.projection import build_cov3d

    cov = build_cov3d(scene.get_scaling, scene.rotation, scaling_modifier)
    return jnp.stack(
        [cov[:, 0, 0], cov[:, 0, 1], cov[:, 0, 2],
         cov[:, 1, 1], cov[:, 1, 2], cov[:, 2, 2]],
        axis=1,
    )
