"""Mean squared distance to the 3 nearest neighbours.

TPU-native replacement for the `simple-knn` CUDA extension's `distCUDA2`
(/root/reference declared in .gitmodules:1-3, consumed at
gaussian_splatting/scene/gaussian_model.py:140,169), which seeds the
initial log-scales of a Gaussian cloud.

Design: `distCUDA2` is itself approximate (Morton-code spatial chunks).
Here we use the same spirit with TPU-friendly shapes: sort points along a
Morton / z-order key, then compare each point against a fixed window of
W sorted neighbours on each side — a banded distance matrix that maps to
dense batched matmul-free VPU work with static shapes. Exact for locally
dense clouds (the 500k surface-sampled use case), and never underestimates
by more than the window truncation.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _morton_key(pts: jax.Array, bits: int = 10) -> jax.Array:
    """Interleave `bits` bits per axis of normalised points -> uint32 key."""
    lo = jnp.min(pts, axis=0, keepdims=True)
    hi = jnp.max(pts, axis=0, keepdims=True)
    q = (pts - lo) / jnp.maximum(hi - lo, 1e-12)
    q = jnp.clip((q * ((1 << bits) - 1)).astype(jnp.uint32), 0, (1 << bits) - 1)

    def spread(v):
        # spread 10 bits to every 3rd position
        v = (v | (v << 16)) & jnp.uint32(0x030000FF)
        v = (v | (v << 8)) & jnp.uint32(0x0300F00F)
        v = (v | (v << 4)) & jnp.uint32(0x030C30C3)
        v = (v | (v << 2)) & jnp.uint32(0x09249249)
        return v

    return spread(q[:, 0]) | (spread(q[:, 1]) << 1) | (spread(q[:, 2]) << 2)


def _band_knn_d2(points: jax.Array, key: jax.Array, k: int, window: int) -> jax.Array:
    """Top-k squared distances within a +-window band of the key-sorted order."""
    n = points.shape[0]
    order = jnp.argsort(key)
    inv_order = jnp.argsort(order)
    sp = points[order]

    offsets = jnp.concatenate(
        [jnp.arange(-window, 0), jnp.arange(1, window + 1)]
    )  # (2W,)
    idx = jnp.arange(n)[:, None] + offsets[None, :]  # (N, 2W)
    valid = (idx >= 0) & (idx < n)
    idx = jnp.clip(idx, 0, n - 1)
    nbrs = sp[idx]  # (N, 2W, 3)
    d2 = jnp.sum(jnp.square(nbrs - sp[:, None, :]), axis=-1)
    d2 = jnp.where(valid, d2, jnp.inf)
    neg_top, _ = jax.lax.top_k(-d2, k)  # (N, k) smallest
    return (-neg_top)[inv_order]


def mean_sq_dist_to_knn(points: jax.Array, k: int = 3, window: int = 16) -> jax.Array:
    """Per-point mean squared distance to its k nearest neighbours.

    Candidates come from banded searches along THREE curve orders (Morton
    keys with permuted axis interleavings), merged by top-k — multi-pass
    locality-sort KNN, all static shapes.

    Args:
      points: (N, 3) float array.
      k: number of neighbours (reference uses 3).
      window: half-width of each sorted-order candidate band.
    Returns:
      (N,) mean of squared distances to the k approx-nearest neighbours.
    """
    perms = [(0, 1, 2), (1, 2, 0), (2, 0, 1)]
    cands = [
        _band_knn_d2(points, _morton_key(points[:, list(p)]), k, window)
        for p in perms
    ]
    d2 = jnp.concatenate(cands, axis=-1)  # (N, 3k) with duplicates
    # duplicates across passes can inflate top-k; dedupe by sorting and
    # masking equal consecutive values
    d2 = jnp.sort(d2, axis=-1)
    dup = jnp.concatenate(
        [jnp.zeros_like(d2[:, :1], dtype=bool), d2[:, 1:] == d2[:, :-1]], axis=-1
    )
    d2 = jnp.where(dup, jnp.inf, d2)
    neg_top, _ = jax.lax.top_k(-d2, k)
    return jnp.mean(-neg_top, axis=-1)
