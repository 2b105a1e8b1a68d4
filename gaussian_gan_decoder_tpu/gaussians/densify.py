"""Adaptive density control at FIXED capacity (JAX static shapes).

Re-design of /root/reference/gaussian_splatting/scene/gaussian_model.py:
353-534 (densify_and_clone / densify_and_split / prune_points /
reset_opacity + the Adam-state surgery). The torch version concatenates
and slices tensors, changing N every call; XLA needs static shapes, so the
scene lives at a fixed CAPACITY with a validity mask:

  * prune    -> clear valid bits (opacity < eps, oversized screen/world)
  * clone    -> write copies into invalid slots
  * split    -> write N=2 resampled children into invalid slots, retire
                the parent
  * overflow -> candidates beyond free capacity are dropped
                highest-index-first (reported in the stats)

Optimizer-state "surgery" (ref :370-451) is a tree-map: cloned/split
slots get zeroed Adam moments — same effect as the reference's cat-with-
zeros, without rebuilding the optimizer.

Also: get_expon_lr_func (ref utils/general_utils.py:29-61) and opacity
reset (ref :306-309).
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..splat.projection import build_rotation
from .model import GaussianScene, inverse_sigmoid


class DensifyStats(NamedTuple):
    n_cloned: jax.Array
    n_split: jax.Array
    n_pruned: jax.Array
    n_dropped: jax.Array  # candidates lost to capacity


def get_expon_lr_func(lr_init, lr_final, lr_delay_steps=0, lr_delay_mult=1.0,
                      max_steps=1_000_000):
    """Log-linear lr decay with optional sine delay (ref general_utils.py:29-61)."""

    def helper(step):
        step = jnp.asarray(step, jnp.float32)
        if lr_init == 0.0 and lr_final == 0.0:
            return jnp.zeros_like(step)
        if lr_delay_steps > 0:
            delay = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
                0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0, 1)
            )
        else:
            delay = 1.0
        t = jnp.clip(step / max_steps, 0, 1)
        log_lerp = jnp.exp(np.log(lr_init) * (1 - t) + np.log(lr_final) * t)
        return delay * log_lerp

    return helper


def reset_opacity(scene: GaussianScene) -> GaussianScene:
    """(ref gaussian_model.py:306-309): clamp opacity to <= 0.01."""
    new = inverse_sigmoid(jnp.minimum(jax.nn.sigmoid(scene.opacity), 0.01))
    return scene._replace(opacity=jnp.where(scene.valid[:, None], new, scene.opacity))


def _write_slots(arr, slot_idx, values, active):
    """Scatter `values` rows into `slot_idx` rows of arr where active."""
    safe = jnp.where(active, slot_idx, arr.shape[0])  # OOB -> dropped
    return arr.at[safe].set(values, mode="drop")


def densify_and_prune(
    scene: GaussianScene,
    grad_accum: jax.Array,     # (N,) accumulated ||d(screen xy)|| (sum)
    denom: jax.Array,          # (N,) visibility counts
    max_radii2d: jax.Array,    # (N,) running max screen radius
    key,
    max_grad: float = 0.0002,
    min_opacity: float = 0.005,
    extent: float = 1.0,
    max_screen_size: Optional[float] = None,
    percent_dense: float = 0.01,
) -> Tuple[GaussianScene, DensifyStats]:
    """One adaptive-density step at fixed capacity (ref :453-534)."""
    n = scene.num_points
    grads = jnp.nan_to_num(grad_accum / jnp.maximum(denom, 1e-12))
    max_scale = jnp.max(scene.get_scaling, axis=1)

    # -- prune (ref :524-533) -------------------------------------------------
    prune = (jax.nn.sigmoid(scene.opacity[:, 0]) < min_opacity)
    if max_screen_size is not None:
        prune = prune | (max_radii2d > max_screen_size) | (max_scale > 0.1 * extent)
    prune = prune & scene.valid
    valid = scene.valid & ~prune

    hit = (grads >= max_grad) & valid
    clone_sel = hit & (max_scale <= percent_dense * extent)
    split_sel = hit & (max_scale > percent_dense * extent)

    # -- allocate free slots (invalid entries), clones first -------------------
    free = ~valid
    free_rank = jnp.cumsum(free.astype(jnp.int32)) - 1          # rank among free
    (free_idx,) = jnp.nonzero(free, size=n, fill_value=n)        # free slot list

    clone_rank = jnp.cumsum(clone_sel.astype(jnp.int32)) - 1
    n_clone = jnp.sum(clone_sel.astype(jnp.int32))
    # split children: 2 slots per parent, after the clones
    split_rank = jnp.cumsum(split_sel.astype(jnp.int32)) - 1
    n_split = jnp.sum(split_sel.astype(jnp.int32))
    n_free = jnp.sum(free.astype(jnp.int32))

    def alloc(rank, base):
        slot_pos = base + rank
        ok = slot_pos < n_free
        return jnp.where(ok, free_idx[jnp.minimum(slot_pos, n - 1)], n), ok

    # clones: copy the row verbatim (ref densify_and_clone :493-521)
    c_slot, c_ok = alloc(clone_rank, 0)
    c_active = clone_sel & c_ok

    # splits: two children each, resampled inside the parent (ref :453-491)
    s_slot0, s_ok0 = alloc(split_rank * 2, n_clone)
    s_slot1, s_ok1 = alloc(split_rank * 2 + 1, n_clone)
    s_active0 = split_sel & s_ok0
    s_active1 = split_sel & s_ok1

    stds = scene.get_scaling
    rots = build_rotation(scene.rotation)
    k0, k1 = jax.random.split(key)

    def child(k):
        sample = jax.random.normal(k, (n, 3)) * stds
        xyz = jnp.einsum("nij,nj->ni", rots, sample) + scene.xyz
        scaling = jnp.log(scene.get_scaling / (0.8 * 2))
        return xyz, scaling

    cx0, cs0 = child(k0)
    cx1, cs1 = child(k1)

    def place(arr, base_vals, idx_slots, active):
        return _write_slots(arr, idx_slots, base_vals, active)

    new = scene
    # clones
    for field, vals in [
        ("xyz", scene.xyz), ("features_dc", scene.features_dc),
        ("features_rest", scene.features_rest), ("scaling", scene.scaling),
        ("rotation", scene.rotation), ("opacity", scene.opacity),
    ]:
        new = new._replace(**{field: place(getattr(new, field), vals, c_slot, c_active)})
    valid = _write_slots(valid, c_slot, jnp.ones(n, bool), c_active)

    # split children
    for slot, active, cx, cs in [(s_slot0, s_active0, cx0, cs0), (s_slot1, s_active1, cx1, cs1)]:
        new = new._replace(xyz=place(new.xyz, cx, slot, active))
        new = new._replace(scaling=place(new.scaling, cs, slot, active))
        for field in ("features_dc", "features_rest", "rotation", "opacity"):
            new = new._replace(**{field: place(getattr(new, field), getattr(scene, field), slot, active)})
        valid = _write_slots(valid, slot, jnp.ones(n, bool), active)

    # retire split parents (ref prune_filter, :489-491)
    valid = valid & ~s_active0

    new = new._replace(valid=valid)
    stats = DensifyStats(
        n_cloned=jnp.sum(c_active.astype(jnp.int32)),
        n_split=jnp.sum(s_active0.astype(jnp.int32)),
        n_pruned=jnp.sum(prune.astype(jnp.int32)),
        n_dropped=jnp.sum((clone_sel & ~c_ok).astype(jnp.int32))
        + 2 * jnp.sum((split_sel & ~s_ok0).astype(jnp.int32)),
    )
    return new, stats


def reset_adam_state(opt_state, touched_mask):
    """Zero Adam moments for rewritten slots (replaces the reference's
    optimizer-state surgery, ref :370-451). touched_mask (N,) bool."""

    def zero_rows(x):
        if hasattr(x, "shape") and x.ndim >= 1 and x.shape[0] == touched_mask.shape[0]:
            m = touched_mask.reshape((-1,) + (1,) * (x.ndim - 1))
            return jnp.where(m, 0.0, x)
        return x

    return jax.tree.map(zero_rows, opt_state)
