"""Device meshes and shardings.

The reference's ONLY distribution strategy is data parallelism over NCCL
process groups (SURVEY §2.6: torch.multiprocessing.spawn + flattened-grad
all_reduce, /root/reference/PanoHead/training/training_loop.py:186-299).
The TPU-native equivalent is declarative: one jitted program over a
`jax.sharding.Mesh`, params replicated, the batch axis sharded over ICI,
XLA inserting the psum — no rendezvous files, no manual broadcasts,
`check_ddp_consistency` is unnecessary by construction.

Axes:
  'data'   — per-device latents/views (DP; replaces rank-sharded GPUs)
  'points' — optional second axis for sharding the 500k-gaussian /
             2.1M-sigma-sample point dimension within one scene
             ("sequence parallelism" per SURVEY §5).

Multi-host: call jax.distributed.initialize() before make_mesh; devices
enumerate across hosts and the same code runs unchanged (ICI within a
slice, DCN across slices).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Tuple[str, ...] = ("data",),
    shape: Optional[Tuple[int, ...]] = None,
) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    if shape is None:
        shape = (len(devs),) + (1,) * (len(axis_names) - 1)
    arr = np.asarray(devs).reshape(shape)
    return Mesh(arr, axis_names)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Leading-axis sharding over `axis`."""
    return NamedSharding(mesh, P(axis))
