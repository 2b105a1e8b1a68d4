"""Runtime contracts and small helpers.

Equivalent of /root/reference/PanoHead/torch_utils/misc.py's surviving
roles: `assert_shape` (:84, the shape-contract checker used throughout the
reference networks), `copy_params_and_buffers` (:157 — a tree merge here),
`print_module_summary` (:198 — a param-count tree report). The DDP
machinery (ddp_sync/check_ddp_consistency) is obsolete: pjit-sharded
params are replicated by construction.
"""
from __future__ import annotations

from typing import Iterable, Optional, Sequence

import jax
import numpy as np


def assert_shape(x, ref_shape: Sequence[Optional[int]]):
    """Shape contract: None entries are wildcards (ref misc.py:84-100)."""
    if x.ndim != len(ref_shape):
        raise AssertionError(f"rank {x.ndim} != expected {len(ref_shape)}")
    for i, (got, want) in enumerate(zip(x.shape, ref_shape)):
        if want is not None and got != want:
            raise AssertionError(f"dim {i}: {got} != expected {want} (shape {x.shape})")


def copy_params_and_buffers(src_tree, dst_tree, require_all: bool = False):
    """Merge src leaves into dst by matching paths (ref misc.py:157-168)."""
    src_flat = dict(jax.tree_util.tree_flatten_with_path(src_tree)[0])
    dst_flat, treedef = jax.tree_util.tree_flatten_with_path(dst_tree)
    out = []
    for path, leaf in dst_flat:
        if path in src_flat:
            out.append(src_flat[path])
        else:
            if require_all:
                raise KeyError(f"missing {path}")
            out.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, out)


def count_params(tree) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree) if hasattr(x, "shape"))


def print_module_summary(name: str, params, indent: int = 0):
    """Param-count report per subtree (ref misc.py:198-266)."""
    pad = "  " * indent
    if isinstance(params, dict):
        total = count_params(params)
        print(f"{pad}{name}: {total:,} params")
        for k, v in sorted(params.items()):
            if isinstance(v, dict):
                print_module_summary(k, v, indent + 1)
    else:
        shape = getattr(params, "shape", ())
        print(f"{pad}{name}: {tuple(shape)}")
