"""Checkpoint / resume.

The reference keeps three formats (SURVEY §5 checkpoint/resume):
  1. source-embedding pickles via torch_utils.persistence — JAX params are
     plain pytrees, so the equivalent robustness comes from orbax
     checkpoints of (params, opt_state) + a JSON config snapshot that
     fully reconstructs the dataclass configs (the "embedded source"
     becomes embedded *configuration*);
  2. raw state_dict .pt       -> a flat .npz export of the params tree;
  3. 3DGS .ply                -> gaussians/ply.py.
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional

import numpy as np

try:  # orbax is baked into the image; gate anyway for minimal installs
    import orbax.checkpoint as ocp

    _HAS_ORBAX = True
except Exception:  # pragma: no cover
    _HAS_ORBAX = False


def _config_to_json(obj) -> Any:
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        return {
            "__dataclass__": f"{type(obj).__module__}.{type(obj).__qualname__}",
            "fields": {
                f.name: _config_to_json(getattr(obj, f.name))
                for f in dataclasses.fields(obj)
            },
        }
    if isinstance(obj, (list, tuple)):
        return [_config_to_json(x) for x in obj]
    if isinstance(obj, dict):
        return {k: _config_to_json(v) for k, v in obj.items()}
    return obj


def _config_from_json(data):
    if isinstance(data, dict) and "__dataclass__" in data:
        module, _, qual = data["__dataclass__"].rpartition(".")
        import importlib

        cls = getattr(importlib.import_module(module), qual)
        fields = {k: _config_from_json(v) for k, v in data["fields"].items()}
        # tuples survive json as lists; dataclass fields here use tuples at
        # EVERY nesting level (e.g. rendering_kwargs carries list values
        # like avg_camera_pivot) — convert deeply or the config is
        # unhashable and != the pickle-ported original
        def _deep_tuple(v):
            return tuple(_deep_tuple(x) for x in v) if isinstance(v, list) else v

        fields = {k: _deep_tuple(v) if isinstance(v, list) else v
                  for k, v in fields.items()}
        return cls(**fields)
    if isinstance(data, list):
        return [_config_from_json(x) for x in data]
    return data


def save(path: str, state, configs: Optional[Dict[str, Any]] = None) -> None:
    """Write an orbax checkpoint of the train-state pytree + config JSON."""
    path = os.path.abspath(path)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    assert _HAS_ORBAX, "orbax unavailable"
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    if configs is not None:
        with open(path + ".config.json", "w") as f:
            json.dump({k: _config_to_json(v) for k, v in configs.items()}, f, indent=2)


def restore(path: str, target):
    """Restore a pytree saved by `save` (target = matching abstract tree)."""
    assert _HAS_ORBAX, "orbax unavailable"
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, target=target)


def load_configs(path: str) -> Dict[str, Any]:
    with open(os.path.abspath(path) + ".config.json") as f:
        return {k: _config_from_json(v) for k, v in json.load(f).items()}


def save_npz(path: str, params) -> None:
    """Flat `a/b/c -> array` export (the reference's .pt state_dict analog,
    train_pano2gaussian_decoder.py:307)."""
    flat = {}

    def walk(tree, prefix):
        if isinstance(tree, dict):
            for k, v in tree.items():
                walk(v, f"{prefix}/{k}" if prefix else str(k))
        elif isinstance(tree, (list, tuple)):
            for i, v in enumerate(tree):
                walk(v, f"{prefix}/{i}")
        else:
            flat[prefix] = np.asarray(tree)

    walk(params, "")
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, **flat)


def load_npz(path: str) -> Dict[str, np.ndarray]:
    return dict(np.load(path))
