"""Reverse port: our param pytrees -> reference-named torch state dicts.

The reference saves BOTH a persistence pickle and a plain torch state dict
per snapshot (`torch.save(decoder.state_dict(), f"{outdir}/decoder{i}.pt")`,
ref main/train_pano2gaussian_decoder.py:307). Our param trees mirror the
reference torch module hierarchy 1:1 (CLAUDE.md conventions; the read side
port/torch_pickle.py is a pure re-nesting), so the inverse is mechanical:
flatten with dotted names + undo the two Sequential-index renames.

A state dict exported here loads into the reference's own decoder /
generator classes via `module.load_state_dict(sd, strict=False)` —
strict=False only because the STATIC resample-filter buffers (SG2
`resample_filter`, SG3 `up_filter`/`down_filter`) are config, not params,
in this framework (re-derived from layer geometry; torch_pickle.py:149
drops them on the read side for the same reason). Every learned tensor
and every stochastic buffer (noise_const, w_avg, magnitude_ema, Fourier
freqs/phases) round-trips exactly.

The persistence-PICKLE side stays one-way by design (read only): writing
it would require embedding a torch re-implementation of the generator as
source code inside every snapshot (torch_utils/persistence.py:37-134
executes `module_src` at load) — see README "snapshot interop".
"""
from __future__ import annotations

from typing import Dict

import numpy as np

# our-tree name -> torch name, applied per dotted segment pair (inverse of
# torch_pickle._nest's renames; OSGDecoder is a torch Sequential:
# ref PanoHead/training/triplane.py:305-311)
_SEGMENT_RENAMES = {
    ("decoder", "fc0"): ("decoder", "net.0"),
    ("decoder", "fc1"): ("decoder", "net.2"),
}

_HEAD_NAMES = ("color", "opacity", "rotation", "scale", "xyz")


def flatten_params(tree, prefix: str = "",
                   out: Dict[str, np.ndarray] | None = None) -> Dict[str, np.ndarray]:
    """Nested param pytree -> flat {dotted_name: float32 ndarray}."""
    if out is None:
        out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            flatten_params(v, f"{prefix}{k}.", out)
    else:
        out[prefix[:-1]] = np.asarray(tree, dtype=np.float32)
    return out


def _apply_renames(name: str) -> str:
    parts = name.split(".")
    for i in range(len(parts) - 1):
        key = (parts[i], parts[i + 1])
        if key in _SEGMENT_RENAMES:
            parts[i], parts[i + 1] = _SEGMENT_RENAMES[key]
    return ".".join(parts)


def generator_state_from_params(params) -> Dict[str, np.ndarray]:
    """models/triplane.py (or stylegan2/3) param tree -> torch-named flat
    state dict (inverse of torch_pickle.generator_params_from_state)."""
    return {_apply_renames(k): v for k, v in flatten_params(params).items()}


def decoder_state_dict(decoder, params) -> Dict[str, np.ndarray]:
    """GaussianDecoder params -> the reference decoder module's state-dict
    names: `{name}_decoder.backbone.{2i}.{weight,bias}` for the heads
    (ref main/decoder_models/base_decoder.py:11-19: Linear at even
    Sequential indices, GELU at odd) + `G.` + generator names."""
    out: Dict[str, np.ndarray] = {}
    for name in _HEAD_NAMES:
        if name not in params:
            continue
        for fc, bag in params[name].items():
            idx = int(fc.removeprefix("fc")) * 2
            for pname, v in bag.items():
                out[f"{name}_decoder.backbone.{idx}.{pname}"] = np.asarray(
                    v, dtype=np.float32)
    if "G" in params:
        for k, v in generator_state_from_params(params["G"]).items():
            out[f"G.{k}"] = v
    return out


def save_torch_state_dict(path: str, flat: Dict[str, np.ndarray]) -> None:
    """Write a torch-loadable state dict (`torch.save` format)."""
    import torch

    torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in flat.items()}, path)
