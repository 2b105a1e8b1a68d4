"""3DGS .ply import/export, byte-compatible with the reference layout.

Replicates /root/reference/gaussian_splatting/scene/gaussian_model.py:281-351
(save_ply/load_ply): binary_little_endian 1.0, one 'vertex' element with f4
properties x y z nx ny nz f_dc_* [f_rest_*] opacity scale_* rot_*, storing
RAW (pre-activation) values. `plyfile` is not available in this image, so
the codec is hand-rolled numpy (the format is a plain packed struct array).

Exported .ply files load in splatviz/SIBR viewers exactly like reference
exports (same property names and order).

Known reference defect NOT replicated: for active_sh_degree == 0 with
max_sh_degree > 0 (a save before the first oneupSHdegree ramp step) the
reference's attribute-name list gates f_rest_* on the ACTIVE degree
(gaussian_model.py:271) while the data concat gates on MAX
(gaussian_model.py:287-299), so its structured-array assignment raises.
Here both gate on the active degree: the save succeeds with the dc-only
layout, and load_ply zero-fills the missing rest coefficients.
"""
from __future__ import annotations

import os
import re
from typing import Dict, List, Tuple

import numpy as np

from .model import GaussianScene


def _header(names: List[str], count: int) -> bytes:
    lines = ["ply", "format binary_little_endian 1.0", f"element vertex {count}"]
    lines += [f"property float {n}" for n in names]
    lines.append("end_header")
    return ("\n".join(lines) + "\n").encode("ascii")


def _attribute_names(scene: GaussianScene) -> List[str]:
    """(ref construct_list_of_attributes, gaussian_model.py:266-279)"""
    names = ["x", "y", "z", "nx", "ny", "nz"]
    names += [f"f_dc_{i}" for i in range(scene.features_dc.shape[1] * 3)]
    if scene.active_sh_degree > 0:
        names += [f"f_rest_{i}" for i in range(scene.features_rest.shape[1] * 3)]
    names += ["opacity"]
    names += [f"scale_{i}" for i in range(scene.scaling.shape[1])]
    names += [f"rot_{i}" for i in range(scene.rotation.shape[1])]
    return names


def save_ply(scene: GaussianScene, path: str, only_valid: bool = True) -> None:
    xyz = np.asarray(scene.xyz, np.float32)
    valid = np.asarray(scene.valid)
    # f_dc layout: torch does features_dc.transpose(1,2).flatten(1) ->
    # channel-major (c0k0, c0k1, ..., c1k0, ...); here K_dc == 1 so it is
    # simply the 3 color channels.
    f_dc = np.asarray(scene.features_dc, np.float32).transpose(0, 2, 1).reshape(len(xyz), -1)
    f_rest = np.asarray(scene.features_rest, np.float32).transpose(0, 2, 1).reshape(len(xyz), -1)
    opac = np.asarray(scene.opacity, np.float32)
    scale = np.asarray(scene.scaling, np.float32)
    rot = np.asarray(scene.rotation, np.float32)

    cols = [xyz, np.zeros_like(xyz), f_dc]
    if scene.active_sh_degree > 0:
        cols.append(f_rest)
    cols += [opac, scale, rot]
    attributes = np.concatenate(cols, axis=1).astype("<f4")
    if only_valid:
        attributes = attributes[valid]

    names = _attribute_names(scene)
    assert attributes.shape[1] == len(names), (attributes.shape, len(names))
    d = os.path.dirname(path)
    if d:
        os.makedirs(d, exist_ok=True)
    with open(path, "wb") as f:
        f.write(_header(names, attributes.shape[0]))
        f.write(np.ascontiguousarray(attributes).tobytes())


def _parse_header(blob: bytes) -> Tuple[int, List[str], int]:
    end = blob.index(b"end_header\n") + len(b"end_header\n")
    header = blob[:end].decode("ascii")
    assert "binary_little_endian" in header, "only binary_little_endian supported"
    count = int(re.search(r"element vertex (\d+)", header).group(1))
    names = re.findall(r"property float (\S+)", header)
    return count, names, end


def load_ply_arrays(path: str) -> Dict[str, np.ndarray]:
    with open(path, "rb") as f:
        blob = f.read()
    count, names, offset = _parse_header(blob)
    data = np.frombuffer(blob, dtype="<f4", count=count * len(names), offset=offset)
    data = data.reshape(count, len(names))
    return {n: data[:, i].copy() for i, n in enumerate(names)}


def load_ply(path: str, max_sh_degree: int = 0) -> GaussianScene:
    """(ref load_ply, gaussian_model.py:310-351)"""
    import jax.numpy as jnp

    cols = load_ply_arrays(path)
    n = len(cols["x"])
    xyz = np.stack([cols["x"], cols["y"], cols["z"]], axis=1)
    f_dc = np.stack([cols["f_dc_0"], cols["f_dc_1"], cols["f_dc_2"]], axis=1)  # (N,3)

    rest_names = sorted(
        (k for k in cols if k.startswith("f_rest_")), key=lambda s: int(s.split("_")[-1])
    )
    k_rest = (max_sh_degree + 1) ** 2 - 1
    if rest_names:
        assert len(rest_names) == 3 * k_rest
        rest = np.stack([cols[k] for k in rest_names], axis=1).reshape(n, 3, k_rest)
        rest = rest.transpose(0, 2, 1)  # (N, K-1, 3)
    else:
        rest = np.zeros((n, k_rest, 3), np.float32)

    scale_names = sorted(
        (k for k in cols if k.startswith("scale_")), key=lambda s: int(s.split("_")[-1])
    )
    rot_names = sorted(
        (k for k in cols if k.startswith("rot_")), key=lambda s: int(s.split("_")[-1])
    )
    return GaussianScene(
        xyz=jnp.asarray(xyz),
        features_dc=jnp.asarray(f_dc)[:, None, :],
        features_rest=jnp.asarray(rest),
        scaling=jnp.asarray(np.stack([cols[k] for k in scale_names], axis=1)),
        rotation=jnp.asarray(np.stack([cols[k] for k in rot_names], axis=1)),
        opacity=jnp.asarray(cols["opacity"])[:, None],
        valid=jnp.ones((n,), bool),
        max_sh_degree=max_sh_degree,
        active_sh_degree=max_sh_degree,
    )
