"""TF-era StyleGAN2 checkpoint conversion.

Port of the reference's `convert_tf_generator`
(/root/reference/PanoHead/legacy.py:109-215 = eg3d/legacy.py): old
TensorFlow `dnnlib.tflib.network.Network` pickles (StyleGAN2 TF) are
unpickled as inert stubs and their variable dict is name-mapped onto the
models/stylegan2.Generator param tree. The reference targets its torch
Generator; our trees mirror that module hierarchy, so the mapping rules
are the same (weight transposes, Conv0_up/Skip spatial flips for the
flipped-filter convention, mod_bias + 1, noise buffer renumbering,
lr-multiplier conventions are handled by the models themselves).
"""
from __future__ import annotations

import math
import pickle
import re
from typing import Any, Dict, Tuple

import numpy as np

from .torch_pickle import _EasyDict, _nest


class TFNetworkStub(_EasyDict):
    """Captures a pickled dnnlib.tflib.network.Network: version,
    static_kwargs, variables [(name, ndarray)], components {name: stub}."""


class _TFUnpickler(pickle.Unpickler):
    def find_class(self, module, name):
        if module == "dnnlib.tflib.network" and name == "Network":
            return TFNetworkStub
        if module.startswith("dnnlib"):
            return _EasyDict
        return super().find_class(module, name)


def load_tf_pickle(path_or_file) -> Any:
    if hasattr(path_or_file, "read"):
        return _TFUnpickler(path_or_file).load()
    with open(path_or_file, "rb") as f:
        return _TFUnpickler(f).load()


def is_tf_pickle(data: Any) -> bool:
    return (isinstance(data, tuple) and len(data) == 3
            and all(isinstance(n, TFNetworkStub) for n in data))


def collect_tf_params(tf_net: TFNetworkStub) -> Dict[str, np.ndarray]:
    """Flatten variables across components (ref legacy.py:64-74)."""
    out: Dict[str, np.ndarray] = {}

    def recurse(prefix, net):
        for name, value in net.get("variables", []):
            out[prefix + name] = np.asarray(value)
        for name, comp in net.get("components", {}).items():
            recurse(prefix + name + "/", comp)

    recurse("", tf_net)
    return out


def convert_tf_generator(tf_G: TFNetworkStub):
    """-> (models.stylegan2.Generator, params tree). Mirrors the
    reference's kwarg + variable mapping (legacy.py:109-215)."""
    from ..models.stylegan2 import Generator

    if tf_G.get("version", 0) < 4:
        raise ValueError("TensorFlow pickle version too low")
    kw = dict(tf_G.get("static_kwargs", {}))

    def kwarg(name, default=None, none=None):
        val = kw.get(name, default)
        return val if val is not None else none

    img_resolution = kwarg("resolution", 1024)
    mapping_kwargs = (
        ("num_layers", kwarg("mapping_layers", 8)),
        ("embed_features", kwarg("label_fmaps", None)),
        ("layer_features", kwarg("mapping_fmaps", None)),
        ("activation", kwarg("mapping_nonlinearity", "lrelu")),
        ("lr_multiplier", kwarg("mapping_lrmul", 0.01)),
        ("w_avg_beta", kwarg("w_avg_beta", 0.995, none=1)),
    )

    tf_params = collect_tf_params(tf_G)
    # progressive-growing pickles store per-lod ToRGBs: remap each to its
    # resolution and switch to the 'orig' architecture (single final
    # ToRGB, no per-block skips). NOTE this fixes a reference defect
    # rather than replicating it: eg3d/legacy.py:166 flips the
    # architecture via `kwargs.synthesis.kwargs.architecture` — an
    # attribute path that does not exist on its kwargs EasyDict, so the
    # reference's own 'orig' branch raises AttributeError on any input
    # that triggers it (verified in-process). The discriminator branch
    # (legacy.py:265, `kwargs.architecture = 'orig'`) shows the intended
    # semantics, which we implement.
    architecture = kwarg("architecture", "skip")
    for name, value in list(tf_params.items()):
        m = re.fullmatch(r"ToRGB_lod(\d+)/(.*)", name)
        if m:
            r = img_resolution // (2 ** int(m.group(1)))
            tf_params[f"{r}x{r}/ToRGB/{m.group(2)}"] = value
            architecture = "orig"

    gen = Generator(
        z_dim=kwarg("latent_size", 512),
        c_dim=kwarg("label_size", 0),
        w_dim=kwarg("dlatent_size", 512),
        img_resolution=img_resolution,
        img_channels=kwarg("num_channels", 3),
        channel_base=kwarg("fmap_base", 16384) * 2,
        channel_max=kwarg("fmap_max", 512),
        num_fp16_res=kwarg("num_fp16_res", 0),
        conv_clamp=kwarg("conv_clamp", None),
        mapping_kwargs=mapping_kwargs,
        architecture=architecture,
    )

    flat: Dict[str, np.ndarray] = {}

    def conv_w(v, flip=False):
        v = np.asarray(v, np.float32)
        if flip:
            v = v[::-1, ::-1]
        return v.transpose(3, 2, 0, 1).copy()   # (kh,kw,in,out)->(out,in,kh,kw)

    flat["mapping.w_avg"] = tf_params["dlatent_avg"]
    if "mapping/LabelEmbed/weight" in tf_params:
        flat["mapping.embed.weight"] = tf_params["mapping/LabelEmbed/weight"].T
        flat["mapping.embed.bias"] = tf_params["mapping/LabelEmbed/bias"]
    for i in range(int(kwarg("mapping_layers", 8))):
        flat[f"mapping.fc{i}.weight"] = tf_params[f"mapping/Dense{i}/weight"].T
        flat[f"mapping.fc{i}.bias"] = tf_params[f"mapping/Dense{i}/bias"]

    def tf_key(src):
        """Remapped per-lod ToRGB entries land WITHOUT the component
        prefix ('{r}x{r}/ToRGB/...'); everything else carries it."""
        if f"{src}/weight" in tf_params:
            return src
        unprefixed = src.split("/", 1)[1]
        if f"{unprefixed}/weight" in tf_params:
            return unprefixed
        return src  # KeyError below names the prefixed form

    def layer(dst, src, noise_idx, flip=False):
        src = tf_key(src)
        flat[f"{dst}.weight"] = conv_w(tf_params[f"{src}/weight"], flip)
        flat[f"{dst}.bias"] = tf_params[f"{src}/bias"]
        flat[f"{dst}.affine.weight"] = tf_params[f"{src}/mod_weight"].T
        flat[f"{dst}.affine.bias"] = tf_params[f"{src}/mod_bias"] + 1.0
        if noise_idx is not None:
            flat[f"{dst}.noise_const"] = tf_params[f"synthesis/noise{noise_idx}"][0, 0]
            flat[f"{dst}.noise_strength"] = tf_params[f"{src}/noise_strength"]

    top = img_resolution
    flat["synthesis.b4.const"] = tf_params["synthesis/4x4/Const/const"][0]
    layer("synthesis.b4.conv1", "synthesis/4x4/Conv", 0)
    if architecture == "skip" or top == 4:
        layer("synthesis.b4.torgb", "synthesis/4x4/ToRGB", None)
    for r in [2 ** i for i in range(3, int(math.log2(img_resolution)) + 1)]:
        k = int(math.log2(r))
        layer(f"synthesis.b{r}.conv0", f"synthesis/{r}x{r}/Conv0_up",
              k * 2 - 5, flip=True)
        layer(f"synthesis.b{r}.conv1", f"synthesis/{r}x{r}/Conv1", k * 2 - 4)
        if architecture == "skip" or r == top:
            layer(f"synthesis.b{r}.torgb", f"synthesis/{r}x{r}/ToRGB", None)
        if f"synthesis/{r}x{r}/Skip/weight" in tf_params:
            flat[f"synthesis.b{r}.skip.weight"] = conv_w(
                tf_params[f"synthesis/{r}x{r}/Skip/weight"], flip=True)

    return gen, _nest(flat)


def load_tf_network_pkl(path_or_file) -> Tuple[Any, Dict]:
    """(G_ema Generator, params) from a 3-tuple TF pickle
    (ref load_network_pkl TF branch, legacy.py:28-34)."""
    data = load_tf_pickle(path_or_file)
    if not is_tf_pickle(data):
        raise ValueError(
            "not a TF-era pickle (use port.load_generator_pkl for modern "
            "persistence snapshots)")
    _tf_G, _tf_D, tf_Gs = data
    return convert_tf_generator(tf_Gs)
