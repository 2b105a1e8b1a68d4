"""InceptionV3 feature extractor for FID/KID/PR/IS, TPU-native.

The reference computes every Inception metric through a TorchScript
translation of the 2015-12-05 TF InceptionV3
(/root/reference/eg3d/metrics/frechet_inception_distance.py:34-35,
metric_utils.py get_feature_detector). That torchscript pickle cannot be
fetched in this environment, so this module ports the OTHER public
standard for the same network: the pytorch-fid `fid_inception_v3`
architecture (torchvision InceptionV3 with the FIDInception A/C/E pooling
quirks), whose converted TF weights (`pt_inception-2015-12-05-6726825d
.pth`) are the de-facto reference for published FID numbers. Given that
state dict, `load_torch_state_dict` maps it 1:1 onto this tree; without
weights the architecture still runs (random init) so the metric suite
stays internally consistent.

Structure notes (all parity-relevant):
  * BasicConv2d = bias-free conv + BatchNorm(eps=1e-3) + relu.
  * FIDInceptionA/C and E_1 use avg_pool2d(3, 1, 1) with
    count_include_pad=False; E_2 uses max_pool2d(3, 1, 1) — the two
    pytorch-fid deviations from torchvision.
  * Input: (N, 3, H, W) in [0, 255]; resized to 299^2 with bilinear
    align_corners=False (NO antialias — pytorch-fid semantics), then
    scaled to [-1, 1].
  * fc (2048 -> 1008 TF classes) is kept: `logits` powers is50k.

TPU notes: one jit over the whole stack; convs are NCHW
lax.conv_general_dilated (MXU), BN folded into scale/shift at trace
time, pools via reduce_window. bf16 activations optional.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import resize_bilinear

Params = Dict[str, any]


# ----------------------------------------------------------------------------
# primitives


def _conv(params, x, stride=1, padding=((0, 0), (0, 0))):
    w = jnp.asarray(params["conv"]["weight"], x.dtype)
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding=padding,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32,
    )
    bn = params["bn"]
    scale = jnp.asarray(bn["weight"]) * jax.lax.rsqrt(
        jnp.asarray(bn["running_var"]) + 1e-3
    )
    shift = jnp.asarray(bn["bias"]) - jnp.asarray(bn["running_mean"]) * scale
    y = y * scale[None, :, None, None] + shift[None, :, None, None]
    return jax.nn.relu(y).astype(x.dtype)


def _max_pool(x, window=3, stride=2, padding=0):
    pad = ((0, 0), (0, 0), (padding, padding), (padding, padding))
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        (1, 1, window, window), (1, 1, stride, stride),
        [(p[0], p[1]) for p in pad],
    )


def _avg_pool_nip(x, window=3, stride=1, padding=1):
    """avg_pool2d with count_include_pad=False (pytorch-fid A/C/E_1)."""
    pad = [(0, 0), (0, 0), (padding, padding), (padding, padding)]
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add,
        (1, 1, window, window), (1, 1, stride, stride), pad,
    )
    ones = jnp.ones((1, 1) + x.shape[2:], x.dtype)
    cnt = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add,
        (1, 1, window, window), (1, 1, stride, stride), pad,
    )
    return s / cnt


def _pad_hw(ph, pw):
    return ((ph, ph), (pw, pw))


# ----------------------------------------------------------------------------
# inception blocks (names/dims = torchvision + pytorch-fid)


def _block_a(p, x):
    b1 = _conv(p["branch1x1"], x)
    b5 = _conv(p["branch5x5_2"], _conv(p["branch5x5_1"], x), padding=_pad_hw(2, 2))
    b3 = _conv(p["branch3x3dbl_1"], x)
    b3 = _conv(p["branch3x3dbl_2"], b3, padding=_pad_hw(1, 1))
    b3 = _conv(p["branch3x3dbl_3"], b3, padding=_pad_hw(1, 1))
    bp = _conv(p["branch_pool"], _avg_pool_nip(x))
    return jnp.concatenate([b1, b5, b3, bp], axis=1)


def _block_b(p, x):
    b3 = _conv(p["branch3x3"], x, stride=2)
    bd = _conv(p["branch3x3dbl_1"], x)
    bd = _conv(p["branch3x3dbl_2"], bd, padding=_pad_hw(1, 1))
    bd = _conv(p["branch3x3dbl_3"], bd, stride=2)
    bp = _max_pool(x)
    return jnp.concatenate([b3, bd, bp], axis=1)


def _block_c(p, x):
    b1 = _conv(p["branch1x1"], x)
    b7 = _conv(p["branch7x7_1"], x)
    b7 = _conv(p["branch7x7_2"], b7, padding=_pad_hw(0, 3))
    b7 = _conv(p["branch7x7_3"], b7, padding=_pad_hw(3, 0))
    bd = _conv(p["branch7x7dbl_1"], x)
    bd = _conv(p["branch7x7dbl_2"], bd, padding=_pad_hw(3, 0))
    bd = _conv(p["branch7x7dbl_3"], bd, padding=_pad_hw(0, 3))
    bd = _conv(p["branch7x7dbl_4"], bd, padding=_pad_hw(3, 0))
    bd = _conv(p["branch7x7dbl_5"], bd, padding=_pad_hw(0, 3))
    bp = _conv(p["branch_pool"], _avg_pool_nip(x))
    return jnp.concatenate([b1, b7, bd, bp], axis=1)


def _block_d(p, x):
    b3 = _conv(p["branch3x3_2"], _conv(p["branch3x3_1"], x), stride=2)
    b7 = _conv(p["branch7x7x3_1"], x)
    b7 = _conv(p["branch7x7x3_2"], b7, padding=_pad_hw(0, 3))
    b7 = _conv(p["branch7x7x3_3"], b7, padding=_pad_hw(3, 0))
    b7 = _conv(p["branch7x7x3_4"], b7, stride=2)
    bp = _max_pool(x)
    return jnp.concatenate([b3, b7, bp], axis=1)


def _block_e(p, x, pool: str):
    b1 = _conv(p["branch1x1"], x)
    b3 = _conv(p["branch3x3_1"], x)
    b3 = jnp.concatenate([
        _conv(p["branch3x3_2a"], b3, padding=_pad_hw(0, 1)),
        _conv(p["branch3x3_2b"], b3, padding=_pad_hw(1, 0)),
    ], axis=1)
    bd = _conv(p["branch3x3dbl_1"], x)
    bd = _conv(p["branch3x3dbl_2"], bd, padding=_pad_hw(1, 1))
    bd = jnp.concatenate([
        _conv(p["branch3x3dbl_3a"], bd, padding=_pad_hw(0, 1)),
        _conv(p["branch3x3dbl_3b"], bd, padding=_pad_hw(1, 0)),
    ], axis=1)
    if pool == "avg":
        px = _avg_pool_nip(x)
    else:  # FIDInceptionE_2: max_pool2d(3, 1, 1)
        px = _max_pool(x, stride=1, padding=1)
    bp = _conv(p["branch_pool"], px)
    return jnp.concatenate([b1, b3, bd, bp], axis=1)


# layer plan: name -> (kind, conv-shape info for init)
_STEM = [
    # name, cin, cout, kh, kw, stride, pad
    ("Conv2d_1a_3x3", 3, 32, 3, 3, 2, 0),
    ("Conv2d_2a_3x3", 32, 32, 3, 3, 1, 0),
    ("Conv2d_2b_3x3", 32, 64, 3, 3, 1, 1),
    ("Conv2d_3b_1x1", 64, 80, 1, 1, 1, 0),
    ("Conv2d_4a_3x3", 80, 192, 3, 3, 1, 0),
]

# (name, kind, cin, kwargs)
_MIXED = [
    ("Mixed_5b", "a", 192, dict(pool_features=32)),
    ("Mixed_5c", "a", 256, dict(pool_features=64)),
    ("Mixed_5d", "a", 288, dict(pool_features=64)),
    ("Mixed_6a", "b", 288, {}),
    ("Mixed_6b", "c", 768, dict(c7=128)),
    ("Mixed_6c", "c", 768, dict(c7=160)),
    ("Mixed_6d", "c", 768, dict(c7=160)),
    ("Mixed_6e", "c", 768, dict(c7=192)),
    ("Mixed_7a", "d", 768, {}),
    ("Mixed_7b", "e1", 1280, {}),
    ("Mixed_7c", "e2", 2048, {}),
]


def _branch_convs(kind: str, cin: int, **kw) -> Dict[str, Tuple[int, int, int, int]]:
    """branch name -> (cin, cout, kh, kw)."""
    if kind == "a":
        pf = kw["pool_features"]
        return {
            "branch1x1": (cin, 64, 1, 1),
            "branch5x5_1": (cin, 48, 1, 1), "branch5x5_2": (48, 64, 5, 5),
            "branch3x3dbl_1": (cin, 64, 1, 1), "branch3x3dbl_2": (64, 96, 3, 3),
            "branch3x3dbl_3": (96, 96, 3, 3),
            "branch_pool": (cin, pf, 1, 1),
        }
    if kind == "b":
        return {
            "branch3x3": (cin, 384, 3, 3),
            "branch3x3dbl_1": (cin, 64, 1, 1), "branch3x3dbl_2": (64, 96, 3, 3),
            "branch3x3dbl_3": (96, 96, 3, 3),
        }
    if kind == "c":
        c7 = kw["c7"]
        return {
            "branch1x1": (cin, 192, 1, 1),
            "branch7x7_1": (cin, c7, 1, 1), "branch7x7_2": (c7, c7, 1, 7),
            "branch7x7_3": (c7, 192, 7, 1),
            "branch7x7dbl_1": (cin, c7, 1, 1), "branch7x7dbl_2": (c7, c7, 7, 1),
            "branch7x7dbl_3": (c7, c7, 1, 7), "branch7x7dbl_4": (c7, c7, 7, 1),
            "branch7x7dbl_5": (c7, 192, 1, 7),
            "branch_pool": (cin, 192, 1, 1),
        }
    if kind == "d":
        return {
            "branch3x3_1": (cin, 192, 1, 1), "branch3x3_2": (192, 320, 3, 3),
            "branch7x7x3_1": (cin, 192, 1, 1), "branch7x7x3_2": (192, 192, 1, 7),
            "branch7x7x3_3": (192, 192, 7, 1), "branch7x7x3_4": (192, 192, 3, 3),
        }
    # e1 / e2
    return {
        "branch1x1": (cin, 320, 1, 1),
        "branch3x3_1": (cin, 384, 1, 1), "branch3x3_2a": (384, 384, 1, 3),
        "branch3x3_2b": (384, 384, 3, 1),
        "branch3x3dbl_1": (cin, 448, 1, 1), "branch3x3dbl_2": (448, 384, 3, 3),
        "branch3x3dbl_3a": (384, 384, 1, 3), "branch3x3dbl_3b": (384, 384, 3, 1),
        "branch_pool": (cin, 192, 1, 1),
    }


@dataclass(frozen=True)
class InceptionV3:
    """pytorch-fid-compatible InceptionV3 (pool3 features + TF logits)."""

    num_classes: int = 1008
    compute_dtype: any = jnp.float32

    # -- init -----------------------------------------------------------------

    def _conv_init(self, key, cin, cout, kh, kw):
        k1, _ = jax.random.split(key)
        fan_in = cin * kh * kw
        return {
            "conv": {"weight": jax.random.normal(k1, (cout, cin, kh, kw),
                                                 jnp.float32) / np.sqrt(fan_in)},
            "bn": {
                "weight": jnp.ones((cout,), jnp.float32),
                "bias": jnp.zeros((cout,), jnp.float32),
                "running_mean": jnp.zeros((cout,), jnp.float32),
                "running_var": jnp.ones((cout,), jnp.float32),
            },
        }

    def init(self, key) -> Params:
        p: Params = {}
        for i, (name, cin, cout, kh, kw, _s, _p) in enumerate(_STEM):
            p[name] = self._conv_init(jax.random.fold_in(key, i), cin, cout, kh, kw)
        for j, (name, kind, cin, kw_) in enumerate(_MIXED):
            bp = {}
            for bi, (bname, (ci, co, kh, kw2)) in enumerate(
                sorted(_branch_convs(kind, cin, **kw_).items())
            ):
                bp[bname] = self._conv_init(
                    jax.random.fold_in(key, 100 + j * 20 + bi), ci, co, kh, kw2
                )
            p[name] = bp
        kf = jax.random.fold_in(key, 999)
        p["fc"] = {
            "weight": jax.random.normal(kf, (self.num_classes, 2048),
                                        jnp.float32) / np.sqrt(2048),
            "bias": jnp.zeros((self.num_classes,), jnp.float32),
        }
        return p

    # -- forward --------------------------------------------------------------

    def features(self, params: Params, img255: jax.Array,
                 resize_input: bool = True) -> jax.Array:
        """(N, 3, H, W) in [0,255] -> (N, 2048) pool3 features."""
        x = img255.astype(self.compute_dtype)
        if resize_input and x.shape[-2:] != (299, 299):
            x = resize_bilinear(x, 299, 299, antialias=False)
        x = x / 127.5 - 1.0  # pytorch-fid normalize_input on [0,1]*255

        x = _conv(params["Conv2d_1a_3x3"], x, stride=2)
        x = _conv(params["Conv2d_2a_3x3"], x)
        x = _conv(params["Conv2d_2b_3x3"], x, padding=_pad_hw(1, 1))
        x = _max_pool(x)
        x = _conv(params["Conv2d_3b_1x1"], x)
        x = _conv(params["Conv2d_4a_3x3"], x)
        x = _max_pool(x)
        for name, kind, _cin, _kw in _MIXED:
            if kind == "a":
                x = _block_a(params[name], x)
            elif kind == "b":
                x = _block_b(params[name], x)
            elif kind == "c":
                x = _block_c(params[name], x)
            elif kind == "d":
                x = _block_d(params[name], x)
            else:
                x = _block_e(params[name], x, "avg" if kind == "e1" else "max")
        return jnp.mean(x, axis=(2, 3)).astype(jnp.float32)  # (N, 2048)

    def logits(self, params: Params, img255: jax.Array) -> jax.Array:
        """(N, 1008) TF-class logits (inception_score's classifier)."""
        f = self.features(params, img255)
        return f @ params["fc"]["weight"].T + params["fc"]["bias"]

    # -- weight import --------------------------------------------------------

    def load_torch_state_dict(self, state: Dict[str, np.ndarray]) -> Params:
        """pytorch-fid / torchvision names -> params tree.

        Expects keys like `Mixed_5b.branch1x1.conv.weight`,
        `...bn.{weight,bias,running_mean,running_var}`, `fc.{weight,bias}`.
        """
        def conv_entry(prefix):
            return {
                "conv": {"weight": jnp.asarray(state[f"{prefix}.conv.weight"])},
                "bn": {k: jnp.asarray(state[f"{prefix}.bn.{k}"])
                       for k in ("weight", "bias", "running_mean", "running_var")},
            }

        p: Params = {}
        for name, *_ in _STEM:
            p[name] = conv_entry(name)
        for name, kind, cin, kw_ in _MIXED:
            p[name] = {b: conv_entry(f"{name}.{b}")
                       for b in _branch_convs(kind, cin, **kw_)}
        p["fc"] = {"weight": jnp.asarray(state["fc.weight"]),
                   "bias": jnp.asarray(state["fc.bias"])}
        return p


def load_inception(path: str, compute_dtype=jnp.float32):
    """Load `pt_inception-2015-12-05-6726825d.pth` (or any state dict with
    pytorch-fid naming) -> (InceptionV3, params).

    The reference instead downloads NVIDIA's torchscript translation
    (eg3d/metrics/frechet_inception_distance.py:35); both are conversions
    of the same 2015-12-05 TF network."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    state = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
             for k, v in obj.items()}
    net = InceptionV3(compute_dtype=compute_dtype)
    return net, net.load_torch_state_dict(state)
