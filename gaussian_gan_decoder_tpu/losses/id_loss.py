"""Face-identity loss via an IR-SE-50 ArcFace backbone.

Re-design of /root/reference/main/loss_utils/id_loss.py:6-33 +
main/models/encoders/{model_irse.py:9-84, helpers.py} in functional JAX.
Inference-only: BatchNorm runs with stored running statistics (the
reference calls .eval()), dropout is identity.

The ArcFace weights (`pretrained_models/model_ir_se50.pth`) are not
redistributable / fetchable in this zero-egress image. `IRSE50.init`
provides a deterministic random fallback (enough for smoke training and
plumbing tests); `IRSE50.load_torch_state_dict` ingests the real weights
when the user supplies the .pth (see port/torch_pickle.py).

Pipeline parity: area-downsample to 256^2, crop rows 35:223 / cols 32:220,
adaptive-average-pool to 112^2, embed, 1 - <x, y> (target detached).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .image import area_downsample


def _blocks_50() -> List[Tuple[int, int, int]]:
    """(in_channel, depth, stride) list (ref helpers.py:25-36, 50 layers)."""
    spec = [(64, 64, 3), (64, 128, 4), (128, 256, 14), (256, 512, 3)]
    out = []
    for cin, depth, units in spec:
        out.append((cin, depth, 2))
        out += [(depth, depth, 1)] * (units - 1)
    return out


def _conv(x, w, stride=1, padding=0):
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )


def _bn(x, p):
    inv = jax.lax.rsqrt(p["running_var"] + 1e-5)
    scale = (p["weight"] * inv).reshape(1, -1, 1, 1) if x.ndim == 4 else p["weight"] * inv
    shift = p["bias"] - p["running_mean"] * p["weight"] * inv
    if x.ndim == 4:
        return x * scale + shift.reshape(1, -1, 1, 1)
    return x * scale + shift


def _prelu(x, alpha):
    a = alpha.reshape(1, -1, 1, 1) if x.ndim == 4 else alpha
    return jnp.where(x >= 0, x, a * x)


@dataclass(frozen=True)
class IRSE50:
    drop_ratio: float = 0.6  # identity at inference

    def init(self, key) -> Dict:
        """Deterministic random init (smoke fallback; load real weights
        for meaningful identity supervision)."""
        p: Dict = {}

        def conv_init(k, cout, cin, ks):
            fan = cin * ks * ks
            return jax.random.normal(k, (cout, cin, ks, ks), jnp.float32) * np.sqrt(2.0 / fan)

        def bn_init(c):
            return {
                "weight": jnp.ones((c,)), "bias": jnp.zeros((c,)),
                "running_mean": jnp.zeros((c,)), "running_var": jnp.ones((c,)),
            }

        k = iter(jax.random.split(key, 4 * len(_blocks_50()) + 8))
        p["input"] = {
            "conv": conv_init(next(k), 64, 3, 3),
            "bn": bn_init(64),
            "prelu": jnp.full((64,), 0.25),
        }
        p["body"] = []
        for cin, depth, stride in _blocks_50():
            blk = {
                "bn1": bn_init(cin),
                "conv1": conv_init(next(k), depth, cin, 3),
                "prelu": jnp.full((depth,), 0.25),
                "conv2": conv_init(next(k), depth, depth, 3),
                "bn2": bn_init(depth),
                "se_fc1": conv_init(next(k), depth // 16, depth, 1),
                "se_fc2": conv_init(next(k), depth, depth // 16, 1),
            }
            if cin != depth:
                blk["shortcut_conv"] = conv_init(next(k), depth, cin, 1)
                blk["shortcut_bn"] = bn_init(depth)
            p["body"].append(blk)
        p["output"] = {
            "bn1": bn_init(512),
            "linear": {
                "weight": jax.random.normal(next(k), (512, 512 * 7 * 7), jnp.float32) * 0.01,
                "bias": jnp.zeros((512,)),
            },
            "bn2": bn_init(512),
        }
        return p

    def embed(self, params: Dict, x: jax.Array) -> jax.Array:
        """x: (N, 3, 112, 112) -> l2-normalised (N, 512)."""
        p = params["input"]
        x = _prelu(_bn(_conv(x, p["conv"], 1, 1), p["bn"]), p["prelu"])
        for blk, (cin, depth, stride) in zip(params["body"], _blocks_50()):
            if cin == depth:
                shortcut = x[:, :, ::stride, ::stride]  # MaxPool2d(1, stride)
            else:
                shortcut = _bn(_conv(x, blk["shortcut_conv"], stride), blk["shortcut_bn"])
            r = _bn(x, blk["bn1"])
            r = _prelu(_conv(r, blk["conv1"], 1, 1), blk["prelu"])
            r = _bn(_conv(r, blk["conv2"], stride, 1), blk["bn2"])
            # SE
            s = jnp.mean(r, axis=(2, 3), keepdims=True)
            s = jax.nn.relu(_conv(s, blk["se_fc1"]))
            s = jax.nn.sigmoid(_conv(s, blk["se_fc2"]))
            x = r * s + shortcut
        o = params["output"]
        x = _bn(x, o["bn1"])
        x = x.reshape(x.shape[0], -1)
        x = x @ o["linear"]["weight"].T + o["linear"]["bias"]
        x = _bn(x, o["bn2"])
        return x / jnp.linalg.norm(x, axis=1, keepdims=True)

    def extract_feats(self, params, img):
        """(ref id_loss.py:16-22): 256^2 area pool, crop, pool to 112^2."""
        if img.shape[2] > 256:
            img = area_downsample(img, 256)
        img = img[:, :, 35:223, 32:220]  # 188x188
        # AdaptiveAvgPool2d(112): torch pools 188 -> 112 with variable bins;
        # replicate via the exact adaptive pooling index math
        img = _adaptive_avg_pool(img, 112)
        return self.embed(params, img)

    def load_torch_state_dict(self, state: Dict[str, np.ndarray]) -> Dict:
        """Map the reference Backbone state_dict names to this tree."""
        g = lambda n: jnp.asarray(state[n])  # noqa: E731
        p: Dict = {
            "input": {
                "conv": g("input_layer.0.weight"),
                "bn": {
                    "weight": g("input_layer.1.weight"),
                    "bias": g("input_layer.1.bias"),
                    "running_mean": g("input_layer.1.running_mean"),
                    "running_var": g("input_layer.1.running_var"),
                },
                "prelu": g("input_layer.2.weight"),
            },
            "body": [],
        }
        for i, (cin, depth, stride) in enumerate(_blocks_50()):
            pre = f"body.{i}"
            blk = {
                "bn1": {
                    "weight": g(f"{pre}.res_layer.0.weight"),
                    "bias": g(f"{pre}.res_layer.0.bias"),
                    "running_mean": g(f"{pre}.res_layer.0.running_mean"),
                    "running_var": g(f"{pre}.res_layer.0.running_var"),
                },
                "conv1": g(f"{pre}.res_layer.1.weight"),
                "prelu": g(f"{pre}.res_layer.2.weight"),
                "conv2": g(f"{pre}.res_layer.3.weight"),
                "bn2": {
                    "weight": g(f"{pre}.res_layer.4.weight"),
                    "bias": g(f"{pre}.res_layer.4.bias"),
                    "running_mean": g(f"{pre}.res_layer.4.running_mean"),
                    "running_var": g(f"{pre}.res_layer.4.running_var"),
                },
                "se_fc1": g(f"{pre}.res_layer.5.fc1.weight"),
                "se_fc2": g(f"{pre}.res_layer.5.fc2.weight"),
            }
            if cin != depth:
                blk["shortcut_conv"] = g(f"{pre}.shortcut_layer.0.weight")
                blk["shortcut_bn"] = {
                    "weight": g(f"{pre}.shortcut_layer.1.weight"),
                    "bias": g(f"{pre}.shortcut_layer.1.bias"),
                    "running_mean": g(f"{pre}.shortcut_layer.1.running_mean"),
                    "running_var": g(f"{pre}.shortcut_layer.1.running_var"),
                }
            p["body"].append(blk)
        p["output"] = {
            "bn1": {
                "weight": g("output_layer.0.weight"),
                "bias": g("output_layer.0.bias"),
                "running_mean": g("output_layer.0.running_mean"),
                "running_var": g("output_layer.0.running_var"),
            },
            "linear": {
                "weight": g("output_layer.3.weight"),
                "bias": g("output_layer.3.bias"),
            },
            "bn2": {
                "weight": g("output_layer.4.weight"),
                "bias": g("output_layer.4.bias"),
                "running_mean": g("output_layer.4.running_mean"),
                "running_var": g("output_layer.4.running_var"),
            },
        }
        return p


def _adaptive_avg_pool(x, out: int):
    """torch AdaptiveAvgPool2d semantics: bin i = [floor(i*H/out),
    ceil((i+1)*H/out))."""
    h = x.shape[2]
    starts = (np.arange(out) * h) // out
    ends = -(-(np.arange(out) + 1) * h // out)
    # build a (out, h) averaging matrix (static) — dense matmul on MXU
    m = np.zeros((out, h), np.float32)
    for i, (s, e) in enumerate(zip(starts, ends)):
        m[i, s:e] = 1.0 / (e - s)
    mj = jnp.asarray(m, x.dtype)
    x = jnp.einsum("oh,nchw->ncow", mj, x)
    x = jnp.einsum("pw,nchw->nchp", mj, x)
    return x


def id_loss(model: IRSE50, params, synth_image, target_image):
    """1 - <emb(synth), stopgrad(emb(target))> (ref id_loss.py:24-28)."""
    x = model.extract_feats(params, synth_image)
    y = jax.lax.stop_gradient(model.extract_feats(params, target_image))
    return 1.0 - jnp.sum(x * y, axis=1).mean()


def id_similarity(model: IRSE50, params, synth_image, target_image):
    x = model.extract_feats(params, synth_image)
    y = model.extract_feats(params, target_image)
    return jnp.sum(x * y, axis=1)
