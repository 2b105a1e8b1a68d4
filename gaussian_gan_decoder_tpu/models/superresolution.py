"""EG3D/PanoHead superresolution stacks, TPU-native.

Functional re-design of /root/reference/PanoHead/training/superresolution.py
(:29 Hybrid8X, :62 4X, :92 4XCustom, :123 2XCustom, :158 2X, :191 DeepFp32,
:328 8XDC). Each stack = two StyleGAN2 SynthesisBlocks (the first optionally
without upsampling), conditioned on the LAST w repeated 3x, with a bilinear
(optionally antialiased) resize of the raw/feature images to the stack's
input resolution.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops import resize_bilinear
from .stylegan2 import Params, SynthesisBlock


@dataclass(frozen=True)
class Superresolution:
    """Generic 2-block SR stack; concrete variants built by make_superresolution."""

    channels: int
    img_resolution: int
    input_resolution: int
    block0_out: int
    block1_out: int
    block0_res: int
    block1_res: int
    block0_up: bool
    sr_antialias: bool = True
    use_fp16: bool = False
    returns_features: bool = False  # 4XCustom returns x instead of rgb
    fused_modconv_default: str = "inference_only"  # parity only; unused

    def _blocks(self):
        clamp = 256.0 if self.use_fp16 else None
        b0 = SynthesisBlock(
            in_channels=self.channels, out_channels=self.block0_out, w_dim=512,
            resolution=self.block0_res, img_channels=3,
            is_last=(self.block1_res is None), use_fp16=self.use_fp16,
            conv_clamp=clamp, up=2 if self.block0_up else 1,
        )
        b1 = SynthesisBlock(
            in_channels=self.block0_out, out_channels=self.block1_out, w_dim=512,
            resolution=self.block1_res, img_channels=3, is_last=True,
            use_fp16=self.use_fp16, conv_clamp=clamp,
        )
        return {"block0": b0, "block1": b1}

    def init(self, key) -> Params:
        blocks = self._blocks()
        k0, k1 = jax.random.split(key)
        return {"block0": blocks["block0"].init(k0), "block1": blocks["block1"].init(k1)}

    def apply(
        self,
        params: Params,
        rgb: jax.Array,       # (N, 3, h, w)
        x: jax.Array,         # (N, C, h, w) feature image
        ws: jax.Array,        # (N, num_ws, 512) — only the last w is used
        noise_mode: str = "random",
        noise_key=None,
        return_raw_alias: bool = False,
    ) -> jax.Array:
        """return_raw_alias additionally returns the reference's MUTATED
        image_raw, or None when no mutation occurs. The reference's
        SynthesisBlock(NoUp) does `img = img.add_(y)` IN PLACE
        (networks_stylegan2.py:461, superresolution.py:314); when block0
        does not upsample and the raw image is already at input_resolution
        (no interpolate copy), the caller's rgb tensor — returned by
        triplane.py synthesis as `image_raw` — silently gains block0's
        ToRGB skip. Replicated for checkpoint/loss parity; see
        tests/test_reference_golden.py."""
        blocks = self._blocks()
        ws = jnp.repeat(ws[:, -1:, :], 3, axis=1)
        aliases = not self.block0_up and x.shape[-1] == self.input_resolution
        if x.shape[-1] != self.input_resolution:
            x = resize_bilinear(
                x, self.input_resolution, self.input_resolution,
                antialias=self.sr_antialias,
            )
            rgb = resize_bilinear(
                rgb, self.input_resolution, self.input_resolution,
                antialias=self.sr_antialias,
            )
        k0 = k1 = None
        if noise_key is not None:
            k0, k1 = jax.random.split(noise_key)
        x, rgb = blocks["block0"].apply(
            params["block0"], x, rgb, ws, noise_mode=noise_mode, noise_key=k0
        )
        raw_alias = rgb if aliases else None
        x, rgb = blocks["block1"].apply(
            params["block1"], x, rgb, ws, noise_mode=noise_mode, noise_key=k1
        )
        out = x if self.returns_features else rgb
        if return_raw_alias:
            return out, raw_alias
        return out


_VARIANTS = {
    # name -> (input_res, b0_out, b1_out, b0_res, b1_res, b0_up, returns_feats)
    "SuperresolutionHybrid8X": (128, 128, 64, 256, 512, True, False),
    "SuperresolutionHybrid8XDC": (128, 256, 128, 256, 512, True, False),
    "SuperresolutionHybrid4X": (128, 128, 64, 128, 256, False, False),
    "SuperresolutionHybrid4XCustom": (256, 128, 96, 512, 1024, True, True),
    "SuperresolutionHybrid2X": (64, 128, 64, 64, 128, False, False),
    "SuperresolutionHybrid2XCustom": (64, 128, 96, 256, 512, False, False),
    "SuperresolutionHybridDeepfp32": (128, 128, 64, 128, 256, False, False),
}


def make_superresolution(
    class_name: str,
    channels: int,
    img_resolution: int,
    sr_num_fp16_res: int = 0,
    sr_antialias: bool = True,
    **_ignored,
) -> Superresolution:
    """Build an SR stack from the reference's dotted class name.

    Mirrors dnnlib.util.construct_class_by_name dispatch
    (ref triplane.py:53-60, eg3d/training/triplane.py:41).
    """
    short = class_name.rsplit(".", 1)[-1]
    if short not in _VARIANTS:
        raise ValueError(f"unknown superresolution module: {class_name}")
    in_res, b0o, b1o, b0r, b1r, b0up, rfeat = _VARIANTS[short]
    return Superresolution(
        channels=channels,
        img_resolution=img_resolution,
        input_resolution=in_res,
        block0_out=b0o,
        block1_out=b1o,
        block0_res=b0r,
        block1_res=b1r,
        block0_up=b0up,
        sr_antialias=sr_antialias,
        use_fp16=sr_num_fp16_res > 0,
        returns_features=rfeat,
    )
