"""StyleGAN2 / EG3D / PanoHead discriminators, TPU-native.

Functional re-design of
  /root/reference/PanoHead/training/networks_stylegan2.py:560-798
  (DiscriminatorBlock, MinibatchStdLayer, DiscriminatorEpilogue,
  Discriminator) and
  /root/reference/PanoHead/training/dual_discriminator.py
  (:14 SingleDiscriminator, :79 filtered_resizing, :100 DualDiscriminator,
  :246/:348 MaskDualDiscriminator(V2) tri-branch with segmentation).

Same math, same parameter names (port-compatible); bf16 replaces the
per-resolution fp16 blocks.
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops import downsample2d, resize_bilinear, setup_filter, upsample2d
from .stylegan2 import Conv2dLayer, FullyConnectedLayer, MappingNetwork, Params


@dataclass(frozen=True)
class DiscriminatorBlock:
    in_channels: int          # 0 = first block
    tmp_channels: int
    out_channels: int
    resolution: int
    img_channels: int
    architecture: str = "resnet"
    activation: str = "lrelu"
    resample_filter: Tuple[int, ...] = (1, 3, 3, 1)
    conv_clamp: Optional[float] = None
    use_fp16: bool = False

    def _layers(self):
        layers = {}
        if self.in_channels == 0 or self.architecture == "skip":
            layers["fromrgb"] = Conv2dLayer(
                self.img_channels, self.tmp_channels, kernel_size=1,
                activation=self.activation, conv_clamp=self.conv_clamp,
            )
        layers["conv0"] = Conv2dLayer(
            self.tmp_channels, self.tmp_channels, kernel_size=3,
            activation=self.activation, conv_clamp=self.conv_clamp,
        )
        layers["conv1"] = Conv2dLayer(
            self.tmp_channels, self.out_channels, kernel_size=3,
            activation=self.activation, down=2,
            resample_filter=self.resample_filter, conv_clamp=self.conv_clamp,
        )
        if self.architecture == "resnet":
            layers["skip"] = Conv2dLayer(
                self.tmp_channels, self.out_channels, kernel_size=1, bias=False,
                down=2, resample_filter=self.resample_filter,
            )
        return layers

    def init(self, key) -> Params:
        layers = self._layers()
        keys = jax.random.split(key, len(layers))
        return {n: l.init(k) for (n, l), k in zip(sorted(layers.items()), keys)}

    def apply(self, params, x, img, force_fp32=False):
        layers = self._layers()
        dtype = jnp.bfloat16 if (self.use_fp16 and not force_fp32) else jnp.float32
        if x is not None:
            x = x.astype(dtype)
        if self.in_channels == 0 or self.architecture == "skip":
            img = img.astype(dtype)
            y = layers["fromrgb"].apply(params["fromrgb"], img)
            x = x + y if x is not None else y
            img = (
                downsample2d(img, setup_filter(list(self.resample_filter)))
                if self.architecture == "skip" else None
            )
        if self.architecture == "resnet":
            y = layers["skip"].apply(params["skip"], x, gain=math.sqrt(0.5))
            x = layers["conv0"].apply(params["conv0"], x)
            x = layers["conv1"].apply(params["conv1"], x, gain=math.sqrt(0.5))
            x = y + x
        else:
            x = layers["conv0"].apply(params["conv0"], x)
            x = layers["conv1"].apply(params["conv1"], x)
        return x, img


def minibatch_std(x, group_size: Optional[int] = 4, num_channels: int = 1):
    """(ref networks_stylegan2.py:651-676)"""
    N, C, H, W = x.shape
    g = min(group_size, N) if group_size is not None else N
    # N must divide by g in the reference too
    f = num_channels
    c = C // f
    y = x.reshape(g, -1, f, c, H, W)
    y = y - jnp.mean(y, axis=0)
    y = jnp.mean(jnp.square(y), axis=0)
    y = jnp.sqrt(y + 1e-8)
    y = jnp.mean(y, axis=(2, 3, 4))
    y = y.reshape(-1, f, 1, 1)
    y = jnp.tile(y, (g, 1, H, W))
    return jnp.concatenate([x, y.astype(x.dtype)], axis=1)


@dataclass(frozen=True)
class DiscriminatorEpilogue:
    in_channels: int
    cmap_dim: int
    resolution: int = 4
    img_channels: int = 3
    architecture: str = "resnet"
    mbstd_group_size: Optional[int] = 4
    mbstd_num_channels: int = 1
    activation: str = "lrelu"
    conv_clamp: Optional[float] = None

    def _layers(self):
        layers = {}
        if self.architecture == "skip":
            layers["fromrgb"] = Conv2dLayer(
                self.img_channels, self.in_channels, 1, activation=self.activation
            )
        layers["conv"] = Conv2dLayer(
            self.in_channels + self.mbstd_num_channels, self.in_channels, 3,
            activation=self.activation, conv_clamp=self.conv_clamp,
        )
        layers["fc"] = FullyConnectedLayer(
            self.in_channels * self.resolution ** 2, self.in_channels,
            activation=self.activation,
        )
        layers["out"] = FullyConnectedLayer(
            self.in_channels, 1 if self.cmap_dim == 0 else self.cmap_dim
        )
        return layers

    def init(self, key) -> Params:
        layers = self._layers()
        keys = jax.random.split(key, len(layers))
        return {n: l.init(k) for (n, l), k in zip(sorted(layers.items()), keys)}

    def apply(self, params, x, img, cmap):
        layers = self._layers()
        x = x.astype(jnp.float32)
        if self.architecture == "skip":
            x = x + layers["fromrgb"].apply(params["fromrgb"], img.astype(jnp.float32))
        if self.mbstd_num_channels > 0:
            x = minibatch_std(x, self.mbstd_group_size, self.mbstd_num_channels)
        x = layers["conv"].apply(params["conv"], x)
        x = layers["fc"].apply(params["fc"], x.reshape(x.shape[0], -1))
        x = layers["out"].apply(params["out"], x)
        if self.cmap_dim > 0:
            x = jnp.sum(x * cmap, axis=1, keepdims=True) / math.sqrt(self.cmap_dim)
        return x


def filtered_resizing(image, size: int, filter_mode: str = "antialiased", f=None):
    """(ref dual_discriminator.py:79-97)"""
    if filter_mode == "antialiased":
        return resize_bilinear(image, size, size, antialias=True)
    if filter_mode == "classic":
        x = upsample2d(image, f, up=2)
        x = resize_bilinear(x, size * 2 + 2, size * 2 + 2)
        return downsample2d(x, f, down=2, flip_filter=True, padding=-1)
    if filter_mode == "none":
        return resize_bilinear(image, size, size, antialias=False)
    if isinstance(filter_mode, float):
        a = resize_bilinear(image, size, size, antialias=True)
        b = resize_bilinear(image, size, size, antialias=False)
        return (1 - filter_mode) * b + filter_mode * a
    raise ValueError(filter_mode)


def _channels_dict(resolutions, channel_base, channel_max):
    return {r: min(channel_base // r, channel_max) for r in list(resolutions) + [4]}


@dataclass(frozen=True)
class Discriminator:
    """Plain SG2 discriminator; also the shared trunk of the dual/mask
    variants (mode switches the input assembly, ref dual_discriminator.py)."""

    c_dim: int
    img_resolution: int
    img_channels: int
    mode: str = "single"            # 'single' | 'plain' | 'dual' | 'mask_dual'
    architecture: str = "resnet"
    channel_base: int = 32768
    channel_max: int = 512
    num_fp16_res: int = 4
    conv_clamp: Optional[float] = 256.0
    cmap_dim: Optional[int] = None
    disc_c_noise: float = 0.0
    seg_resolution: int = 64        # mask_dual: segmentation branch input res
    seg_channels: int = 1
    mbstd_group_size: Optional[int] = 4

    @property
    def eff_img_channels(self):
        if self.mode in ("dual", "mask_dual"):
            return self.img_channels * 2
        return self.img_channels

    @property
    def block_resolutions(self):
        n = int(math.log2(self.img_resolution))
        return [2 ** i for i in range(n, 2, -1)]

    @property
    def seg_block_resolutions(self):
        n = int(math.log2(self.seg_resolution))
        return [2 ** i for i in range(n, 2, -1)]

    def _cmap_dim(self):
        ch = _channels_dict(self.block_resolutions, self.channel_base, self.channel_max)
        cd = self.cmap_dim if self.cmap_dim is not None else ch[4]
        return 0 if self.c_dim == 0 else cd

    def _blocks(self, resolutions, img_channels, img_resolution):
        ch = _channels_dict(self.block_resolutions, self.channel_base, self.channel_max)
        fp16_res = max(2 ** (int(math.log2(self.img_resolution)) + 1 - self.num_fp16_res), 8)
        blocks = {}
        for res in resolutions:
            blocks[f"b{res}"] = DiscriminatorBlock(
                in_channels=ch[res] if res < img_resolution else 0,
                tmp_channels=ch[res],
                out_channels=ch[res // 2],
                resolution=res,
                img_channels=img_channels,
                architecture=self.architecture,
                conv_clamp=self.conv_clamp,
                use_fp16=(res >= fp16_res),
            )
        return blocks

    def _modules(self):
        mods: Dict[str, Any] = dict(
            self._blocks(self.block_resolutions, self.eff_img_channels, self.img_resolution)
        )
        if self.mode == "mask_dual":
            for name, b in self._blocks(
                self.seg_block_resolutions, self.seg_channels, self.seg_resolution
            ).items():
                mods["s" + name] = b
        if self.c_dim > 0:
            mods["mapping"] = MappingNetwork(
                z_dim=0, c_dim=self.c_dim, w_dim=self._cmap_dim(), num_ws=None,
                w_avg_beta=None,
            )
        ch = _channels_dict(self.block_resolutions, self.channel_base, self.channel_max)
        mods["b4"] = DiscriminatorEpilogue(
            ch[4], cmap_dim=self._cmap_dim(), resolution=4,
            img_channels=self.eff_img_channels, architecture=self.architecture,
            conv_clamp=self.conv_clamp, mbstd_group_size=self.mbstd_group_size,
        )
        return mods

    def init(self, key) -> Params:
        mods = self._modules()
        keys = jax.random.split(key, len(mods))
        return {n: m.init(k) for (n, m), k in zip(sorted(mods.items()), keys)}

    def apply(self, params, img, c, noise_key=None, force_fp32=False):
        """img: array (single/plain) or dict with image/image_raw
        (+image_mask for mask_dual)."""
        mods = self._modules()
        f = setup_filter([1, 3, 3, 1])

        seg = None
        if self.mode == "dual":
            raw = filtered_resizing(img["image_raw"], img["image"].shape[-1], "antialiased", f)
            img = jnp.concatenate([img["image"], raw], axis=1)
        elif self.mode == "mask_dual":
            raw = filtered_resizing(img["image_raw"], img["image"].shape[-1], "antialiased", f)
            seg = filtered_resizing(img["image_mask"], self.seg_resolution, "antialiased", f)
            seg = 2 * seg - 1
            img = jnp.concatenate([img["image"], raw], axis=1)
        elif isinstance(img, dict):
            img = img["image"]

        x = None
        for res in self.block_resolutions:
            x, img = mods[f"b{res}"].apply(params[f"b{res}"], x, img, force_fp32)

        if seg is not None:
            xs = None
            for res in self.seg_block_resolutions:
                xs, seg = mods[f"sb{res}"].apply(params[f"sb{res}"], xs, seg, force_fp32)
            x = x + xs

        cmap = None
        if self.c_dim > 0:
            if self.disc_c_noise > 0:
                assert noise_key is not None
                c = c + jax.random.normal(noise_key, c.shape, c.dtype) * jnp.std(
                    c, axis=0
                ) * self.disc_c_noise
            cmap = mods["mapping"].apply(params["mapping"], None, c)
        return mods["b4"].apply(params["b4"], x, img, cmap)
