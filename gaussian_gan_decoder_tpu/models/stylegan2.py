"""StyleGAN2 backbone, TPU-native.

Functional re-design of /root/reference/PanoHead/training/networks_stylegan2.py
(same math, same parameter shapes/names so reference checkpoints port 1:1,
see port/torch_pickle.py). Differences from the torch original, by design:

* modules are (config, params-pytree, pure apply) triples — everything
  composes with jit/vmap/grad/shard_map;
* per-resolution fp16 + conv_clamp=256 is replaced by a bf16 compute
  policy (`dtype` on SynthesisBlockCfg); bf16 has f32's exponent range so
  the overflow clamp is kept only for checkpoint parity (it also clips
  legitimately large activations in fp16-trained models);
* noise is driven by explicit PRNG keys ('random') or the ported
  noise_const buffer ('const');
* w_avg (mapping EMA) is carried as a buffer entry in the params pytree;
  `update_w_avg` returns the new buffer instead of mutating.

Parameter tree layout mirrors the reference module tree, e.g.
  mapping: {'fc0': {'weight','bias'}, ..., 'w_avg': (w_dim,)}
  synthesis: {'b4': {'const', 'conv1': {...}, 'torgb': {...}}, 'b8': ...}
"""
from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import bias_act, modulated_conv2d, conv2d_resample, setup_filter, upsample2d

Params = Dict[str, Any]


def normalize_2nd_moment(x, axis=-1, eps=1e-8):
    """x / sqrt(mean(x^2)) (ref networks_stylegan2.py:28-29)."""
    return x * jax.lax.rsqrt(jnp.mean(jnp.square(x), axis=axis, keepdims=True) + eps)


# ----------------------------------------------------------------------------
# FullyConnectedLayer (ref networks_stylegan2.py:96-130)


@dataclass(frozen=True)
class FullyConnectedLayer:
    in_features: int
    out_features: int
    bias: bool = True
    activation: str = "linear"
    lr_multiplier: float = 1.0
    bias_init: float | Tuple[float, ...] = 0.0
    weight_init: float = 1.0  # ref networks_stylegan3.py:78 (SG3 affine uses 0)

    def init(self, key) -> Params:
        w = jax.random.normal(
            key, (self.out_features, self.in_features), jnp.float32
        ) * (self.weight_init / self.lr_multiplier)
        p = {"weight": w}
        if self.bias:
            # stored value is bias_init/lr_mult so apply's *lr_mult restores it
            # (ref networks_stylegan2.py:109-112 folds lr_mult the same way)
            b = jnp.broadcast_to(
                jnp.asarray(self.bias_init, jnp.float32), (self.out_features,)
            )
            p["bias"] = b / self.lr_multiplier
        return p

    def apply(self, params: Params, x: jax.Array) -> jax.Array:
        weight_gain = self.lr_multiplier / math.sqrt(self.in_features)
        w = params["weight"].astype(x.dtype) * weight_gain
        b = params.get("bias")
        if b is not None and self.lr_multiplier != 1.0:
            b = b * self.lr_multiplier
        # accumulate on the MXU in f32 even for bf16 activations
        acc = jnp.float32 if x.dtype != jnp.float64 else jnp.float64
        x = jnp.matmul(x, w.T, preferred_element_type=acc).astype(x.dtype)
        return bias_act(x, b, dim=x.ndim - 1, act=self.activation)


# ----------------------------------------------------------------------------
# Conv2dLayer (ref networks_stylegan2.py:135-188)


@dataclass(frozen=True)
class Conv2dLayer:
    in_channels: int
    out_channels: int
    kernel_size: int
    bias: bool = True
    activation: str = "linear"
    up: int = 1
    down: int = 1
    resample_filter: Tuple[int, ...] = (1, 3, 3, 1)
    conv_clamp: Optional[float] = None

    def init(self, key) -> Params:
        w = jax.random.normal(
            key,
            (self.out_channels, self.in_channels, self.kernel_size, self.kernel_size),
            jnp.float32,
        )
        p = {"weight": w}
        if self.bias:
            p["bias"] = jnp.zeros((self.out_channels,), jnp.float32)
        return p

    def apply(self, params: Params, x: jax.Array, gain: float = 1.0) -> jax.Array:
        weight_gain = 1.0 / math.sqrt(self.in_channels * self.kernel_size ** 2)
        w = params["weight"] * weight_gain
        f = setup_filter(list(self.resample_filter))
        flip_weight = self.up == 1
        x = conv2d_resample(
            x, w.astype(x.dtype), f=f, up=self.up, down=self.down,
            padding=self.kernel_size // 2, flip_weight=flip_weight,
        )
        act_gain = None if gain == 1.0 else bias_act_gain(self.activation) * gain
        act_clamp = self.conv_clamp * gain if self.conv_clamp is not None else None
        return bias_act(
            x, params.get("bias"), act=self.activation, gain=act_gain, clamp=act_clamp
        )


def bias_act_gain(act: str) -> float:
    from ..ops.bias_act import activation_funcs

    return activation_funcs[act].def_gain


# ----------------------------------------------------------------------------
# MappingNetwork (ref networks_stylegan2.py:193-275)


@dataclass(frozen=True)
class MappingNetwork:
    z_dim: int
    c_dim: int
    w_dim: int
    num_ws: Optional[int]
    num_layers: int = 8
    embed_features: Optional[int] = None
    layer_features: Optional[int] = None
    activation: str = "lrelu"
    last_activation: Optional[str] = None
    lr_multiplier: float = 0.01
    w_avg_beta: Optional[float] = 0.998

    def _features(self):
        embed = self.embed_features
        if embed is None:
            embed = self.w_dim
        if self.c_dim == 0:
            embed = 0
        layer = self.layer_features or self.w_dim
        return embed, [self.z_dim + embed] + [layer] * (self.num_layers - 1) + [self.w_dim]

    def _layers(self):
        embed, feats = self._features()
        layers = {}
        if self.c_dim > 0:
            layers["embed"] = FullyConnectedLayer(self.c_dim, embed)
        for idx in range(self.num_layers):
            act = self.activation
            if idx == self.num_layers - 1 and self.last_activation:
                act = self.last_activation
            layers[f"fc{idx}"] = FullyConnectedLayer(
                feats[idx], feats[idx + 1], activation=act,
                lr_multiplier=self.lr_multiplier,
            )
        return layers

    def init(self, key) -> Params:
        layers = self._layers()
        keys = jax.random.split(key, len(layers))
        p = {n: l.init(k) for (n, l), k in zip(sorted(layers.items()), keys)}
        if self.num_ws is not None and self.w_avg_beta is not None:
            p["w_avg"] = jnp.zeros((self.w_dim,), jnp.float32)
        return p

    def apply(
        self,
        params: Params,
        z: Optional[jax.Array],
        c: Optional[jax.Array],
        truncation_psi: float | jax.Array = 1.0,
        truncation_cutoff: Optional[int] = None,
    ) -> jax.Array:
        layers = self._layers()
        x = None
        if self.z_dim > 0:
            x = normalize_2nd_moment(z.astype(jnp.float32))
        if self.c_dim > 0:
            y = normalize_2nd_moment(layers["embed"].apply(params["embed"], c.astype(jnp.float32)))
            x = jnp.concatenate([x, y], axis=-1) if x is not None else y
        for idx in range(self.num_layers):
            x = layers[f"fc{idx}"].apply(params[f"fc{idx}"], x)
        if self.num_ws is not None:
            x = jnp.repeat(x[:, None, :], self.num_ws, axis=1)
        # truncation: w_avg.lerp(x, psi). Applied unconditionally (psi==1 is
        # the identity) so psi can be a traced scalar inside jit.
        if self.w_avg_beta is not None and "w_avg" in params:
            w_avg = params["w_avg"]
            psi = jnp.asarray(truncation_psi, x.dtype)
            if self.num_ws is None or truncation_cutoff is None:
                x = w_avg + (x - w_avg) * psi
            else:
                head = w_avg + (x[:, : truncation_cutoff] - w_avg) * psi
                x = jnp.concatenate([head, x[:, truncation_cutoff:]], axis=1)
        return x

    def update_w_avg(self, params: Params, x_mean: jax.Array) -> jax.Array:
        """New w_avg buffer: x_mean.lerp(w_avg, beta) (ref :257)."""
        return x_mean + (params["w_avg"] - x_mean) * self.w_avg_beta


# ----------------------------------------------------------------------------
# SynthesisLayer (ref networks_stylegan2.py:280-334)


@dataclass(frozen=True)
class SynthesisLayer:
    in_channels: int
    out_channels: int
    w_dim: int
    resolution: int
    kernel_size: int = 3
    up: int = 1
    use_noise: bool = True
    activation: str = "lrelu"
    resample_filter: Tuple[int, ...] = (1, 3, 3, 1)
    conv_clamp: Optional[float] = None

    @property
    def affine(self):
        return FullyConnectedLayer(self.w_dim, self.in_channels, bias_init=1.0)

    def init(self, key) -> Params:
        ka, kw, kn = jax.random.split(key, 3)
        p = {
            "affine": self.affine.init(ka),
            "weight": jax.random.normal(
                kw,
                (self.out_channels, self.in_channels, self.kernel_size, self.kernel_size),
                jnp.float32,
            ),
            "bias": jnp.zeros((self.out_channels,), jnp.float32),
        }
        if self.use_noise:
            p["noise_const"] = jax.random.normal(
                kn, (self.resolution, self.resolution), jnp.float32
            )
            p["noise_strength"] = jnp.zeros((), jnp.float32)
        return p

    def apply(
        self,
        params: Params,
        x: jax.Array,
        w: jax.Array,
        noise_mode: str = "random",
        gain: float = 1.0,
        noise_key=None,
    ) -> jax.Array:
        styles = self.affine.apply(params["affine"], w)
        noise = None
        if self.use_noise and noise_mode == "random":
            assert noise_key is not None, "noise_mode='random' needs a PRNG key"
            noise = (
                jax.random.normal(
                    noise_key, (x.shape[0], 1, self.resolution, self.resolution), x.dtype
                )
                * params["noise_strength"]
            )
        elif self.use_noise and noise_mode == "const":
            noise = params["noise_const"].astype(x.dtype) * params["noise_strength"]
        flip_weight = self.up == 1
        x = modulated_conv2d(
            x,
            params["weight"],
            styles,
            noise=noise,
            up=self.up,
            padding=self.kernel_size // 2,
            resample_filter=setup_filter(list(self.resample_filter)),
            flip_weight=flip_weight,
        )
        act_gain = bias_act_gain(self.activation) * gain
        act_clamp = self.conv_clamp * gain if self.conv_clamp is not None else None
        return bias_act(
            x, params["bias"], act=self.activation, gain=act_gain, clamp=act_clamp
        )


# ----------------------------------------------------------------------------
# ToRGBLayer (ref networks_stylegan2.py:344-364)


@dataclass(frozen=True)
class ToRGBLayer:
    in_channels: int
    out_channels: int
    w_dim: int
    kernel_size: int = 1
    conv_clamp: Optional[float] = None

    @property
    def affine(self):
        return FullyConnectedLayer(self.w_dim, self.in_channels, bias_init=1.0)

    def init(self, key) -> Params:
        ka, kw = jax.random.split(key)
        return {
            "affine": self.affine.init(ka),
            "weight": jax.random.normal(
                kw,
                (self.out_channels, self.in_channels, self.kernel_size, self.kernel_size),
                jnp.float32,
            ),
            "bias": jnp.zeros((self.out_channels,), jnp.float32),
        }

    def apply(self, params: Params, x: jax.Array, w: jax.Array) -> jax.Array:
        weight_gain = 1.0 / math.sqrt(self.in_channels * self.kernel_size ** 2)
        styles = self.affine.apply(params["affine"], w) * weight_gain
        x = modulated_conv2d(x, params["weight"], styles, demodulate=False)
        return bias_act(x, params["bias"], clamp=self.conv_clamp)


# ----------------------------------------------------------------------------
# SynthesisBlock (ref networks_stylegan2.py:369-468; NoUp variant
# superresolution.py:222-321)


@dataclass(frozen=True)
class SynthesisBlock:
    in_channels: int
    out_channels: int
    w_dim: int
    resolution: int
    img_channels: int
    is_last: bool
    architecture: str = "skip"
    resample_filter: Tuple[int, ...] = (1, 3, 3, 1)
    conv_clamp: Optional[float] = 256.0
    use_fp16: bool = False        # -> bf16 on TPU
    up: int = 2                   # 1 = SynthesisBlockNoUp
    layer_kwargs: Tuple[Tuple[str, Any], ...] = ()

    @property
    def num_conv(self):
        return (1 if self.in_channels != 0 else 0) + 1

    @property
    def num_torgb(self):
        return 1 if (self.is_last or self.architecture == "skip") else 0

    def _layers(self):
        lk = dict(self.layer_kwargs)
        layers = {}
        if self.in_channels != 0:
            layers["conv0"] = SynthesisLayer(
                self.in_channels, self.out_channels, w_dim=self.w_dim,
                resolution=self.resolution, up=self.up,
                resample_filter=self.resample_filter, conv_clamp=self.conv_clamp, **lk,
            )
            if self.architecture == "resnet":
                layers["skip"] = Conv2dLayer(
                    self.in_channels, self.out_channels, kernel_size=1, bias=False,
                    up=self.up, resample_filter=self.resample_filter,
                )
        layers["conv1"] = SynthesisLayer(
            self.out_channels, self.out_channels, w_dim=self.w_dim,
            resolution=self.resolution, conv_clamp=self.conv_clamp, **lk,
        )
        if self.is_last or self.architecture == "skip":
            layers["torgb"] = ToRGBLayer(
                self.out_channels, self.img_channels, w_dim=self.w_dim,
                conv_clamp=self.conv_clamp,
            )
        return layers

    def init(self, key) -> Params:
        layers = self._layers()
        keys = jax.random.split(key, len(layers) + 1)
        p = {n: l.init(k) for (n, l), k in zip(sorted(layers.items()), keys[1:])}
        if self.in_channels == 0:
            p["const"] = jax.random.normal(
                keys[0], (self.out_channels, self.resolution, self.resolution), jnp.float32
            )
        return p

    def apply(
        self,
        params: Params,
        x: Optional[jax.Array],
        img: Optional[jax.Array],
        ws: jax.Array,  # (N, num_conv + num_torgb, w_dim)
        noise_mode: str = "random",
        force_fp32: bool = False,
        noise_key=None,
    ):
        layers = self._layers()
        dtype = jnp.bfloat16 if (self.use_fp16 and not force_fp32) else jnp.float32
        w_idx = 0

        def next_w():
            nonlocal w_idx
            w = ws[:, w_idx]
            w_idx += 1
            return w

        nk = (lambda: None)
        if noise_key is not None:
            keys = iter(jax.random.split(noise_key, self.num_conv))
            nk = lambda: next(keys)  # noqa: E731

        if self.in_channels == 0:
            x = params["const"].astype(dtype)
            x = jnp.broadcast_to(x[None], (ws.shape[0],) + x.shape)
        else:
            x = x.astype(dtype)

        if self.in_channels == 0:
            x = layers["conv1"].apply(
                params["conv1"], x, next_w(), noise_mode=noise_mode, noise_key=nk()
            )
        elif self.architecture == "resnet":
            y = layers["skip"].apply(params["skip"], x, gain=math.sqrt(0.5))
            x = layers["conv0"].apply(
                params["conv0"], x, next_w(), noise_mode=noise_mode, noise_key=nk()
            )
            x = layers["conv1"].apply(
                params["conv1"], x, next_w(), noise_mode=noise_mode,
                gain=math.sqrt(0.5), noise_key=nk(),
            )
            x = y + x
        else:
            x = layers["conv0"].apply(
                params["conv0"], x, next_w(), noise_mode=noise_mode, noise_key=nk()
            )
            x = layers["conv1"].apply(
                params["conv1"], x, next_w(), noise_mode=noise_mode, noise_key=nk()
            )

        if img is not None and self.up == 2:
            img = upsample2d(img, setup_filter(list(self.resample_filter)))
        if self.is_last or self.architecture == "skip":
            y = layers["torgb"].apply(params["torgb"], x, next_w())
            y = y.astype(jnp.float32)
            img = img + y if img is not None else y
        return x, img


# ----------------------------------------------------------------------------
# SynthesisNetwork / Generator (ref networks_stylegan2.py:473-557)


@dataclass(frozen=True)
class SynthesisNetwork:
    w_dim: int
    img_resolution: int
    img_channels: int
    channel_base: int = 32768
    channel_max: int = 512
    num_fp16_res: int = 4
    conv_clamp: Optional[float] = 256.0
    architecture: str = "skip"

    @property
    def block_resolutions(self) -> Sequence[int]:
        n = int(math.log2(self.img_resolution))
        return [2 ** i for i in range(2, n + 1)]

    def _channels(self, res):
        return min(self.channel_base // res, self.channel_max)

    def _blocks(self):
        fp16_res = max(2 ** (int(math.log2(self.img_resolution)) + 1 - self.num_fp16_res), 8)
        blocks = {}
        for res in self.block_resolutions:
            blocks[f"b{res}"] = SynthesisBlock(
                in_channels=self._channels(res // 2) if res > 4 else 0,
                out_channels=self._channels(res),
                w_dim=self.w_dim,
                resolution=res,
                img_channels=self.img_channels,
                is_last=(res == self.img_resolution),
                use_fp16=(res >= fp16_res),
                conv_clamp=self.conv_clamp,
                architecture=self.architecture,
            )
        return blocks

    @property
    def num_ws(self) -> int:
        n = 0
        for res in self.block_resolutions:
            b = self._blocks()[f"b{res}"]
            n += b.num_conv
            if b.is_last:
                n += b.num_torgb
        return n

    def init(self, key) -> Params:
        blocks = self._blocks()
        keys = jax.random.split(key, len(blocks))
        return {n: b.init(k) for (n, b), k in zip(sorted(blocks.items()), keys)}

    def apply(
        self,
        params: Params,
        ws: jax.Array,
        noise_mode: str = "random",
        force_fp32: bool = False,
        noise_key=None,
        capture=None,
    ) -> jax.Array:
        """capture: optional dict — per-block feature/skip maps are stored
        into it under 'b{res}' / 'b{res}.img' (the layer-capture hook of
        the reference visualizer, eg3d/viz/renderer.py:411-447; forward
        hooks don't exist on functional modules, so capture is explicit)."""
        blocks = self._blocks()
        ws = ws.astype(jnp.float32)
        if noise_key is not None:
            block_keys = iter(jax.random.split(noise_key, len(blocks)))
        x = img = None
        w_idx = 0
        for res in self.block_resolutions:
            b = blocks[f"b{res}"]
            cur_ws = jax.lax.slice_in_dim(ws, w_idx, w_idx + b.num_conv + b.num_torgb, axis=1)
            x, img = b.apply(
                params[f"b{res}"], x, img, cur_ws,
                noise_mode=noise_mode, force_fp32=force_fp32,
                noise_key=(next(block_keys) if noise_key is not None else None),
            )
            w_idx += b.num_conv
            if capture is not None:
                capture[f"b{res}"] = x
                if img is not None:
                    capture[f"b{res}.img"] = img
        return img


@dataclass(frozen=True)
class Generator:
    z_dim: int
    c_dim: int
    w_dim: int
    img_resolution: int
    img_channels: int
    channel_base: int = 32768
    channel_max: int = 512
    num_fp16_res: int = 4
    conv_clamp: Optional[float] = 256.0
    mapping_kwargs: Tuple[Tuple[str, Any], ...] = ()
    architecture: str = "skip"  # 'orig' = progressive-growing-era blocks
    # (single final ToRGB, no per-block skips) — needed to load converted
    # TF 'orig' checkpoints (port/tf_legacy.py)

    @property
    def synthesis(self) -> SynthesisNetwork:
        return SynthesisNetwork(
            w_dim=self.w_dim,
            img_resolution=self.img_resolution,
            img_channels=self.img_channels,
            channel_base=self.channel_base,
            channel_max=self.channel_max,
            num_fp16_res=self.num_fp16_res,
            conv_clamp=self.conv_clamp,
            architecture=self.architecture,
        )

    @property
    def num_ws(self) -> int:
        return self.synthesis.num_ws

    @property
    def mapping(self) -> MappingNetwork:
        return MappingNetwork(
            z_dim=self.z_dim, c_dim=self.c_dim, w_dim=self.w_dim,
            num_ws=self.num_ws, **dict(self.mapping_kwargs),
        )

    def init(self, key) -> Params:
        km, ks = jax.random.split(key)
        return {
            "mapping": self.mapping.init(km),
            "synthesis": self.synthesis.init(ks),
        }

    def apply(
        self, params, z, c, truncation_psi=1.0, truncation_cutoff=None,
        noise_mode="random", noise_key=None,
    ):
        ws = self.mapping.apply(
            params["mapping"], z, c,
            truncation_psi=truncation_psi, truncation_cutoff=truncation_cutoff,
        )
        return self.synthesis.apply(
            params["synthesis"], ws, noise_mode=noise_mode, noise_key=noise_key
        )
