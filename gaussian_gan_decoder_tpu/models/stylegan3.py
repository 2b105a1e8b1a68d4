"""StyleGAN3 alias-free generator, TPU-native.

Functional re-design of /root/reference/PanoHead/training/
networks_stylegan3.py: the SynthesisLayer (:255-396 — modulated 1x1/3x3
conv followed by the fused upsample -> leaky-ReLU -> downsample
nonlinearity, ops/filtered_lrelu.py, with Kaiser-windowed sinc
resampling filters designed from per-layer cutoff/stopband parameters
:303-324), the Fourier-feature SynthesisInput (:171-250), the
SynthesisNetwork whose layer geometry follows a geometric cutoff/
stopband progression (:400-487), and the Generator wrapper (:491-515).

The reference pipeline imports the layer as `AFSynthesisLayer` into the
SR module (superresolution.py:22) without using it in any shipped SR
class; the full generator exists upstream for alias-free training runs.
Both are provided here; parity is enforced by the torch-golden test in
tests/test_stylegan3.py against the reference's own module on CPU.

TPU notes: the demod pre-normalization in the reference's SG3
modulated_conv2d (:42-45) cancels exactly in f32 (the per-channel and
global scales divide back out of the demod coefficient), so the shared
ops/modulated_conv.py path is used; per-layer fp16 maps to an optional
bf16 policy (`use_bf16`), default off.
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import filtered_lrelu, modulated_conv2d
from .stylegan2 import FullyConnectedLayer, MappingNetwork, Params


def design_lowpass_filter(numtaps: int, cutoff: float, width: float, fs: float,
                          radial: bool = False) -> Optional[np.ndarray]:
    """Kaiser-windowed sinc (ref networks_stylegan3.py:41-64)."""
    # deferred: keeps scipy off the import path of every models/ consumer
    import scipy.signal
    import scipy.special

    if numtaps == 1:
        return None
    if not radial:
        f = scipy.signal.firwin(numtaps=numtaps, cutoff=cutoff, width=width, fs=fs)
        return np.asarray(f, np.float32)
    # radially symmetric jinc filter with kaiser window (ref :378-386;
    # r==0 never occurs there — taps are even — the limit value
    # j1(x)~x/2 => cutoff is supplied for odd-tap robustness)
    x = (np.arange(numtaps) - (numtaps - 1) / 2) / fs
    r = np.hypot(*np.meshgrid(x, x))
    with np.errstate(divide="ignore", invalid="ignore"):
        f = np.where(
            r == 0, float(cutoff),
            scipy.special.j1(2 * cutoff * (math.pi * r)) / (math.pi * r),
        )
    beta = scipy.signal.kaiser_beta(
        scipy.signal.kaiser_atten(numtaps, width / (fs / 2))
    )
    w = np.kaiser(numtaps, beta)
    f = f * np.outer(w, w)
    f = f / f.sum()
    return np.asarray(f, np.float32)


@dataclass(frozen=True)
class SynthesisLayer3:
    w_dim: int
    in_channels: int
    out_channels: int
    in_size: int
    out_size: int
    in_sampling_rate: float
    out_sampling_rate: float
    in_cutoff: float
    out_cutoff: float
    in_half_width: float
    out_half_width: float
    conv_kernel: int = 3
    lrelu_upsampling: int = 2
    filter_size: int = 6
    use_radial_filters: bool = False
    conv_clamp: Optional[float] = 256.0
    is_torgb: bool = False

    @property
    def tmp_sampling_rate(self) -> float:
        return max(self.in_sampling_rate, self.out_sampling_rate) * (
            1 if self.is_torgb else self.lrelu_upsampling
        )

    @property
    def up_factor(self) -> int:
        return int(np.rint(self.tmp_sampling_rate / self.in_sampling_rate))

    @property
    def down_factor(self) -> int:
        return int(np.rint(self.tmp_sampling_rate / self.out_sampling_rate))

    def _filters(self):
        up_taps = self.filter_size * self.up_factor if self.up_factor > 1 and not self.is_torgb else 1
        fu = design_lowpass_filter(
            up_taps, self.in_cutoff, self.in_half_width * 2, self.tmp_sampling_rate
        )
        down_taps = self.filter_size * self.down_factor if self.down_factor > 1 and not self.is_torgb else 1
        fd = design_lowpass_filter(
            down_taps, self.out_cutoff, self.out_half_width * 2,
            self.tmp_sampling_rate, radial=self.use_radial_filters,
        )
        return fu, fd

    @property
    def padding(self):
        """Total filtered_lrelu padding solving exactly for out_size
        (ref :323-329): the conv runs with padding k-1 (out = in + k - 1,
        matching the reference's modulated_conv2d padding=conv_kernel-1
        at :352 — NOT a valid conv + later zero-pad, which would differ
        at borders); the asymmetric lo/hi split shifts sample locations
        per the symmetric interpretation (ref Appendix C.3)."""
        fu, fd = self._filters()
        fu_taps = 1 if fu is None else fu.shape[0]
        fd_taps = 1 if fd is None else fd.shape[0]
        pad_total = (self.out_size - 1) * self.down_factor + 1
        pad_total -= (self.in_size + self.conv_kernel - 1) * self.up_factor
        pad_total += fu_taps + fd_taps - 2
        pad_lo = (pad_total + self.up_factor) // 2
        pad_hi = pad_total - pad_lo
        return [pad_lo, pad_hi, pad_lo, pad_hi]

    @property
    def affine(self):
        return FullyConnectedLayer(self.w_dim, self.in_channels, bias_init=1.0)

    def init(self, key) -> Params:
        ka, kw = jax.random.split(key)
        return {
            "affine": self.affine.init(ka),
            "weight": jax.random.normal(
                kw, (self.out_channels, self.in_channels, self.conv_kernel, self.conv_kernel)
            ),
            "bias": jnp.zeros((self.out_channels,)),
            "magnitude_ema": jnp.ones(()),
        }

    def apply(self, params: Params, x: jax.Array, w: jax.Array) -> jax.Array:
        styles = self.affine.apply(params["affine"], w)
        if self.is_torgb:
            styles = styles * (1 / math.sqrt(self.in_channels * self.conv_kernel ** 2))
        # input magnitude normalization (ema frozen at inference, ref
        # :336-341); a scalar gain on x == the reference's input_gain on
        # the weights' input channels
        input_gain = jax.lax.rsqrt(params["magnitude_ema"])
        x = modulated_conv2d(
            x * input_gain.astype(x.dtype), params["weight"], styles,
            padding=self.conv_kernel - 1, demodulate=not self.is_torgb,
        )
        fu, fd = self._filters()
        gain = 1.0 if self.is_torgb else math.sqrt(2)
        slope = 1.0 if self.is_torgb else 0.2
        return filtered_lrelu(
            x, fu, fd, params["bias"].astype(x.dtype),
            up=self.up_factor, down=self.down_factor, padding=self.padding,
            gain=gain, slope=slope, clamp=self.conv_clamp,
        )

    def update_magnitude_ema(self, params: Params, x: jax.Array,
                             beta: float = 0.999) -> Params:
        """Training-time input-magnitude EMA step (ref :336-340); returns
        the updated params pytree (buffers are values, not state)."""
        cur = jnp.mean(jnp.square(jax.lax.stop_gradient(x).astype(jnp.float32)))
        new = cur + (params["magnitude_ema"] - cur) * beta
        return {**params, "magnitude_ema": new}


# ----------------------------------------------------------------------------
# SynthesisInput (ref networks_stylegan3.py:171-250): Fourier features on a
# learned-affine-transformed frequency basis.


@dataclass(frozen=True)
class SynthesisInput3:
    w_dim: int
    channels: int
    size: int              # output spatial size (square)
    sampling_rate: float
    bandwidth: float

    @property
    def affine(self):
        # t = (r_c, r_s, t_x, t_y), identity-rotation init (ref :195)
        return FullyConnectedLayer(
            self.w_dim, 4, weight_init=0.0, bias_init=(1.0, 0.0, 0.0, 0.0)
        )

    def init(self, key) -> Params:
        kf, kp, kw, ka = jax.random.split(key, 4)
        # random frequencies from a uniform 2D disc, scaled to bandwidth
        # (ref :186-191: dividing by radii * exp(r^2)^(1/4) maps the
        # gaussian draw to a uniform-in-disc direction+radius law)
        freqs = jax.random.normal(kf, (self.channels, 2), jnp.float32)
        radii = jnp.sqrt(jnp.sum(jnp.square(freqs), axis=1, keepdims=True))
        freqs = freqs / (radii * jnp.exp(jnp.square(radii)) ** 0.25)
        freqs = freqs * self.bandwidth
        phases = jax.random.uniform(kp, (self.channels,), jnp.float32) - 0.5
        return {
            "weight": jax.random.normal(kw, (self.channels, self.channels), jnp.float32),
            "affine": self.affine.init(ka),
            # buffers (ported from checkpoints; random per model)
            "transform": jnp.eye(3, dtype=jnp.float32),
            "freqs": freqs,
            "phases": phases,
        }

    def apply(self, params: Params, w: jax.Array) -> jax.Array:
        """w: (N, w_dim) -> (N, channels, size, size) Fourier features."""
        f32 = jnp.float32
        t = self.affine.apply(params["affine"], w.astype(f32))  # (N, 4)
        t = t / jnp.sqrt(jnp.square(t[:, 0:1]) + jnp.square(t[:, 1:2]))
        # inverse rotation+translation wrt the resulting image, composed
        # with the user transform buffer (ref :209-217); built with
        # channel arithmetic — a (N,3,3) batched matmul chain lowers
        # poorly on TPU and this is 3x3
        t0, t1, t2, t3 = t[:, 0], t[:, 1], t[:, 2], t[:, 3]
        # m_r @ m_t rows (third row is (0,0,1)):
        m00, m01, m02 = t0, -t1, -t0 * t2 + t1 * t3
        m10, m11, m12 = t1, t0, -t1 * t2 - t0 * t3
        u = params["transform"].astype(f32)  # (3,3) user transform
        tr = jnp.stack(
            [
                m00[:, None] * u[0] + m01[:, None] * u[1] + m02[:, None] * u[2],
                m10[:, None] * u[0] + m11[:, None] * u[1] + m12[:, None] * u[2],
            ],
            axis=1,
        )  # (N, 2, 3): the two rows that matter
        base_freqs = params["freqs"].astype(f32)    # (C, 2)
        base_phases = params["phases"].astype(f32)  # (C,)
        # transform frequencies: freqs' = freqs @ tr[:, :2, :2] (ref :220-221)
        fx = base_freqs[None, :, 0, None]  # (1, C, 1)
        fy = base_freqs[None, :, 1, None]
        freqs = fx * tr[:, None, 0, :2] + fy * tr[:, None, 1, :2]  # (N, C, 2)
        phases = base_phases[None] + (
            base_freqs[None, :, 0] * tr[:, None, 0, 2]
            + base_freqs[None, :, 1] * tr[:, None, 1, 2]
        )  # (N, C)
        # dampen out-of-band frequencies introduced by the transform (ref :224)
        fnorm = jnp.sqrt(jnp.sum(jnp.square(freqs), axis=2))
        amplitudes = jnp.clip(
            1 - (fnorm - self.bandwidth) / (self.sampling_rate / 2 - self.bandwidth),
            0.0, 1.0,
        )
        # sampling grid: torch affine_grid, align_corners=False (ref :227-230)
        n = self.size
        coord = ((2.0 * jnp.arange(n, dtype=f32) + 1.0) / n - 1.0) * (
            0.5 * n / self.sampling_rate
        )
        # ang[n,h,w,c] = gx[w]*fx' + gy[h]*fy' + phase (grid x varies along
        # width, y along height)
        ang = (
            coord[None, None, :, None] * freqs[:, None, None, :, 0]
            + coord[None, :, None, None] * freqs[:, None, None, :, 1]
            + phases[:, None, None, :]
        )
        x = jnp.sin(ang * (2.0 * math.pi)) * amplitudes[:, None, None, :]
        weight = params["weight"].astype(f32) / math.sqrt(self.channels)
        x = jnp.einsum("nhwc,oc->nhwo", x, weight)
        return jnp.transpose(x, (0, 3, 1, 2))  # NCHW


# ----------------------------------------------------------------------------
# SynthesisNetwork (ref networks_stylegan3.py:400-487): geometric cutoff /
# stopband progression -> per-layer sampling rates, sizes, and channels.


@dataclass(frozen=True)
class SynthesisNetwork3:
    w_dim: int
    img_resolution: int
    img_channels: int
    channel_base: int = 32768
    channel_max: int = 512
    num_layers: int = 14        # excluding Fourier input and ToRGB
    num_critical: int = 2
    first_cutoff: float = 2.0
    first_stopband: float = 2 ** 2.1
    last_stopband_rel: float = 2 ** 0.3
    margin_size: int = 10
    output_scale: float = 0.25
    num_fp16_res: int = 4       # maps to bf16 on TPU when use_bf16
    use_bf16: bool = False
    conv_kernel: int = 3
    filter_size: int = 6
    lrelu_upsampling: int = 2
    use_radial_filters: bool = False
    conv_clamp: Optional[float] = 256.0

    @property
    def num_ws(self) -> int:
        return self.num_layers + 2  # input affine + layers + torgb (ref :420)

    def _geometry(self):
        """cutoffs / sampling rates / half widths / sizes / channels
        (ref :429-442)."""
        last_cutoff = self.img_resolution / 2
        last_stopband = last_cutoff * self.last_stopband_rel
        exponents = np.minimum(
            np.arange(self.num_layers + 1) / (self.num_layers - self.num_critical), 1
        )
        cutoffs = self.first_cutoff * (last_cutoff / self.first_cutoff) ** exponents
        stopbands = (
            self.first_stopband * (last_stopband / self.first_stopband) ** exponents
        )
        sampling_rates = np.exp2(
            np.ceil(np.log2(np.minimum(stopbands * 2, self.img_resolution)))
        )
        half_widths = np.maximum(stopbands, sampling_rates / 2) - cutoffs
        sizes = sampling_rates + self.margin_size * 2
        sizes[-2:] = self.img_resolution
        channels = np.rint(
            np.minimum((self.channel_base / 2) / cutoffs, self.channel_max)
        )
        channels[-1] = self.img_channels
        return cutoffs, sampling_rates, half_widths, sizes, channels

    @property
    def input(self) -> SynthesisInput3:
        cutoffs, sampling_rates, _, sizes, channels = self._geometry()
        return SynthesisInput3(
            w_dim=self.w_dim, channels=int(channels[0]), size=int(sizes[0]),
            sampling_rate=float(sampling_rates[0]), bandwidth=float(cutoffs[0]),
        )

    def _layers(self) -> Dict[str, SynthesisLayer3]:
        cutoffs, rates, half_widths, sizes, channels = self._geometry()
        layers: Dict[str, SynthesisLayer3] = {}
        for idx in range(self.num_layers + 1):
            prev = max(idx - 1, 0)
            is_torgb = idx == self.num_layers
            is_crit = idx >= self.num_layers - self.num_critical
            layer = SynthesisLayer3(
                w_dim=self.w_dim,
                in_channels=int(channels[prev]), out_channels=int(channels[idx]),
                in_size=int(sizes[prev]), out_size=int(sizes[idx]),
                in_sampling_rate=int(rates[prev]), out_sampling_rate=int(rates[idx]),
                in_cutoff=float(cutoffs[prev]), out_cutoff=float(cutoffs[idx]),
                in_half_width=float(half_widths[prev]),
                out_half_width=float(half_widths[idx]),
                conv_kernel=1 if is_torgb else self.conv_kernel,
                lrelu_upsampling=self.lrelu_upsampling,
                filter_size=self.filter_size,
                # radial filters only on non-critically-sampled layers (ref :319)
                use_radial_filters=self.use_radial_filters and not is_crit,
                conv_clamp=self.conv_clamp,
                is_torgb=is_torgb,
            )
            layers[f"L{idx}_{layer.out_size}_{layer.out_channels}"] = layer
        return layers

    def _bf16_flags(self):
        _, rates, _, _, _ = self._geometry()
        return [
            bool(rates[i] * (2 ** self.num_fp16_res) > self.img_resolution)
            for i in range(self.num_layers + 1)
        ]

    def init(self, key) -> Params:
        layers = self._layers()
        keys = jax.random.split(key, len(layers) + 1)
        p: Params = {"input": self.input.init(keys[0])}
        for (name, layer), k in zip(layers.items(), keys[1:]):
            p[name] = layer.init(k)
        return p

    def apply(self, params: Params, ws: jax.Array) -> jax.Array:
        """ws: (N, num_ws, w_dim) -> (N, img_channels, res, res)."""
        x = self.input.apply(params["input"], ws[:, 0])
        bf16 = self._bf16_flags()
        for i, (name, layer) in enumerate(self._layers().items()):
            if self.use_bf16 and bf16[i]:
                x = x.astype(jnp.bfloat16)
            else:
                x = x.astype(jnp.float32)
            x = layer.apply(params[name], x, ws[:, i + 1])
        if self.output_scale != 1:
            x = x * self.output_scale
        return x.astype(jnp.float32)


# ----------------------------------------------------------------------------
# Generator (ref networks_stylegan3.py:491-515). The SG3 MappingNetwork
# (:111-166) is math-identical to StyleGAN2's with num_layers=2 defaults, so
# the shared models/stylegan2.MappingNetwork is reused (same param names:
# embed / fc{i} / w_avg).


@dataclass(frozen=True)
class Generator3:
    z_dim: int
    c_dim: int
    w_dim: int
    img_resolution: int
    img_channels: int
    mapping_num_layers: int = 2
    mapping_lr_multiplier: float = 0.01
    mapping_w_avg_beta: float = 0.998
    synthesis_kwargs: Tuple[Tuple[str, object], ...] = ()

    @property
    def synthesis(self) -> SynthesisNetwork3:
        return SynthesisNetwork3(
            w_dim=self.w_dim, img_resolution=self.img_resolution,
            img_channels=self.img_channels, **dict(self.synthesis_kwargs),
        )

    @property
    def num_ws(self) -> int:
        return self.synthesis.num_ws

    @property
    def mapping(self) -> MappingNetwork:
        return MappingNetwork(
            z_dim=self.z_dim, c_dim=self.c_dim, w_dim=self.w_dim,
            num_ws=self.num_ws, num_layers=self.mapping_num_layers,
            lr_multiplier=self.mapping_lr_multiplier,
            w_avg_beta=self.mapping_w_avg_beta,
        )

    def init(self, key) -> Params:
        km, ks = jax.random.split(key)
        return {
            "mapping": self.mapping.init(km),
            "synthesis": self.synthesis.init(ks),
        }

    def apply(self, params: Params, z: jax.Array, c: Optional[jax.Array],
              truncation_psi: float = 1.0,
              truncation_cutoff: Optional[int] = None) -> jax.Array:
        ws = self.mapping.apply(
            params["mapping"], z, c,
            truncation_psi=truncation_psi, truncation_cutoff=truncation_cutoff,
        )
        return self.synthesis.apply(params["synthesis"], ws)
