"""StyleGAN3 alias-free synthesis layer, TPU-native.

Functional re-design of /root/reference/PanoHead/training/
networks_stylegan3.py:255-516 (SynthesisLayer): modulated 1x1/3x3 conv
followed by the fused upsample -> leaky-ReLU -> downsample nonlinearity
(ops/filtered_lrelu.py), with Kaiser-windowed sinc resampling filters
designed from per-layer cutoff/stopband parameters (ref :303-324).

The reference imports this as `AFSynthesisLayer` into the SR module
(superresolution.py:22) without using it in any shipped SR class; it is
provided here for the same completeness (and for alias-free variants).
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import scipy.signal
import scipy.special

from ..ops import filtered_lrelu, modulated_conv2d
from .stylegan2 import FullyConnectedLayer, Params


def design_lowpass_filter(numtaps: int, cutoff: float, width: float, fs: float,
                          radial: bool = False) -> Optional[np.ndarray]:
    """Kaiser-windowed sinc (ref networks_stylegan3.py:41-64)."""
    if numtaps == 1:
        return None
    if not radial:
        f = scipy.signal.firwin(numtaps=numtaps, cutoff=cutoff, width=width, fs=fs)
        return np.asarray(f, np.float32)
    # radially symmetric jinc filter with kaiser window
    x = (np.arange(numtaps) - (numtaps - 1) / 2) / fs
    r = np.hypot(*np.meshgrid(x, x))
    with np.errstate(divide="ignore", invalid="ignore"):
        f = 2 * cutoff / fs * np.where(
            r == 0, 1.0,
            scipy.special.j1(2 * math.pi * cutoff * r) / (math.pi * cutoff * r * 2)
            * (math.pi * cutoff),
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
        """Total padding solving exactly for out_size (ref :326-337): the
        VALID conv leaves in_size - k + 1 samples; after zero-insertion by
        `up`, both FIR convolutions, and decimation by `down`, requesting
        out = (conv_out*up + pad - (fu-1) - (fd-1) + (down-1)) // down =
        out_size pins pad."""
        fu, fd = self._filters()
        fu_taps = 1 if fu is None else fu.shape[0]
        fd_taps = 1 if fd is None else fd.shape[0]
        conv_out = self.in_size - self.conv_kernel + 1
        pad_total = (self.out_size - 1) * self.down_factor + 1
        pad_total -= conv_out * self.up_factor
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
        # input magnitude normalization (ema frozen at inference, ref :379-386)
        input_gain = jax.lax.rsqrt(params["magnitude_ema"])
        x = modulated_conv2d(
            x * input_gain.astype(x.dtype), params["weight"], styles,
            padding=0, demodulate=not self.is_torgb,
        )
        fu, fd = self._filters()
        gain = 1.0 if self.is_torgb else math.sqrt(2)
        slope = 1.0 if self.is_torgb else 0.2
        return filtered_lrelu(
            x, fu, fd, params["bias"].astype(x.dtype),
            up=self.up_factor, down=self.down_factor, padding=self.padding,
            gain=gain, slope=slope, clamp=self.conv_clamp,
        )
