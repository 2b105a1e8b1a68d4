"""Tri-plane super-resolution heads (experimental reference feature).

Equivalent of /root/reference/main/decoder_utils/triplane_superres.py:8-30:
upsample the 3-plane feature stack to 512^2 / 1024^2 with StyleGAN2 SR
blocks before point sampling. In the reference this is dead-on-arrival —
the default decoder reads an UNSET `triplane_sr` attribute
(sequential_decoder_reverse.py:58, known defect per SURVEY §7) and the
reference modules' reshapes don't even type-check. Here it is a working,
explicit option: a 2-block feature-SR returning the upsampled planes.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from .superresolution import Superresolution
from .stylegan2 import Params


@dataclass(frozen=True)
class TriplaneSuperres:
    """Feature-preserving plane upsampler: (N,3,C*D,H,W) -> (...,R,R)."""

    in_resolution: int = 256
    out_resolution: int = 512
    channels: int = 32 * 3          # C*D per plane
    hidden: int = 256

    @property
    def sr(self) -> Superresolution:
        total = self.channels * 3
        return Superresolution(
            channels=total,
            img_resolution=self.out_resolution,
            input_resolution=self.in_resolution,
            block0_out=self.hidden,
            block1_out=total,
            block0_res=self.in_resolution,
            block1_res=self.out_resolution,
            block0_up=False,
            sr_antialias=False,
            returns_features=True,
        )

    def init(self, key) -> Params:
        return {"superres": self.sr.init(key)}

    def apply(self, params: Params, planes: jax.Array, ws: jax.Array) -> jax.Array:
        n, p, cd, h, w = planes.shape
        x = planes.reshape(n, p * cd, h, w)
        rgb = jnp.zeros((n, 3, h, w), planes.dtype)
        out = self.sr.apply(params["superres"], rgb, x, ws, noise_mode="const")
        r = out.shape[-1]
        return out.reshape(n, p, cd, r, r)
