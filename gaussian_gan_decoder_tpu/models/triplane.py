"""Tri-plane (EG3D) / tri-grid (PanoHead) 3D GAN generator, TPU-native.

Functional re-design unifying both reference variants:
  * /root/reference/PanoHead/training/triplane.py:18-332 (tri-grid,
    t_mapping self-adaptive camera, background blend forced to -1,
    optional raw ToRGB, mask output)
  * /root/reference/eg3d/training/triplane.py:18-139 (plain tri-plane,
    only_planes short-circuit, sigmoid-only OSG decoder)

The whole synthesis path is one pure function of (params, ws, c, key) —
jit it once and reuse; there is no `_last_planes` mutable cache. The
reference's backbone cache (triplane.py:152-157) is subsumed by calling
`synthesis_planes` once and feeding the planes to `render_planes` /
`sample_mixed_from_planes` explicitly (see decoder/ pipeline), which is
both faster and functional.

TPU deviation (documented): the reference builds a full background
synthesis network, runs it, then overwrites its output with -1
(triplane.py:183-184). We keep the parameter subtree (checkpoint parity)
but skip the dead computation.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..neuralfield import ImportanceRenderer, sample_rays

from .stylegan2 import (
    FullyConnectedLayer,
    Generator as StyleGAN2Backbone,
    MappingNetwork,
    Params,
    SynthesisNetwork,
    ToRGBLayer,
)
from .superresolution import make_superresolution


# ----------------------------------------------------------------------------
# OSGDecoder (ref PanoHead/training/triplane.py:300-332, eg3d :116-139)


@dataclass(frozen=True)
class OSGDecoder:
    n_features: int = 32
    hidden_dim: int = 64
    output_dim: int = 32
    lr_multiplier: float = 1.0
    activation: str = "sigmoid"   # 'sigmoid' (EG3D) or 'lrelu' (with ToRGB)

    def _layers(self):
        return {
            "fc0": FullyConnectedLayer(
                self.n_features, self.hidden_dim, lr_multiplier=self.lr_multiplier
            ),
            "fc1": FullyConnectedLayer(
                self.hidden_dim, 1 + self.output_dim, lr_multiplier=self.lr_multiplier
            ),
        }

    def init(self, key) -> Params:
        k0, k1 = jax.random.split(key)
        layers = self._layers()
        return {"fc0": layers["fc0"].init(k0), "fc1": layers["fc1"].init(k1)}

    def apply(self, params: Params, sampled_features: jax.Array, ray_directions=None) -> Dict:
        """features (N, n_planes, M, C) -> {'rgb': (N,M,out), 'sigma': (N,M,1)}."""
        layers = self._layers()
        x = jnp.mean(sampled_features, axis=1)  # aggregate over planes
        x = layers["fc0"].apply(params["fc0"], x)
        x = jax.nn.softplus(x)
        x = layers["fc1"].apply(params["fc1"], x)
        rgb, sigma = x[..., 1:], x[..., 0:1]
        if self.activation == "sigmoid":
            rgb = jax.nn.sigmoid(rgb) * (1 + 2 * 0.001) - 0.001  # MipNeRF clamp
        elif self.activation == "lrelu":
            rgb = jax.nn.leaky_relu(rgb, 0.2) * jnp.sqrt(2.0).astype(rgb.dtype)
        return {"rgb": rgb, "sigma": sigma}


# ----------------------------------------------------------------------------
# TriPlaneGenerator


def default_rendering_kwargs(variant: str = "panohead") -> Dict[str, Any]:
    """Presets matching the reference launchers
    (PanoHead/train.py:302-340, eg3d/train.py:285-310, ffhq cfg)."""
    base = dict(
        image_resolution=512,
        disparity_space_sampling=False,
        clamp_mode="softplus",
        c_gen_conditioning_zero=False,
        c_scale=1.0,
        superresolution_noise_mode="none",
        density_reg=0.25,
        density_reg_p_dist=0.004,
        decoder_lr_mul=1.0,
        sr_antialias=True,
        depth_resolution=48,
        depth_resolution_importance=48,
        ray_start=2.25,
        ray_end=3.3,
        box_warp=1.0,
        avg_camera_radius=2.7,
        avg_camera_pivot=(0, 0, 0.2),
    )
    if variant == "panohead":
        base.update(
            superresolution_module="training.superresolution.SuperresolutionHybrid8XDC",
            decoder_activation="lrelu",
            use_torgb_raw=True,
            use_background=True,
            triplane_size=256,
            triplane_depth=3,
            ray_start="auto",
            ray_end="auto",
        )
    else:
        base.update(
            superresolution_module="training.superresolution.SuperresolutionHybrid8XDC",
            decoder_activation="sigmoid",
            use_torgb_raw=False,
            use_background=False,
            triplane_size=256,
            triplane_depth=1,
        )
    return base


@dataclass(frozen=True)
class TriPlaneGenerator:
    z_dim: int = 512
    c_dim: int = 25
    w_dim: int = 512
    img_resolution: int = 512
    img_channels: int = 3
    variant: str = "panohead"          # 'panohead' (tri-grid) | 'eg3d'
    sr_num_fp16_res: int = 0
    without_sr: bool = False
    channel_base: int = 32768
    channel_max: int = 512
    num_fp16_res: int = 0
    conv_clamp: Optional[float] = None
    mapping_kwargs: Tuple[Tuple[str, Any], ...] = ()
    rendering_kwargs: Tuple[Tuple[str, Any], ...] = ()

    # -- static sub-configs ---------------------------------------------------

    @property
    def rk(self) -> Dict[str, Any]:
        d = default_rendering_kwargs(self.variant)
        d.update(dict(self.rendering_kwargs))
        return d

    @property
    def triplane_depth(self) -> int:
        return int(self.rk["triplane_depth"]) if self.variant == "panohead" else 1

    @property
    def backbone(self) -> StyleGAN2Backbone:
        return StyleGAN2Backbone(
            z_dim=self.z_dim,
            c_dim=self.c_dim,
            w_dim=self.w_dim,
            img_resolution=int(self.rk["triplane_size"]),
            img_channels=32 * 3 * self.triplane_depth,
            channel_base=self.channel_base,
            channel_max=self.channel_max,
            num_fp16_res=self.num_fp16_res,
            conv_clamp=self.conv_clamp,
            mapping_kwargs=self.mapping_kwargs,
        )

    @property
    def superresolution(self):
        return make_superresolution(
            self.rk["superresolution_module"],
            channels=32,
            img_resolution=self.img_resolution,
            sr_num_fp16_res=self.sr_num_fp16_res,
            sr_antialias=self.rk["sr_antialias"],
        )

    @property
    def decoder(self) -> OSGDecoder:
        return OSGDecoder(
            n_features=32,
            output_dim=32,
            lr_multiplier=self.rk.get("decoder_lr_mul", 1.0),
            activation=self.rk.get("decoder_activation", "sigmoid")
            if self.variant == "panohead"
            else "sigmoid",
        )

    @property
    def torgb(self) -> Optional[ToRGBLayer]:
        if self.variant == "panohead" and self.rk.get("use_torgb_raw", False):
            return ToRGBLayer(32, 3, self.w_dim)
        return None

    @property
    def bcg_synthesis(self) -> Optional[SynthesisNetwork]:
        if self.variant == "panohead" and self.rk.get("use_background", False):
            return SynthesisNetwork(
                w_dim=self.w_dim,
                img_resolution=self.superresolution.input_resolution,
                img_channels=32,
                channel_base=self.channel_base // 2,
                channel_max=self.channel_max,
                num_fp16_res=self.num_fp16_res,
                conv_clamp=self.conv_clamp,
            )
        return None

    @property
    def t_mapping(self) -> Optional[MappingNetwork]:
        if self.variant == "panohead":
            return MappingNetwork(
                z_dim=self.z_dim, c_dim=self.c_dim, w_dim=3, num_ws=1,
                last_activation="linear", lr_multiplier=1.0,
                **dict(self.mapping_kwargs),
            )
        return None

    @property
    def renderer(self) -> ImportanceRenderer:
        return ImportanceRenderer(plane_variant=self.variant)

    @property
    def num_ws(self) -> int:
        return self.backbone.num_ws

    # -- params ---------------------------------------------------------------

    def init(self, key) -> Params:
        keys = jax.random.split(key, 5)
        p: Params = {
            "backbone": self.backbone.init(keys[0]),
            "decoder": self.decoder.init(keys[1]),
        }
        if not self.without_sr:
            p["superresolution"] = self.superresolution.init(keys[2])
        if self.torgb is not None:
            p["torgb"] = self.torgb.init(keys[3])
        if self.t_mapping is not None:
            p["t_mapping"] = self.t_mapping.init(keys[4])
        if self.bcg_synthesis is not None:
            # kept only for checkpoint parity; never evaluated (see module doc)
            p["bcg_synthesis"] = self.bcg_synthesis.init(jax.random.fold_in(key, 5))
        return p

    # -- mapping (ref PanoHead/training/triplane.py:87-96) --------------------

    def mapping(self, params, z, c, truncation_psi=1.0, truncation_cutoff=None):
        if self.rk["c_gen_conditioning_zero"]:
            c = jnp.zeros_like(c)
        return self.backbone.mapping.apply(
            params["backbone"]["mapping"],
            z,
            c * self.rk.get("c_scale", 0.0),
            truncation_psi=truncation_psi,
            truncation_cutoff=truncation_cutoff,
        )

    # -- self-adaptive camera (ref :99-126) ------------------------------------

    def apply_delta_c(self, params, z, c, truncation_psi=1.0, truncation_cutoff=None):
        assert self.t_mapping is not None, "apply_delta_c is PanoHead-only"
        # NB exact reference semantics (triplane.py:109-124): when
        # c_gen_conditioning_zero, c is REBOUND to zeros BEFORE c_new is
        # cloned from it — so the returned camera keeps none of the input
        # extrinsics/intrinsics (a degenerate all-zero camera + delta
        # translation; G.forward then renders NaNs). Real PanoHead GAN
        # configs run this path with c_gen_conditioning_zero=False, where
        # it is a plain translation offset on the true camera.
        c_in = jnp.zeros_like(c) if self.rk["c_gen_conditioning_zero"] else c
        delta_c = self.t_mapping.apply(
            params["t_mapping"], z, c_in * self.rk.get("c_scale", 0.0),
            truncation_psi=truncation_psi, truncation_cutoff=truncation_cutoff,
        )[:, 0]  # (N, 3)
        c_new = c_in.at[:, 3].add(delta_c[:, 0])
        c_new = c_new.at[:, 7].add(delta_c[:, 1])
        c_new = c_new.at[:, 11].add(delta_c[:, 2])
        return c_new, delta_c

    # -- synthesis -------------------------------------------------------------

    def synthesis_planes(self, params, ws, noise_mode="const", noise_key=None,
                         capture=None):
        """Backbone -> (N, 3, 32*D, H, W) feature planes.

        capture: optional dict collecting per-block backbone activations
        (see stylegan2.SynthesisNetwork.apply)."""
        planes = self.backbone.synthesis.apply(
            params["backbone"]["synthesis"], ws,
            noise_mode=noise_mode, noise_key=noise_key, capture=capture,
        )
        N = planes.shape[0]
        return planes.reshape(
            N, 3, 32 * self.triplane_depth, planes.shape[-2], planes.shape[-1]
        )

    def render_planes(
        self,
        params,
        planes,
        ws,
        c,
        neural_rendering_resolution: int = 64,
        noise_mode: str = "const",
        key=None,
        noise_key=None,
        ws_bcg=None,
        plane_table=None,
        rk_overrides=None,
    ) -> Dict[str, jax.Array]:
        """Volume render + SR from precomputed planes (ref synthesis :128-225).

        rk_overrides: dict merged over rendering_kwargs for this call —
        e.g. scaled depth_resolution/_importance (the reference
        visualizer's depth-sample-multiplier widget,
        eg3d/viz/render_depth_sample_widget.py)."""
        rk = self.rk
        if rk_overrides:
            rk = {**rk, **rk_overrides}
        if plane_table is not None:
            rk = {**rk, "plane_table": plane_table}
        if key is None:
            key = jax.random.PRNGKey(0)
        cam2world = c[:, :16].reshape(-1, 4, 4)
        intrinsics = c[:, 16:25].reshape(-1, 3, 3)
        N = c.shape[0]
        res = neural_rendering_resolution

        ray_origins, ray_directions = sample_rays(cam2world, intrinsics, res)

        decoder_fn = lambda feats, dirs: self.decoder.apply(  # noqa: E731
            params["decoder"], feats, dirs
        )
        feature_samples, depth_samples, weights_samples = self.renderer(
            key, planes, decoder_fn, ray_origins, ray_directions, rk
        )

        H = W = res
        feature_image = jnp.transpose(feature_samples, (0, 2, 1)).reshape(
            N, feature_samples.shape[-1], H, W
        )
        depth_image = jnp.transpose(depth_samples, (0, 2, 1)).reshape(N, 1, H, W)
        weights_image = jnp.transpose(weights_samples, (0, 2, 1)).reshape(N, 1, H, W)

        if self.variant == "panohead":
            if self.decoder.activation == "sigmoid":
                feature_image = feature_image * 2 - 1
            if self.bcg_synthesis is not None:
                # ref triplane.py:183-191 forces the background to -1; the
                # bilinear resize of a constant is the constant.
                feature_image = feature_image + (1 - weights_image) * (-1.0)
            if self.torgb is not None:
                rgb_image = self.torgb.apply(
                    params["torgb"], feature_image, ws[:, -1]
                ).astype(jnp.float32)
            else:
                rgb_image = feature_image[:, :3]
        else:
            rgb_image = feature_image[:, :3]

        mask_image = weights_image * (1 + 2 * 0.001) - 0.001

        out = {
            "image_raw": rgb_image,
            "image_depth": depth_image,
            "feature_planes": planes,
        }
        if self.variant == "panohead":
            out["image_mask"] = mask_image
        if self.without_sr:
            return out

        sr_noise_mode = rk["superresolution_noise_mode"]
        if sr_noise_mode not in ("random", "none"):
            sr_noise_mode = noise_mode
        out["image"], raw_alias = self.superresolution.apply(
            params["superresolution"], rgb_image, feature_image, ws,
            noise_mode="const" if sr_noise_mode == "none" else sr_noise_mode,
            noise_key=noise_key,
            return_raw_alias=True,
        )
        if raw_alias is not None:
            # reference in-place aliasing: when the SR stack consumes the
            # raw image without resizing, its block0 ToRGB skip is added
            # into the returned image_raw (networks_stylegan2.py:461 `img.
            # add_(y)` mutating triplane.py:196's rgb_image). Dual
            # discrimination trains D on this mutated raw image, so parity
            # requires reproducing it.
            out["image_raw"] = raw_alias.astype(jnp.float32)
        return out

    def synthesis(
        self, params, ws, c, neural_rendering_resolution: int = 64,
        noise_mode: str = "const", key=None, noise_key=None,
    ) -> Dict[str, jax.Array]:
        """mapping-ws -> full synthesis dict (ref triplane.py:128-225)."""
        planes = self.synthesis_planes(params, ws, noise_mode, noise_key)
        return self.render_planes(
            params, planes, ws, c, neural_rendering_resolution,
            noise_mode=noise_mode, key=key, noise_key=noise_key,
        )

    # -- point probes (ref :227-263) -------------------------------------------

    def sample_mixed_from_planes(self, params, planes, coordinates,
                                 directions=None, table=None):
        """{rgb, sigma} at arbitrary coords from precomputed planes.

        `table` (renderer.build_plane_table output) reuses one brick
        expansion across chunked probes."""
        decoder_fn = lambda feats, dirs: self.decoder.apply(  # noqa: E731
            params["decoder"], feats, dirs
        )
        rk = self.rk if table is None else {**self.rk, "plane_table": table}
        return self.renderer.run_model(planes, decoder_fn, coordinates, directions, rk)

    def build_sampling_table(self, planes, brick_dtype=None,
                             pallas_build: bool = False):
        """Precompute the probe brick table for render_planes /
        sample_mixed_from_planes reuse (neuralfield.build_plane_table)."""
        from ..neuralfield.renderer import build_plane_table

        return build_plane_table(
            planes, self.triplane_depth, brick_dtype=brick_dtype,
            pallas_build=pallas_build if self.triplane_depth > 1 else False,
        )

    def sample_mixed(self, params, coordinates, directions, ws, noise_mode="const"):
        planes = self.synthesis_planes(params, ws, noise_mode)
        return self.sample_mixed_from_planes(params, planes, coordinates, directions)

    def sample(self, params, coordinates, directions, z, c, truncation_psi=1.0):
        ws = self.mapping(params, z, c, truncation_psi=truncation_psi)
        return self.sample_mixed(params, coordinates, directions, ws)

    # -- forward (ref :265-293) -------------------------------------------------

    def apply(
        self, params, z, c, truncation_psi=1.0, truncation_cutoff=None,
        neural_rendering_resolution: int = 64, noise_mode="const",
        key=None, noise_key=None,
    ):
        ws = self.mapping(params, z, c, truncation_psi, truncation_cutoff)
        if self.variant == "panohead":
            c, _ = self.apply_delta_c(params, z, c, truncation_psi, truncation_cutoff)
        return self.synthesis(
            params, ws, c, neural_rendering_resolution,
            noise_mode=noise_mode, key=key, noise_key=noise_key,
        )
