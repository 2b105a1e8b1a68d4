"""Interactive viewer server (headless visualizer).

TPU-native stand-in for the reference's imgui/glfw visualizer
(/root/reference/eg3d/visualizer.py + eg3d/viz/renderer.py:239-447): the
GUI itself runs in an external viewer (SIBR remote / splatviz, the same
tools the reference README points at); THIS process is the render server.
It speaks the reference's network-GUI wire protocol
(gaussians/network_gui.py) and implements the renderer state the
reference widgets drive:

  * seed blending — `w0_seeds: [[seed, weight], ...]` fractional-seed
    interpolation exactly like the latent widget (renderer.py:301-334:
    per-seed `mapping(z) - w_avg`, weighted sum, `+ w_avg`);
  * style mixing — `stylemix_seed` + `stylemix_idx` overwrite the chosen
    w layers (renderer.py:333-335);
  * truncation — `trunc_psi` / `trunc_cutoff` (applied in mapping);
  * render types — `render_type: image | alpha | depth` (the reference's
    image / image_depth toggle, renderer.py:367-385; depth renders the
    per-gaussian view-space z splatted through the same rasterizer and
    normalized to the reference's inverted [-1, 1] convention);
  * live latent changes with plane/decode caching — re-decode only when
    the latent state changes (the `backbone_cache` widget,
    renderer.py:344-350);
  * GAN neural-render modes — `render_type: gan_image | gan_depth` run
    the generator's own volume render + SR from the viewer camera (the
    reference visualizer's primary mode), with `depth_mult` scaling both
    depth resolutions (eg3d/viz/render_depth_sample_widget.py) and `nrr`
    overriding the neural rendering resolution;
  * perf counter — `"perf": true` returns the last render wall time in
    the verify JSON (eg3d/viz/performance_widget.py).

Clients send the extra keys alongside the base SIBR message; plain SIBR /
splatviz viewers that omit them get the defaults (camera + scale modifier
only), so the base protocol stays compatible.
"""
from __future__ import annotations

import argparse
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _find_w_avg(gen_params):
    """Locate the BACKBONE mapping's w_avg buffer in a generator param
    tree (params['backbone']['mapping']['w_avg'] for both variants; the
    t_mapping EMA is a different, 3-dim buffer)."""
    node = gen_params
    for key in ("backbone", "mapping"):
        if isinstance(node, dict) and key in node:
            node = node[key]
    if isinstance(node, dict) and "w_avg" in node:
        return node["w_avg"]
    raise KeyError("w_avg not found in generator params")


class DecoderRenderer:
    """Latent-state machinery of the reference visualizer renderer on the
    decoder/3DGS path. Stateless protocol in, uint8 frame out."""

    def __init__(self, decoder, params, frozen_params, target_cfg,
                 raster_config=None, backend: str = "xla"):
        from ..flagship import default_camera_params
        from ..splat.rasterize import RasterizeConfig

        self.decoder = decoder
        self.gen = decoder.generator
        self.params = params
        self.frozen = frozen_params
        self.tcfg = target_cfg
        self.rcfg = raster_config or RasterizeConfig()
        self.backend = backend
        self.cp, _ = default_camera_params()
        self._w_cache = {}        # seed -> raw ws (num_ws, w_dim), psi=1
        self._decode_cache = None  # (state_key, decoded EasyDict)
        self._plane_cache = None   # (state_key, planes) for the GAN modes
        self.last_render_ms = 0.0  # perf widget (set per render() call)

    # -- latent machinery (ref renderer.py:301-335) ---------------------------

    def _raw_w(self, seed: int):
        """mapping(z_seed) with NO truncation (psi=1): the blending basis."""
        if seed not in self._w_cache:
            z = jnp.asarray(
                np.random.RandomState(int(seed)).randn(1, self.gen.z_dim),
                jnp.float32)
            # decoder mapping convention: zeroed camera for the reversed /
            # parallel chains, real conditioning for 'sequential'
            c = (self.cp if self.decoder.decoder_type == "sequential"
                 else jnp.zeros_like(self.cp))
            ws = self.gen.mapping(self.params["G"], z, c, truncation_psi=1.0)
            self._w_cache[seed] = ws[0]
            if len(self._w_cache) > 64:   # LRU-ish bound
                self._w_cache.pop(next(iter(self._w_cache)))
        return self._w_cache[seed]

    def blended_ws(self, w0_seeds, stylemix_idx, stylemix_seed,
                   trunc_psi: float, trunc_cutoff: Optional[int]):
        """Reference blend: per-seed (w - w_avg), weighted sum, stylemix
        overwrite, + w_avg; truncation lerp toward w_avg afterwards."""
        w_avg = _find_w_avg(self.params["G"])
        w = sum(( self._raw_w(int(s)) - w_avg[None, :]) * float(wt)
                for s, wt in w0_seeds)
        num_ws = w.shape[0]
        idx = [i for i in stylemix_idx if 0 <= i < num_ws]
        if idx:
            mix = self._raw_w(int(stylemix_seed)) - w_avg[None, :]
            w = w.at[jnp.asarray(idx)].set(mix[jnp.asarray(idx)])
        w = w + w_avg[None, :]
        # truncation (mapping applies it pre-blend in the reference; the
        # lerp commutes with the affine blend so applying it here is exact
        # for cutoff=None and matches per-layer for explicit cutoffs)
        psi = float(trunc_psi)
        if psi != 1.0:
            lerped = w_avg[None, :] + (w - w_avg[None, :]) * psi
            if trunc_cutoff is None or int(trunc_cutoff) >= num_ws \
                    or int(trunc_cutoff) <= 0:
                w = lerped
            else:
                cut = int(trunc_cutoff)
                w = jnp.concatenate([lerped[:cut], w[cut:]], axis=0)
        return w[None]  # (1, num_ws, w_dim)

    # -- decode with caching (ref renderer.py:344-350) ------------------------

    def _decode(self, state_key, ws):
        if self._decode_cache is not None and self._decode_cache[0] == state_key:
            return self._decode_cache[1]
        from ..decoder.target_pipeline import sample_target

        # surface vertices from the FROZEN generator at the blended
        # latent (the decoder's init positions, ref load_decoder flow)
        seed_material = abs(hash(state_key)) % (2 ** 31)
        t = sample_target(
            jax.random.PRNGKey(seed_material), self.gen, self.frozen,
            z=None, ws=ws, camera_params=self.cp, cfg=self.tcfg,
            only_surface=True,
        )
        planes = self.gen.synthesis_planes(self.params["G"], ws,
                                           noise_mode="const")
        decoded = self.decoder.decode_from_planes(
            self.params, planes, t.vertices)
        self._decode_cache = (state_key, decoded)
        return decoded

    def _planes(self, state_key, ws):
        if self._plane_cache is not None and self._plane_cache[0] == state_key:
            return self._plane_cache[1]
        planes = self.gen.synthesis_planes(self.params["G"], ws,
                                           noise_mode="const")
        self._plane_cache = (state_key, planes)
        return planes

    # -- GAN neural-render modes (ref viz/renderer.py:352-396) ----------------

    def _camera_params_from_cam(self, cam):
        """network-GUI Camera -> EG3D 25-dim conditioning. cameras.py keeps
        world_view_transform = inv(cam2world^T) (row-vector form), so
        cam2world = inv(world_view)^T; normalized intrinsics from
        tan(fov/2)."""
        wv = np.asarray(cam.world_view_transform, np.float64)
        cam2world = np.linalg.inv(wv).T
        fx = 1.0 / (2.0 * float(cam.tanfovx))
        fy = 1.0 / (2.0 * float(cam.tanfovy))
        intr = np.array([[fx, 0, 0.5], [0, fy, 0.5], [0, 0, 1]], np.float64)
        c = np.concatenate([cam2world.reshape(-1), intr.reshape(-1)])
        return jnp.asarray(c, jnp.float32)[None]

    def _render_gan(self, cam, msg: dict, ws, state_key) -> np.ndarray:
        """render_type gan_image | gan_depth: the generator's own two-pass
        volume render + SR from the viewer camera (the reference
        visualizer's primary path). `depth_mult` scales both depth
        resolutions (eg3d/viz/render_depth_sample_widget.py), `nrr`
        overrides the neural rendering resolution."""
        from ..ops import resize_bilinear

        planes = self._planes(state_key, ws)
        rk = self.gen.rk
        mult = float(msg.get("depth_mult", 1.0))
        over = {
            "depth_resolution": max(2, int(round(rk["depth_resolution"] * mult))),
            "depth_resolution_importance": max(
                2, int(round(rk["depth_resolution_importance"] * mult))),
        }
        default_nrr = (self.tcfg.neural_rendering_resolution
                       if self.tcfg is not None else 64)
        nrr = int(msg.get("nrr", default_nrr))
        out = self.gen.render_planes(
            self.params["G"], planes, ws, self._camera_params_from_cam(cam),
            neural_rendering_resolution=nrr, noise_mode="const",
            rk_overrides=over)
        if msg.get("render_type") == "gan_depth":
            # ref renderer.py:381-385: -image_depth, normalized
            d = -out["image_depth"][0]
            lo, hi = jnp.min(d), jnp.max(d)
            img = jnp.tile((d - lo) / jnp.maximum(hi - lo, 1e-8), (3, 1, 1))
        else:
            raw = out["image"] if "image" in out else out["image_raw"]
            img = jnp.clip((raw[0] + 1) / 2, 0, 1)
        H, W = int(cam.image_height), int(cam.image_width)
        if img.shape[-2:] != (H, W):
            img = resize_bilinear(img[None], H, W)[0]
        return np.asarray(
            jnp.clip(img * 255, 0, 255)).astype(np.uint8).transpose(1, 2, 0)

    # -- layer capture (ref viz/renderer.py:411-447) --------------------------

    def layer_list(self):
        """[(name, shape, dtype)] of capturable backbone activations."""
        ws = self.blended_ws([[0, 1.0]], [], 0, 1.0, None)
        cap = {}
        jax.eval_shape(
            lambda p, w: self.gen.synthesis_planes(p, w, capture=cap),
            self.params["G"], ws)
        return [(k, list(v.shape), str(v.dtype)) for k, v in cap.items()]

    def _render_layer(self, ws, msg: dict, out_size: int) -> np.ndarray:
        """Capture one backbone activation and visualize it the way the
        reference does (renderer.py:364-396): channel select, dB scale,
        optional normalize, x*127.5+128."""
        cap = {}
        self.gen.synthesis_planes(self.params["G"], ws, capture=cap)
        name = msg["layer_name"]
        if name not in cap:
            raise KeyError(f"unknown layer {name!r}; have {sorted(cap)}")
        out = np.asarray(cap[name][0], np.float32)       # (C, h, w)
        sel_channels = int(msg.get("sel_channels", 3))
        if sel_channels > out.shape[0]:
            sel_channels = 1
        base = max(min(int(msg.get("base_channel", 0)),
                       out.shape[0] - sel_channels), 0)
        img = out[base:base + sel_channels]
        if msg.get("img_normalize"):
            img = img / np.clip(np.abs(img).max(axis=(1, 2), keepdims=True),
                                1e-8, 1e8)
        img = img * (10 ** (float(msg.get("img_scale_db", 0)) / 20))
        img = np.clip(img * 127.5 + 128, 0, 255).astype(np.uint8)
        img = img.transpose(1, 2, 0)
        if img.shape[-1] == 1:
            img = np.repeat(img, 3, axis=-1)
        elif img.shape[-1] == 2:
            img = np.concatenate([img, np.zeros_like(img[..., :1])], axis=-1)
        if img.shape[0] != out_size:                      # nearest upscale
            reps = max(out_size // img.shape[0], 1)
            img = np.kron(img, np.ones((reps, reps, 1), np.uint8))
            img = img[:out_size, :out_size]
            if img.shape[0] < out_size:
                pad = out_size - img.shape[0]
                img = np.pad(img, ((0, pad), (0, pad), (0, 0)))
        return img

    # -- frame ----------------------------------------------------------------

    def render(self, cam, msg: dict, scale_modifier: float = 1.0) -> np.ndarray:
        """(Camera, protocol msg) -> (H, W, 3) uint8 frame. Wall time lands
        in self.last_render_ms (perf widget)."""
        t0 = time.perf_counter()
        try:
            return self._render_impl(cam, msg, scale_modifier)
        finally:
            self.last_render_ms = (time.perf_counter() - t0) * 1e3

    def _render_impl(self, cam, msg: dict, scale_modifier: float = 1.0) -> np.ndarray:
        from ..splat.rasterize import rasterize

        w0_seeds = msg.get("w0_seeds") or [[int(msg.get("seed", 0)), 1.0]]
        stylemix_idx = msg.get("stylemix_idx") or []
        stylemix_seed = int(msg.get("stylemix_seed", 0))
        trunc_psi = float(msg.get("trunc_psi", 1.0))
        trunc_cutoff = msg.get("trunc_cutoff")
        render_type = msg.get("render_type", "image")

        state_key = (
            tuple((int(s), round(float(w), 6)) for s, w in w0_seeds),
            tuple(int(i) for i in stylemix_idx), stylemix_seed,
            round(trunc_psi, 6),
            None if trunc_cutoff is None else int(trunc_cutoff),
        )
        ws = self.blended_ws(w0_seeds, stylemix_idx, stylemix_seed,
                             trunc_psi, trunc_cutoff)
        if msg.get("layer_name"):
            return self._render_layer(ws, msg, cam.image_height)
        if render_type in ("gan_image", "gan_depth"):
            return self._render_gan(cam, msg, ws, state_key)
        d = self._decode(state_key, ws)

        opac = jax.nn.sigmoid(d["opacity"][:, 0])
        scales = jnp.exp(d["scale"])
        if render_type == "depth":
            # per-gaussian view-space z splatted as a color; alpha-weighted
            # mean depth per pixel (divide by coverage), then the
            # reference's inverted [-1,1] normalization (renderer.py:382-385)
            xyz_h = jnp.concatenate(
                [d["xyz"], jnp.ones((d["xyz"].shape[0], 1))], axis=1)
            view_z = (xyz_h @ cam.world_view_transform)[:, 2]
            colors = jnp.tile(view_z[:, None], (1, 3))
            out = rasterize(
                cam, d["xyz"], scales, d["rotation"], opac,
                colors_precomp=colors, scale_modifier=scale_modifier,
                config=self.rcfg,
            )
            depth = out["render"][0] / jnp.maximum(out["alpha"][0], 1e-6)
            lo, hi = jnp.min(depth), jnp.max(depth)
            norm = (depth - lo) / jnp.maximum(hi - lo, 1e-8)
            img01 = jnp.tile((1.0 - norm)[None], (3, 1, 1))
        else:
            out = rasterize(
                cam, d["xyz"], scales, d["rotation"], opac,
                shs=d["color"][:, None, :], sh_degree=0,
                scale_modifier=scale_modifier, config=self.rcfg,
            )
            img01 = out["alpha"].repeat(3, axis=0) if render_type == "alpha" \
                else out["render"]
        return np.asarray(
            jnp.clip(img01 * 255, 0, 255)).astype(np.uint8).transpose(1, 2, 0)


def serve(renderer: DecoderRenderer, host: str, port: int):
    from ..gaussians.network_gui import NetworkGUI

    gui = NetworkGUI(host, port)
    print(f"viewer server on {host}:{port} — connect SIBR/splatviz")
    while True:
        if gui.conn is None:
            gui.try_connect()
            time.sleep(0.05)
            continue
        try:
            cam, _train, _keep, scale_mod, (w, h), msg = gui.receive()
            if cam is None:
                gui.send(None, "ok")
                continue
            img = renderer.render(cam, msg, scale_mod)
            verify = "ok"
            meta = {}
            if msg.get("list_layers"):
                # metadata rides back in the verify string (the wire
                # format has no other metadata channel)
                meta["layers"] = renderer.layer_list()
            if msg.get("perf"):
                meta["render_ms"] = round(renderer.last_render_ms, 3)
            if meta:
                import json as _json

                verify = _json.dumps({"ok": True, **meta})
            gui.send(img.tobytes(), verify)
        except (ConnectionError, BrokenPipeError, OSError):
            print("viewer disconnected")
            gui.conn = None


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", required=True, help="decoder snapshot")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=6009)
    p.add_argument("--backend", default="xla", choices=["xla", "pallas"])
    p.add_argument("--force_cpu", action="store_true")
    args = p.parse_args(argv)
    if args.force_cpu:
        jax.config.update("jax_platforms", "cpu")

    from ..decoder.snapshot import load_decoder

    decoder, params, configs = load_decoder(args.checkpoint)
    frozen = configs.get("frozen_G_params", params["G"])
    renderer = DecoderRenderer(
        decoder, params, frozen, configs.get("target_cfg"),
        backend=args.backend,
    )
    serve(renderer, args.host, args.port)


if __name__ == "__main__":
    main()
