"""Gaussian-attribute decoder heads — the paper's contribution.

Re-design of /root/reference/main/decoder_models/{base_decoder.py:8-27,
sequential_decoder_reverse.py:12-99, sequential_decoder.py:12-96,
parallel_decoder.py:12-92} as one configurable functional module.

Each head is a 4-layer MLP (Linear-GELU x3 -> Linear) reading the
plane-mean tri-plane feature (32ch) concatenated with a conditioning
vector. Variants:

  * 'sequential_reversed' (reference default): chain color -> opacity ->
    rotation -> scale -> xyz, each conditioned on all previous outputs;
    xyz = 0.01 * head + init_position; scale act = -softplus(s+5) - 2.5;
    G.mapping receives ZEROED camera conditioning while G.synthesis gets
    the real camera.
  * 'sequential': chain xyz -> scale -> rot -> opacity -> color; scale
    offset -2; mapping gets the REAL camera, synthesis gets zeros
    (the reference's opposite convention, sequential_decoder.py:40-41).
  * 'parallel': all five heads read only (features ⊕ position encoding).

The reference's dead `triplane_sr` attribute (a known defect — it is read
but never set, sequential_decoder_reverse.py:58) becomes an explicit
`triplane_sr` option, default off.

TPU-first notes: on a 500k-point axis each head is a dense (M, C) x
(C, H) matmul stack — pure MXU work. `decode_from_planes` takes
precomputed planes so per-latent backbone work is hoisted out of
per-point work (replacing the reference's mutable `_last_planes` cache),
and the point axis shards cleanly under shard_map (see parallel/).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..models.triplane import TriPlaneGenerator
from ..neuralfield import sample_from_planes
from ..utils import EasyDict
from .pos_encoding import Embedder

Params = Dict[str, Any]


@dataclass(frozen=True)
class DecoderHead:
    """4-layer GELU MLP (ref base_decoder.py:8-27)."""

    n_features: int
    out_features: int = 3
    hidden_dim: int = 128
    gelu: str = "exact"  # see GaussianDecoder.gelu

    def _dims(self):
        h = self.hidden_dim
        return [(self.n_features, h), (h, h), (h, h), (h, self.out_features)]

    def init(self, key) -> Params:
        p = {}
        for i, (din, dout) in enumerate(self._dims()):
            kw, kb = jax.random.split(jax.random.fold_in(key, i))
            bound = 1.0 / jnp.sqrt(din)  # torch.nn.Linear default init
            p[f"fc{i}"] = {
                "weight": jax.random.uniform(kw, (dout, din), jnp.float32, -bound, bound),
                "bias": jax.random.uniform(kb, (dout,), jnp.float32, -bound, bound),
            }
        return p

    def apply(self, params: Params, plane_features: jax.Array, cond: jax.Array) -> jax.Array:
        """plane_features (n_planes, M, 32) — averaged over planes like the
        reference (base_decoder.py:21); cond (M, D)."""
        x = jnp.concatenate([jnp.mean(plane_features, axis=0), cond], axis=-1)
        for i in range(4):
            w = params[f"fc{i}"]["weight"]
            b = params[f"fc{i}"]["bias"]
            x = x @ w.T.astype(x.dtype) + b.astype(x.dtype)
            if i < 3:
                if self.gelu.startswith("poly"):
                    from .pallas_heads import _GELUS
                    x = _GELUS[self.gelu](x)
                else:
                    x = jax.nn.gelu(x, approximate=(self.gelu == "tanh"))
        return x


_CHAINS = {
    # name -> ordered (attr, out_dim); cond dim grows by out_dim each step
    "sequential_reversed": (("color", 3), ("opacity", 1), ("rotation", 4), ("scale", 3), ("xyz", 3)),
    "sequential": (("xyz", 3), ("scale", 3), ("rotation", 4), ("opacity", 1), ("color", 3)),
    "parallel": (("xyz", 3), ("scale", 3), ("rotation", 4), ("opacity", 1), ("color", 3)),
}


@dataclass(frozen=True)
class GaussianDecoder:
    generator: TriPlaneGenerator
    decoder_type: str = "sequential_reversed"
    hidden_dim: int = 128
    use_xyz_embedding: bool = False
    use_gen_finetune: bool = True
    bf16_sampling: bool = False   # bf16 brick gathers (speed; ~2^-8 feat err)
    int8_sampling: bool = False   # int8 brick gathers with per-channel
    # scales: 256B rows gather ~1.7x faster than bf16 512B rows (row-rate
    # is byte-bound at flagship table sizes); ~2^-7 relative feature err
    pallas_heads: bool = False    # fused VMEM-resident head chain (inference)
    pallas_heads_train: bool = False  # custom-VJP fused chain (training):
    # exact f32 gradients, VMEM-resident fwd AND bwd (pallas_heads_vjp.py)
    gelu: str = "exact"           # 'exact' (torch parity) | 'poly' (1.2e-4
    # max dev, no transcendentals — the exact erf costs 5.5 ms/frame in the
    # fused chain) | 'tanh' (jax.nn.gelu default approximation)
    heads_bf16: bool = False      # bf16 matmuls inside the fused heads
    pallas_sampling: bool = False  # Pallas streaming brick-table build;
    # 'select' = channel-duplicated source variant (lane-aligned masked-
    # select stores instead of 8 lane rotations)
    fused_sampling: bool = False  # move the brick-row dequant+lerp+plane-
    # mean INTO the heads kernel (decode_project only): feeding the opaque
    # pallas_call otherwise forces XLA to materialise the gather->lerp->
    # mean->concat chain (~+8 ms/frame at flagship)
    fused_lerp: str = "dots"      # in-kernel lerp form: 'dots' (MXU
    # expand+segment-sum) | 'bcast' (VPU per-corner broadcasts)
    slab_sampling: bool = False   # slab-gather decode: Morton-pack the
    # STATIC template into slab-fitting blocks once (make_slab_context),
    # then decode each frame with ONE kernel that DMAs raw int8 volume
    # slabs and lerps on the MXU — no brick table, no HBM row gather
    # (decoder/point_blocks.py + pallas_heads.decode_project_pallas_slab)
    pallas_mapping: bool = False  # fused VMEM-resident mapping chain: the
    # 8-FC StyleGAN2 mapping at batch 1 is ~11 tiny sequential XLA ops of
    # pure launch latency (2.45 ms/frame measured); one pallas_call runs
    # the whole chain (models/pallas_mapping.py). bf16 weights — inference
    # decode path only, torch-parity paths keep the XLA mapping
    slab_clip_q: float = 0.0      # percentile int8 scales for the slab
    # volume (build_slab_volume clip_quantile): 0 = absmax (exact range);
    # e.g. 0.9995 clips the outlier tail for ~halved quantization step
    slab_int8_weights: bool = True  # quantize the static (z,y) lerp weight
    # matrix to int8 (x127, dequant folded into the segment matrix): the
    # MXU contraction runs s8 x s8 -> s32 at 2x the bf16 rate with half
    # the weight-stream bytes; +2^-7 relative weight error on features
    # that already carry the int8 volume's 2^-7

    @property
    def _brick_dtype(self):
        if self.int8_sampling:
            if self.generator.triplane_depth > 1:
                return jnp.int8
            # int8 bricks exist only for the tri-grid table; on tri-plane
            # (eg3d, depth 1) generators degrade to bf16 instead of
            # tripping the tri-grid-only assert deep inside jit
            return jnp.bfloat16
        return jnp.bfloat16 if self.bf16_sampling else None

    @property
    def embedder(self) -> Optional[Embedder]:
        return Embedder(include_input=True, input_dims=3, num_freqs=10) if self.use_xyz_embedding else None

    @property
    def position_dim(self) -> int:
        return self.embedder.out_dim if self.use_xyz_embedding else 3

    @property
    def scale_offset(self) -> float:
        return -2.5 if self.decoder_type == "sequential_reversed" else -2.0

    def _heads(self) -> Dict[str, DecoderHead]:
        heads = {}
        extra = 0
        for name, out_dim in _CHAINS[self.decoder_type]:
            cond = self.position_dim + (extra if self.decoder_type != "parallel" else 0)
            heads[name] = DecoderHead(
                n_features=32 + cond, out_features=out_dim,
                hidden_dim=self.hidden_dim, gelu=self.gelu,
            )
            extra += out_dim
        return heads

    def init(self, key, generator_params: Optional[Params] = None) -> Params:
        """Head params (+ the fine-tunable generator copy under 'G')."""
        p: Params = {}
        for i, (name, head) in enumerate(sorted(self._heads().items())):
            p[name] = head.init(jax.random.fold_in(key, i))
        if generator_params is not None:
            p["G"] = generator_params
        return p

    def activate_scale(self, scale):
        return -jax.nn.softplus(scale + 5.0) + self.scale_offset

    # -- per-point decode (planes already synthesised) ------------------------

    def decode_from_planes(self, params: Params, planes: jax.Array, init_position: jax.Array) -> EasyDict:
        """planes (1, 3, C*D, H, W); init_position (M, 3) -> EasyDict of raw
        attrs {xyz, scale, rotation, opacity, color} each (M, dim).

        `scale` is returned ACTIVATED (like the reference forward), the
        others raw — render_simple applies exp/sigmoid/normalize, so the
        activated scale is compensated there via log. See render path.
        """
        g = self.generator
        feats = sample_from_planes(
            g.renderer.plane_axes, planes, init_position[None],
            box_warp=g.rk["box_warp"], triplane_depth=g.triplane_depth,
            brick_dtype=self._brick_dtype,
            pallas_build=self.pallas_sampling if g.triplane_depth > 1 else False,
        )[0]  # (n_planes, M, 32)

        heads = self._heads()
        result = EasyDict()
        cond = self.embedder(init_position) if self.use_xyz_embedding else init_position

        # the fused kernels assume the flagship hidden width (STAGE=128
        # staging lanes); other hidden_dims take the XLA chain
        use_pallas = self.hidden_dim == 128
        if self.pallas_heads_train and use_pallas:
            # custom-VJP fused chain: the XLA heads path round-trips 20
            # hidden activations through HBM in BOTH directions of the
            # train step (~57 ms fwd alone); the Pallas pair keeps them
            # in VMEM (pallas_heads_vjp.py)
            from .pallas_heads_vjp import decode_heads_pallas_diff

            chain_spec = _CHAINS[self.decoder_type]
            packed = decode_heads_pallas_diff(
                {name: params[name] for name, _ in chain_spec},
                chain_spec,
                jnp.mean(feats, axis=0).astype(jnp.float32),
                cond, init_position, self.scale_offset,
                (self.decoder_type == "parallel"), self.gelu, 512, None,
            )
            M = init_position.shape[0]
            result = EasyDict()
            off = 0
            for name, out_dim in chain_spec:
                result[name] = packed[:M, off:off + out_dim]
                off += out_dim
            return result

        if self.pallas_heads and use_pallas:
            from .pallas_heads import decode_heads_pallas

            out = decode_heads_pallas(
                {name: params[name] for name, _ in _CHAINS[self.decoder_type]},
                _CHAINS[self.decoder_type],
                jnp.mean(feats, axis=0).astype(jnp.float32),
                cond, init_position, self.scale_offset,
                parallel=(self.decoder_type == "parallel"),
                compute_dtype=jnp.bfloat16 if self.heads_bf16 else jnp.float32,
                gelu=self.gelu,
            )
            return EasyDict(out)

        if self.decoder_type == "parallel":
            for name, out_dim in _CHAINS["parallel"]:
                v = heads[name].apply(params[name], feats, cond)
                if name == "xyz":
                    v = v * 0.01 + init_position
                elif name == "scale":
                    v = self.activate_scale(v)
                result[name] = v
            return result

        for name, out_dim in _CHAINS[self.decoder_type]:
            v = heads[name].apply(params[name], feats, cond)
            if name == "xyz":
                v = v * 0.01 + init_position
            elif name == "scale":
                v = self.activate_scale(v)
            result[name] = v
            cond = jnp.concatenate([cond, v], axis=-1)
        return result

    # -- full forward (ref sequential_decoder_reverse.py:38-87) ---------------

    def synthesize_planes(self, params: Params, z, gan_camera_params, truncation_psi=1.0):
        """Run the fine-tunable G copy: mapping (+zero-cam convention per
        variant) + synthesis -> feature planes."""
        g = self.generator
        gp = params["G"]
        cam = (gan_camera_params if self.decoder_type == "sequential"
               else jnp.zeros_like(gan_camera_params))
        mn = g.backbone.mapping if hasattr(g, "backbone") else None
        if (self.pallas_mapping and mn is not None
                and mn.activation == "lrelu" and not mn.last_activation
                and mn.num_ws is not None and "w_avg" in gp["backbone"]["mapping"]
                and z.shape[0] <= 8):
            from ..models.pallas_mapping import mapping_forward_pallas

            # TriPlaneGenerator.mapping's c preconditioning (triplane.py
            # :258-267): conditioning-zero + c_scale, applied here so the
            # kernel sees the same c the XLA mapping would
            c_in = jnp.zeros_like(cam) if g.rk["c_gen_conditioning_zero"] else cam
            ws = mapping_forward_pallas(
                mn, gp["backbone"]["mapping"], z,
                c_in * g.rk.get("c_scale", 0.0), truncation_psi)
        else:
            ws = g.mapping(gp, z, cam, truncation_psi=truncation_psi)
        planes = g.synthesis_planes(gp, ws, noise_mode="const")
        return planes, ws

    def apply(self, params: Params, z, gan_camera_params, init_position, truncation_psi=1.0) -> EasyDict:
        planes, _ = self.synthesize_planes(params, z, gan_camera_params, truncation_psi)
        return self.decode_from_planes(params, planes, init_position)

    # -- packed fast path (render hot loop) -----------------------------------

    def decode_packed(self, params: Params, planes, init_position):
        """-> (out16 (Mpad, 16) raw packed head outputs, layout name->(col, dim)).

        Same math as decode_from_planes via the Pallas head chain, but the
        (Mpad, 16) output is NOT sliced into (M, k) attribute arrays — the
        fast rasterizer consumes it channel-major (splat/fast_raster.py
        render_packed). Rows >= M are padding."""
        from .pallas_heads import decode_heads_pallas

        g = self.generator
        feats = sample_from_planes(
            g.renderer.plane_axes, planes, init_position[None],
            box_warp=g.rk["box_warp"], triplane_depth=g.triplane_depth,
            brick_dtype=self._brick_dtype,
            pallas_build=self.pallas_sampling if g.triplane_depth > 1 else False,
        )[0]
        cond = self.embedder(init_position) if self.use_xyz_embedding else init_position
        return decode_heads_pallas(
            {name: params[name] for name, _ in _CHAINS[self.decoder_type]},
            _CHAINS[self.decoder_type],
            jnp.mean(feats, axis=0).astype(jnp.float32),
            cond, init_position, self.scale_offset,
            parallel=(self.decoder_type == "parallel"),
            compute_dtype=jnp.bfloat16 if self.heads_bf16 else jnp.float32,
            return_packed=True,
            gelu=self.gelu,
        )

    def apply_packed(self, params: Params, z, gan_camera_params, init_position, truncation_psi=1.0):
        planes, _ = self.synthesize_planes(params, z, gan_camera_params, truncation_psi)
        return self.decode_packed(params, planes, init_position)

    # -- slab-gather static context (see point_blocks.py) ---------------------

    def make_slab_context(self, init_position, block: int = 1024,
                          cache_dir: Optional[str] = None):
        """One-time (per template) packing for the slab decode path: call
        OUTSIDE jit with a concrete (M, 3) template. Returns an EasyDict of
        device arrays decode_project consumes via slab_ctx=.

        cache_dir persists the HOST packing products (origins + compact
        int16 indices + permuted positions, ~30 MB at flagship) keyed on
        (template bytes, grid dims, block geometry, packer version) —
        honoring the reference's saved-positions contract, where the
        template is fixed per checkpoint (main/load_decoder.py:12-26). The
        device-side weight/staging builds re-run on load; their jit
        compiles hit jax's persistent compilation cache when one is
        configured, so a warm start skips both the greedy pack and the
        tunnel compile."""
        import hashlib
        import os
        import sys
        import time as _time

        import numpy as np

        from .pallas_heads import STAGE, VALID_COL, _build_staging
        from .point_blocks import (
            DZW, PointBlocks, build_point_blocks, build_slab_weights,
            compact_indices)

        g = self.generator
        sizes = (g.triplane_depth, int(g.rk["triplane_size"]),
                 int(g.rk["triplane_size"]))
        # depth-1 (EG3D tri-plane) generators take the BILINEAR variant:
        # 2-D windows, no z-slab (the reference samples them with 2-D
        # grid_sample); ey grows to 128 so the kernel K-tile stays 1x128
        # (clamped to the padded plane height for tiny test grids)
        bilinear = g.triplane_depth == 1
        if bilinear:
            yp = -(-(sizes[1] + 2) // 8) * 8
            dzw, ey = 1, min(128, yp)
        else:
            dzw, ey = DZW, 32
        verbose = bool(os.environ.get("GGD_SLAB_VERBOSE"))

        def _stamp(label, t0, *block_on):
            # stamps measure WORK, not dispatch: block on the stage's
            # actual outputs before reading the clock (the r4 verbose
            # breakdown summed to 1.6 s against a 670 s wall because only
            # wzy was ever blocked on — async dispatch artifacts)
            if verbose:
                for a in block_on:
                    jax.block_until_ready(a)
                print(f"slab ctx: {label} {_time.perf_counter() - t0:.1f}s",
                      file=sys.stderr)
            return _time.perf_counter()

        t_entry = _time.perf_counter()
        pos_np = np.asarray(init_position, np.float32)
        t_entry = _stamp("entry (np.asarray(template) + imports)", t_entry,
                         pos_np)
        cache_path = None
        if cache_dir:
            h = hashlib.sha256()
            h.update(pos_np.tobytes())
            # plane_axes drive build_point_blocks/compact_indices index
            # layout and validity bits — two generators with identical
            # sizes but different axis conventions must not share a pack
            h.update(np.asarray(g.renderer.plane_axes, np.float32).tobytes())
            h.update(repr((sizes, float(g.rk["box_warp"]), block,
                           (dzw, ey, bilinear), "slab_pack_v1")).encode())
            cache_path = os.path.join(cache_dir,
                                      f"slab_pack_{h.hexdigest()[:24]}.npz")
        pb = idx16 = None
        t0 = _time.perf_counter()
        if cache_path and os.path.exists(cache_path):
            z = np.load(cache_path)
            pb = PointBlocks(
                perm=z["perm"], positions=z["positions"],
                origins=z["origins"], idxw=None, valid=z["valid"],
                n_points=int(z["n_points"]), block=int(z["block"]),
                ey=int(z["ey"]), ex=int(z["ex"]))
            idx16 = z["idx16"]
            t0 = _stamp("host pack loaded from cache", t0)
        else:
            pb = build_point_blocks(
                pos_np, g.renderer.plane_axes,
                box_warp=g.rk["box_warp"], sizes=sizes, block=block,
                ey=ey, bilinear=bilinear,
            )
            idx16 = compact_indices(pb, g.renderer.plane_axes,
                                    g.rk["box_warp"], sizes,
                                    bilinear=bilinear)
            t0 = _stamp("host pack built", t0)
            if cache_path:
                os.makedirs(cache_dir, exist_ok=True)
                # np.savez appends .npz when missing — keep the suffix so
                # the atomic-rename source name is what savez wrote
                tmp = cache_path + f".tmp{os.getpid()}.npz"
                np.savez(tmp, perm=pb.perm, positions=pb.positions,
                         origins=pb.origins, valid=pb.valid, idx16=idx16,
                         n_points=pb.n_points, block=pb.block,
                         ey=pb.ey, ex=pb.ex)
                os.replace(tmp, cache_path)
                t0 = _stamp("host pack saved", t0)
        if pb.m_padded > 2 * pb.n_points:
            print(f"WARNING: slab packing {pb.m_padded / pb.n_points:.1f}x "
                  f"padded ({pb.n_blocks} blocks for {pb.n_points} points) — "
                  "template density too low for the slab windows; the "
                  "brick-table path is likely faster", file=sys.stderr)
        build_fn = build_slab_weights(
            pb, g.renderer.plane_axes, g.rk["box_warp"], sizes, idx16=idx16,
            dzw=dzw, bilinear=bilinear, as_fn=True)
        positions = jnp.asarray(pb.positions)
        chain_spec = _CHAINS[self.decoder_type]
        dtype = jnp.bfloat16 if self.heads_bf16 else jnp.float32

        # ONE jit for the whole device side (weight build + int8 quant +
        # cond + staging): each separate jit costs a tunnel compile
        # (minutes on a cold cache), and eager op-by-op dispatch on the
        # ~200-430 MB wzy drags the warm start through per-op round trips
        @jax.jit
        def _device_build(origins, idx16_d, positions, valid):
            w, axs = build_fn(origins, idx16_d, positions)
            if self.slab_int8_weights:
                w = jnp.clip(jnp.round(w.astype(jnp.float32) * 127.0),
                             -127, 127).astype(jnp.int8)
            cond = (self.embedder(positions) if self.use_xyz_embedding
                    else positions)
            aux, _ = _build_staging(
                jnp.zeros((pb.m_padded, 32), jnp.float32), cond, positions,
                chain_spec, pb.block, dtype)
            aux = aux.at[:, VALID_COL].set(valid.astype(dtype))
            return w, axs, aux

        wzy, axs, aux = _device_build(
            jnp.asarray(pb.origins), jnp.asarray(idx16), positions,
            jnp.asarray(pb.valid))
        t0 = _stamp("device build (ONE jit: weights + quant + staging)", t0,
                    wzy, axs, aux)
        # inv_slot[original point index] = packed slot index: unpermutes
        # slab-path outputs back to template order (rows[:, inv_slot])
        inv_slot = np.zeros(pb.n_points, np.int32)
        inv_slot[pb.perm] = np.where(pb.valid > 0)[0]
        origins_d = jnp.asarray(pb.origins)
        valid_d = jnp.asarray(pb.valid)
        inv_slot_d = jnp.asarray(inv_slot)
        _stamp("tail (inv_slot + small staging transfers)", t0,
               origins_d, valid_d, inv_slot_d)
        return EasyDict(
            origins=origins_d, wzy=wzy, axs=axs, aux=aux,
            positions=positions, perm=pb.perm, valid=valid_d,
            inv_slot=inv_slot_d,
            n_points=pb.n_points, block=pb.block, ey=pb.ey, ex=pb.ex,
            dzw=dzw, cond_dim=self.position_dim, m_padded=pb.m_padded,
        )

    def decode_project(self, params: Params, planes, init_position, cam,
                       slab_ctx=None):
        """Fused heads + EWA projection -> (rows (NROWS, Mpad), layout).

        Channel-major: rows[0:16] raw head outputs, rows[16:28] the
        screen-space quantities (splat/fast_raster.py render_rows).

        slab_ctx (make_slab_context output) switches to the slab-gather
        kernel; rows are then in the ctx's PERMUTED/padded point order
        (irrelevant to the rasterizer — it depth-sorts; pad slots carry
        visible=0)."""
        from .pallas_heads import decode_project_pallas

        g = self.generator
        if slab_ctx is not None:
            from ..neuralfield.renderer import build_slab_volume
            from .pallas_heads import decode_project_pallas_slab

            vol, scales = build_slab_volume(planes, g.triplane_depth,
                                            clip_quantile=self.slab_clip_q)
            return decode_project_pallas_slab(
                {name: params[name] for name, _ in _CHAINS[self.decoder_type]},
                _CHAINS[self.decoder_type],
                slab_ctx.origins, slab_ctx.wzy, slab_ctx.axs, slab_ctx.aux,
                vol, scales, self.scale_offset,
                cam=cam, P=slab_ctx.cond_dim,
                ey=slab_ctx.ey, ex=slab_ctx.ex, dzw=slab_ctx.dzw,
                parallel=(self.decoder_type == "parallel"),
                compute_dtype=jnp.bfloat16 if self.heads_bf16 else jnp.float32,
                block=slab_ctx.block,
                gelu=self.gelu,
            )
        if self.fused_sampling:
            from ..neuralfield.renderer import sample_fused_inputs
            from .pallas_heads import decode_project_pallas_fused

            M = init_position.shape[0]
            block = 1024
            Mpad = -(-M // block) * block
            rows, wts, smats, K = sample_fused_inputs(
                g.renderer.plane_axes, planes, init_position[None],
                box_warp=g.rk["box_warp"], triplane_depth=g.triplane_depth,
                brick_dtype=self._brick_dtype,
                pallas_build=self.pallas_sampling if g.triplane_depth > 1 else False,
                pad_to=Mpad,
            )
            cond = (self.embedder(init_position) if self.use_xyz_embedding
                    else init_position)
            return decode_project_pallas_fused(
                {name: params[name] for name, _ in _CHAINS[self.decoder_type]},
                _CHAINS[self.decoder_type],
                rows, wts, smats, K,
                cond, init_position, self.scale_offset,
                cam=cam, n_points=M,
                parallel=(self.decoder_type == "parallel"),
                compute_dtype=jnp.bfloat16 if self.heads_bf16 else jnp.float32,
                block=block,
                gelu=self.gelu,
                lerp_mode=self.fused_lerp,
            )
        feats = sample_from_planes(
            g.renderer.plane_axes, planes, init_position[None],
            box_warp=g.rk["box_warp"], triplane_depth=g.triplane_depth,
            brick_dtype=self._brick_dtype,
            pallas_build=self.pallas_sampling if g.triplane_depth > 1 else False,
        )[0]
        cond = self.embedder(init_position) if self.use_xyz_embedding else init_position
        return decode_project_pallas(
            {name: params[name] for name, _ in _CHAINS[self.decoder_type]},
            _CHAINS[self.decoder_type],
            jnp.mean(feats, axis=0).astype(jnp.float32),
            cond, init_position, self.scale_offset,
            cam=cam, n_points=init_position.shape[0],
            parallel=(self.decoder_type == "parallel"),
            compute_dtype=jnp.bfloat16 if self.heads_bf16 else jnp.float32,
            gelu=self.gelu,
        )

    def apply_project(self, params: Params, z, gan_camera_params, init_position, cam, truncation_psi=1.0):
        planes, _ = self.synthesize_planes(params, z, gan_camera_params, truncation_psi)
        return self.decode_project(params, planes, init_position, cam)

    def trainable_filter(self, path: Tuple, _leaf) -> bool:
        """optax mask: heads always train; 'G' only with use_gen_finetune
        (ref get_params_custom, sequential_decoder_reverse.py:89-99)."""
        if path and getattr(path[0], "key", None) == "G":
            return self.use_gen_finetune
        return True
