"""Fused Pallas mapping-network kernel (TPU inference fast path).

The StyleGAN2 MappingNetwork (ref networks_stylegan2.py:193-275) at batch 1
is pure launch latency on TPU: ~11 tiny sequential XLA ops (2nd-moment
normalize, c embed + normalize, 8 chained 512x512 FCs, truncation lerp)
measured 2.45 ms/frame in the flagship decode stream — the FLOPs are ~4
MFLOP, microseconds of MXU time. This kernel runs the whole chain in one
pallas_call with every weight resident in VMEM (~5 MB bf16).

Numerics: bf16 weights / f32 accumulators — same policy as the rest of the
flagship inference path (the fused heads kernel); parity vs the XLA
mapping is ~1e-2 relative, fine for the random-weight benchmark and
flag-gated OFF everywhere torch parity matters.

Used by GaussianDecoder.synthesize_planes when `pallas_mapping=True`
(decode path only; the GAN training path keeps the XLA mapping).
"""
from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# batch rows the kernel is padded to (MXU sublane granularity)
_BPAD = 8


def _mapping_kernel(z_ref, c_ref, psi_ref,
                    we_ref, be_ref, w0_ref, b0_ref, wr_ref, br_ref,
                    wavg_ref, out_ref, *, n_rest: int, has_embed: bool,
                    eps: float = 1e-8):
    f32 = jnp.float32
    x = z_ref[...].astype(f32)                       # (B, z_dim)
    x = x * jax.lax.rsqrt(jnp.mean(x * x, axis=1, keepdims=True) + eps)
    if has_embed:
        c = c_ref[...].astype(f32)                   # (B, Cpad)
        y = jnp.dot(c.astype(jnp.bfloat16), we_ref[...],
                    preferred_element_type=f32) + be_ref[...].astype(f32)
        y = y * jax.lax.rsqrt(jnp.mean(y * y, axis=1, keepdims=True) + eps)
        x = jnp.concatenate([x, y], axis=1)

    def lrelu(v):
        return (jnp.maximum(v, 0.0) + 0.2 * jnp.minimum(v, 0.0)) * math.sqrt(2.0)

    x = lrelu(jnp.dot(x.astype(jnp.bfloat16), w0_ref[...],
                      preferred_element_type=f32) + b0_ref[...].astype(f32))
    for k in range(n_rest):
        x = lrelu(jnp.dot(x.astype(jnp.bfloat16), wr_ref[k],
                          preferred_element_type=f32)
                  + br_ref[k].astype(f32))
    w_avg = wavg_ref[...].astype(f32)
    psi = psi_ref[0, 0]
    out_ref[...] = w_avg + (x - w_avg) * psi


def mapping_forward_pallas(
    mn,                       # MappingNetwork (static config)
    params,
    z: jax.Array,             # (B, z_dim), B <= 8
    c: Optional[jax.Array],   # (B, c_dim) or None
    truncation_psi=1.0,
    interpret: bool | None = None,
) -> jax.Array:
    """Fused replacement for MappingNetwork.apply on the inference decode
    path: -> (B, num_ws, w_dim). Requires lrelu activations throughout, a
    w_avg buffer, and truncation_cutoff=None (the flagship mapping call).

    The bf16 weight casts/scales trace as ops on `params` only, so inside
    a frame fori_loop XLA hoists them out of the loop."""
    if interpret is None:  # CPU (tests / dry runs): no Mosaic — interpret
        interpret = jax.default_backend() == "cpu"
    assert mn.activation == "lrelu" and not mn.last_activation
    assert mn.num_ws is not None and "w_avg" in params
    B = z.shape[0]
    assert B <= _BPAD, B
    embed_dim, feats = mn._features()
    n_layers = mn.num_layers
    lg = mn.lr_multiplier

    def fold_fc(p, in_f):
        # FullyConnectedLayer folds lr_mult into the weight gain and bias
        # (stylegan2.py:70-79); fold here so the kernel is a plain chain
        w = (p["weight"].astype(jnp.float32) * (lg / math.sqrt(in_f))).T
        b = p["bias"].astype(jnp.float32) * lg
        return w.astype(jnp.bfloat16), b[None]

    has_embed = mn.c_dim > 0
    cpad = 128
    if has_embed:
        assert mn.c_dim <= cpad
        ep = params["embed"]
        we = (ep["weight"].astype(jnp.float32)
              / math.sqrt(mn.c_dim)).T            # embed: lr_mult 1
        we = jnp.pad(we, ((0, cpad - mn.c_dim), (0, 0))).astype(jnp.bfloat16)
        be = ep["bias"].astype(jnp.float32)[None]
        cin = jnp.pad(c.astype(jnp.float32),
                      ((0, _BPAD - B), (0, cpad - mn.c_dim)))
    else:
        we = jnp.zeros((cpad, mn.w_dim), jnp.bfloat16)
        be = jnp.zeros((1, mn.w_dim), jnp.float32)
        cin = jnp.zeros((_BPAD, cpad), jnp.float32)

    w0, b0 = fold_fc(params["fc0"], feats[0])
    rest_w, rest_b = [], []
    for idx in range(1, n_layers):
        w, b = fold_fc(params[f"fc{idx}"], feats[idx])
        rest_w.append(w)
        rest_b.append(b)
    wr = jnp.stack(rest_w)                         # (L-1, F, F)
    br = jnp.stack(rest_b)                         # (L-1, 1, F)

    zin = jnp.pad(z.astype(jnp.float32), ((0, _BPAD - B), (0, 0)))
    psi = jnp.asarray(truncation_psi, jnp.float32).reshape(1, 1)

    out = pl.pallas_call(
        functools.partial(_mapping_kernel, n_rest=n_layers - 1,
                          has_embed=has_embed),
        out_shape=jax.ShapeDtypeStruct((_BPAD, mn.w_dim), jnp.float32),
        interpret=interpret,
    )(zin, cin, psi, we, be, w0, b0, wr, br,
      params["w_avg"].astype(jnp.float32)[None])
    ws = out[:B]
    return jnp.repeat(ws[:, None, :], mn.num_ws, axis=1)
