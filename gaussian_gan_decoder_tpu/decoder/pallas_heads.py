"""Pallas TPU kernel: the 5 chained Gaussian-decoder MLP heads, fused.

The XLA path (decoder/heads.py) materialises every hidden activation of
every head in HBM — 20 layers x (500k, 128) f32 = ~5 GB of round-trip
traffic per frame, measured at ~57 ms. This kernel keeps the whole chain
in VMEM: one (BLOCK, 128) staging tile per grid step, all head weights
resident (~1 MB), 20 MXU matmuls back-to-back, one (BLOCK, 16) result
write. HBM traffic drops to read-input + write-output (~70 MB).

Semantics match decoder/heads.py exactly (ref main/decoder_models/
base_decoder.py:8-27 + sequential_decoder_reverse.py:38-87):

  * head h input = [mean-plane-feats(32) ⊕ pos-cond ⊕ prior outputs] —
    a CONTIGUOUS PREFIX of the staging layout, so padded first-layer
    weights make every head the same (128->128) matmul;
  * chain conditioning uses the TRANSFORMED outputs (scale activated,
    xyz shifted) exactly like the reference forward;
  * GELU variant is selectable: exact erf (torch parity, default),
    polynomial (flagship fast path), or tanh approximation.

Staging column layout (128 lanes):
  [0:32)   mean plane features
  [32:32+P) position conditioning (P = 3 raw xyz or 63 embedded)
  [..:..+14) chain outputs, in chain order
  [120:123) raw init_position (read by the xyz transform)
"""
from __future__ import annotations

import functools
import os as _os
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

STAGE = 128      # staging width (lanes)
OUT_W = 16       # padded output width
INIT_COL = 120   # raw init_position stash


def _erf(x):
    """f32 erf — Abramowitz & Stegun 7.1.26 (max abs err 1.5e-7).

    Mosaic has no erf lowering; this matches jax.lax.erf well past the
    bf16/f32-parity tolerances used in tests.
    """
    s = jnp.sign(x)
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
           + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * jnp.exp(-a * a))


def _gelu_exact(x):
    # torch.nn.GELU default: x * 0.5 * (1 + erf(x / sqrt(2)))
    xf = x.astype(jnp.float32)
    return (xf * 0.5 * (1.0 + _erf(xf * (2.0 ** -0.5)))).astype(x.dtype)


def _gelu_tanh(x):
    """tanh-approximate GELU (jax.nn.gelu approximate=True; max abs dev
    from exact ~3e-4). ~2x fewer VPU ops than the A&S erf path — the
    GELU, not the MXU, dominates the fused chain (a bare 20-dot chain
    measures 96 TFLOP/s; the full kernel with exact GELU only 32)."""
    xf = x.astype(jnp.float32)
    u = 0.7978845608028654 * (xf + 0.044715 * xf * xf * xf)
    e = jnp.exp(-2.0 * jnp.abs(u))
    t = (1.0 - e) / (1.0 + e)          # tanh(|u|)
    return (0.5 * xf * (1.0 + jnp.sign(u) * t)).astype(x.dtype)


_GELU_POLY = (  # h(u) coeffs, GELU(x) = x/2 + h(x^2), |x| <= 4.5
    2.83848659e-05, 3.98631713e-01, -6.59243150e-02, 9.56686907e-03,
    -1.03506464e-03, 8.13021533e-05, -4.45819445e-06, 1.60138706e-07,
    -3.35935034e-09, 3.10310371e-11,
)


def gelu_poly(x):
    """Polynomial GELU: GELU(x) - x/2 is EVEN, so fit deg-9 in u = x^2 on
    [-4.5, 4.5] + linear/zero tails. Max abs err 1.2e-4 (beats the tanh
    approximation's 3e-4) with ZERO transcendentals/divides — the exact
    erf GELU costs 5.5 ms/frame of VPU time inside the fused chain."""
    xf = x.astype(jnp.float32)
    u = xf * xf
    acc = jnp.full_like(xf, _GELU_POLY[-1])
    for c in _GELU_POLY[-2::-1]:
        acc = acc * u + c
    y = 0.5 * xf + acc
    y = jnp.where(xf > 4.5, xf, jnp.where(xf < -4.5, 0.0, y))
    return y.astype(x.dtype)


_GELU_POLY6 = (  # minimax-ish deg-6 fit of h(u), max abs err 1.8e-3
    1.78927555e-03, 3.88399878e-01, -5.61855200e-02, 5.99722169e-03,
    -3.76970754e-04, 1.25452394e-05, -1.69796236e-07,
)


def gelu_poly6(x):
    """Coarser polynomial GELU (max abs err 1.8e-3 vs poly's 1.2e-4): 3
    fewer Horner steps x 15 GELUs/block on the VPU-bound chain. Intended
    for the int8-feature path, whose 2^-7 quantization floor (~8e-3)
    already dominates this approximation error."""
    xf = x.astype(jnp.float32)
    u = xf * xf
    acc = jnp.full_like(xf, _GELU_POLY6[-1])
    for c in _GELU_POLY6[-2::-1]:
        acc = acc * u + c
    y = 0.5 * xf + acc
    y = jnp.where(xf > 4.5, xf, jnp.where(xf < -4.5, 0.0, y))
    return y.astype(x.dtype)


_GELUS = {"exact": _gelu_exact, "tanh": _gelu_tanh, "poly": gelu_poly,
          "poly6": gelu_poly6, "none": lambda x: x}


def _heads_kernel(
    stage_in,    # (BLK, 128) staging input
    w1, b1, w2, b2, w3, b3, w4, b4,   # packed weights (5, ...)
    out_ref,     # (BLK, 16)
    x_ref,       # scratch (BLK, 128) staging copy
    *,
    chain: Tuple[Tuple[str, int, int, int], ...],  # (name, out_dim, stage_col, out_col)
    scale_offset: float,
    compute_dtype,
    gelu,
):
    x_ref[:] = stage_in[:]
    init = stage_in[:, INIT_COL:INIT_COL + 3].astype(jnp.float32)

    for h, (name, out_dim, stage_col, out_col) in enumerate(chain):
        x = x_ref[:].astype(compute_dtype)
        a = jnp.dot(x, w1[h], preferred_element_type=jnp.float32) + b1[h].astype(jnp.float32)
        a = gelu(a).astype(compute_dtype)
        a = jnp.dot(a, w2[h], preferred_element_type=jnp.float32) + b2[h].astype(jnp.float32)
        a = gelu(a).astype(compute_dtype)
        a = jnp.dot(a, w3[h], preferred_element_type=jnp.float32) + b3[h].astype(jnp.float32)
        a = gelu(a).astype(compute_dtype)
        o = jnp.dot(a, w4[h], preferred_element_type=jnp.float32) + b4[h].astype(jnp.float32)
        # per-attribute transform (both the chain cond and the result use it)
        if name == "scale":
            o = -jax.nn.softplus(o + 5.0) + scale_offset
        elif name == "xyz":
            o = o * 0.01
            col = jax.lax.broadcasted_iota(jnp.int32, o.shape, 1)
            init_w = jnp.concatenate(
                [init, jnp.zeros((init.shape[0], o.shape[1] - 3), jnp.float32)],
                axis=1,
            )
            o = o + jnp.where(col < 3, init_w, 0.0)
        t = o.astype(stage_in.dtype)
        if stage_col + out_dim <= STAGE:
            x_ref[:, stage_col:stage_col + out_dim] = t[:, :out_dim]
        out_ref[:, out_col:out_col + out_dim] = o[:, :out_dim].astype(out_ref.dtype)


def _pack_chain(head_params, chain_spec, P, parallel, compute_dtype):
    """-> (weights 8-tuple, chain list, layout dict)."""
    n_heads = len(chain_spec)
    w1 = jnp.zeros((n_heads, STAGE, STAGE), jnp.float32)
    b1 = jnp.zeros((n_heads, 1, STAGE), jnp.float32)
    w2 = jnp.zeros((n_heads, STAGE, STAGE), jnp.float32)
    b2 = jnp.zeros((n_heads, 1, STAGE), jnp.float32)
    w3 = jnp.zeros((n_heads, STAGE, STAGE), jnp.float32)
    b3 = jnp.zeros((n_heads, 1, STAGE), jnp.float32)
    w4 = jnp.zeros((n_heads, STAGE, OUT_W), jnp.float32)
    b4 = jnp.zeros((n_heads, 1, OUT_W), jnp.float32)

    chain = []
    layout = {}
    stage_col = 32 + P
    out_col = 0
    for h, (name, out_dim) in enumerate(chain_spec):
        hp = head_params[name]
        tw1 = hp["fc0"]["weight"].T  # (n_in, 128)
        n_in = tw1.shape[0]
        w1 = w1.at[h, :n_in, :].set(tw1)
        b1 = b1.at[h, 0].set(hp["fc0"]["bias"])
        w2 = w2.at[h].set(hp["fc1"]["weight"].T)
        b2 = b2.at[h, 0].set(hp["fc1"]["bias"])
        w3 = w3.at[h].set(hp["fc2"]["weight"].T)
        b3 = b3.at[h, 0].set(hp["fc2"]["bias"])
        w4 = w4.at[h, :, :out_dim].set(hp["fc3"]["weight"].T)
        b4 = b4.at[h, 0, :out_dim].set(hp["fc3"]["bias"])
        # parallel decoder: chain outputs stay OUT of the staging prefix
        chain.append((name, out_dim, STAGE if parallel else stage_col, out_col))
        layout[name] = (out_col, out_dim)
        stage_col += out_dim
        out_col += out_dim

    w1, w2, w3, w4 = (w.astype(compute_dtype) for w in (w1, w2, w3, w4))
    return (w1, b1, w2, b2, w3, b3, w4, b4), chain, layout


def _build_staging(feats_mean, cond0, init_position, chain_spec, block,
                   compute_dtype):
    M = feats_mean.shape[0]
    P = cond0.shape[1]
    pad_mid = INIT_COL - 32 - P - sum(d for _, d in chain_spec)
    staging = jnp.concatenate(
        [
            feats_mean.astype(jnp.float32),
            cond0.astype(jnp.float32),
            jnp.zeros((M, pad_mid + sum(d for _, d in chain_spec)), jnp.float32),
            init_position.astype(jnp.float32),
            jnp.zeros((M, STAGE - INIT_COL - 3), jnp.float32),
        ],
        axis=1,
    ).astype(compute_dtype)
    Mpad = ((M + block - 1) // block) * block
    if Mpad != M:
        staging = jnp.pad(staging, ((0, Mpad - M), (0, 0)))
    return staging, Mpad


def decode_heads_pallas(
    head_params: Dict[str, Dict],      # name -> {'fc0'..'fc3': {'weight','bias'}}
    chain_spec: Sequence[Tuple[str, int]],  # ordered (name, out_dim)
    feats_mean: jax.Array,             # (M, 32)
    cond0: jax.Array,                  # (M, P) position conditioning
    init_position: jax.Array,          # (M, 3)
    scale_offset: float,
    parallel: bool = False,
    compute_dtype=jnp.float32,
    block: int = 1024,
    interpret: bool | None = None,
    return_packed: bool = False,
    gelu: str = "exact",
) -> Dict[str, jax.Array]:
    """Fused forward of all 5 heads -> {name: (M, out_dim) f32}.

    `parallel=True` reproduces the ParallelDecoder (heads see only
    feats ⊕ cond0; chain outputs never enter the staging prefix).
    """
    M, F = feats_mean.shape
    P = cond0.shape[1]
    assert F == 32 and 32 + P + sum(d for _, d in chain_spec) <= INIT_COL
    if interpret is None:  # CPU (tests / dry runs): no Mosaic — interpret
        # GGD_PALLAS_INTERPRET=1: interpret mode on ANY backend — the
        # kernel lowers through plain XLA instead of Mosaic (slow; a
        # numerics-attribution tool, see PERFORMANCE.md r5 quality table)
        interpret = (jax.default_backend() == "cpu"
                     or bool(_os.environ.get("GGD_PALLAS_INTERPRET")))

    (w1, b1, w2, b2, w3, b3, w4, b4), chain, _layout = _pack_chain(
        head_params, chain_spec, P, parallel, compute_dtype)
    staging, Mpad = _build_staging(
        feats_mean, cond0, init_position, chain_spec, block, compute_dtype)

    out = pl.pallas_call(
        functools.partial(
            _heads_kernel,
            chain=tuple(chain),
            scale_offset=scale_offset,
            compute_dtype=compute_dtype,
            gelu=_GELUS[gelu],
        ),
        grid=(Mpad // block,),
        in_specs=[
            pl.BlockSpec((block, STAGE), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 8,
        out_specs=pl.BlockSpec((block, OUT_W), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mpad, OUT_W), jnp.float32),
        scratch_shapes=[pltpu.VMEM((block, STAGE), compute_dtype)],
        interpret=interpret,
    )(staging, w1, b1, w2, b2, w3, b3, w4, b4)

    if return_packed:
        # (Mpad, 16) packed output + column layout — the render fast path
        # transposes this ONCE and never touches (N, small-k) arrays
        return out, dict(_layout)

    result = {}
    off = 0
    for name, out_dim in chain_spec:
        result[name] = out[:M, off:off + out_dim]
        off += out_dim
    return result


# ---------------------------------------------------------------------------
# v2: heads chain + EWA projection fused, channel-major output
# ---------------------------------------------------------------------------

# output row layout of decode_project_pallas: rows [0:16) = raw packed head
# outputs (same column order as decode_heads_pallas); then projection rows
PROJ_ROWS = {
    "px": 16, "py": 17, "conic_a": 18, "conic_b": 19, "conic_c": 20,
    "opac": 21, "col_r": 22, "col_g": 23, "col_b": 24,
    "depth": 25, "radius_f": 26, "visible": 27,
}
NROWS = 32


class _KernelCam:
    """Duck-typed stand-in for gaussians.cameras.Camera inside the kernel:
    project_channels only touches these six attributes, and its math is
    shape-generic, so the (1, BLK) row vectors flow through unchanged."""

    def __init__(self, wv, pj, tanx, tany, w, h):
        self.world_view_transform = wv
        self.full_proj_transform = pj
        self.tanfovx = tanx
        self.tanfovy = tany
        self.image_width = w
        self.image_height = h


def _chain_project_body(
    x_ref, o16_ref, out_ref,
    w1, b1, w2, b2, w3, b3, w4, b4,
    wv_ref, pj_ref, consts_ref,
    *,
    chain, scale_offset, compute_dtype, gelu,
    image_w: int, image_h: int, block: int, layout, interleave: int,
):
    """Shared kernel tail: run the 5-head chain over the staging in x_ref,
    then the EWA projection on the channel-major outputs. x_ref must hold
    the full staging block (fm ⊕ cond ⊕ chain-zeros ⊕ init)."""
    from ..splat.projection import project_channels

    # interleave G independent row-chunks through the chain: the MXU dots
    # of one chunk overlap the VPU tail (bias+GELU+transforms+narrow column
    # stores) of the others — the chain's dots alone run at ~83 TFLOP/s
    # (microbench_mxu_ilp) but the fused body measured ~3x that time
    # because VPU and MXU work of a single serial chain can't overlap.
    G = interleave
    S = block // G
    sl = [slice(g * S, (g + 1) * S) for g in range(G)]
    init = [x_ref[s, INIT_COL:INIT_COL + 3].astype(jnp.float32) for s in sl]

    for h, (name, out_dim, stage_col, out_col) in enumerate(chain):
        x = [x_ref[s].astype(compute_dtype) for s in sl]
        a = [jnp.dot(xg, w1[h], preferred_element_type=jnp.float32)
             + b1[h].astype(jnp.float32) for xg in x]
        a = [gelu(ag).astype(compute_dtype) for ag in a]
        a = [jnp.dot(ag, w2[h], preferred_element_type=jnp.float32)
             + b2[h].astype(jnp.float32) for ag in a]
        a = [gelu(ag).astype(compute_dtype) for ag in a]
        a = [jnp.dot(ag, w3[h], preferred_element_type=jnp.float32)
             + b3[h].astype(jnp.float32) for ag in a]
        a = [gelu(ag).astype(compute_dtype) for ag in a]
        o = [jnp.dot(ag, w4[h], preferred_element_type=jnp.float32)
             + b4[h].astype(jnp.float32) for ag in a]
        if name == "scale":
            o = [-jax.nn.softplus(og + 5.0) + scale_offset for og in o]
        elif name == "xyz":
            col = jax.lax.broadcasted_iota(jnp.int32, o[0].shape, 1)
            o = [og * 0.01 + jnp.where(
                col < 3,
                jnp.concatenate(
                    [ig, jnp.zeros((ig.shape[0], og.shape[1] - 3), jnp.float32)],
                    axis=1),
                0.0) for og, ig in zip(o, init)]
        for g in range(G):
            t = o[g].astype(x_ref.dtype)
            if stage_col + out_dim <= STAGE:
                x_ref[sl[g], stage_col:stage_col + out_dim] = t[:, :out_dim]
            o16_ref[sl[g], out_col:out_col + out_dim] = o[g][:, :out_dim]

    # ONE in-VMEM transpose -> every per-point quantity becomes a clean
    # (1, BLK) lane-vector; EWA projection runs here instead of as an XLA
    # stage over lane-padded HBM arrays
    oT = jnp.transpose(o16_ref[:])            # (16, BLK)
    out_ref[0:16, :] = oT

    def row(c):
        return oT[c:c + 1, :]

    x0, _ = layout["xyz"]
    r0, _ = layout["rotation"]
    s0, _ = layout["scale"]
    c0, _ = layout["color"]
    op0, _ = layout["opacity"]

    cam = _KernelCam(wv_ref, pj_ref, consts_ref[0, 0], consts_ref[0, 1],
                     image_w, image_h)
    ch = project_channels(
        cam, row(x0), row(x0 + 1), row(x0 + 2),
        (row(r0), row(r0 + 1), row(r0 + 2), row(r0 + 3)),
        (jnp.exp(row(s0)), jnp.exp(row(s0 + 1)), jnp.exp(row(s0 + 2))),
    )
    i = pl.program_id(0)
    gcol = jax.lax.broadcasted_iota(jnp.int32, (1, block), 1) + i * block
    n_points = consts_ref[0, 2].astype(jnp.int32)
    visible = ch["visible"] & (gcol < n_points)

    sh_c0 = consts_ref[0, 3]
    out_ref[PROJ_ROWS["px"], :] = ch["px"][0]
    out_ref[PROJ_ROWS["py"], :] = ch["py"][0]
    out_ref[PROJ_ROWS["conic_a"], :] = ch["conic_a"][0]
    out_ref[PROJ_ROWS["conic_b"], :] = ch["conic_b"][0]
    out_ref[PROJ_ROWS["conic_c"], :] = ch["conic_c"][0]
    out_ref[PROJ_ROWS["opac"], :] = jax.nn.sigmoid(row(op0))[0]
    for k in range(3):
        out_ref[PROJ_ROWS["col_r"] + k, :] = jnp.maximum(
            sh_c0 * row(c0 + k) + 0.5, 0.0)[0]
    out_ref[PROJ_ROWS["depth"], :] = ch["depth"][0]
    out_ref[PROJ_ROWS["radius_f"], :] = ch["radius_f"][0]
    out_ref[PROJ_ROWS["visible"], :] = jnp.where(visible, 1.0, 0.0)[0]
    for r in range(max(PROJ_ROWS.values()) + 1, NROWS):
        out_ref[r, :] = jnp.zeros((block,), jnp.float32)


def _heads_project_kernel(
    stage_in,    # (BLK, 128) staging input
    w1, b1, w2, b2, w3, b3, w4, b4,   # packed weights (5, ...)
    wv_ref,      # (4, 4) world_view_transform (row-vector convention)
    pj_ref,      # (4, 4) full_proj_transform
    consts_ref,  # (1, 8): tanfovx, tanfovy, n_points, sh_c0, pad...
    out_ref,     # (NROWS, BLK) channel-major
    x_ref,       # scratch (BLK, 128) staging copy
    o16_ref,     # scratch (BLK, 16) f32 raw outputs
    **kw,
):
    x_ref[:] = stage_in[:]
    _chain_project_body(
        x_ref, o16_ref, out_ref, w1, b1, w2, b2, w3, b3, w4, b4,
        wv_ref, pj_ref, consts_ref, **kw)


def _sample_heads_project_kernel(
    aux_in,      # (BLK, 128) staging with the fm columns ZERO
    rows0, rows1, rows2,   # (BLK, K*C) per-plane brick-row takes
    wts_ref,     # (WR, BLK) f32 channel-major corner weights
    smats_ref,   # (n_planes, K*C, C) f32 dequant/mean-folded segment mats
    w1, b1, w2, b2, w3, b3, w4, b4,
    wv_ref, pj_ref, consts_ref,
    out_ref, x_ref, o16_ref,
    *,
    K: int, C: int, lerp_mode: str = "dots",
    **kw,
):
    """Gather-fused variant: reconstruct fm = mean-over-planes trilinear
    sample IN VMEM from the raw brick rows, then run the shared chain+
    projection tail.

    lerp_mode:
      'dots'  — two MXU dots per plane: wrow = w8 @ E expands the K
                per-point weights to the K*C lane groups, then
                (rows * wrow) @ smat segment-sums corners with the dequant
                scale folded in (bf16 operands, f32 accumulate);
      'bcast' — K (BLK, C) broadcast-multiplies per plane (C=32 of 128
                lanes -> 4x VPU lane waste, but no MXU round trips)."""
    block = kw["block"]
    x_ref[:] = aux_in[:]
    wT = jnp.transpose(wts_ref[:])            # (BLK, WR) f32
    acc = jnp.zeros((block, C), jnp.float32)
    if lerp_mode == "dots":
        # corner -> lane-group expander E[c, c*C+j] = 1 (built from iota;
        # a (K, K*C) constant — cheaper than another operand DMA). bf16:
        # int8 rows are exact in bf16; weight products round at 2^-8,
        # inside the int8 table's 2^-7 error budget.
        lane_g = jax.lax.broadcasted_iota(jnp.int32, (K, K * C), 1) // C
        row_g = jax.lax.broadcasted_iota(jnp.int32, (K, K * C), 0)
        expander = (lane_g == row_g).astype(jnp.bfloat16)
        for p, r_ref in enumerate((rows0, rows1, rows2)):
            w8 = wT[:, p * K:(p + 1) * K].astype(jnp.bfloat16)
            # Mosaic requires 32-bit matmul accumulators — accumulate f32,
            # round once to bf16 for the product
            wrow = jnp.dot(w8, expander,
                           preferred_element_type=jnp.float32
                           ).astype(jnp.bfloat16)
            prod = r_ref[:].astype(jnp.bfloat16) * wrow
            acc = acc + jnp.dot(prod, smats_ref[p].astype(jnp.bfloat16),
                                preferred_element_type=jnp.float32)
    else:
        for p, r_ref in enumerate((rows0, rows1, rows2)):
            r = r_ref[:]
            accp = jnp.zeros((block, C), jnp.float32)
            for c in range(K):
                w = wT[:, p * K + c:p * K + c + 1]          # (BLK, 1) f32
                accp = accp + r[:, c * C:(c + 1) * C].astype(jnp.float32) * w
            # per-channel scale recovered from the segment matrix:
            # column sums are K * scale[p, j] / n_planes
            scale_row = jnp.sum(smats_ref[p], axis=0, keepdims=True) / K
            acc = acc + accp * scale_row
    x_ref[:, 0:C] = acc.astype(x_ref.dtype)
    _chain_project_body(
        x_ref, o16_ref, out_ref, w1, b1, w2, b2, w3, b3, w4, b4,
        wv_ref, pj_ref, consts_ref, **kw)


def decode_project_pallas(
    head_params, chain_spec, feats_mean, cond0, init_position, scale_offset,
    cam,                         # gaussians.cameras.Camera
    n_points: int,
    parallel: bool = False,
    compute_dtype=jnp.float32,
    block: int = 1024,
    interpret: bool | None = None,
    gelu: str = "exact",
    interleave: int = 1,
):
    """Fused heads + projection -> (rows (NROWS, Mpad) f32, layout).

    rows[0:16] are the raw packed head outputs TRANSPOSED (channel-major);
    rows[16:28] are the screen-space quantities the rasterizer's binning
    consumes (see PROJ_ROWS). Compared to decode_heads_pallas + an XLA
    projection stage this removes the lane-padded (Mpad, 16) HBM array,
    its 256 MB transpose, and the projection stage's HBM round trips."""
    M, F = feats_mean.shape
    P = cond0.shape[1]
    assert F == 32 and 32 + P + sum(d for _, d in chain_spec) <= INIT_COL
    assert block % interleave == 0, (block, interleave)
    if interpret is None:
        # GGD_PALLAS_INTERPRET=1: interpret mode on ANY backend — the
        # kernel lowers through plain XLA instead of Mosaic (slow; a
        # numerics-attribution tool, see PERFORMANCE.md r5 quality table)
        interpret = (jax.default_backend() == "cpu"
                     or bool(_os.environ.get("GGD_PALLAS_INTERPRET")))

    weights, chain, layout = _pack_chain(
        head_params, chain_spec, P, parallel, compute_dtype)
    staging, Mpad = _build_staging(
        feats_mean, cond0, init_position, chain_spec, block, compute_dtype)

    wv = cam.world_view_transform.astype(jnp.float32)
    pj = cam.full_proj_transform.astype(jnp.float32)
    consts = jnp.stack([
        jnp.asarray(cam.tanfovx, jnp.float32),
        jnp.asarray(cam.tanfovy, jnp.float32),
        jnp.asarray(n_points, jnp.float32),
        jnp.asarray(0.28209479177387814, jnp.float32),
    ]).reshape(1, 4)
    consts = jnp.pad(consts, ((0, 0), (0, 4)))

    rows = pl.pallas_call(
        functools.partial(
            _heads_project_kernel,
            chain=tuple(chain), scale_offset=scale_offset,
            compute_dtype=compute_dtype, gelu=_GELUS[gelu],
            image_w=cam.image_width, image_h=cam.image_height,
            block=block, layout=layout, interleave=interleave,
        ),
        grid=(Mpad // block,),
        in_specs=[
            pl.BlockSpec((block, STAGE), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 11,
        out_specs=pl.BlockSpec(
            (NROWS, block), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NROWS, Mpad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((block, STAGE), compute_dtype),
            pltpu.VMEM((block, OUT_W), jnp.float32),
        ],
        interpret=interpret,
    )(staging, *weights, wv, pj, consts)
    return rows, layout


def decode_project_pallas_fused(
    head_params, chain_spec,
    rows,                        # list of n_planes (Mpad, K*C) brick rows
    wts_cm,                      # (WR, Mpad) f32 channel-major weights
    smats,                       # (n_planes, K*C, C) f32
    K: int,
    cond0, init_position, scale_offset,
    cam, n_points: int,
    parallel: bool = False,
    compute_dtype=jnp.float32,
    block: int = 1024,
    interpret: bool | None = None,
    gelu: str = "exact",
    interleave: int = 1,
    lerp_mode: str = "dots",
):
    """Gather-fused heads + projection (see sample_fused_inputs for the
    XLA-side contract). Same output contract as decode_project_pallas:
    (rows (NROWS, Mpad) f32, layout).

    vs decode_project_pallas: the staging input no longer depends on the
    tri-grid gather, so XLA's materialisation of the gather->lerp->mean->
    concat chain (measured ~+8 ms/frame at flagship when it feeds the
    opaque pallas_call) disappears; the kernel reconstructs fm in VMEM
    from the raw (block, K*C) brick rows with two tiny MXU dots."""
    assert len(rows) == 3, "kernel is specialised to 3 planes"
    M = init_position.shape[0]
    P = cond0.shape[1]
    C = smats.shape[-1]
    assert C == 32 and 32 + P + sum(d for _, d in chain_spec) <= INIT_COL
    assert block % interleave == 0, (block, interleave)
    if interpret is None:
        # GGD_PALLAS_INTERPRET=1: interpret mode on ANY backend — the
        # kernel lowers through plain XLA instead of Mosaic (slow; a
        # numerics-attribution tool, see PERFORMANCE.md r5 quality table)
        interpret = (jax.default_backend() == "cpu"
                     or bool(_os.environ.get("GGD_PALLAS_INTERPRET")))

    weights, chain, layout = _pack_chain(
        head_params, chain_spec, P, parallel, compute_dtype)
    # aux = staging with the fm columns zero (the kernel fills them)
    aux, Mpad = _build_staging(
        jnp.zeros((M, C), jnp.float32), cond0, init_position, chain_spec,
        block, compute_dtype)
    assert rows[0].shape == (Mpad, K * C), (rows[0].shape, Mpad, K * C)
    assert wts_cm.shape[1] == Mpad, (wts_cm.shape, Mpad)
    WR = wts_cm.shape[0]

    wv = cam.world_view_transform.astype(jnp.float32)
    pj = cam.full_proj_transform.astype(jnp.float32)
    consts = jnp.stack([
        jnp.asarray(cam.tanfovx, jnp.float32),
        jnp.asarray(cam.tanfovy, jnp.float32),
        jnp.asarray(n_points, jnp.float32),
        jnp.asarray(0.28209479177387814, jnp.float32),
    ]).reshape(1, 4)
    consts = jnp.pad(consts, ((0, 0), (0, 4)))

    out = pl.pallas_call(
        functools.partial(
            _sample_heads_project_kernel,
            K=K, C=C, lerp_mode=lerp_mode,
            chain=tuple(chain), scale_offset=scale_offset,
            compute_dtype=compute_dtype, gelu=_GELUS[gelu],
            image_w=cam.image_width, image_h=cam.image_height,
            block=block, layout=layout, interleave=interleave,
        ),
        grid=(Mpad // block,),
        in_specs=[
            pl.BlockSpec((block, STAGE), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, K * C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, K * C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, K * C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((WR, block), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 11,
        out_specs=pl.BlockSpec(
            (NROWS, block), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NROWS, Mpad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((block, STAGE), compute_dtype),
            pltpu.VMEM((block, OUT_W), jnp.float32),
        ],
        interpret=interpret,
    )(aux, rows[0], rows[1], rows[2], wts_cm, smats, *weights, wv, pj, consts)
    return out, layout


# ---------------------------------------------------------------------------
# v3: slab-gather decode — no brick table, no HBM row gather
# ---------------------------------------------------------------------------

VALID_COL = 123  # staging column carrying the pad-slot mask (1 real / 0 pad)


def _slab_heads_project_kernel(
    origins,     # (nb, 12) i32 scalar-prefetch: (zt, yt, xt) per plane
    wzy_in,      # (3, BLK, KR) bf16 static (z,y) weight-matrix block
    axs_in,      # (BLK, 64) bf16 static x corner weights [p*EX:(p+1)*EX)
    aux_in,      # (BLK, 128) staging with fm columns ZERO, valid at col 123
    seg,         # (3, EXC, C) bf16 x-segment matrix (int8 scale / 3 folded)
    vol,         # (3, DZ, YP, XP*C) int8 ANY — manual slab DMA
    w1, b1, w2, b2, w3, b3, w4, b4,
    wv_ref, pj_ref, consts_ref,
    out_ref,     # (NROWS, BLK)
    slab,        # scratch (2, 3, DZW, EY, EXC) int8
    sems,        # scratch DMA sems (2, 3)
    x_ref, o16_ref,
    *,
    dzw: int, ey: int, exc: int, C: int, y_align: int,
    **kw,
):
    """Slab-gather decode: the template is STATIC across frames, so points
    are Morton-packed into blocks whose tri-grid footprint fits a fixed
    (dzw, ey, ex)-cell slab per plane (decoder/point_blocks.py). Per block
    the kernel DMAs 3 raw slabs (double-buffered) and reconstructs
    fm = mean-over-planes trilinear sample as MXU contractions with
    PREBUILT block-local weight matrices — no brick table build and no
    ~9 ns/row HBM row-gather (the XLA gather runs ~17x off bandwidth;
    slabs stream at DMA rate). Then the shared chain+projection tail."""
    i = pl.program_id(0)
    nb = pl.num_programs(0)
    block = kw["block"]

    def dma(b, slot, p):
        zt = origins[b, 3 * p]
        yt = origins[b, 3 * p + 1]
        xt = origins[b, 3 * p + 2]
        return pltpu.make_async_copy(
            vol.at[p, pl.ds(zt, dzw), pl.ds(yt * y_align, ey),
                   pl.ds(xt * 128, exc)],
            slab.at[slot, p],
            sems.at[slot, p],
        )

    @pl.when(i == 0)
    def _():
        for p in range(3):
            dma(0, 0, p).start()

    @pl.when(i + 1 < nb)
    def _():
        for p in range(3):
            dma(i + 1, (i + 1) % 2, p).start()

    slot = i % 2
    for p in range(3):
        dma(i, slot, p).wait()

    kr = dzw * ey
    ex = exc // C
    # x corner -> lane-group expander E[x, x*C+j] = 1 (iota constant)
    xeiota = ((jax.lax.broadcasted_iota(jnp.int32, (ex, exc), 1) // C)
              == jax.lax.broadcasted_iota(jnp.int32, (ex, exc), 0)
              ).astype(jnp.bfloat16)
    int8_w = wzy_in.dtype == jnp.int8
    acc = jnp.zeros((block, C), jnp.float32)
    for p in range(3):
        # (z,y) contraction: 4-nonzero-per-row static weight matrix on MXU.
        # int8 weights (x127, 1/127 folded into seg) run s8 x s8 -> s32 at
        # 2x the bf16 rate and half the stream bytes (measured 5.1 vs 5.8
        # ms standalone at flagship scale)
        if int8_w:
            sl = slab[slot, p].reshape(kr, exc)
            t = jnp.dot(wzy_in[p], sl, preferred_element_type=jnp.int32
                        ).astype(jnp.bfloat16)
        else:
            sl = slab[slot, p].reshape(kr, exc).astype(jnp.bfloat16)
            t = jnp.dot(wzy_in[p], sl, preferred_element_type=jnp.float32
                        ).astype(jnp.bfloat16)
        ax = jnp.dot(axs_in[:, p * ex:(p + 1) * ex], xeiota,
                     preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        prod = t * ax
        # x contraction + int8 dequant + plane mean via the segment matrix
        acc = acc + jnp.dot(prod, seg[p],
                            preferred_element_type=jnp.float32)

    x_ref[:] = aux_in[:]
    x_ref[:, 0:C] = acc.astype(x_ref.dtype)
    _chain_project_body(
        x_ref, o16_ref, out_ref, w1, b1, w2, b2, w3, b3, w4, b4,
        wv_ref, pj_ref, consts_ref, **kw)
    # pad slots decode garbage at the origin — cull them from the raster
    valid = jnp.transpose(aux_in[:, VALID_COL:VALID_COL + 1]
                          .astype(jnp.float32))          # (1, BLK)
    out_ref[PROJ_ROWS["visible"], :] = out_ref[PROJ_ROWS["visible"], :] * valid[0]
    out_ref[PROJ_ROWS["opac"], :] = out_ref[PROJ_ROWS["opac"], :] * valid[0]
    out_ref[PROJ_ROWS["radius_f"], :] = out_ref[PROJ_ROWS["radius_f"], :] * valid[0]


def decode_project_pallas_slab(
    head_params, chain_spec,
    origins,                     # (nb, 12) i32
    wzy,                         # (3, Mpad, KR) bf16 (point_blocks.build_slab_weights)
    axs,                         # (Mpad, 64) bf16
    aux,                         # (Mpad, 128) staging (fm zero, valid col set)
    vol,                         # (3, DZ, YP, XP*C) int8 (build_slab_volume)
    scales,                      # (3, C) f32 int8 dequant scales
    scale_offset,
    cam,
    P: int,                      # cond width the aux staging was built with
    ey: int, ex: int,
    parallel: bool = False,
    compute_dtype=jnp.bfloat16,
    block: int = 1024,
    interpret: bool | None = None,
    gelu: str = "poly",
    interleave: int = 1,
    dzw: int = 4,
    y_align: int = 8,
):
    """Slab-gather fused decode+heads+projection -> (rows (NROWS, Mpad),
    layout). Same output contract as decode_project_pallas, but over the
    PERMUTED Morton-packed template (order is irrelevant downstream: the
    rasterizer depth-sorts). Replaces brick-table build + HBM row gather +
    staging build + heads kernel with ONE kernel over the raw int8 volume.

    Pad-slot culling rides the aux valid column (VALID_COL); the gcol
    mask is disarmed (n_points = Mpad)."""
    assert wzy.ndim == 3 and wzy.shape[0] == 3
    Mpad = wzy.shape[1]
    C = scales.shape[-1]
    exc = ex * C
    kr = dzw * ey
    assert aux.shape == (Mpad, STAGE), aux.shape
    assert wzy.shape[2] == kr, (wzy.shape, kr)
    assert Mpad % block == 0, (Mpad, block)
    assert origins.shape == (Mpad // block, 12), origins.shape
    assert block % interleave == 0, (block, interleave)
    if interpret is None:
        # GGD_PALLAS_INTERPRET=1: interpret mode on ANY backend — the
        # kernel lowers through plain XLA instead of Mosaic (slow; a
        # numerics-attribution tool, see PERFORMANCE.md r5 quality table)
        interpret = (jax.default_backend() == "cpu"
                     or bool(_os.environ.get("GGD_PALLAS_INTERPRET")))

    weights, chain, layout = _pack_chain(
        head_params, chain_spec, P, parallel, compute_dtype)

    # x-segment matrix: seg[p, x*C + j, j] = scales[p, j] / n_planes
    # (x corner-sum + int8 dequant + plane mean in one MXU contraction);
    # int8 wzy weights additionally fold their 1/127 dequant here
    eye_t = jnp.tile(jnp.eye(C, dtype=jnp.float32), (ex, 1))   # (EXC, C)
    wq = 127.0 if wzy.dtype == jnp.int8 else 1.0
    seg = (eye_t[None] * (scales.astype(jnp.float32) / (3.0 * wq))[:, None, :]
           ).astype(jnp.bfloat16)

    wv = cam.world_view_transform.astype(jnp.float32)
    pj = cam.full_proj_transform.astype(jnp.float32)
    consts = jnp.stack([
        jnp.asarray(cam.tanfovx, jnp.float32),
        jnp.asarray(cam.tanfovy, jnp.float32),
        jnp.asarray(Mpad, jnp.float32),
        jnp.asarray(0.28209479177387814, jnp.float32),
    ]).reshape(1, 4)
    consts = jnp.pad(consts, ((0, 0), (0, 4)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Mpad // block,),
        in_specs=[
            pl.BlockSpec((3, block, kr), lambda i, *_: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 64), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, STAGE), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),     # seg
            pl.BlockSpec(memory_space=pl.ANY),         # vol
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 11,
        out_specs=pl.BlockSpec((NROWS, block), lambda i, *_: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 3, dzw, ey, exc), jnp.int8),
            pltpu.SemaphoreType.DMA((2, 3)),
            pltpu.VMEM((block, STAGE), compute_dtype),
            pltpu.VMEM((block, OUT_W), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _slab_heads_project_kernel,
            dzw=dzw, ey=ey, exc=exc, C=C, y_align=y_align,
            chain=tuple(chain), scale_offset=scale_offset,
            compute_dtype=compute_dtype, gelu=_GELUS[gelu],
            image_w=cam.image_width, image_h=cam.image_height,
            block=block, layout=layout, interleave=interleave,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((NROWS, Mpad), jnp.float32),
        interpret=interpret,
    )(origins, wzy, axs, aux.astype(compute_dtype), seg, vol,
      *weights, wv, pj, consts)
    return out, layout
