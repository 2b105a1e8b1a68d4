"""Parity: fused Pallas head chain (interpret mode) vs the XLA head path.

Covers all three decoder chain variants, with and without xyz embedding.
The Pallas kernel must reproduce decoder/heads.py bit-closely in f32
(same math, same transform placement in the chain).
"""
import jax
import jax.numpy as jnp
import pytest

from gaussian_gan_decoder_tpu.decoder.heads import _CHAINS, GaussianDecoder
from gaussian_gan_decoder_tpu.decoder.pallas_heads import decode_heads_pallas
from gaussian_gan_decoder_tpu.flagship import flagship_generator


def _xla_reference(dec, params, feats, pos):
    heads = dec._heads()
    cond = dec.embedder(pos) if dec.use_xyz_embedding else pos
    ref = {}
    for name, _ in _CHAINS[dec.decoder_type]:
        v = heads[name].apply(params[name], feats, cond)
        if name == "xyz":
            v = v * 0.01 + pos
        elif name == "scale":
            v = dec.activate_scale(v)
        ref[name] = v
        if dec.decoder_type != "parallel":
            cond = jnp.concatenate([cond, v], axis=-1)
    return ref


@pytest.mark.parametrize("decoder_type", ["sequential_reversed", "sequential", "parallel"])
@pytest.mark.parametrize("use_emb", [False, True])
def test_pallas_heads_parity(decoder_type, use_emb):
    gen = flagship_generator()
    dec = GaussianDecoder(
        generator=gen, decoder_type=decoder_type, use_xyz_embedding=use_emb
    )
    params = dec.init(jax.random.PRNGKey(0))
    M = 257  # deliberately not a block multiple
    feats = jax.random.normal(jax.random.PRNGKey(1), (3, M, 32), jnp.float32)
    pos = jax.random.normal(jax.random.PRNGKey(2), (M, 3), jnp.float32) * 0.2

    ref = _xla_reference(dec, params, feats, pos)
    cond0 = dec.embedder(pos) if use_emb else pos
    out = decode_heads_pallas(
        {name: params[name] for name, _ in _CHAINS[decoder_type]},
        _CHAINS[decoder_type],
        jnp.mean(feats, axis=0), cond0, pos, dec.scale_offset,
        parallel=(decoder_type == "parallel"),
        compute_dtype=jnp.float32, block=128, interpret=True,
    )
    for name in ref:
        assert float(jnp.max(jnp.abs(out[name] - ref[name]))) < 1e-4, name


def test_decoder_pallas_flag_routes():
    """GaussianDecoder(pallas_heads=True) produces the same attrs via
    decode_from_planes (interpret unavailable through the flag — run the
    wrapper directly on CPU where pallas_call falls back to interpret)."""
    gen = flagship_generator()
    dec = GaussianDecoder(generator=gen)
    params = dec.init(jax.random.PRNGKey(0))
    M = 64
    feats = jax.random.normal(jax.random.PRNGKey(1), (3, M, 32), jnp.float32)
    pos = jax.random.normal(jax.random.PRNGKey(2), (M, 3), jnp.float32) * 0.2
    ref = _xla_reference(dec, params, feats, pos)
    out = decode_heads_pallas(
        {name: params[name] for name, _ in _CHAINS[dec.decoder_type]},
        _CHAINS[dec.decoder_type], jnp.mean(feats, axis=0), pos, pos,
        dec.scale_offset, compute_dtype=jnp.float32, block=64, interpret=True,
    )
    for name in ref:
        assert jnp.allclose(out[name], ref[name], atol=1e-4), name
