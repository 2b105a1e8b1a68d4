"""Decoder heads, positional encoding, camera samplers, surface sampling."""
import math

import numpy as np
import torch
import pytest

import jax
import jax.numpy as jnp

from gaussian_gan_decoder_tpu.decoder import (
    Embedder,
    DecoderHead,
    GaussianDecoder,
    FOV_to_intrinsics,
    sample_camera_params,
    marching_tetrahedra_sample,
    create_samples,
)
from gaussian_gan_decoder_tpu.decoder.surface import marching_tetrahedra_faces
from tests.test_models_triplane import tiny_generator, _camera_params


def test_embedder_matches_reference_semantics():
    """Linear (not log) bands, include_input, out_dim 63
    (ref pos_encoding.py:4-50)."""
    e = Embedder(include_input=True, input_dims=3, num_freqs=10)
    assert e.out_dim == 63
    np.testing.assert_allclose(e.freq_bands[0], 1.0)
    np.testing.assert_allclose(e.freq_bands[-1], 512.0)
    # linear spacing
    d = np.diff(e.freq_bands)
    np.testing.assert_allclose(d, d[0])
    x = jnp.asarray([[0.1, -0.2, 0.3]])
    out = np.asarray(e(x))
    assert out.shape == (1, 63)
    np.testing.assert_allclose(out[0, :3], [0.1, -0.2, 0.3], rtol=1e-6)
    np.testing.assert_allclose(out[0, 3:6], np.sin([0.1, -0.2, 0.3]), rtol=1e-5)
    np.testing.assert_allclose(out[0, 6:9], np.cos([0.1, -0.2, 0.3]), rtol=1e-5)


def test_decoder_head_matches_torch_mlp(rng):
    head = DecoderHead(n_features=35, out_features=3, hidden_dim=16)
    p = head.init(jax.random.PRNGKey(0))
    mlp = torch.nn.Sequential(
        torch.nn.Linear(35, 16), torch.nn.GELU(),
        torch.nn.Linear(16, 16), torch.nn.GELU(),
        torch.nn.Linear(16, 16), torch.nn.GELU(),
        torch.nn.Linear(16, 3),
    )
    with torch.no_grad():
        for i, lin in enumerate([mlp[0], mlp[2], mlp[4], mlp[6]]):
            lin.weight.copy_(torch.tensor(np.asarray(p[f"fc{i}"]["weight"])))
            lin.bias.copy_(torch.tensor(np.asarray(p[f"fc{i}"]["bias"])))
    feats = rng.randn(3, 7, 32).astype(np.float32)  # (planes, M, C)
    cond = rng.randn(7, 3).astype(np.float32)
    got = np.asarray(head.apply(p, jnp.asarray(feats), jnp.asarray(cond)))
    x = torch.cat([torch.tensor(feats).mean(0), torch.tensor(cond)], dim=-1)
    want = mlp(x).detach().numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("decoder_type", ["sequential_reversed", "sequential", "parallel"])
def test_gaussian_decoder_forward(decoder_type):
    g = tiny_generator("panohead")
    gen_params = g.init(jax.random.PRNGKey(0))
    dec = GaussianDecoder(generator=g, decoder_type=decoder_type, hidden_dim=32)
    params = dec.init(jax.random.PRNGKey(1), generator_params=gen_params)
    z = jax.random.normal(jax.random.PRNGKey(2), (1, 32))
    c = _camera_params()
    pos = (jax.random.uniform(jax.random.PRNGKey(3), (64, 3)) - 0.5) * 0.5
    out = dec.apply(params, z, c, pos, truncation_psi=0.7)
    assert out["xyz"].shape == (64, 3)
    assert out["scale"].shape == (64, 3)
    assert out["rotation"].shape == (64, 4)
    assert out["opacity"].shape == (64, 1)
    assert out["color"].shape == (64, 3)
    # xyz is a small offset from init positions
    assert float(jnp.max(jnp.abs(out["xyz"] - pos))) < 0.2
    # activated scale is bounded above
    bound = -2.5 if decoder_type == "sequential_reversed" else -2.0
    assert float(jnp.max(out["scale"])) <= bound + 1e-5


def test_gaussian_decoder_grad_flows_to_generator():
    g = tiny_generator("panohead")
    gen_params = g.init(jax.random.PRNGKey(0))
    dec = GaussianDecoder(generator=g, decoder_type="sequential_reversed", hidden_dim=16)
    params = dec.init(jax.random.PRNGKey(1), generator_params=gen_params)
    z = jax.random.normal(jax.random.PRNGKey(2), (1, 32))
    c = _camera_params()
    pos = (jax.random.uniform(jax.random.PRNGKey(3), (32, 3)) - 0.5) * 0.5

    def loss(p):
        out = dec.apply(p, z, c, pos)
        return jnp.mean(out["color"] ** 2) + jnp.mean(out["xyz"] ** 2)

    grads = jax.grad(loss)(params)
    g_backbone = sum(
        float(jnp.sum(jnp.abs(x))) for x in jax.tree.leaves(grads["G"]["backbone"])
    )
    g_heads = sum(float(jnp.sum(jnp.abs(x))) for x in jax.tree.leaves(grads["color"]))
    assert g_backbone > 0 and g_heads > 0


def torch_pose_oracle(h, v, radius):
    """Re-expression of ref camera_utils.py:76-97 LookAt sample for given h,v."""
    h = torch.tensor([[h]], dtype=torch.float64)
    v = torch.tensor([[v]], dtype=torch.float64)
    v = torch.clamp(v, 1e-5, math.pi - 1e-5)
    theta = h
    v_norm = v / math.pi
    phi = torch.arccos(1 - 2 * v_norm)
    origins = torch.zeros((1, 3), dtype=torch.float64)
    origins[:, 0:1] = radius * torch.sin(phi) * torch.cos(math.pi - theta)
    origins[:, 2:3] = radius * torch.sin(phi) * torch.sin(math.pi - theta)
    origins[:, 1:2] = radius * torch.cos(phi)
    forward = -origins / origins.norm(dim=-1, keepdim=True)
    up = torch.tensor([0.0, 1.0, 0.0], dtype=torch.float64).expand_as(forward)
    right = -torch.cross(up, forward, dim=-1)
    right = right / right.norm(dim=-1, keepdim=True)
    up2 = torch.cross(forward, right, dim=-1)
    up2 = up2 / up2.norm(dim=-1, keepdim=True)
    rot = torch.eye(4, dtype=torch.float64).unsqueeze(0).clone()
    rot[:, :3, :3] = torch.stack((right, up2, forward), dim=-1)
    tr = torch.eye(4, dtype=torch.float64).unsqueeze(0).clone()
    tr[:, :3, 3] = origins
    return (tr @ rot).numpy()[0]


def test_pose_matrix_matches_reference_math():
    from gaussian_gan_decoder_tpu.decoder.camera_sampling import _pose_from_hv

    for h, v in [(math.pi / 2, math.pi / 2), (1.1, 1.9), (2.5, 0.7)]:
        want = torch_pose_oracle(h, v, 2.7)
        got = np.asarray(
            _pose_from_hv(jnp.asarray([[h]], jnp.float64), jnp.asarray([[v]], jnp.float64), 2.7)
        )[0]
        np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-12)


def test_sample_camera_params_layout():
    cp, pose, h, v = sample_camera_params(jax.random.PRNGKey(0), 12.0)
    assert cp.shape == (1, 25)
    np.testing.assert_allclose(np.asarray(cp[0, :16]), np.asarray(pose.reshape(-1)), rtol=1e-6)
    intr = np.asarray(cp[0, 16:25]).reshape(3, 3)
    focal = 1 / (2 * math.tan(12.0 * 2 * 3.14159 / 360 / 2))
    np.testing.assert_allclose(intr[0, 0], focal, rtol=1e-5)
    np.testing.assert_allclose(intr[0, 2], 0.5)
    # camera sits on the radius-2.7 orbit
    np.testing.assert_allclose(np.linalg.norm(np.asarray(pose[0, :3, 3])), 2.7, rtol=1e-5)


def test_marching_tetrahedra_sphere():
    """Level set of a radial field must yield points on the sphere."""
    R = 48
    grid = np.asarray(create_samples(R, 1.0))[0].reshape(R, R, R, 3)
    dist = np.linalg.norm(grid, axis=-1)
    sigmas = jnp.asarray(40.0 * (0.5 - dist))  # level 10 at dist = 0.25
    pts = marching_tetrahedra_sample(
        jax.random.PRNGKey(0), sigmas, level=10.0, n_points=5000,
        surface_thickness=0.0, face_capacity=2 ** 16,
    )
    # ref normalisation idx/R - 0.5 maps world w -> w*(R-1)/R - 1/(2R):
    # sphere of radius 0.25 centred at 0 -> radius 0.25*(R-1)/R centred
    # at -1/(2R) per axis
    center = -1.0 / (2 * R)
    want_r = 0.25 * (R - 1) / R
    norms = np.linalg.norm(np.asarray(pts) - center, axis=1)
    assert abs(np.mean(norms) - want_r) < 0.005, (np.mean(norms), want_r)
    assert np.std(norms) < 0.005


def test_marching_tetrahedra_face_count_and_thickness():
    R = 24
    grid = np.asarray(create_samples(R, 1.0))[0].reshape(R, R, R, 3)
    dist = np.linalg.norm(grid, axis=-1)
    sigmas = jnp.asarray(100.0 * (0.45 - dist))  # level 10 at dist = 0.35
    _, n_faces = marching_tetrahedra_faces(sigmas, 10.0, face_capacity=2 ** 15)
    assert int(n_faces) > 1000
    pts = marching_tetrahedra_sample(
        jax.random.PRNGKey(1), sigmas, level=10.0, n_points=2000,
        surface_thickness=0.1, face_capacity=2 ** 15,
    )
    norms = np.linalg.norm(np.asarray(pts), axis=1)
    # thickness jitter shrinks toward origin only (scale clipped to [0,1])
    # radius 0.35*(R-1)/R ~ 0.335 with a -1/(2R) centre offset; jitter only
    # shrinks toward the origin (scale clipped to [0,1])
    assert norms.max() < 0.38
    assert norms.std() > 0.005
