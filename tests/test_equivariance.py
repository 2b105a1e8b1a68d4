"""EQ-T / EQ-T_frac / EQ-R equivariance metrics: golden ops parity against
the ACTUAL reference implementation (eg3d/metrics/equivariance.py) plus an
end-to-end smoke on a tiny SG3 generator."""
import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = "/root/reference"
EG3D = os.path.join(REF, "eg3d")

torch = pytest.importorskip("torch")

from gaussian_gan_decoder_tpu.metrics import equivariance as eq  # noqa: E402

_REF_PREFIXES = ("training", "torch_utils", "dnnlib", "legacy", "metrics")


def _purge_ref_modules():
    for name in [m for m in sys.modules if m.split(".")[0] in _REF_PREFIXES]:
        del sys.modules[name]


@pytest.fixture(scope="module")
def ref_eq():
    if not os.path.isdir(EG3D):
        pytest.skip("no reference checkout")
    saved_path = list(sys.path)
    _purge_ref_modules()
    sys.path = [p for p in sys.path
                if not p.startswith(os.path.join(REF, "PanoHead"))]
    if EG3D not in sys.path:
        sys.path.insert(0, EG3D)
    try:
        # stub out metrics.metric_utils BEFORE the import: the reference's
        # equivariance.py only uses it inside compute_equivariance_metrics
        # (which we don't call), but its module-level import chain pulls in
        # main.load_decoder -> gaussian_splatting (CUDA-only deps)
        import types

        import metrics as ref_pkg  # the eg3d metrics package

        stub = types.ModuleType("metrics.metric_utils")
        sys.modules["metrics.metric_utils"] = stub
        ref_pkg.metric_utils = stub
        from metrics import equivariance as ref_mod

        yield ref_mod
    finally:
        _purge_ref_modules()
        sys.path = saved_path


@pytest.fixture()
def imgs(rng):
    return rng.rand(2, 3, 32, 32).astype(np.float32) * 2 - 1


def test_integer_translation_golden(ref_eq, imgs):
    tx, ty = 0.07, -0.11
    zr, mr = ref_eq.apply_integer_translation(torch.from_numpy(imgs), tx, ty)
    z, m = eq.apply_integer_translation(jnp.asarray(imgs), tx, ty)
    np.testing.assert_allclose(np.asarray(z), zr.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(m), mr.numpy(), atol=1e-6)


def test_fractional_translation_golden(ref_eq, imgs):
    tx, ty = 0.083, -0.041
    zr, mr = ref_eq.apply_fractional_translation(torch.from_numpy(imgs), tx, ty)
    z, m = eq.apply_fractional_translation(jnp.asarray(imgs), tx, ty)
    np.testing.assert_allclose(np.asarray(z), zr.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(m), mr.numpy(), atol=1e-6)


def test_bandlimit_filter_golden(ref_eq):
    mat = eq.rotation_matrix(0.37)
    fr = ref_eq.construct_affine_bandlimit_filter(torch.as_tensor(mat))
    f = eq.construct_affine_bandlimit_filter(mat)
    np.testing.assert_allclose(np.asarray(f), fr.numpy(), atol=1e-5)


def test_fractional_rotation_golden(ref_eq, imgs):
    angle = 0.61
    zr, mr = ref_eq.apply_fractional_rotation(torch.from_numpy(imgs), angle)
    z, m = eq.apply_fractional_rotation(jnp.asarray(imgs), angle)
    np.testing.assert_allclose(np.asarray(z), zr.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(m), mr.numpy(), atol=1e-6)


def test_pseudo_rotation_golden(ref_eq, imgs):
    angle = -0.43
    zr, mr = ref_eq.apply_fractional_pseudo_rotation(
        torch.from_numpy(imgs), angle)
    z, m = eq.apply_fractional_pseudo_rotation(jnp.asarray(imgs), angle)
    np.testing.assert_allclose(np.asarray(z), zr.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(m), mr.numpy(), atol=1e-6)


def test_compute_equivariance_smoke():
    """All three metrics on a tiny SG3 generator: finite PSNRs, and the
    transform plumbing (params['synthesis']['input']['transform']) works."""
    from gaussian_gan_decoder_tpu.models.stylegan3 import Generator3

    gen = Generator3(
        z_dim=16, c_dim=0, w_dim=16, img_resolution=32, img_channels=3,
        synthesis_kwargs=(
            ("channel_base", 1024), ("channel_max", 16),
            ("num_layers", 6), ("num_critical", 2), ("margin_size", 2),
        ),
    )
    params = gen.init(jax.random.PRNGKey(0))
    psnrs = eq.compute_equivariance_metrics(
        gen, params, jax.random.PRNGKey(1), num_samples=2, batch_size=1,
        compute_eqt_int=True, compute_eqt_frac=True, compute_eqr=True)
    assert len(psnrs) == 3
    assert all(np.isfinite(p) for p in psnrs), psnrs


def test_checkpoint_transform_does_not_skew_metrics():
    """The orig pass must reset the user transform to identity (ref
    equivariance.py:223): a checkpoint carrying a non-identity transform
    yields the SAME PSNRs as the identity-carrying one."""
    from gaussian_gan_decoder_tpu.models.stylegan3 import Generator3

    gen = Generator3(
        z_dim=16, c_dim=0, w_dim=16, img_resolution=32, img_channels=3,
        synthesis_kwargs=(
            ("channel_base", 1024), ("channel_max", 16),
            ("num_layers", 6), ("num_critical", 2), ("margin_size", 2),
        ),
    )
    params = gen.init(jax.random.PRNGKey(0))
    skew = np.eye(3, dtype=np.float32)
    skew[:2, 2] = (0.25, -0.125)
    params_skew = jax.tree_util.tree_map(lambda x: x, params)
    params_skew["synthesis"] = {
        **params["synthesis"],
        "input": {**params["synthesis"]["input"],
                  "transform": jnp.asarray(skew)},
    }
    kwargs = dict(num_samples=2, batch_size=1, compute_eqt_int=True,
                  compute_eqr=True)
    a = eq.compute_equivariance_metrics(gen, params, jax.random.PRNGKey(1),
                                        **kwargs)
    b = eq.compute_equivariance_metrics(gen, params_skew,
                                        jax.random.PRNGKey(1), **kwargs)
    np.testing.assert_allclose(a, b, rtol=1e-5)


def test_metric_registry_entries():
    from gaussian_gan_decoder_tpu.metrics.metric_main import list_metrics

    for name in ("eqt50k_int", "eqt50k_frac", "eqr50k"):
        assert name in list_metrics()
