"""Weight-porting round trip: reference-style persistence pickle -> params."""
import io
import pickle

import numpy as np
import torch
import pytest

import jax
import jax.numpy as jnp

from gaussian_gan_decoder_tpu.port import (
    extract_state,
    generator_config_from_pickle,
    generator_params_from_state,
    load_reference_pickle,
)
from tests.test_models_triplane import tiny_generator, _camera_params


def _reconstruct_persistent_obj(meta):  # top-level for picklability
    raise RuntimeError("should never run — the port intercepts this")


class _FakePersistentModule:
    """Pickles exactly like a torch_utils.persistence-wrapped module."""

    def __init__(self, params=None, buffers=None, modules=None,
                 class_name="training.x.Y", init_args=(), init_kwargs=None):
        self._parameters = dict(params or {})
        self._buffers = dict(buffers or {})
        self._modules = dict(modules or {})
        self.class_name = class_name
        self.init_args = init_args
        self.init_kwargs = init_kwargs or {}

    def __reduce__(self):
        meta = dict(
            type="class",
            version=2,
            module_src="# embedded source not needed",
            class_name=self.class_name,
            init_args=self.init_args,
            init_kwargs=self.init_kwargs,
            state={
                "_parameters": self._parameters,
                "_buffers": self._buffers,
                "_modules": self._modules,
            },
        )
        return (_reconstruct_persistent_obj, (meta,))


# make pickle record the reference's module path for the reconstructor —
# a shim module satisfies the PICKLE-time lookup. Installed only around
# pickle.dumps (contextmanager): a permanent sys.modules entry would
# shadow the REAL /root/reference torch_utils that test_reference_golden
# imports later in the same process.
import contextlib
import pickle as _pickle
import sys
import types

_reconstruct_persistent_obj.__module__ = "torch_utils.persistence"


@contextlib.contextmanager
def _persistence_shim():
    shim_pkg = types.ModuleType("torch_utils")
    shim = types.ModuleType("torch_utils.persistence")
    shim._reconstruct_persistent_obj = _reconstruct_persistent_obj
    shim_pkg.persistence = shim
    saved = {k: sys.modules.get(k)
             for k in ("torch_utils", "torch_utils.persistence")}
    sys.modules["torch_utils"] = shim_pkg
    sys.modules["torch_utils.persistence"] = shim
    try:
        yield
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


def _dumps_with_shim(obj):
    with _persistence_shim():
        return _pickle.dumps(obj)


def _tree_to_fake_modules(tree):
    params = {}
    modules = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            modules[k] = _tree_to_fake_modules(v)
        else:
            params[k] = torch.tensor(np.asarray(v))
    return _FakePersistentModule(params=params, modules=modules)


def _join_tree(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_join_tree(v, prefix + k + "."))
        else:
            out[prefix + k] = np.asarray(v)
    return out


def test_port_roundtrip_restores_generator_params():
    g = tiny_generator("panohead")
    params = g.init(jax.random.PRNGKey(0))

    # rename our OSG decoder keys back to torch Sequential names
    flat = _join_tree(params)
    flat = {
        k.replace("decoder.fc0", "decoder.net.0").replace("decoder.fc1", "decoder.net.2"): v
        for k, v in flat.items()
    }
    # rebuild a dotted module hierarchy
    nested = {}
    for k, v in flat.items():
        node = nested
        parts = k.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v

    fake = _tree_to_fake_modules(nested)
    fake.init_args = (32, 25, 32, 64, 3)
    fake.init_kwargs = {
        "rendering_kwargs": {
            "triplane_size": 32, "triplane_depth": 3, "box_warp": 1.0,
            "depth_resolution": 8, "depth_resolution_importance": 8,
            "c_gen_conditioning_zero": True,
            "superresolution_module": "training.superresolution.SuperresolutionHybrid8XDC",
            "decoder_activation": "lrelu",
            "clamp_mode": "softplus", "ray_start": "auto", "ray_end": "auto",
        },
        "channel_base": 1024, "channel_max": 64,
    }
    blob = _dumps_with_shim({"G_ema": fake, "training_set_kwargs": None})

    data = load_reference_pickle(io.BytesIO(blob))
    stub = data["G_ema"]
    cfg = generator_config_from_pickle(stub)
    assert cfg.variant == "panohead"
    assert cfg.z_dim == 32 and cfg.img_resolution == 64
    assert cfg.rk["triplane_size"] == 32

    ported = generator_params_from_state(extract_state(stub))

    orig_flat = _join_tree(params)
    port_flat = _join_tree(ported)
    assert set(orig_flat) == set(port_flat), (
        set(orig_flat) ^ set(port_flat)
    )
    for k in orig_flat:
        np.testing.assert_allclose(orig_flat[k], port_flat[k], rtol=1e-6)

    # ported params drive the forward identically
    z = jax.random.normal(jax.random.PRNGKey(2), (1, 32))
    c = _camera_params()
    # tiny_generator is without_sr; ported tree may carry superres too —
    # forward only touches what the config owns
    out1 = g.apply(params, z, c, neural_rendering_resolution=16, key=jax.random.PRNGKey(3))
    out2 = g.apply(ported, z, c, neural_rendering_resolution=16, key=jax.random.PRNGKey(3))
    np.testing.assert_allclose(
        np.asarray(out1["image_raw"]), np.asarray(out2["image_raw"]), rtol=1e-6
    )


def test_unpickler_is_inert_for_reference_classes():
    """Reference-internal symbols resolve to inert containers, never code."""
    import pickletools

    class Evil:
        def __reduce__(self):
            return (eval, ("__import__('os').system('true')",))

    # our unpickler must NOT intercept builtins — only reference modules —
    # so eval would still fire; confirm we never call load on untrusted
    # non-reference pickles in the API (documented), and reference-module
    # symbols become EasyDicts:
    from gaussian_gan_decoder_tpu.port.torch_pickle import _RefUnpickler

    got = _RefUnpickler(io.BytesIO(_dumps_with_shim({"a": 1}))).load()
    assert got == {"a": 1}
