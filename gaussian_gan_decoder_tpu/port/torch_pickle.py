"""Import reference checkpoints (.pkl) into JAX param trees.

TPU-native replacement for the reference's loader stack:
  * legacy.load_network_pkl (/root/reference/PanoHead/legacy.py:24-62)
  * load_from_pkl_new_G (/root/reference/main/decoder_utils/load_network.py:3-29)

The reference snapshots are pickles of torch modules wrapped by
torch_utils.persistence (source-embedding classes, persistence.py:37-253):
each module reduces to `_reconstruct_persistent_obj(meta)` where meta
carries {type, class_name, module_src, state(=module __dict__ incl.
_parameters/_buffers/_modules), init_args, init_kwargs}. We do NOT execute
the embedded source: a custom Unpickler intercepts the reconstructor and
captures the state tree as inert stubs; tensors deserialize through
torch's normal machinery (torch-cpu is available).

From the captured tree we emit:
  * a flat {dotted.torch.name: np.ndarray} state dict,
  * a TriPlaneGenerator config (from init_args/kwargs + rendering_kwargs),
  * the params pytree for models/triplane.py (name-mapped 1:1; our trees
    intentionally mirror the reference module tree).
"""
from __future__ import annotations

import io
import pickle
from typing import Any, Dict, Optional, Tuple

import numpy as np


class PersistentStub:
    """Inert stand-in for a persistence-wrapped torch module."""

    def __init__(self, meta):
        self.meta = meta
        self.class_name = meta.get("class_name", "?")
        self.state = meta.get("state", {})
        # persistence stores the ctor capture on the INSTANCE
        # (state['_init_args']), not in the meta dict
        # (ref torch_utils/persistence.py:107-124)
        self.init_args = self.state.get("_init_args",
                                        meta.get("init_args", ()))
        self.init_kwargs = dict(self.state.get("_init_kwargs",
                                               meta.get("init_kwargs", {})))

    def __repr__(self):
        return f"PersistentStub({self.class_name})"


def _reconstruct_stub(meta):
    return PersistentStub(meta)


class _EasyDict(dict):
    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError:
            raise AttributeError(k) from None

    def __setattr__(self, k, v):
        self[k] = v


class _RefUnpickler(pickle.Unpickler):
    """Resolves reference-internal classes to local stand-ins; everything
    torch/numpy resolves normally."""

    def find_class(self, module, name):
        if name == "_reconstruct_persistent_obj" and "persistence" in module:
            return _reconstruct_stub
        if name == "EasyDict":
            return _EasyDict
        if module.startswith(("dnnlib", "torch_utils", "training", "main", "camera_utils")):
            # any other reference-internal symbol: inert container
            return _EasyDict
        return super().find_class(module, name)


def load_reference_pickle(path_or_file) -> Any:
    """Unpickle a reference snapshot without its codebase."""
    if hasattr(path_or_file, "read"):
        return _RefUnpickler(path_or_file).load()
    with open(path_or_file, "rb") as f:
        return _RefUnpickler(f).load()


def _to_numpy(v):
    try:
        import torch

        if isinstance(v, torch.Tensor):
            return v.detach().to(torch.float32).cpu().numpy()
    except ImportError:
        pass
    return None


def extract_state(obj, prefix: str = "", out: Optional[Dict[str, np.ndarray]] = None):
    """Walk stubs / torch modules -> flat {dotted_name: ndarray}."""
    if out is None:
        out = {}
    state = None
    if isinstance(obj, PersistentStub):
        state = obj.state
    else:
        # Duck-typed torch-module state: covers live torch modules AND
        # plain-pickled (non-persistent) reference modules that the
        # unpickler stands in as _EasyDict — e.g. eg3d's OSGDecoder,
        # which unlike PanoHead's is NOT @persistent_class
        # (/root/reference/eg3d/training/triplane.py:116 vs
        # PanoHead/training/triplane.py:295); its _parameters land in
        # the stand-in's instance __dict__ via pickle BUILD.
        d = getattr(obj, "__dict__", None)
        if isinstance(d, dict) and ("_parameters" in d or "_modules" in d):
            state = d
    if state is None:
        return out
    for bag in ("_parameters", "_buffers"):
        for name, v in (state.get(bag) or {}).items():
            arr = _to_numpy(v)
            if arr is not None:
                out[prefix + name] = arr
    for name, sub in (state.get("_modules") or {}).items():
        if sub is not None:
            extract_state(sub, prefix + name + ".", out)
    return out


# ----------------------------------------------------------------------------
# name-mapped tree assembly


def _nest(flat: Dict[str, np.ndarray]) -> Dict:
    """dotted flat dict -> nested dict of jnp arrays, with renames for the
    few places our tree names differ from torch Sequential indices."""
    import jax.numpy as jnp

    renames = {
        # OSGDecoder: torch Sequential net.0 / net.2 (ref triplane.py:305-311)
        "net.0": "fc0",
        "net.2": "fc1",
    }
    tree: Dict = {}
    for key, arr in flat.items():
        # static FIR constants are config, not params, in this framework
        # (SG2 resample_filter; SG3 per-layer Kaiser filters are re-derived
        # from the layer geometry in models/stylegan3.py:_filters)
        if key.endswith(("resample_filter", "up_filter", "down_filter")):
            continue
        for old, new in renames.items():
            key = key.replace(old, new)
        parts = key.split(".")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(arr)
    return tree


def generator_params_from_state(flat: Dict[str, np.ndarray]) -> Dict:
    """Flat torch names -> models/triplane.py param tree.

    Our trees mirror the reference module hierarchy exactly (backbone/
    mapping/fc0..., backbone/synthesis/b{res}/conv0/..., superresolution/
    block0/..., decoder/, torgb/, t_mapping/, bcg_synthesis/), so this is a
    pure re-nesting + Sequential-index rename."""
    return _nest(flat)


def generator_config_from_pickle(g_stub: PersistentStub, variant: Optional[str] = None):
    """Build a TriPlaneGenerator dataclass from the pickled init metadata
    (equivalent of load_from_pkl_new_G reconstructing from init_args/kwargs,
    ref load_network.py:12-18)."""
    from ..models.triplane import TriPlaneGenerator

    kw = dict(g_stub.init_kwargs)
    args = list(g_stub.init_args)
    names = ["z_dim", "c_dim", "w_dim", "img_resolution", "img_channels"]
    pos = dict(zip(names, args))
    rendering_kwargs = dict(kw.get("rendering_kwargs", {}))
    if variant is None:
        variant = "panohead" if rendering_kwargs.get("triplane_depth", 1) > 1 else "eg3d"
    synth_kw = {}
    for k in ("channel_base", "channel_max", "num_fp16_res", "conv_clamp"):
        if k in kw:
            synth_kw[k] = kw[k]
    # sanitize rendering kwargs into hashable tuples
    rk_items = tuple(
        (k, tuple(v) if isinstance(v, (list, tuple)) else v)
        for k, v in rendering_kwargs.items()
    )
    return TriPlaneGenerator(
        z_dim=pos.get("z_dim", kw.get("z_dim", 512)),
        c_dim=pos.get("c_dim", kw.get("c_dim", 25)),
        w_dim=pos.get("w_dim", kw.get("w_dim", 512)),
        img_resolution=pos.get("img_resolution", kw.get("img_resolution", 512)),
        img_channels=pos.get("img_channels", kw.get("img_channels", 3)),
        variant=variant,
        sr_num_fp16_res=kw.get("sr_num_fp16_res", 0),
        mapping_kwargs=tuple(dict(kw.get("mapping_kwargs", {})).items()),
        rendering_kwargs=rk_items,
        **synth_kw,
    )


def load_generator_pkl(path: str, variant: Optional[str] = None, key: str = "G_ema"):
    """One-call port: reference GAN snapshot -> (TriPlaneGenerator config,
    params pytree). Equivalent of load_from_pkl_new_G."""
    data = load_reference_pickle(path)
    g = data[key] if isinstance(data, dict) else data
    assert isinstance(g, PersistentStub), type(g)
    cfg = generator_config_from_pickle(g, variant)
    params = generator_params_from_state(extract_state(g))
    return cfg, params


# ----------------------------------------------------------------------------
# decoder snapshots (ref main/train_pano2gaussian_decoder.py:299-306 pickles
# {'decoder': <persistent SequentialDecoderReverse>, 'dataloader': ...};
# main/load_decoder.py:28-34 loads them)


_DECODER_TYPES = {
    "SequentialDecoderReverse": "sequential_reversed",
    "SequentialDecoder": "sequential",
    "ParallelDecoder": "parallel",
}

_HEAD_NAMES = ("color", "opacity", "rotation", "scale", "xyz")


def decoder_head_params_from_state(flat: Dict[str, np.ndarray]) -> Dict:
    """Flat torch names ({name}_decoder.backbone.{0,2,4,6}.{weight,bias},
    ref main/decoder_models/base_decoder.py:11-19) -> decoder/heads.py
    head-param tree ({name}/fc{0..3}/{weight,bias})."""
    import jax.numpy as jnp

    tree: Dict = {}
    for key, arr in flat.items():
        parts = key.split(".")
        if len(parts) != 4 or parts[1] != "backbone":
            continue
        name = parts[0].removesuffix("_decoder")
        if name not in _HEAD_NAMES:
            continue
        idx = int(parts[2])
        assert idx % 2 == 0, key  # odd indices are the GELUs
        tree.setdefault(name, {}).setdefault(f"fc{idx // 2}", {})[parts[3]] = jnp.asarray(arr)
    return tree


def load_decoder_pkl(path_or_file, key: str = "decoder"):
    """Reference decoder snapshot -> (GaussianDecoder config, params pytree
    incl. the fine-tuned generator copy under 'G').

    Equivalent of main/load_decoder.py:28-34 — the snapshot's 'decoder'
    entry is a persistence-wrapped Sequential*/ParallelDecoder whose G
    module is embedded."""
    from ..decoder.heads import GaussianDecoder

    data = (path_or_file
            if isinstance(path_or_file, (dict, PersistentStub))
            else load_reference_pickle(path_or_file))
    d = data[key] if isinstance(data, dict) else data
    assert isinstance(d, PersistentStub), type(d)
    g_stub = (d.state.get("_modules") or {}).get("G")
    assert isinstance(g_stub, PersistentStub), "decoder snapshot has no G module"
    gen = generator_config_from_pickle(g_stub)
    decoder_type = _DECODER_TYPES.get(d.class_name)
    assert decoder_type is not None, f"unknown decoder class {d.class_name}"
    kw = dict(d.init_kwargs)
    cfg = GaussianDecoder(
        generator=gen,
        decoder_type=decoder_type,
        hidden_dim=int(d.state.get("hidden_dim", kw.get("hidden_dim", 128))),
        use_xyz_embedding=bool(d.state.get("use_xyz_embedding",
                                           kw.get("use_xyz_embedding", True))),
        use_gen_finetune=bool(d.state.get("use_gen_finetune",
                                          kw.get("use_gen_finetune", True))),
    )
    params = decoder_head_params_from_state(extract_state(d))
    params["G"] = generator_params_from_state(extract_state(g_stub))
    return cfg, params


# ----------------------------------------------------------------------------
# discriminators + full GAN snapshots (ref training_loop.py:430-444 pickles
# {'G','D','G_ema','augment_pipe'}; training_loop.py:160-166 resumes by
# copy_params_and_buffers from such a snapshot)


_DISC_MODES = {
    "SingleDiscriminator": "single",
    "DualDiscriminator": "dual",
    "MaskDualDiscriminator": "mask_dual",
}


def discriminator_config_from_pickle(d_stub: PersistentStub):
    """Pickled init metadata -> models/discriminator.py Discriminator
    (ref dual_discriminator.py ctors; positional order c_dim,
    img_resolution, img_channels[, seg_resolution, seg_channels])."""
    from ..models.discriminator import Discriminator

    cls = d_stub.class_name.rsplit(".", 1)[-1]
    mode = _DISC_MODES.get(cls)
    assert mode is not None, f"unsupported discriminator class {cls}"
    kw = dict(d_stub.init_kwargs)
    names = ["c_dim", "img_resolution", "img_channels"]
    if mode == "mask_dual":
        names += ["seg_resolution", "seg_channels"]
    pos = dict(zip(names, d_stub.init_args))

    def get(k, default):
        return pos.get(k, kw.get(k, default))

    ep = dict(kw.get("epilogue_kwargs", {}))
    return Discriminator(
        c_dim=get("c_dim", 25),
        img_resolution=get("img_resolution", 512),
        img_channels=get("img_channels", 3),
        mode=mode,
        architecture=kw.get("architecture", "resnet"),
        channel_base=kw.get("channel_base", 32768),
        channel_max=kw.get("channel_max", 512),
        num_fp16_res=kw.get("num_fp16_res", 4),
        conv_clamp=kw.get("conv_clamp", 256),
        cmap_dim=kw.get("cmap_dim"),
        disc_c_noise=float(kw.get("disc_c_noise", 0.0)),
        seg_resolution=get("seg_resolution", 64),
        seg_channels=get("seg_channels", 1),
        mbstd_group_size=ep.get("mbstd_group_size", 4),
    )


def discriminator_params_from_state(flat: Dict[str, np.ndarray]) -> Dict:
    """Flat torch names -> Discriminator param tree (b{res}/sb{res}/
    mapping/b4 naming matches the reference module tree 1:1)."""
    return _nest(flat)


def load_gan_snapshot_pkl(path_or_file):
    """Reference GAN training snapshot -> dict with ported configs/params:
    {'G': cfg, 'g_params', 'g_ema', 'D': cfg (or None), 'd_params'}.

    Accepts a path, a file-like, or an ALREADY-LOADED snapshot dict (so
    callers that inspected the pickle don't pay a second full unpickle).
    """
    data = (path_or_file if isinstance(path_or_file, dict)
            else load_reference_pickle(path_or_file))
    assert isinstance(data, dict), type(data)
    out: Dict[str, Any] = {}
    g = data.get("G") or data.get("G_ema")
    assert isinstance(g, PersistentStub), "snapshot has no generator"
    out["G"] = generator_config_from_pickle(g)
    out["g_params"] = generator_params_from_state(extract_state(g))
    ema = data.get("G_ema")
    out["g_ema"] = (
        generator_params_from_state(extract_state(ema))
        if isinstance(ema, PersistentStub) else out["g_params"]
    )
    d = data.get("D")
    if isinstance(d, PersistentStub):
        out["D"] = discriminator_config_from_pickle(d)
        out["d_params"] = discriminator_params_from_state(extract_state(d))
    else:
        out["D"] = None
        out["d_params"] = None
    return out
