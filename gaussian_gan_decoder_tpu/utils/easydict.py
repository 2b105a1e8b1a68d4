"""Attribute-access dict used throughout the framework.

Mirrors the role of ``dnnlib.EasyDict`` in the reference
(/root/reference/main/dnnlib/util.py:42) as the lightweight result/config
container (decoder outputs, target-sample records, config trees).

Registered as a JAX pytree so EasyDicts can flow through jit/vmap/grad.
"""
from __future__ import annotations

import jax


class EasyDict(dict):
    """dict with attribute access: d.key == d['key']."""

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError:
            raise AttributeError(name) from None

    def __setattr__(self, name, value):
        self[name] = value

    def __delattr__(self, name):
        del self[name]


def _flatten(d):
    keys = sorted(d.keys())
    return [d[k] for k in keys], tuple(keys)


def _unflatten(keys, values):
    return EasyDict(zip(keys, values))


jax.tree_util.register_pytree_node(EasyDict, _flatten, _unflatten)
