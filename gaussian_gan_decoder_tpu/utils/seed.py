"""Deterministic seeding.

Equivalent of /root/reference/main/decoder_utils/seed.py:6-13. JAX has no
global RNG — determinism comes from explicit PRNG keys — so this seeds the
HOST-side generators (python/numpy, used by data loaders and samplers) and
hands back the root JAX key. cudnn-determinism flags have no analog: XLA
compilation is deterministic by default.
"""
from __future__ import annotations

import random

import jax
import numpy as np


def set_seeds(seed: int) -> jax.Array:
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)
