"""Test config: run everything on a virtual 8-device CPU mesh.

Mirrors SURVEY.md §4's test plan: golden-value parity against torch math
(torch-cpu is the oracle, playing the role of the reference's impl='ref'
paths) plus multi-device tests without TPU hardware.

Must set XLA flags BEFORE jax initialises.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize pins the TPU tunnel backend regardless of env;
# jax.config.update reliably overrides it before backend init.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)  # f64 golden parity vs torch

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
