"""Test harness: run everything on a virtual 8-device CPU mesh.

The container's sitecustomize registers the TPU (axon) PJRT plugin at
interpreter startup, so JAX_PLATFORMS env vars are too late here — we switch
platforms via jax.config before any backend is initialized, and force 8
virtual CPU devices so multi-chip sharding logic runs without TPU hardware
(SURVEY.md §4d).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = _flags + " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
