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
    _flags += " --xla_force_host_platform_device_count=8"
# Tests assert numerics/shapes, not speed: skip the XLA optimization
# pipeline (compile time dominates the suite on this 1-core host).
if "xla_backend_optimization_level" not in _flags:
    _flags += " --xla_backend_optimization_level=0"
os.environ["XLA_FLAGS"] = _flags

import jax

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: several engine/sharding tests compile the
# identical train-step HLO (same config, fresh closures) — and re-runs of
# the suite recompile everything from scratch. Keyed by HLO hash, so
# staleness is not a correctness risk.
jax.config.update("jax_compilation_cache_dir", "/tmp/kmunet_jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
