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
#
# KNOWN XLA-CPU HAZARD at optimization level 0: large backward graphs can
# be MISCOMPILED into NaN gradients while the forward stays finite — seen
# reproducibly on the full SmaAt-UNet train step at B4 32^2 (grads NaN at
# level 0, bit-healthy at the default level; forward intermediates all
# finite either way). Individual ops and small composites do not trigger
# it. If a grad-finiteness test fails ONLY under this harness, re-check at
# the default optimization level before treating it as a model bug
# (XLA_FLAGS without the level-0 flag); real-TPU runs are unaffected.
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
