"""Test configuration: run everything on CPU with 8 virtual devices so the
multi-chip sharding paths are exercised without TPU hardware (SURVEY.md §4).

NOTE: this image's sitecustomize registers the `axon` TPU plugin and pins
JAX_PLATFORMS at interpreter start, so the env var alone does NOT select the
backend — the programmatic `jax.config.update("jax_platforms", ...)` below is
what actually forces CPU (it must run before the first backend use).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

# compilation here is wall-clock slow (~1-4s per distinct op/shape); cache
# compiled executables across runs so only the first run pays
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
