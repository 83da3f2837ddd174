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

# Persistent compile cache: OPT-IN ONLY (LIMOVELO_TEST_CACHE=1).
#
# Two failure modes observed on this jaxlib when the cache is on for tests:
#  1. loading an XLA:CPU AOT entry compiled on a DIFFERENT machine SIGILLs
#     (entries encode host CPU features; this workspace moves between
#     heterogeneous hosts) — mitigated by the machine-tag dir name below;
#  2. `executable.serialize()` during the cache WRITE of large executables
#     (the 8-device shard_map step, the racing-bucket pipeline step)
#     sporadically SIGSEGVs/SIGABRTs deep in jaxlib, killing the whole
#     suite late in a cold run.  A one-shot cold run gains nothing from the
#     cache, so the default is OFF; iterating developers opt in and retry
#     on the rare crash.
if os.environ.get("LIMOVELO_TEST_CACHE"):
    def _machine_tag() -> str:
        import hashlib
        import platform

        feats = ""
        try:
            with open("/proc/cpuinfo") as f:
                for line in f:
                    if line.startswith("flags"):
                        feats = line
                        break
        except OSError:
            pass
        return hashlib.sha1(
            (platform.machine() + feats).encode()
        ).hexdigest()[:12]

    jax.config.update("jax_compilation_cache_dir",
                      f"/tmp/jax_cache_cpu_{_machine_tag()}")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True, scope="module")
def _drop_executables_between_modules():
    """Free compiled executables after each test module.

    Observed on this jaxlib/2-vCPU image: once a long suite process has
    accumulated a few hundred compiled programs, the NEXT large compile (the
    8-device shard_map step, the racing-bucket pipeline step) sporadically
    SIGSEGV/SIGABRTs inside XLA:CPU (`backend_compile_and_load` /
    `executable.serialize`).  Isolated runs of the same tests pass.  Clearing
    the jit caches between modules keeps the live-executable population small
    and has not crashed since; the cost is cross-module recompiles."""
    yield
    jax.clear_caches()
