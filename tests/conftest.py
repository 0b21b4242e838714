"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is unavailable in CI; sharding logic is validated on
host-platform virtual devices instead (same XLA partitioner).  The bundled
'axon' TPU plugin force-registers itself regardless of ``JAX_PLATFORMS``, so
the platform must be pinned via ``jax.config`` after import (env vars alone
do not stick).
"""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: measured on a 1-CPU box, full tier
# ~40 min cold; smoke tier `-m "not slow"` ~19 min cold / ~13 min warm
# (only XLA compilation is cached — tracing/lowering is re-done every
# run, so the warm floor is trace-bound).
_cache_dir = os.environ.get(
    "TMV_TEST_COMPILE_CACHE",
    os.path.join(os.path.expanduser("~"), ".cache", "tmv_test_jax_cache"))
if _cache_dir:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
