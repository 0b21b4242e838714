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
#
# The default dir is keyed by a host-CPU fingerprint: XLA:CPU caches AOT
# machine code whose cache key does NOT include the host ISA, so a cache
# directory carried over from a different box loads mis-targeted code
# (cpu_aot_loader warns "could lead to execution errors such as SIGILL" —
# observed here as hard aborts inside jitted steps).


def _host_fingerprint():
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha256(
                        " ".join(sorted(line.split()[2:])).encode()
                    ).hexdigest()[:12]
    except OSError:
        pass
    import platform

    return hashlib.sha256(platform.processor().encode()).hexdigest()[:12]


_cache_dir = os.environ.get(
    "TMV_TEST_COMPILE_CACHE",
    os.path.join(os.path.expanduser("~"), ".cache",
                 f"tmv_test_jax_cache_{_host_fingerprint()}"))
if _cache_dir:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
    # share the cache with test subprocesses (tests/dp_equiv_cases.py)
    os.environ.setdefault("TMV_TEST_COMPILE_CACHE_DIR", _cache_dir)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
