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

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
