"""Device-mesh construction and sharding helpers.

The reference's entire distributed story is single-host data parallelism via
``tf.distribute.MirroredStrategy`` + one gradient ``all_reduce('mean')``
(`facenet/train.py:71`, `facenet/facenet_model.py:297-299`).  The TPU-native
replacement is a 1-D (or 2-D for future model sharding) ``jax.sharding.Mesh``
with batch-sharded inputs and replicated parameters: ``jax.jit`` with these
shardings makes XLA insert the gradient ``psum`` over ICI automatically —
no explicit collective code, no NCCL analog.

Tests exercise this on a virtual 8-device CPU mesh
(``--xla_force_host_platform_device_count=8``); the same code drives real
multi-chip slices.
"""

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("data",),
    shape: Optional[Sequence[int]] = None,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a mesh over available devices (default: 1-D data mesh).

    ``devices`` pins an explicit device subset/ordering; the default is
    ``jax.devices()``.
    """
    devices = list(devices) if devices is not None else jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place a host batch onto the mesh, sharded along the leading axis."""
    sharding = NamedSharding(mesh, P(axis))

    def put(x):
        return jax.device_put(x, sharding)

    return jax.tree.map(put, batch)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (params/state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
