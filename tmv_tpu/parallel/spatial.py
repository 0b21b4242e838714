"""Spatial partitioning: shard the image *height* axis across devices.

The reference's only "scale the input" axis is image resolution — the
EfficientDet family runs up to 1536 px (`utils/global_params.py:125-140`)
— yet it has no mechanism to split one image across accelerators.  This
module adds that capability the TPU-native way: a 2-D ``(data, space)``
``jax.sharding.Mesh`` where batches shard over ``data`` and the H axis of
NHWC image tensors shards over ``space``.  Convolutions need halo rows from
spatial neighbors; under ``jax.jit`` with these sharding annotations the
XLA GSPMD partitioner inserts the halo-exchange collectives (``ppermute``
over ICI) automatically — no manual collective code, and the math is
bit-identical to the unsharded program (tests assert this on the virtual
8-device CPU mesh).

Use cases: D6/D7x @1280-1536 px where one image's activations pressure a
single chip's HBM, and UNet-style dense prediction on large inputs.  For
ordinary resolutions pure data parallelism (``parallel/train.py``) is
faster — spatial halos cost ICI bandwidth — so ``space`` is opt-in.
"""

from typing import Callable, Optional, Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tmv_tpu.parallel.mesh import create_mesh


def spatial_spec(ndim: int, data_axis: str = "data",
                 space_axis: str = "space") -> P:
    """PartitionSpec for a batch leaf: NHWC tensors shard (batch, H)."""
    if ndim >= 4:
        return P(data_axis, space_axis)
    if ndim >= 1:
        return P(data_axis)
    return P()


class SpatialDataParallel:
    """2-D (data × space) mesh wrapper: dp over batch, sp over image height.

    ``wrap_step``/``wrap_forward`` mirror ``DataParallel`` but shard every
    rank≥4 batch leaf as ``P('data', 'space')`` (NHWC → H split).  State is
    replicated; XLA inserts gradient all-reduces *and* conv halo exchanges.
    """

    def __init__(self, data: Optional[int] = None, space: int = 2,
                 devices: Optional[Sequence] = None):
        devs = list(devices) if devices is not None else jax.devices()
        if data is None:
            data = len(devs) // space
        n = data * space
        if n > len(devs):
            raise ValueError(
                f"mesh {data}x{space} needs {n} devices, have {len(devs)}")
        self.mesh: Mesh = create_mesh(
            n, ("data", "space"), shape=(data, space), devices=devs)
        self.replicated = NamedSharding(self.mesh, P())

    @property
    def num_devices(self) -> int:
        return self.mesh.devices.size

    def leaf_sharding(self, x) -> NamedSharding:
        spec = spatial_spec(getattr(x, "ndim", 0))
        # coarse leaves (e.g. low-resolution target grids) whose height
        # doesn't divide the space axis stay data-sharded
        shape = getattr(x, "shape", ())
        n_space = self.mesh.shape["space"]
        if (spec == P("data", "space")
                and (len(shape) < 2 or shape[1] % n_space != 0)):
            spec = P("data")
        return NamedSharding(self.mesh, spec)

    def put_batch(self, batch):
        return jax.tree.map(
            lambda x: jax.device_put(x, self.leaf_sharding(x)), batch)

    def put_state(self, state):
        return jax.tree.map(
            lambda x: jax.device_put(x, self.replicated), state)

    def put_rng(self, key):
        return jax.device_put(key, self.replicated)

    def _batch_shardings(self, batch):
        return jax.tree.map(lambda x: self.leaf_sharding(x), batch)

    def wrap_step(self, train_step: Callable, example_batch) -> Callable:
        """jit a ``(state, batch, rng) -> (state, metrics)`` train step."""
        return jax.jit(
            train_step,
            in_shardings=(self.replicated,
                          self._batch_shardings(example_batch),
                          self.replicated),
            out_shardings=(self.replicated, self.replicated),
        )

    def wrap_forward(self, apply_fn: Callable, example_batch) -> Callable:
        """jit a ``(variables, images) -> outputs`` forward pass.

        Outputs keep compiler-chosen shardings (they are typically spatially
        sharded feature maps; fetch or re-shard as needed downstream).
        """
        return jax.jit(
            apply_fn,
            in_shardings=(self.replicated,
                          self._batch_shardings(example_batch)),
        )
