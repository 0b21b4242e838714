"""Tensor (model) parallelism: shard parameter channels across devices.

The reference has no model-sharding story at all — its largest model
(EfficientDet-D7x, `utils/global_params.py:125-140`) must fit one GPU.
This module adds the TPU-native mechanism: a ``model`` mesh axis over
which convolution kernels shard along their *output-channel* dimension
(and dense kernels along their output features).  Under ``jax.jit`` the
XLA GSPMD partitioner propagates the parameter shardings through the
graph and inserts the reduce-scatter/all-gather collectives over ICI
automatically; the math is identical to the unsharded program up to
collective reduction order (tests assert fp-tolerance equality on the
virtual 8-device CPU mesh).

Sharding is assigned by a *shape rule*, not by parameter paths, so the
same rule covers params, batch_stats, and optimizer state (momentum /
Adam moments mirror the kernel shapes):

- rank-4 HWIO conv kernels: ``P(None, None, None, 'model')`` when the
  output-channel dim divides the axis and is >= ``min_channels``;
- rank-2 dense kernels: ``P(None, 'model')`` under the same condition;
- rank-1 channel vectors (bias, BN scale/offset/moments):
  ``P('model')`` when divisible and >= ``min_channels``;
- everything else (scalars, tiny fusion weights, step counters):
  replicated.

``min_channels`` keeps small leaves (BiFPN fast-attention scalars, head
prior biases on tiny class counts) replicated — sharding them would cost
more collective latency than it saves in memory.

Unlike data/spatial parallelism this is a *memory* lever first: each
device holds ``1/model`` of the parameters and optimizer state, the
TPU-native equivalent of ZeRO-3/FSDP for the conv zoo.  Combine with the
``data`` axis (``TensorParallel(data=…, model=…)``) for the standard
dp x tp grid.
"""

from typing import Callable, Optional, Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tmv_tpu.parallel.mesh import create_mesh


def tensor_spec(shape: Sequence[int], axis_size: int,
                axis: str = "model", min_channels: int = 8) -> P:
    """Shape-rule PartitionSpec for one parameter/optimizer leaf."""
    if not shape:
        return P()
    c = shape[-1]
    if c % axis_size != 0 or c < min_channels:
        return P()
    ndim = len(shape)
    if ndim == 4:
        return P(None, None, None, axis)
    if ndim == 2:
        return P(None, axis)
    if ndim == 1:
        return P(axis)
    # rank-3/5+ leaves (none in the current zoo): shard the last dim
    return P(*([None] * (ndim - 1) + [axis]))


def tensor_shardings(tree, mesh: Mesh, axis: str = "model",
                     min_channels: int = 8):
    """Per-leaf NamedShardings for a params/state pytree via the shape rule."""
    size = mesh.shape[axis]

    def leaf(x):
        return NamedSharding(
            mesh, tensor_spec(getattr(x, "shape", ()), size, axis,
                              min_channels))

    return jax.tree.map(leaf, tree)


class TensorParallel:
    """(data x model) mesh wrapper: batch shards over ``data``, parameter
    channels shard over ``model``.

    Mirrors ``DataParallel``/``SpatialDataParallel``: ``put_state`` places
    the train state with per-leaf channel shardings, ``put_batch`` shards
    the batch over ``data``, and ``wrap_step``/``wrap_forward`` jit with
    those shardings so GSPMD inserts all collectives.
    """

    def __init__(self, data: Optional[int] = None, model: int = 2,
                 devices: Optional[Sequence] = None, min_channels: int = 8):
        devs = list(devices) if devices is not None else jax.devices()
        if data is None:
            data = len(devs) // model
        n = data * model
        if n > len(devs):
            raise ValueError(
                f"mesh {data}x{model} needs {n} devices, have {len(devs)}")
        self.mesh: Mesh = create_mesh(
            n, ("data", "model"), shape=(data, model), devices=devs)
        self.min_channels = min_channels
        self.batch_sharding = NamedSharding(self.mesh, P("data"))
        self.replicated = NamedSharding(self.mesh, P())

    @property
    def num_devices(self) -> int:
        return self.mesh.devices.size

    def state_shardings(self, state):
        return tensor_shardings(state, self.mesh,
                                min_channels=self.min_channels)

    def put_state(self, state):
        shardings = self.state_shardings(state)
        return jax.tree.map(jax.device_put, state, shardings)

    def put_batch(self, batch):
        return jax.tree.map(
            lambda x: jax.device_put(x, self.batch_sharding), batch)

    def put_rng(self, key):
        return jax.device_put(key, self.replicated)

    def wrap_step(self, train_step: Callable, example_state) -> Callable:
        """jit a ``(state, batch, rng) -> (state, metrics)`` train step.

        The state keeps its channel shardings across steps (gradients and
        optimizer updates inherit them), so parameter memory stays
        ``1/model`` per device for the whole run.
        """
        state_sh = self.state_shardings(example_state)
        return jax.jit(
            train_step,
            in_shardings=(state_sh, self.batch_sharding, self.replicated),
            out_shardings=(state_sh, self.replicated),
        )

    def wrap_forward(self, apply_fn: Callable, example_variables) -> Callable:
        """jit a ``(variables, images) -> outputs`` forward pass with
        channel-sharded variables and data-sharded images; outputs are
        replicated for host fetch."""
        var_sh = tensor_shardings(example_variables, self.mesh,
                                  min_channels=self.min_channels)
        return jax.jit(
            apply_fn,
            in_shardings=(var_sh, self.batch_sharding),
            out_shardings=self.replicated,
        )
