"""Data-parallel sharded inference over a device mesh.

Serving scales across chips the TPU-native way: the batched predictor is
one jitted program whose batch dimension is sharded over the mesh's
``data`` axis with replicated variables.  GSPMD splits the forward across
devices automatically; the per-image decode+NMS tail is batch-local, so
the program contains **zero cross-device collectives** — scaling is
embarrassingly parallel over ICI-attached chips and latency stays at the
single-chip per-image cost.

No reference counterpart: the reference serves a single float32 Keras
model per uWSGI worker process (`AIServer/views/object_detection.py:17-37`,
`uwsgi.ini`), multiplying *processes* to scale; here one process drives
the whole slice.

Use with the serving micro-batch queue: ``MicroBatcher`` already pads
every batch to ``max_batch``, so a capacity that is a multiple of the
mesh size keeps shapes static and shards even.
"""

from typing import Callable

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def shard_predict(predict_fn: Callable, mesh: Mesh,
                  axis: str = "data") -> Callable:
    """Wrap ``predict_fn(variables, images) -> outputs`` so the batch is
    sharded over ``mesh``'s ``axis`` and the variables are replicated.

    ``images`` must have a leading batch dimension divisible by the axis
    size; every output array keeps its leading batch dimension (the
    prefix ``PartitionSpec`` broadcasts over the output pytree).
    """
    data = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())
    return jax.jit(predict_fn, in_shardings=(repl, data),
                   out_shardings=data)


def shard_predict_spatial(predict_fn: Callable, mesh: Mesh,
                          axis: str = "space") -> Callable:
    """Latency-direction sharding: split the single image's HEIGHT over
    ``mesh``'s ``axis`` (variables replicated).

    Where :func:`shard_predict` multiplies *throughput* (batch split, no
    collectives), this divides *per-image latency*: the convolutional
    forward partitions spatially and GSPMD inserts the conv halo
    exchanges (``ppermute`` over ICI) automatically — the serving analog
    of ``SpatialDataParallel`` (`parallel/spatial.py`); math is
    bit-identical to the unsharded program.  Use for big-resolution
    models (D6/D7x @1280–1536 px); at small resolutions halo traffic
    eats the win.  Input: ``(variables, (1, H, W, 3))`` with H divisible
    by the axis size; outputs are replicated for host fetch.
    """
    image = NamedSharding(mesh, P(None, axis))
    repl = NamedSharding(mesh, P())
    return jax.jit(predict_fn, in_shardings=(repl, image),
                   out_shardings=repl)


def make_spatial_predictor(predict_fn: Callable, variables,
                           n_devices: int = 0):
    """Convenience for the serve CLI: 1-D ``space`` mesh over
    ``n_devices`` (0 = all), variables replicated; returns
    ``(sharded_predict, placed_variables, mesh)``."""
    from tmv_tpu.parallel.mesh import create_mesh, replicate

    mesh = create_mesh(n_devices or None, ("space",))
    placed = replicate(variables, mesh)
    return shard_predict_spatial(predict_fn, mesh), placed, mesh


def make_sharded_batched_predictor(batched_predict: Callable, variables,
                                   n_devices: int = 0, axis: str = "data"):
    """Convenience for the serve CLI: build a 1-D data mesh over
    ``n_devices`` (0 = all), replicate ``variables`` onto it, and return
    ``(sharded_predict, placed_variables, mesh)``."""
    from tmv_tpu.parallel.mesh import create_mesh, replicate

    mesh = create_mesh(n_devices or None, (axis,))
    placed = replicate(variables, mesh)
    return shard_predict(batched_predict, mesh, axis), placed, mesh
