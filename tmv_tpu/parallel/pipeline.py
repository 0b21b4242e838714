"""Pipeline parallelism: GPipe-style microbatching over a ``pipe`` mesh axis.

The reference has no pipeline story (single-GPU Keras `Model.fit`); this
is the TPU-native capability for models whose *depth* outgrows one chip:
P uniform stages live on P devices (each holding 1/P of the stage
parameters), microbatches stream through the pipe, and activations hop
between neighbor devices over ICI via ``lax.ppermute``.  The schedule is
the classic GPipe fill/steady/drain: ``M + P - 1`` ticks for ``M``
microbatches, bubble fraction ``(P-1)/(M+P-1)``.

Built with ``jax.shard_map`` (explicit SPMD) rather than sharding
annotations: pipelining is a *schedule*, not a layout, so GSPMD cannot
discover it — this is the one place in the framework where collectives
are written by hand.  Reverse-mode differentiation works through the
whole schedule (the scan + ppermute transpose is the backward pipeline),
so ``jax.grad`` of a loss over :func:`pipeline_apply` trains the staged
model; the tests pin forward *and* gradient equality against the serial
program on the virtual 8-device CPU mesh.

Requirements: all stages share one ``stage_fn(params, x) -> y`` with
``y`` shaped like ``x`` (uniform stages — e.g. repeated BiFPN cells,
`layers/bifpn.py:89-118`, or the residual sub-blocks of a CSP stage).
Activations may be arbitrary pytrees (the multi-level BiFPN feature
tuple pipelines as one unit).  The global batch must divide into
``n_microbatches`` equal microbatches.
"""

import functools
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tmv_tpu.parallel.mesh import create_mesh


def stack_stage_params(param_trees: Sequence):
    """Stack per-stage parameter pytrees along a new leading axis.

    All trees must share structure and leaf shapes (uniform stages); the
    result is the ``stacked_params`` input of :func:`pipeline_apply`,
    sharded so device ``i`` holds stage ``i``'s slice.
    """
    return jax.tree.map(lambda *leaves: jnp.stack(leaves), *param_trees)


def _split_microbatches(x, n_microbatches: int):
    def split(leaf):
        b = leaf.shape[0]
        if b % n_microbatches != 0:
            raise ValueError(
                f"batch {b} not divisible into {n_microbatches} microbatches")
        return leaf.reshape((n_microbatches, b // n_microbatches)
                            + leaf.shape[1:])

    return jax.tree.map(split, x)


def _merge_microbatches(x):
    return jax.tree.map(
        lambda leaf: leaf.reshape((leaf.shape[0] * leaf.shape[1],)
                                  + leaf.shape[2:]), x)


def pipeline_apply(stage_fn: Callable, stacked_params, x, mesh: Mesh,
                   n_microbatches: int, axis: str = "pipe",
                   data_axis: Optional[str] = None):
    """Run ``x`` through ``P = mesh.shape[axis]`` pipelined stages.

    ``stage_fn(params, mb) -> mb`` is one stage on one microbatch;
    ``stacked_params`` has a leading stage axis of size P (see
    :func:`stack_stage_params`).  ``x`` is the full batch (any pytree of
    batch-leading arrays); the return value is ``stage_P-1(...stage_0(x))``
    exactly, computed on the GPipe schedule.

    With ``data_axis`` set (2-D ``(data, pipe)`` mesh) each microbatch
    additionally shards over the data axis — dp x pp composition.
    """
    n_stages = mesh.shape[axis]
    xs = _split_microbatches(x, n_microbatches)

    param_spec = jax.tree.map(lambda _: P(axis), stacked_params)
    xs_spec = jax.tree.map(lambda _: P(None, data_axis), xs)

    def local_program(params_local, xs_local):
        # this device's stage: drop the size-1 stage axis
        params_local = jax.tree.map(lambda a: a[0], params_local)
        idx = lax.axis_index(axis)
        shift_perm = [(i, i + 1) for i in range(n_stages - 1)]
        zero_mb = jax.tree.map(lambda a: jnp.zeros_like(a[0]), xs_local)
        out_init = jax.tree.map(jnp.zeros_like, xs_local)

        def tick(carry, t):
            state, outputs = carry
            # stage 0 injects microbatch t (garbage past M never reaches
            # the last stage inside the loop horizon)
            inject = jax.tree.map(
                lambda a: lax.dynamic_index_in_dim(
                    a, jnp.minimum(t, n_microbatches - 1), 0,
                    keepdims=False),
                xs_local)
            x_in = jax.tree.map(
                lambda i, s: jnp.where(idx == 0, i, s), inject, state)
            y = stage_fn(params_local, x_in)
            # last stage commits finished microbatch t-(P-1)
            pos = t - (n_stages - 1)
            write = jnp.logical_and(idx == n_stages - 1, pos >= 0)
            safe = jnp.clip(pos, 0, n_microbatches - 1)
            outputs = jax.tree.map(
                lambda o, v: jnp.where(
                    write,
                    lax.dynamic_update_index_in_dim(o, v, safe, 0), o),
                outputs, y)
            state = jax.tree.map(
                lambda v: lax.ppermute(v, axis, shift_perm), y)
            return (state, outputs), None

        (_, outputs), _ = lax.scan(
            tick, (zero_mb, out_init),
            jnp.arange(n_microbatches + n_stages - 1))
        # only the last stage holds real outputs; psum replicates them
        outputs = jax.tree.map(
            lambda o: lax.psum(
                jnp.where(idx == n_stages - 1, o, jnp.zeros_like(o)),
                axis),
            outputs)
        return outputs

    out = jax.shard_map(
        local_program, mesh=mesh,
        in_specs=(param_spec, xs_spec),
        out_specs=jax.tree.map(lambda _: P(None, data_axis), xs),
        check_vma=False,
    )(stacked_params, xs)
    return _merge_microbatches(out)


def make_efficientdet_bifpn_pipeline(model, variables, n_microbatches: int,
                                     devices: Optional[Sequence] = None):
    """Pipelined EfficientDet forward: the repeated BiFPN cells run as
    GPipe stages, one cell per device.

    The reference's deepest configuration repeats the BiFPN cell 8 times
    (`utils/global_params.py:125-140`, fpn_cell_repeats for D7/D7x) —
    cells 1..R-1 are *uniform* (same parameter structure: by cell 1 every
    level already carries ``fpn_num_filters`` channels, so the entry
    resamples of cell 0 vanish), which makes them natural pipeline
    stages.  The backbone, cell 0, and the heads stay stage-local on
    every device (replicated); the multi-level feature tuple flows
    through the pipe as one pytree activation.

    Returns ``(forward, stacked_cells, mesh)`` where
    ``forward(variables, stacked_cells, images) -> (boxes, classes)``
    is jittable and equals ``model.apply(variables, images,
    train=False)`` exactly.  Requires ``fpn_cell_repeats - 1`` devices.
    """
    from tmv_tpu.models.efficientdet.backbone import BackboneModel
    from tmv_tpu.models.efficientdet.bifpn import BiFPN, ResampleFeatureMap
    from tmv_tpu.models.efficientdet.config import default_blocks_args
    from tmv_tpu.models.efficientdet.heads import BoxNet, ClassNet

    cfg = model.config
    n_stages = cfg.fpn_cell_repeats - 1
    if n_stages < 1:
        raise ValueError("need fpn_cell_repeats >= 2 to pipeline")
    mesh = create_mesh(n_stages, ("pipe",), devices=devices)
    bn_m, bn_e = cfg.batch_norm_momentum, cfg.batch_norm_epsilon
    levels_size = tuple(cfg.levels_size[cfg.min_level:cfg.max_level + 1])

    def sub(name):
        return {"params": variables["params"][name],
                "batch_stats": variables["batch_stats"][name]}

    cell = BiFPN(cfg.fpn_num_filters, levels_size,
                 weight_method=cfg.get("fpn_weight_method", "fastattn"),
                 bn_momentum=bn_m, bn_epsilon=bn_e, dtype=model.dtype)
    stacked_cells = stack_stage_params(
        [sub(f"fpn_cell_{i}") for i in range(1, cfg.fpn_cell_repeats)])
    spec = jax.tree.map(lambda _: P("pipe"), stacked_cells)
    stacked_cells = jax.tree.map(
        lambda a, s: jax.device_put(a, NamedSharding(mesh, s)),
        stacked_cells, spec)

    def stage_fn(cell_vars, feats):
        return cell.apply(cell_vars, feats, train=False)

    backbone = BackboneModel(
        blocks_args=tuple(default_blocks_args()),
        width_coefficient=cfg.width_coefficient,
        depth_coefficient=cfg.depth_coefficient,
        depth_divisor=cfg.depth_divisor,
        bn_momentum=bn_m, bn_epsilon=bn_e, dtype=model.dtype,
    )
    num_levels = cfg.max_level - cfg.min_level + 1
    num_anchors = len(cfg.aspect_ratios) * cfg.num_scales
    class_net = ClassNet(
        num_classes=cfg.num_classes, num_anchors=num_anchors,
        num_filters=cfg.fpn_num_filters, num_levels=num_levels,
        repeats=cfg.box_class_repeats, survival_prob=cfg.survival_prob,
        dtype=model.dtype)
    box_net = BoxNet(
        num_anchors=num_anchors, num_filters=cfg.fpn_num_filters,
        num_levels=num_levels, repeats=cfg.box_class_repeats,
        survival_prob=cfg.survival_prob, dtype=model.dtype)

    def forward(variables, stacked_cells, images):
        def sub_(name):
            # parameterless submodules (e.g. a channel-matched resample)
            # have no variables entry at all
            return {"params": variables["params"].get(name, {}),
                    "batch_stats": variables["batch_stats"].get(name, {})}

        all_feats = backbone.apply(sub_("backbone"), images, train=False)
        feats = list(all_feats[cfg.min_level:cfg.max_level + 1])
        for level in range(6, cfg.max_level + 1):
            rs = ResampleFeatureMap(cfg.fpn_num_filters,
                                    cfg.levels_size[level],
                                    bn_m, bn_e, model.dtype)
            feats.append(rs.apply(sub_(f"resample_p{level}"), feats[-1],
                                  train=False))
        feats = cell.apply(sub_("fpn_cell_0"), tuple(feats), train=False)
        feats = pipeline_apply(stage_fn, stacked_cells, tuple(feats),
                               mesh, n_microbatches=n_microbatches)
        classes = class_net.apply(sub_("class_net"), feats, train=False)
        boxes = box_net.apply(sub_("box_net"), feats, train=False)
        return boxes, classes

    return forward, stacked_cells, mesh


class PipelineParallel:
    """1-D ``pipe`` (or 2-D ``data x pipe``) mesh wrapper.

    ``build(stage_fn, per_stage_params, n_microbatches)`` returns a
    jitted ``f(stacked_params, batch) -> batch``-shaped callable running
    the GPipe schedule; differentiate through it for pipelined training.
    """

    def __init__(self, pipe: int, data: int = 1,
                 devices: Optional[Sequence] = None):
        axes = ("data", "pipe") if data > 1 else ("pipe",)
        shape = (data, pipe) if data > 1 else (pipe,)
        self.mesh: Mesh = create_mesh(
            data * pipe, axes, shape=shape, devices=devices)
        self.data_axis = "data" if data > 1 else None
        self.n_stages = pipe

    def stack(self, param_trees: Sequence):
        stacked = stack_stage_params(param_trees)
        spec = jax.tree.map(lambda _: P("pipe"), stacked)
        return jax.tree.map(
            lambda a, s: jax.device_put(a, NamedSharding(self.mesh, s)),
            stacked, spec)

    def build(self, stage_fn: Callable, n_microbatches: int) -> Callable:
        fn = functools.partial(
            pipeline_apply, stage_fn, mesh=self.mesh,
            n_microbatches=n_microbatches, data_axis=self.data_axis)

        def run(stacked_params, x):
            return fn(stacked_params, x=x)

        return jax.jit(run)
