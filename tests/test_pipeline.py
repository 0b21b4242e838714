"""Pipeline parallelism (`parallel/pipeline.py`): the GPipe schedule over
the virtual 8-device CPU mesh must reproduce the serial stage composition
exactly — forward AND gradients (the scan+ppermute transpose is the
backward pipeline).

No reference counterpart (single-GPU Keras training); this is new
TPU-native capability for depth-sharded models.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax import lax

from tmv_tpu.parallel.pipeline import (
    PipelineParallel, pipeline_apply, stack_stage_params,
)
from tmv_tpu.parallel.mesh import create_mesh


def dense_stage(params, x):
    return jnp.tanh(x @ params["w"] + params["b"])


def conv_stage(params, x):
    y = lax.conv_general_dilated(
        x, params["k"], window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return jnp.tanh(y + params["b"])


def serial_apply(stage_fn, param_trees, x):
    for p in param_trees:
        x = stage_fn(p, x)
    return x


def make_dense_params(n_stages, d, seed=0):
    rng = np.random.default_rng(seed)
    return [
        {"w": jnp.asarray(rng.normal(0, 0.5, (d, d)).astype(np.float32)),
         "b": jnp.asarray(rng.normal(0, 0.1, (d,)).astype(np.float32))}
        for _ in range(n_stages)
    ]


class TestPipelineParallel:
    def test_stack_stage_params(self):
        trees = make_dense_params(4, 3)
        stacked = stack_stage_params(trees)
        assert stacked["w"].shape == (4, 3, 3)
        np.testing.assert_array_equal(np.asarray(stacked["b"][2]),
                                      np.asarray(trees[2]["b"]))

    def test_forward_matches_serial_dense(self):
        n_stages, d, batch = 8, 4, 12
        trees = make_dense_params(n_stages, d)
        x = jnp.asarray(np.random.default_rng(1).normal(
            0, 1, (batch, d)).astype(np.float32))
        ref = serial_apply(dense_stage, trees, x)

        pp = PipelineParallel(pipe=n_stages)
        run = pp.build(dense_stage, n_microbatches=4)
        out = run(pp.stack(trees), x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-6, atol=1e-6)

    def test_forward_matches_serial_conv(self):
        n_stages, c, batch = 4, 4, 8
        rng = np.random.default_rng(2)
        trees = [
            {"k": jnp.asarray(rng.normal(0, 0.3, (3, 3, c, c))
                              .astype(np.float32)),
             "b": jnp.asarray(rng.normal(0, 0.1, (c,))
                              .astype(np.float32))}
            for _ in range(n_stages)
        ]
        x = jnp.asarray(rng.normal(0, 1, (batch, 6, 6, c))
                        .astype(np.float32))
        ref = serial_apply(conv_stage, trees, x)

        mesh = create_mesh(4, ("pipe",))
        out = pipeline_apply(conv_stage, stack_stage_params(trees), x,
                             mesh, n_microbatches=8)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6)

    def test_grad_matches_serial(self):
        """Backward pipeline: grads w.r.t. every stage's params and the
        input must equal the serial program's."""
        n_stages, d, batch = 4, 4, 8
        trees = make_dense_params(n_stages, d, seed=3)
        stacked = stack_stage_params(trees)
        x = jnp.asarray(np.random.default_rng(4).normal(
            0, 1, (batch, d)).astype(np.float32))
        mesh = create_mesh(n_stages, ("pipe",))

        def piped_loss(stacked_params, x):
            y = pipeline_apply(dense_stage, stacked_params, x, mesh,
                               n_microbatches=4)
            return jnp.sum(y ** 2)

        def serial_loss(stacked_params, x):
            trees_ = [jax.tree.map(lambda a: a[i], stacked_params)
                      for i in range(n_stages)]
            return jnp.sum(serial_apply(dense_stage, trees_, x) ** 2)

        gp, gx = jax.jit(jax.grad(piped_loss, argnums=(0, 1)))(stacked, x)
        sp_, sx = jax.jit(jax.grad(serial_loss, argnums=(0, 1)))(stacked, x)
        for a, b in zip(jax.tree_util.tree_leaves(gp),
                        jax.tree_util.tree_leaves(sp_)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(gx), np.asarray(sx),
                                   rtol=1e-5, atol=1e-6)

    def test_pytree_activations(self):
        """Multi-leaf activations (the BiFPN feature-tuple shape of use)
        pipeline as one unit."""
        n_stages, d = 4, 4

        def stage(params, feats):
            a = jnp.tanh(feats["a"] @ params["w"])
            b = jnp.tanh(feats["b"] + jnp.mean(a, axis=-1, keepdims=True))
            return {"a": a, "b": b}

        trees = [{"w": t["w"]} for t in make_dense_params(n_stages, d, 5)]
        rng = np.random.default_rng(6)
        x = {"a": jnp.asarray(rng.normal(0, 1, (8, d)).astype(np.float32)),
             "b": jnp.asarray(rng.normal(0, 1, (8, 1)).astype(np.float32))}
        ref = serial_apply(stage, trees, x)

        mesh = create_mesh(n_stages, ("pipe",))
        out = pipeline_apply(stage, stack_stage_params(trees), x, mesh,
                             n_microbatches=2)
        for k in ref:
            np.testing.assert_allclose(np.asarray(out[k]),
                                       np.asarray(ref[k]),
                                       rtol=1e-6, atol=1e-6)

    def test_dp_pp_composition(self):
        """(data=2 x pipe=4): microbatches also shard over the data axis."""
        n_stages, d, batch = 4, 4, 16
        trees = make_dense_params(n_stages, d, seed=7)
        x = jnp.asarray(np.random.default_rng(8).normal(
            0, 1, (batch, d)).astype(np.float32))
        ref = serial_apply(dense_stage, trees, x)

        pp = PipelineParallel(pipe=n_stages, data=2)
        run = pp.build(dense_stage, n_microbatches=4)
        out = run(pp.stack(trees), x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-6, atol=1e-6)

    def test_bad_microbatch_split_raises(self):
        trees = make_dense_params(2, 4)
        x = jnp.zeros((10, 4))
        mesh = create_mesh(2, ("pipe",))
        with pytest.raises(ValueError, match="not divisible"):
            pipeline_apply(dense_stage, stack_stage_params(trees), x,
                           mesh, n_microbatches=4)


@pytest.mark.slow  # compiles the D0-tiny forward twice (direct + pipelined)
class TestBiFPNPipeline:
    def test_pipelined_forward_matches_direct(self):
        """`make_efficientdet_bifpn_pipeline`: the repeated BiFPN cells as
        GPipe stages must reproduce the direct model.apply exactly."""
        from tmv_tpu.models.efficientdet import (
            EfficientDetNet, get_efficientdet_config,
        )
        from tmv_tpu.parallel.pipeline import (
            make_efficientdet_bifpn_pipeline,
        )

        cfg = get_efficientdet_config("efficientdet-d0")
        cfg.image_size = 64
        cfg.fpn_cell_repeats = 5  # 4 uniform cells -> 4 pipeline stages
        cfg.levels_size = [64]
        for _ in range(cfg.max_level):
            cfg.levels_size.append((cfg.levels_size[-1] + 1) // 2)

        model = EfficientDetNet(config=cfg)
        x = jnp.asarray(np.random.default_rng(0).uniform(
            0, 1, (4, 64, 64, 3)).astype(np.float32))
        variables = model.init(jax.random.key(0), x, train=False)
        ref_boxes, ref_classes = jax.jit(
            lambda v, im: model.apply(v, im, train=False))(variables, x)

        forward, stacked, mesh = make_efficientdet_bifpn_pipeline(
            model, variables, n_microbatches=2)
        assert mesh.shape["pipe"] == 4
        out_boxes, out_classes = jax.jit(forward)(variables, stacked, x)
        for r, o in zip(list(ref_boxes) + list(ref_classes),
                        list(out_boxes) + list(out_classes)):
            np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                       rtol=1e-5, atol=1e-5)
