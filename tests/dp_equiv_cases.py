"""DP-equivalence cases for the real training paths, run as a script.

Round-2 verdict weak #4: the YOLO loss/target path, the FaceNet triplet
step — the reference's only genuinely distributed path
(`facenet/facenet_model.py:297-322`) — and the MoCo queue update had no
multi-device coverage.  Each case runs the real train step single-device
and under jit-over-mesh DP on 8 virtual CPU devices and asserts
equivalence.

Why a script and not plain test methods: concurrent multi-device
execution of large programs on XLA:CPU intermittently hard-aborts inside
Eigen's conv thread pool (upstream race; observed as
``EvalParallelNotification::Notify`` SIGABRT stacks — not a tmv_tpu bug,
single-device and TPU paths are unaffected).  An abort would kill the
whole pytest process, so ``tests/test_parallel.py::TestRealPathsParallel``
executes each case in a subprocess and retries once on SIGABRT; genuine
assertion failures (exit 1) are NOT retried.

Usage: python tests/dp_equiv_cases.py {yolo|facenet|moco}
"""

import os
import sys

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    xla_flags = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()
# On a low-core host the 8 per-device executions are time-sliced over a
# tiny thread pool: big programs reach their first cross-device
# all-reduce tens of seconds apart, tripping XLA:CPU's default 40 s
# rendezvous *termination* timeout (rendezvous.cc aborts the process).
# That is a watchdog misfire, not a deadlock — raise it.
if "collective_call_terminate_timeout" not in xla_flags:
    xla_flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
                  " --xla_cpu_collective_call_terminate_timeout_seconds=1200")
os.environ["XLA_FLAGS"] = xla_flags

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
if os.environ.get("TMV_TEST_COMPILE_CACHE_DIR"):
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["TMV_TEST_COMPILE_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402
import pytest  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from tmv_tpu.core.train_state import TrainState, make_train_step  # noqa: E402
from tmv_tpu.parallel.mesh import (  # noqa: E402
    create_mesh, replicate, shard_batch,
)


def dp_run(step, state, batch, rng_key):
    mesh = create_mesh(8, ("data",))
    batch_sh = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    dp_step = jax.jit(
        step,
        in_shardings=(repl, jax.tree.map(lambda _: batch_sh, batch), repl),
        out_shardings=(repl, repl),
    )
    return dp_step(replicate(state, mesh), shard_batch(batch, mesh),
                   jax.device_put(rng_key, repl))


def case_yolo():
    """YoloV3 train step incl. grid-target building: loss and updated
    params must match single-device on the concatenated batch."""
    from tmv_tpu.data.yolo_targets import make_yolo_targets
    from tmv_tpu.models.detector_harness import make_yolo_loss_fn
    from tmv_tpu.models.yolo_v3 import YoloV3

    rng = np.random.default_rng(0)
    size, B, C = 64, 8, 2
    anchors = np.array(
        [[[116, 90], [156, 198], [373, 326]],
         [[30, 61], [62, 45], [59, 119]],
         [[10, 13], [16, 30], [33, 23]]], np.float32) * size / 416
    model = YoloV3(classes_num=C)
    v = model.init(jax.random.key(0), jnp.zeros((1, size, size, 3)),
                   train=False)
    tx = optax.sgd(1e-3)
    state = TrainState.create(v["params"], v["batch_stats"], tx)
    loss_fn = make_yolo_loss_fn(model, (size, size), anchors)
    step = make_train_step(loss_fn, tx, shadow_loss=True)

    # real target building (floor-div centers, best-anchor assignment)
    boxes = np.zeros((B, 4, 4), np.float32)
    classes = np.zeros((B, 4), np.int32)
    valid = np.zeros((B, 4), bool)
    for b in range(B):
        n = 1 + b % 3
        for j in range(n):
            x1, y1 = rng.uniform(2, size - 30, 2)
            w, h = rng.uniform(8, 24, 2)
            boxes[b, j] = [x1, y1, x1 + w, y1 + h]
            classes[b, j] = b % C
            valid[b, j] = True
    targets = jax.vmap(
        lambda bx, cl, va: make_yolo_targets(
            bx, cl, va, anchors, (size, size), C)
    )(jnp.asarray(boxes), jnp.asarray(classes), jnp.asarray(valid))
    batch = {
        "image": jnp.asarray(
            rng.uniform(size=(B, size, size, 3)).astype(np.float32)),
        "targets": targets,
    }

    s1, m1 = jax.jit(step)(state, batch, jax.random.key(1))
    s2, m2 = dp_run(step, state, batch, jax.random.key(1))
    # GSPMD keeps global semantics but not f32 summation order: the
    # train-mode BN batch statistics reduce across devices in a different
    # grouping, and the YOLO loss contains *thresholded* masks (the
    # IoU>thresh ignore mask, objectness selection) that can flip
    # discretely under that noise, changing one grad contribution whole.
    # Measured here: head-bias param deltas up to ~1.5e-4 after one
    # lr=1e-3 step (grad diff ~0.1 on grads of magnitude ~10).  A genuine
    # mis-sharding (samples routed to wrong targets, local-only loss
    # mean) moves params by the full update ~5e-3..1.5e-2 — 30-100x the
    # tolerance — so atol 5e-4 still discriminates sharply.
    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=2e-3)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=5e-4)


def case_facenet():
    """Triplet step under DP — MirroredStrategy all-reduce parity
    (`facenet/facenet_model.py:297-322`)."""
    from tmv_tpu.models.facenet.model import (
        FaceNetModel, make_triplet_train_step,
    )

    rng = np.random.default_rng(0)
    size, B = 64, 8
    model = FaceNetModel(embedding_size=32, backbone="RepVGG")
    v = model.init({"params": jax.random.key(0),
                    "dropout": jax.random.key(1)},
                   jnp.zeros((1, size, size, 3)), train=False)
    tx = optax.sgd(1e-3)
    state = TrainState.create(v["params"], v["batch_stats"], tx)
    loss_fn = make_triplet_train_step(model, tx, alpha=0.2)
    step = make_train_step(loss_fn, tx)
    batch = {
        k: jnp.asarray(
            rng.uniform(size=(B, size, size, 3)).astype(np.float32))
        for k in ("anchor", "positive", "negative")
    }
    batch["valid"] = jnp.ones((B,), bool)

    s1, m1 = jax.jit(step)(state, batch, jax.random.key(2))
    s2, m2 = dp_run(step, state, batch, jax.random.key(2))
    # The loss band is the discriminating assertion here: hard mining is
    # a (Gumbel-seeded) argmax, so a local-instead-of-global mining bug
    # re-picks most negatives and moves the loss by O(10%); GSPMD
    # reduction-order noise only flips near-TIE selections, which leaves
    # the loss value in place (that is what a near-tie means) but can
    # reroute a triplet's gradient through a different sample — measured
    # grad rerouting of ~15% on individual bias elements.  Params are
    # therefore a gross band (a real bug rewrites them wholesale).
    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=2e-3)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1.0, atol=3e-4)


def case_moco():
    """MoCo step under a data-sharded batch: the negative queue must
    receive the GLOBAL key batch in logical order, the EMA key tower and
    InfoNCE loss must match single-device.

    Strict comparison is at step 1 only.  The InfoNCE update is chaotic:
    a measured control (1e-6 relative param perturbation, single-device)
    already diverges to 4.6e-3 loss rel / 0.034 param maxdiff by step 2,
    and GSPMD's reduction-order noise seeds the same amplification — so
    step 2 asserts the structural invariants (queue pointer, queue row
    identity = which global samples landed where) plus a gross band."""
    from tmv_tpu.models.moco import (
        ResNetYoloV3, flatten_normalize, init_moco_state,
        make_moco_train_step,
    )

    rng = np.random.default_rng(0)
    size, B = 32, 8
    model = ResNetYoloV3(out_filters=6)
    v = model.init(jax.random.key(0), jnp.zeros((1, size, size, 3)),
                   train=False)
    y = model.apply(v, jnp.zeros((1, size, size, 3)), train=False)
    feat_dim = flatten_normalize(y).shape[-1]
    tx = optax.sgd(1e-3)
    extra = init_moco_state(
        {"params": v["params"], "batch_stats": v["batch_stats"]},
        queue_size=4 * B, feature_dim=feat_dim, rng=jax.random.key(7))
    state = TrainState.create(v["params"], v["batch_stats"], tx,
                              extra=extra)
    step = make_moco_train_step(model, tx)

    batches = [
        {
            "query": jnp.asarray(rng.uniform(
                size=(B, size, size, 3)).astype(np.float32)),
            "key": jnp.asarray(rng.uniform(
                size=(B, size, size, 3)).astype(np.float32)),
        }
        for _ in range(2)
    ]

    # --- step 1: strict equivalence (semantics visible directly) ---
    s1, m1 = jax.jit(step)(state, batches[0], jax.random.key(3))
    s2, m2 = dp_run(step, state, batches[0], jax.random.key(3))
    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-3)
    np.testing.assert_array_equal(np.asarray(s1.extra.queue_ptr),
                                  np.asarray(s2.extra.queue_ptr))
    # global key batch enqueued in logical (not per-device) order
    np.testing.assert_allclose(np.asarray(s1.extra.queue),
                               np.asarray(s2.extra.queue),
                               rtol=1e-3, atol=1e-5)
    # EMA wiring under sharding, checked *within* the DP run: at step 1
    # the warmup decay is exactly 0, so key_params must equal the DP
    # run's own updated query params bit-for-bit (k*0 + q*1 == q) —
    # this pins the momentum update without any cross-run noise.
    for a, b in zip(jax.tree_util.tree_leaves(s2.extra.key_params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # cross-run key/query params are only a gross band: with decay 0 the
    # key-param diff IS the query-update diff = lr*(grad diff), and
    # InfoNCE/0.07 temperature-sharpened softmax reroutes gradients under
    # BN reduction-order noise exactly as in the facenet case — measured
    # max |diff| 5.8e-3 here vs total one-step movement ~3e-2.  The
    # semantics are carried by the strict loss + queue asserts above (a
    # local-mean-loss or per-device-queue bug moves those directly).
    for a, b in zip(jax.tree_util.tree_leaves(s1.extra.key_params),
                    jax.tree_util.tree_leaves(s2.extra.key_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1.0, atol=2e-2)

    # --- step 2: structural invariants + gross band (chaotic regime) ---
    s1b, m1b = jax.jit(step)(s1, batches[1], jax.random.key(4))
    s2b, m2b = dp_run(step, s2, batches[1], jax.random.key(4))
    np.testing.assert_array_equal(np.asarray(s1b.extra.queue_ptr),
                                  np.asarray(s2b.extra.queue_ptr))
    # rows 0..B-1 (step-1 push) must be untouched by the second push
    np.testing.assert_allclose(np.asarray(s1b.extra.queue[:B]),
                               np.asarray(s2b.extra.queue[:B]),
                               rtol=1e-3, atol=1e-5)
    assert float(m1b["loss"]) == pytest.approx(float(m2b["loss"]), rel=5e-2)


CASES = {"yolo": case_yolo, "facenet": case_facenet, "moco": case_moco}

if __name__ == "__main__":
    name = sys.argv[1]
    CASES[name]()
    print(f"DP-EQUIV-{name.upper()}-OK")
