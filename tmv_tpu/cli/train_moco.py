"""MoCo pretraining CLI + k-tower export + detection fine-tune.

Parity surface: `momentum_contrast/train.py` (pretrain, queue K),
`save_model.py` (export key-tower weights), `train_object_detection.py`
(fine-tune YOLO detection from MoCo weights).
"""

import argparse
import os

import jax
import numpy as np
import optax


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--mode", default="pretrain",
                   choices=["pretrain", "export_k", "finetune"])
    p.add_argument("--trainImagePath", required=False)
    p.add_argument("--trainData", required=False)
    p.add_argument("--classesFile", required=False)
    p.add_argument("--anchorsFile", required=False)
    p.add_argument("--batchSize", type=int, default=8)
    p.add_argument("--imageSize", type=int, default=416)
    p.add_argument("--queueSize", type=int, default=100)
    p.add_argument("--outFilters", type=int, default=21)
    p.add_argument("--steps", type=int, default=10000)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--modelPath", default="./data/moco_weights")
    p.add_argument("--exportPath", default="./data/moco_k_weights")
    p.add_argument("--remat", action="store_true",
                   help="block-level rematerialization (nn.remat) — the "
                        "peak-HBM lever for large-batch training")
    return p.parse_args()


def two_crop_batches(image_path, batch_size, image_size, seed=0):
    """Two independent random augmentations of each image
    (`moco_dataset.py:13-153`)."""
    import jax.numpy as jnp

    from tmv_tpu.utils import image_helper
    from tmv_tpu.utils.file_helper import read_file_list

    files = read_file_list(image_path, r"\.(jpg|jpeg|png)$")
    rng = np.random.default_rng(seed)

    def aug(img):
        out = img
        if rng.random() < 0.5:
            out = image_helper.blur(out, rng.uniform(0.5, 2.0))
        out = image_helper.random_color_jitter(out, rng)
        out = image_helper.random_noise(out, rng, 0.01)
        if rng.random() < 0.5:
            out = out[:, ::-1]
        out, _, _ = image_helper.proportional_resize(
            out, (image_size, image_size))
        return out.astype(np.float32) / 255.0

    while True:
        q_batch, k_batch = [], []
        for _ in range(batch_size):
            path = files[rng.integers(0, len(files))]
            img = image_helper.bytes_to_image(open(path, "rb").read())
            q_batch.append(aug(img))
            k_batch.append(aug(img))
        yield {"query": jnp.asarray(np.stack(q_batch)),
               "key": jnp.asarray(np.stack(k_batch))}


def main():
    import jax.numpy as jnp

    from tmv_tpu.core.checkpoint import CheckpointManager
    from tmv_tpu.core.train_state import TrainState
    from tmv_tpu.models.moco import (
        ResNetYoloV3, init_moco_state, make_moco_train_step,
    )

    args = parse_args()
    model = ResNetYoloV3(out_filters=args.outFilters,
                         remat=args.remat)
    s = args.imageSize
    x0 = jnp.zeros((1, s, s, 3))
    variables = model.init(jax.random.key(0), x0, train=False)

    if args.mode == "export_k":
        mgr = CheckpointManager(args.modelPath)
        tx = optax.sgd(args.lr, momentum=0.9)
        heads = model.apply(variables, x0, train=False)
        feat_dim = sum(int(np.prod(h.shape[1:])) for h in heads)
        extra = init_moco_state(variables, args.queueSize, feat_dim,
                                jax.random.key(1))
        state = TrainState.create(variables["params"],
                                  variables["batch_stats"], tx, extra=extra)
        state = mgr.restore(state)
        out = CheckpointManager(args.exportPath)
        out.save(int(state.step), {
            "params": state.extra.key_params,
            "batch_stats": state.extra.key_batch_stats,
        }, force=True)
        print(f"exported key tower to {args.exportPath}")
        return

    if args.mode == "finetune":
        # train_object_detection.py parity: detection fine-tune from the
        # exported MoCo key tower, grafting every matching-shape leaf
        # (output convs differ when classes_num changes — fresh init)
        from tmv_tpu.convert.graft import graft_params
        from tmv_tpu.core.train_state import make_train_step
        from tmv_tpu.data.loaders import load_anchors
        from tmv_tpu.data.yolo_pipeline import YoloDataPipeline
        from tmv_tpu.models.detector_harness import make_yolo_loss_fn

        anchors = load_anchors(args.anchorsFile)
        pipeline = YoloDataPipeline(
            args.trainImagePath, args.trainData, args.classesFile,
            args.batchSize, anchors, image_wh=(s, s))
        det_model = ResNetYoloV3(
            out_filters=3 * (5 + pipeline.classes_num),
            remat=args.remat)
        det_vars = det_model.init(jax.random.key(0), x0, train=False)

        moco_template = {"params": variables["params"],
                         "batch_stats": variables["batch_stats"]}
        restored = CheckpointManager(args.exportPath).restore(moco_template)
        params, copied, skipped = graft_params(
            det_vars["params"], restored["params"])
        stats, _, _ = graft_params(
            det_vars["batch_stats"], restored["batch_stats"])
        print(f"grafted {len(copied)} tensors from {args.exportPath}; "
              f"{len(skipped)} shape-mismatched (fresh init)")

        tx = optax.adam(args.lr)
        state = TrainState.create(
            jax.tree.map(jnp.asarray, params),
            jax.tree.map(jnp.asarray, stats), tx)
        mgr = CheckpointManager(args.modelPath)
        state = mgr.restore(state)
        loss_fn = make_yolo_loss_fn(det_model, (s, s), anchors,
                                    iou_type="ciou")
        step_fn = jax.jit(make_train_step(loss_fn, tx, shadow_loss=True))
        it = iter(pipeline)  # YoloDataPipeline prefetches to device itself
        from tmv_tpu.core.callbacks import GracefulShutdown

        shutdown = GracefulShutdown()
        for i in range(int(state.step), args.steps):
            state, metrics = step_fn(state, next(it), jax.random.key(i))
            if shutdown.requested:
                print(f"preemption signal: checkpointing at step "
                      f"{int(state.step)} and exiting")
                break
            if i % 50 == 0:
                print(f"step {i} loss {float(metrics['loss']):.4f}")
            if (i + 1) % 1000 == 0:
                mgr.save(int(state.step), state, wait=False)
        mgr.save(int(state.step), state, force=True)
        return

    heads = model.apply(variables, x0, train=False)
    feat_dim = sum(int(np.prod(h.shape[1:])) for h in heads)
    print(f"feature dim {feat_dim}")
    extra = init_moco_state(variables, args.queueSize, feat_dim,
                            jax.random.key(1))
    tx = optax.sgd(args.lr, momentum=0.9)
    state = TrainState.create(variables["params"], variables["batch_stats"],
                              tx, extra=extra)
    mgr = CheckpointManager(args.modelPath)
    state = mgr.restore(state)

    step_fn = jax.jit(make_moco_train_step(model, tx))
    from tmv_tpu.data.prefetch import prefetched

    batches = prefetched(two_crop_batches(args.trainImagePath,
                                          args.batchSize, args.imageSize))
    from tmv_tpu.core.callbacks import GracefulShutdown

    shutdown = GracefulShutdown()
    for i in range(int(state.step), args.steps):
        state, metrics = step_fn(state, next(batches), jax.random.key(i))
        if shutdown.requested:
            print(f"preemption signal: checkpointing at step "
                  f"{int(state.step)} and exiting")
            break
        if i % 50 == 0:
            print(f"step {i} loss {float(metrics['loss']):.4f}")
        if (i + 1) % 1000 == 0:
            mgr.save(int(state.step), state, wait=False)
    mgr.save(int(state.step), state, force=True)


if __name__ == "__main__":
    main()
