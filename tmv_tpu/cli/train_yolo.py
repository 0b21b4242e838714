"""YOLO v3/v4 training CLI.

Parity surface: `yolo_v3/train.py:34-105` / `yolo_v4/train.py:34-105` —
argparse flags, train/val DataGenerators, Adam 1e-4, optional two-phase
warm start (freeze all but the output convs for 1000 steps), checkpoint
resume with the epoch derived from the optimizer step, per-epoch val mAP.

Usage:
    python -m tmv_tpu.cli.train_yolo --version v4 \
        --trainData ./data/train_labels.txt --trainImagePath ./imgs \
        --valData ./data/val_labels.txt --valImagePath ./imgs \
        --classesFile ./data/classes.txt --anchorsFile ./data/anchors.txt
"""

import argparse
import os

import jax
import numpy as np
import optax


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--version", default="v4", choices=["v3", "v4"])
    p.add_argument("--trainData", required=True)
    p.add_argument("--trainImagePath", required=True)
    p.add_argument("--valData", default=None)
    p.add_argument("--valImagePath", default=None)
    p.add_argument("--classesFile", required=True)
    p.add_argument("--anchorsFile", required=True)
    p.add_argument("--batchSize", type=int, default=8)
    p.add_argument("--imageSize", type=int, default=416)
    p.add_argument("--stepsPerEpoch", type=int, default=5000)
    p.add_argument("--epochs", type=int, default=300)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--modelPath", default="./data/yolo_weights")
    p.add_argument("--darknetWeights", default=None,
                   help="optional .weights warm start (convert.py parity)")
    p.add_argument("--warmupSteps", type=int, default=1000)
    p.add_argument("--mosaic", type=float, default=0.0,
                   help="per-image probability of 4-image mosaic "
                        "augmentation (device-side; YOLOv4 README lists it "
                        "unimplemented in the reference — new capability)")
    p.add_argument("--cacheDir", default=None,
                   help="epoch-persistent staging cache directory "
                        "(`data/stage_cache.py`): decode+letterbox once, "
                        "serve later epochs from a uint8 memmap")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--dp", action="store_true",
                   help="data-parallel over all local devices")
    p.add_argument("--sp", type=int, default=1,
                   help="spatial partitioning: shard image height this "
                        "many ways on a 2-D (data x space) mesh")
    p.add_argument("--tp", type=int, default=1,
                   help="tensor parallelism: shard parameter/optimizer "
                        "channels this many ways on a 2-D (data x model) "
                        "mesh (see docs/PARALLELISM.md)")
    p.add_argument("--fsdp", action="store_true",
                   help="fully-sharded data parallelism (ZeRO-3): data-"
                        "parallel compute with parameter/optimizer storage "
                        "split 1/N across devices — per-device state memory "
                        "1/N at the cost of per-layer weight all-gathers")
    p.add_argument("--accumSteps", type=int, default=1,
                   help="gradient accumulation micro-steps (batchSize must "
                        "divide)")
    p.add_argument("--remat", action="store_true",
                   help="block-level rematerialization (nn.remat on every "
                        "backbone/neck stage): ~1 extra forward of FLOPs "
                        "for an O(activations) peak-HBM saving — enables "
                        "large-batch / high-res training on one chip")
    # training-health callbacks (yolo_v3/train.py:76-77 defaults)
    p.add_argument("--earlyStopPatience", type=int, default=10,
                   help="epochs without train-loss improvement before "
                        "stopping (0 disables)")
    p.add_argument("--reduceLrFactor", type=float, default=0.1)
    p.add_argument("--reduceLrPatience", type=int, default=3,
                   help="flat epochs before LR *= factor (0 disables)")
    p.add_argument("--minLr", type=float, default=1e-6)
    args = p.parse_args()
    if args.sp > 1 and args.tp > 1:
        p.error("--sp and --tp cannot be combined on the CLI (use the "
                "parallel/ API directly for 3-D meshes)")
    if args.fsdp and (args.sp > 1 or args.tp > 1):
        p.error("--fsdp shards state over the data axis; it cannot be "
                "combined with --sp/--tp on the CLI")
    if args.dp and (args.sp > 1 or args.tp > 1 or args.fsdp):
        p.error("--dp is implied by --sp/--tp/--fsdp (their meshes "
                "already shard the batch over the data axis) — pass "
                "only one mode")
    return args


def main():
    import jax.numpy as jnp

    from tmv_tpu.core.checkpoint import CheckpointManager
    from tmv_tpu.core.metrics import MetricsLogger, StepTimer
    from tmv_tpu.core.train_state import TrainState, make_train_step
    from tmv_tpu.data.loaders import load_anchors
    from tmv_tpu.data.yolo_pipeline import YoloDataPipeline
    from tmv_tpu.models.detector_harness import (
        eval_map_step, freeze_mask, make_yolo_loss_fn, make_yolo_predict,
        masked_optimizer,
    )
    from tmv_tpu.models.yolo_v3 import YoloV3
    from tmv_tpu.models.yolo_v4 import YoloV4

    args = parse_args()
    anchors = load_anchors(args.anchorsFile)
    image_wh = (args.imageSize, args.imageSize)
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32

    pipeline = YoloDataPipeline(
        args.trainImagePath, args.trainData, args.classesFile,
        args.batchSize, anchors, image_wh=image_wh, mosaic=args.mosaic,
        cache_dir=args.cacheDir,
    )
    model_cls = YoloV4 if args.version == "v4" else YoloV3
    iou_type = "ciou" if args.version == "v4" else "iou"
    model = model_cls(classes_num=pipeline.classes_num, dtype=dtype,
                      remat=args.remat)

    x0 = jnp.zeros((1, image_wh[1], image_wh[0], 3), jnp.float32)
    variables = model.init(jax.random.key(0), x0, train=False)
    params, batch_stats = variables["params"], variables["batch_stats"]

    if args.darknetWeights:
        from tmv_tpu.convert.darknet import load_darknet_weights

        params, batch_stats = load_darknet_weights(
            params, batch_stats, args.darknetWeights,
            model=model, input_size=(image_wh[1], image_wh[0]))
        print(f"loaded darknet weights: {args.darknetWeights}")

    # inject_hyperparams so ReduceLROnPlateau can rewrite the live LR
    # without recompiling the jitted step
    tx = optax.inject_hyperparams(optax.adam)(learning_rate=args.lr)
    state = TrainState.create(params, batch_stats, tx)
    mgr = CheckpointManager(args.modelPath)
    state = mgr.restore(state)
    start_step = int(state.step)
    if start_step:
        print(f"resumed from step {start_step}")

    loss_fn = make_yolo_loss_fn(model, image_wh, anchors, iou_type=iou_type)
    raw_step = make_train_step(loss_fn, tx, shadow_loss=True,
                               accum_steps=args.accumSteps)
    dp = None
    first_batch = None
    if args.sp > 1:
        from tmv_tpu.parallel.spatial import SpatialDataParallel

        dp = SpatialDataParallel(space=args.sp)
        print(f"mesh {dp.mesh.devices.shape} (data x space)")
        first_batch = next(iter(pipeline))
        step_fn = dp.wrap_step(raw_step, first_batch)
        state = dp.put_state(state)
    elif args.tp > 1:
        from tmv_tpu.parallel.tensor import TensorParallel

        dp = TensorParallel(model=args.tp)
        print(f"mesh {dp.mesh.devices.shape} (data x model)")
        step_fn = dp.wrap_step(raw_step, state)
        state = dp.put_state(state)
    elif args.fsdp:
        from tmv_tpu.parallel.fsdp import FullyShardedDataParallel

        dp = FullyShardedDataParallel()
        print(f"fsdp (ZeRO-3) over {dp.num_devices} devices")
        step_fn = dp.wrap_step(raw_step, state)
        state = dp.put_state(state)
    elif args.dp:
        from tmv_tpu.parallel.train import DataParallel

        dp = DataParallel()
        print(f"data-parallel over {dp.num_devices} devices")
        step_fn = dp.wrap_step(raw_step)
        state = dp.put_state(state)
    else:
        step_fn = jax.jit(raw_step)

    # two-phase warm start: train only output convs first
    # (FreeLayer parity, yolo_v3/train.py:79-87)
    if args.darknetWeights and start_step == 0 and args.warmupSteps:
        head_prefixes = ["DarknetConv_0", "DarknetConv_1", "DarknetConv_2"]
        mask = freeze_mask(state.params, head_prefixes)
        warm_tx = masked_optimizer(optax.adam(args.lr), mask)
        warm_state = TrainState.create(state.params, state.batch_stats, warm_tx)
        warm_step = jax.jit(
            make_train_step(loss_fn, warm_tx, shadow_loss=True))
        it = iter(pipeline)
        for i in range(args.warmupSteps):
            warm_state, metrics = warm_step(
                warm_state, next(it), jax.random.key(i))
        state = state.replace(params=warm_state.params,
                              batch_stats=warm_state.batch_stats)
        print("warm start done")

    logger = MetricsLogger(os.path.join(args.modelPath, "metrics.jsonl"),
                           print_every=50)
    timer = StepTimer(batch_size=args.batchSize)
    it = iter(pipeline)
    predict_fn = make_yolo_predict(
        model, image_wh, anchors, pipeline.classes_num, iou_type=iou_type)

    from tmv_tpu.core.callbacks import (
        EarlyStopping, GracefulShutdown, ReduceLROnPlateau,
        set_learning_rate,
    )

    shutdown = GracefulShutdown()

    early = (EarlyStopping(patience=args.earlyStopPatience)
             if args.earlyStopPatience else None)
    plateau = (ReduceLROnPlateau(
        factor=args.reduceLrFactor, patience=args.reduceLrPatience,
        min_lr=args.minLr, base_lr=args.lr)
        if args.reduceLrPatience else None)

    total_steps = args.stepsPerEpoch * args.epochs
    epoch_losses = []
    for step_i in range(start_step, total_steps):
        if first_batch is not None:
            batch, first_batch = first_batch, None
        else:
            batch = next(it)
        if dp is not None:
            batch = dp.put_batch(batch)
        state, metrics = step_fn(state, batch, jax.random.key(step_i))
        metrics.update(timer.tick())
        logger.log(step_i, metrics)
        epoch_losses.append(float(metrics["loss"]))
        if shutdown.requested:
            print(f"preemption signal: checkpointing at step "
                  f"{int(state.step)} and exiting")
            break
        if (step_i + 1) % args.stepsPerEpoch == 0:
            mgr.save(int(state.step), state, wait=False)
            epoch_loss = float(np.mean(epoch_losses))
            epoch_losses = []
            if plateau is not None:
                new_lr = plateau.update(epoch_loss)
                state = set_learning_rate(state, new_lr)
                print(f"epoch loss {epoch_loss:.4f} lr {new_lr:.2e}")
            if early is not None and early.update(epoch_loss):
                print(f"early stopping: no improvement for "
                      f"{args.earlyStopPatience} epochs")
                break
            if args.valData:
                val = YoloDataPipeline(
                    args.valImagePath, args.valData, args.classesFile, 1,
                    anchors, image_wh=image_wh, image_random=False,
                    label_mean=False,
                )
                maps = []
                vit = iter(val)
                for _ in range(min(50, val.labels_num)):
                    maps.append(eval_map_step(
                        predict_fn,
                        {"params": state.params,
                         "batch_stats": state.batch_stats},
                        next(vit), pipeline.classes_num))
                print(f"epoch {(step_i+1)//args.stepsPerEpoch} "
                      f"val_mAP={np.mean(maps):.4f}")
    mgr.save(int(state.step), state, force=True)
    logger.close()


if __name__ == "__main__":
    main()
