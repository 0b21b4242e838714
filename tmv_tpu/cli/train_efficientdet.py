"""EfficientDet training CLI.

Parity surface: `efficientnet/train.py:65-153` — model config by name,
cosine LR with linear warmup scaled by batch size (0.08·bs/64, warmup one
epoch), SGD momentum 0.9 + weight EMA 0.9998 (tfa MovingAverage parity),
per-epoch checkpoint, per-epoch val loss/mAP.
"""

import argparse
import os

import jax
import numpy as np
import optax


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--modelName", default="efficientdet-d1")
    p.add_argument("--trainData", required=True)
    p.add_argument("--trainImagePath", required=True)
    p.add_argument("--classesFile", required=True)
    p.add_argument("--batchSize", type=int, default=8)
    p.add_argument("--stepsPerEpoch", type=int, default=1000)
    p.add_argument("--epochs", type=int, default=300)
    p.add_argument("--modelPath", default="./data/efficientdet_weights")
    p.add_argument("--maxBoxes", type=int, default=100)
    p.add_argument("--imageSize", type=int, default=0,
                   help="override the config's image size (0 = config)")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--accumSteps", type=int, default=1,
                   help="gradient accumulation micro-steps (batchSize must "
                        "divide)")
    p.add_argument("--remat", action="store_true",
                   help="block-level rematerialization (nn.remat on MBConv "
                        "blocks, BiFPN cells, heads) — the peak-HBM lever "
                        "for D4+ / high-res training on one chip")
    p.add_argument("--dp", action="store_true",
                   help="data-parallel over all local devices")
    p.add_argument("--sp", type=int, default=1,
                   help="spatial partitioning: shard image height this "
                        "many ways on a 2-D (data x space) mesh (implies "
                        "parallel execution; see docs/PARALLELISM.md)")
    p.add_argument("--tp", type=int, default=1,
                   help="tensor parallelism: shard parameter/optimizer "
                        "channels this many ways on a 2-D (data x model) "
                        "mesh — 1/N param+optimizer memory per device "
                        "(see docs/PARALLELISM.md)")
    p.add_argument("--fsdp", action="store_true",
                   help="fully-sharded data parallelism (ZeRO-3): data-"
                        "parallel compute with parameter/optimizer storage "
                        "split 1/N across devices — per-device state memory "
                        "1/N at the cost of per-layer weight all-gathers")
    # EarlyStopping on epoch train loss (efficientnet/train.py:138-139;
    # LR stays with the cosine schedule as in the reference)
    p.add_argument("--earlyStopPatience", type=int, default=10,
                   help="epochs without train-loss improvement before "
                        "stopping (0 disables)")
    p.add_argument("--deviceAug", action="store_true",
                   help="run the blur/affine/noise augmentation on-device "
                        "(jitted batch program, `data/device_aug.py`); the "
                        "host only decodes+letterboxes — use when the host "
                        "PIL staging cannot feed the chip")
    p.add_argument("--cacheDir", default=None,
                   help="epoch-persistent staging cache directory "
                        "(`data/stage_cache.py`; requires --deviceAug): "
                        "decode+letterbox once, serve later epochs from a "
                        "uint8 memmap")
    args = p.parse_args()
    if args.cacheDir and not args.deviceAug:
        p.error("--cacheDir requires --deviceAug (only the fixed staging "
                "frame is deterministic and cacheable)")
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
    from tmv_tpu.core.schedules import cosine_lr_schedule, scaled_lr
    from tmv_tpu.core.train_state import TrainState, make_train_step
    from tmv_tpu.data.efficientdet_pipeline import EfficientDetPipeline
    from tmv_tpu.models.efficientdet import (
        EfficientDetNet, get_efficientdet_config,
    )
    from tmv_tpu.models.efficientdet.heads import init_class_prior_bias
    from tmv_tpu.models.efficientdet.net import make_efficientdet_loss_fn
    from tmv_tpu.ops.anchors import Anchors

    args = parse_args()
    cfg = get_efficientdet_config(args.modelName)
    if args.imageSize:
        cfg.image_size = args.imageSize
        cfg.levels_size = [args.imageSize]
        for _ in range(cfg.max_level):
            cfg.levels_size.append((cfg.levels_size[-1] + 1) // 2)
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    if args.remat:
        cfg.remat = True
    # head size follows the dataset: N real classes + background id 0
    # (the config's 81 is the COCO default, not a contract — a 2-class
    # dataset otherwise trains an 81-way head and non-COCO mAP variants
    # average over 79 classes that can never have data)
    from tmv_tpu.data.loaders import load_classes

    _, _classes_num = load_classes(args.classesFile)
    cfg.num_classes = _classes_num + 1
    model = EfficientDetNet(config=cfg, dtype=dtype)

    anchors = Anchors(
        min_level=cfg.min_level, max_level=cfg.max_level,
        image_size=(cfg.image_size, cfg.image_size),
        num_scales=cfg.num_scales, aspect_ratios=cfg.aspect_ratios,
        anchor_scale=cfg.anchor_scale,
    )
    pipeline = EfficientDetPipeline(
        args.trainImagePath, args.trainData, args.classesFile,
        args.batchSize, anchors, cfg.num_classes,
        image_size=cfg.image_size, max_boxes=args.maxBoxes,
        device_aug=args.deviceAug, cache_dir=args.cacheDir,
    )

    x0 = jnp.zeros((1, cfg.image_size, cfg.image_size, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x0, train=False)
    params = init_class_prior_bias(variables["params"])

    lr = scaled_lr(0.08, args.batchSize)
    schedule = cosine_lr_schedule(
        lr, 0.008, args.stepsPerEpoch, args.epochs * args.stepsPerEpoch)
    tx = optax.sgd(schedule, momentum=0.9)
    state = TrainState.create(params, variables["batch_stats"], tx,
                              ema_decay=0.9998)
    mgr = CheckpointManager(args.modelPath)
    state = mgr.restore(state)

    loss_fn = make_efficientdet_loss_fn(model)
    raw_step = make_train_step(
        loss_fn, tx, clip_global_norm=10.0, ema_decay=0.9998,
        accum_steps=args.accumSteps)
    dp = None
    it = iter(pipeline)
    first_batch = None
    if args.sp > 1:
        from tmv_tpu.parallel.spatial import SpatialDataParallel

        dp = SpatialDataParallel(space=args.sp)
        print(f"mesh {dp.mesh.devices.shape} (data x space)")
        first_batch = next(it)
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
    logger = MetricsLogger(os.path.join(args.modelPath, "metrics.jsonl"),
                           print_every=20)
    timer = StepTimer(batch_size=args.batchSize)

    from tmv_tpu.core.callbacks import EarlyStopping, GracefulShutdown

    early = (EarlyStopping(patience=args.earlyStopPatience)
             if args.earlyStopPatience else None)
    shutdown = GracefulShutdown()

    total = args.epochs * args.stepsPerEpoch
    epoch_losses = []
    warned_fg = False
    for i in range(int(state.step), total):
        if first_batch is not None:
            batch, first_batch = first_batch, None
        else:
            batch = next(it)
        if not warned_fg:
            # anchor/box scale mismatch fails silently otherwise: with no
            # anchor reaching IoU>=0.5 every target is background, the
            # classifier trains to predict nothing, and mAP is exactly 0
            fg = sum(float(np.asarray(m).sum()) for m in batch["masks"])
            if fg == 0:
                print("WARNING: first batch assigned ZERO foreground "
                      "anchors — the ground-truth boxes are likely far "
                      "from every anchor size (anchor_scale "
                      f"{cfg.anchor_scale}, levels {cfg.min_level}-"
                      f"{cfg.max_level} at {cfg.image_size} px).  "
                      "Training will converge to background-only output; "
                      "adjust image size or the config's anchor_scale.")
            warned_fg = True
        if dp is not None:
            batch = dp.put_batch(batch)
        state, metrics = step_fn(state, batch, jax.random.key(i))
        metrics.update(timer.tick())
        logger.log(i, metrics)
        epoch_losses.append(float(metrics["loss"]))
        if shutdown.requested:
            print(f"preemption signal: checkpointing at step "
                  f"{int(state.step)} and exiting")
            break
        if (i + 1) % args.stepsPerEpoch == 0:
            mgr.save(int(state.step), state, wait=False)
            epoch_loss = float(np.mean(epoch_losses))
            epoch_losses = []
            if early is not None and early.update(epoch_loss):
                print(f"early stopping: no improvement for "
                      f"{args.earlyStopPatience} epochs")
                break
    mgr.save(int(state.step), state, force=True)
    logger.close()


if __name__ == "__main__":
    main()
