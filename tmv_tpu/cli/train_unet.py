"""UNet keypoint-heatmap training CLI.

Parity surface: `unet/train.py:20-115` — BCE loss, global-norm clip 10,
checkpoint/resume, periodic eval that dumps input/target/pred images.
"""

import argparse
import os

import jax
import numpy as np
import optax


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--labelPath", required=True,
                   help="dir with labelme *.json + images")
    p.add_argument("--batchSize", type=int, default=4)
    p.add_argument("--inputSize", type=int, default=128)
    p.add_argument("--pointsNum", type=int, default=4)
    p.add_argument("--steps", type=int, default=10000)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--modelPath", default="./data/unet_weights")
    p.add_argument("--dumpEvery", type=int, default=500)
    p.add_argument("--depth", type=int, default=4)
    p.add_argument("--filtersBase", type=int, default=16)
    # training-health callbacks (unet/train.py:102 EarlyStopping; the
    # ReduceLROnPlateau mirrors the yolo trainers' live wiring)
    p.add_argument("--earlyStopPatience", type=int, default=10,
                   help="eval windows without loss improvement before "
                        "stopping (0 disables)")
    p.add_argument("--reduceLrPatience", type=int, default=0,
                   help="flat windows before LR *= 0.1 (0 disables)")
    p.add_argument("--remat", action="store_true",
                   help="block-level rematerialization (nn.remat) — "
                        "the peak-HBM lever for large-batch training")
    p.add_argument("--firstShape", action="store_true",
                   help="accept multi-shape labelme files (take the first "
                        "shape) instead of the reference's exactly-one-"
                        "shape filter")
    return p.parse_args()


def main():
    import jax.numpy as jnp

    from tmv_tpu.core.checkpoint import CheckpointManager
    from tmv_tpu.core.metrics import MetricsLogger, StepTimer
    from tmv_tpu.core.train_state import TrainState, make_train_step
    from tmv_tpu.data.unet_dataset import get_dataset
    from tmv_tpu.models.unet import UNetLogits, make_unet_loss_fn
    from tmv_tpu.utils import image_helper

    args = parse_args()
    size = (args.inputSize, args.inputSize)
    batches, gen = get_dataset(
        args.labelPath, args.batchSize, args.pointsNum, size, size,
        first_shape=args.firstShape)
    from tmv_tpu.data.prefetch import prefetched

    batches = prefetched(batches)
    print(f"{gen.labels_num} labels")

    model = UNetLogits(depth=args.depth, filters_base=args.filtersBase,
                       output_filters=args.pointsNum, remat=args.remat)
    x0 = jnp.zeros((1, size[1], size[0], 3))
    variables = model.init(jax.random.key(0), x0, train=False)
    tx = optax.inject_hyperparams(optax.adam)(learning_rate=args.lr)
    state = TrainState.create(variables["params"], variables["batch_stats"], tx)
    mgr = CheckpointManager(args.modelPath)
    state = mgr.restore(state)

    from tmv_tpu.core.callbacks import (
        EarlyStopping, ReduceLROnPlateau, set_learning_rate,
    )

    early = (EarlyStopping(patience=args.earlyStopPatience)
             if args.earlyStopPatience else None)
    plateau = (ReduceLROnPlateau(factor=0.1, patience=args.reduceLrPatience,
                                 base_lr=args.lr)
               if args.reduceLrPatience else None)
    window_losses = []

    loss_fn = make_unet_loss_fn(model)
    step_fn = jax.jit(make_train_step(loss_fn, tx, clip_global_norm=10.0))
    logger = MetricsLogger(os.path.join(args.modelPath, "metrics.jsonl"),
                           print_every=50)
    timer = StepTimer(batch_size=args.batchSize)

    from tmv_tpu.core.callbacks import GracefulShutdown

    shutdown = GracefulShutdown()
    for i in range(int(state.step), args.steps):
        batch = next(batches)
        state, metrics = step_fn(state, batch, jax.random.key(i))
        if shutdown.requested:
            print(f"preemption signal: checkpointing at step "
                  f"{int(state.step)} and exiting")
            break
        metrics.update(timer.tick())
        logger.log(i, metrics)
        window_losses.append(float(metrics["loss"]))
        if (i + 1) % args.dumpEvery == 0:
            mgr.save(int(state.step), state, wait=False)
            window_loss = float(np.mean(window_losses))
            window_losses = []
            if plateau is not None:
                state = set_learning_rate(state, plateau.update(window_loss))
            if early is not None and early.update(window_loss):
                print(f"early stopping: no improvement for "
                      f"{args.earlyStopPatience} windows")
                break
            # dump input/target/pred like the reference test_step
            # (unet/train.py:63-115)
            pred = jax.nn.sigmoid(model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                batch["image"][:1], train=False))
            out_dir = os.path.join(args.modelPath, "dumps")
            os.makedirs(out_dir, exist_ok=True)
            image_helper.image_to_file(
                os.path.join(out_dir, f"in_{i}.jpg"),
                np.asarray(batch["image"][0] * 255))
            for c in range(args.pointsNum):
                image_helper.image_to_file(
                    os.path.join(out_dir, f"target_{i}_{c}.jpg"),
                    np.asarray(batch["target"][0, ..., c] * 255)[..., None]
                    .repeat(3, -1))
                image_helper.image_to_file(
                    os.path.join(out_dir, f"pred_{i}_{c}.jpg"),
                    np.asarray(pred[0, ..., c] * 255)[..., None].repeat(3, -1))
    mgr.save(int(state.step), state, force=True)
    logger.close()


if __name__ == "__main__":
    main()
