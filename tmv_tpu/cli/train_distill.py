"""Teacher→student distillation CLIs.

Parity surface: `unsupervised_learning/` scripts — supervised teacher
training (`train.py`), weight promotion (`create_teacher_weights.py`),
offline pseudo-label dump (`create_teacher_labels.py`), student training on
on-the-fly pseudo-labels (`train_students.py`).
"""

import argparse
import os

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--mode", required=True,
                   choices=["train_teacher", "promote", "dump_labels",
                            "train_students"])
    p.add_argument("--trainImagePath")
    p.add_argument("--trainData")
    p.add_argument("--classesFile")
    p.add_argument("--anchorsFile")
    p.add_argument("--batchSize", type=int, default=8)
    p.add_argument("--imageSize", type=int, default=416)
    p.add_argument("--steps", type=int, default=10000)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--teacherPath", default="./data/teacher_weights")
    p.add_argument("--studentPath", default="./data/student_weights")
    p.add_argument("--labelsOut", default="./data/teacher_labels.txt")
    p.add_argument("--outFilters", type=int, default=None)
    p.add_argument("--remat", action="store_true",
                   help="block-level rematerialization (nn.remat) — the "
                        "peak-HBM lever for large-batch training")
    return p.parse_args()


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from tmv_tpu.core.checkpoint import CheckpointManager
    from tmv_tpu.core.train_state import TrainState, make_train_step
    from tmv_tpu.data.loaders import load_anchors, load_classes
    from tmv_tpu.data.yolo_pipeline import YoloDataPipeline
    from tmv_tpu.data.yolo_targets import make_yolo_targets
    from tmv_tpu.models.detector_harness import make_yolo_loss_fn
    from tmv_tpu.models.distill import make_pseudo_label_fn, promote_teacher
    from tmv_tpu.models.moco import ResNetYoloV3

    args = parse_args()
    anchors = load_anchors(args.anchorsFile) if args.anchorsFile else None
    classes_name, classes_num = (load_classes(args.classesFile)
                                 if args.classesFile else ([], 0))
    image_wh = (args.imageSize, args.imageSize)
    out_filters = args.outFilters or 3 * (5 + classes_num)
    model = ResNetYoloV3(out_filters=out_filters, remat=args.remat)
    x0 = jnp.zeros((1, args.imageSize, args.imageSize, 3))
    variables = model.init(jax.random.key(0), x0, train=False)
    tx = optax.adam(args.lr)

    if args.mode == "promote":
        student = TrainState.create(variables["params"],
                                    variables["batch_stats"], tx)
        student = CheckpointManager(args.studentPath).restore(student)
        teacher_vars = promote_teacher(student, variables)
        t_state = TrainState.create(teacher_vars["params"],
                                    teacher_vars["batch_stats"], tx)
        CheckpointManager(args.teacherPath).save(0, t_state, force=True)
        print(f"promoted student → teacher at {args.teacherPath}")
        return

    if args.mode == "train_teacher":
        pipeline = YoloDataPipeline(
            args.trainImagePath, args.trainData, args.classesFile,
            args.batchSize, anchors, image_wh=image_wh)
        state = TrainState.create(variables["params"],
                                  variables["batch_stats"], tx)
        mgr = CheckpointManager(args.teacherPath)
        state = mgr.restore(state)
        loss_fn = make_yolo_loss_fn(model, image_wh, anchors)
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
            if i % 100 == 0:
                print(f"step {i} loss {float(metrics['loss']):.4f}")
        mgr.save(int(state.step), state, force=True)
        return

    # teacher inference modes
    t_state = TrainState.create(variables["params"],
                                variables["batch_stats"], tx)
    t_state = CheckpointManager(args.teacherPath).restore(t_state)
    teacher_vars = {"params": t_state.params,
                    "batch_stats": t_state.batch_stats}
    labeler = make_pseudo_label_fn(model, anchors, image_wh, classes_num)

    from tmv_tpu.utils import image_helper
    from tmv_tpu.utils.file_helper import read_file_list

    files = read_file_list(args.trainImagePath, r"\.(jpg|jpeg|png)$")

    def staged(path):
        img = image_helper.bytes_to_image(open(path, "rb").read())
        out, _, _ = image_helper.proportional_resize(img, image_wh)
        return out.astype(np.float32) / 255.0

    if args.mode == "dump_labels":
        # offline pseudo-label dump (`create_teacher_labels.py`)
        with open(args.labelsOut, "w", encoding="utf-8") as f:
            for start in range(0, len(files), args.batchSize):
                chunk = files[start : start + args.batchSize]
                imgs = jnp.asarray(np.stack([staged(p) for p in chunk]))
                boxes, ids, valid = labeler(teacher_vars, imgs,
                                            jax.random.key(start))
                for pi, path in enumerate(chunk):
                    parts = [os.path.basename(path)]
                    v = np.asarray(valid[pi])
                    for b, c in zip(np.asarray(boxes[pi])[v],
                                    np.asarray(ids[pi])[v]):
                        parts.append(
                            f"{classes_name[int(c)]},{b[0]:.1f},{b[1]:.1f},"
                            f"{b[2]:.1f},{b[3]:.1f}")
                    f.write("|".join(parts) + "|\n")
        print(f"wrote {args.labelsOut}")
        return

    # train_students: on-the-fly pseudo-labels feed the standard YOLO loss
    student = TrainState.create(variables["params"],
                                variables["batch_stats"], tx)
    mgr = CheckpointManager(args.studentPath)
    student = mgr.restore(student)
    loss_fn = make_yolo_loss_fn(model, image_wh, anchors)
    step_fn = jax.jit(make_train_step(loss_fn, tx, shadow_loss=True))

    targets_fn = jax.jit(jax.vmap(
        lambda b, c, v: make_yolo_targets(b, c, v, anchors, image_wh,
                                          classes_num)))
    from tmv_tpu.core.callbacks import GracefulShutdown

    shutdown = GracefulShutdown()
    rng = np.random.default_rng(0)
    for i in range(int(student.step), args.steps):
        if shutdown.requested:
            print(f"preemption signal: checkpointing at step "
                  f"{int(student.step)} and exiting")
            break
        chunk = [files[rng.integers(0, len(files))]
                 for _ in range(args.batchSize)]
        imgs = jnp.asarray(np.stack([staged(p) for p in chunk]))
        boxes, ids, valid = labeler(teacher_vars, imgs, jax.random.key(i))
        targets = targets_fn(boxes, ids.astype(jnp.int32), valid)
        student, metrics = step_fn(
            student, {"image": imgs, "targets": targets}, jax.random.key(i))
        if i % 100 == 0:
            print(f"step {i} loss {float(metrics['loss']):.4f}")
        if (i + 1) % 1000 == 0:
            mgr.save(int(student.step), student, wait=False)
    mgr.save(int(student.step), student, force=True)


if __name__ == "__main__":
    main()
