"""FaceNet triplet training CLI (custom outer fit loop).

Parity surface: `facenet/train.py:64-128` + the custom fit loop at
`facenet_model.py:338-425`: per outer step, embed a people-batch, mine
semi-hard triplets, then run triplet-loss gradient steps; per epoch, LFW
eval.  Optimizer selectable (ADAGRAD/ADADELTA/ADAM/RMSPROP).  The
MirroredStrategy gradient all-reduce is superseded by jit-over-mesh data
parallelism (see tmv_tpu.parallel).
"""

import argparse
import os

import jax
import numpy as np
import optax


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--filesPath", required=True,
                   help="root dir: one subdir per person")
    p.add_argument("--backbone", default="InceptionResNetV1",
                   choices=["InceptionResNetV1", "InceptionResNetV2",
                            "InceptionV4", "RepVGG"])
    p.add_argument("--embeddingSize", type=int, default=512)
    p.add_argument("--imageSize", type=int, default=160)
    p.add_argument("--alpha", type=float, default=0.2)
    p.add_argument("--batchSize", type=int, default=30)
    p.add_argument("--peoplePerBatch", type=int, default=45)
    p.add_argument("--imagesPerPerson", type=int, default=40)
    p.add_argument("--optimizer", default="ADAM",
                   choices=["ADAGRAD", "ADADELTA", "ADAM", "RMSPROP"])
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--stepsPerEpoch", type=int, default=100)
    p.add_argument("--modelPath", default="./data/facenet_weights")
    p.add_argument("--lfwDir", default=None)
    p.add_argument("--lfwPairs", default=None)
    p.add_argument("--emaDecay", type=float, default=0.9999)
    p.add_argument("--remat", action="store_true",
                   help="block-level rematerialization (nn.remat) — "
                        "the peak-HBM lever for large-batch training")
    return p.parse_args()


def make_optimizer(name: str, lr: float):
    return {
        "ADAGRAD": optax.adagrad(lr),
        "ADADELTA": optax.adadelta(lr),
        "ADAM": optax.adam(lr),
        "RMSPROP": optax.rmsprop(lr, decay=0.9, momentum=0.9, eps=1.0),
    }[name]


def load_images(paths, image_size):
    from tmv_tpu.data.image_ops import load_image
    from tmv_tpu.utils.image_helper import proportional_resize

    out = []
    for p in paths:
        img = load_image(p)
        img, _, _ = proportional_resize(img, (image_size, image_size))
        out.append(img.astype(np.float32) / 255.0)
    return np.stack(out)


def main():
    import jax.numpy as jnp

    from tmv_tpu.core.checkpoint import CheckpointManager
    from tmv_tpu.core.train_state import TrainState, make_train_step
    from tmv_tpu.models.facenet import (
        FaceNetModel, get_embeddings, make_triplet_train_step,
        select_triplets,
    )
    from tmv_tpu.models.facenet.dataset import FaceDataset
    from tmv_tpu.models.facenet import lfw

    args = parse_args()
    model = FaceNetModel(embedding_size=args.embeddingSize,
                         backbone=args.backbone, remat=args.remat)
    x0 = jnp.zeros((1, args.imageSize, args.imageSize, 3))
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        x0, train=False)
    tx = make_optimizer(args.optimizer, args.lr)
    state = TrainState.create(variables["params"], variables["batch_stats"],
                              tx, ema_decay=args.emaDecay)
    mgr = CheckpointManager(args.modelPath)
    state = mgr.restore(state)

    dataset = FaceDataset(args.filesPath, args.peoplePerBatch,
                          args.imagesPerPerson)
    loss_fn = make_triplet_train_step(model, tx, args.alpha)
    step_fn = jax.jit(make_train_step(
        loss_fn, tx, shadow_loss=True, ema_decay=args.emaDecay))

    per_triplet_batch = args.batchSize // 3
    outer = 0
    from tmv_tpu.core.callbacks import GracefulShutdown

    shutdown = GracefulShutdown()
    for epoch in range(args.epochs):
        if shutdown.requested:
            print(f"preemption signal: checkpointing at step "
                  f"{int(state.step)} and exiting")
            break
        for _ in range(args.stepsPerEpoch):
            paths, num_per_class = dataset.sample_people()
            images = load_images(paths, args.imageSize)
            emb = get_embeddings(
                model,
                {"params": state.params, "batch_stats": state.batch_stats},
                images, args.batchSize)
            # pad embeddings into the (people, images) grid for mining
            p_num = len(num_per_class)
            i_num = max(num_per_class)
            grid = np.zeros((p_num, i_num, emb.shape[1]), np.float32)
            valid = np.zeros((p_num, i_num), bool)
            path_grid = np.zeros((p_num, i_num), np.int64)
            cursor = 0
            for pi, n in enumerate(num_per_class):
                grid[pi, :n] = emb[cursor : cursor + n]
                valid[pi, :n] = True
                path_grid[pi, :n] = np.arange(cursor, cursor + n)
                cursor += n
            triplets, tvalid = select_triplets(
                jnp.asarray(grid), jnp.asarray(valid), args.alpha,
                jax.random.key(outer))
            triplets = np.asarray(triplets)[np.asarray(tvalid)]
            if not len(triplets):
                continue
            flat_idx = path_grid.reshape(-1)
            np.random.default_rng(outer).shuffle(triplets)
            for start in range(0, len(triplets) - per_triplet_batch + 1,
                               per_triplet_batch):
                chunk = triplets[start : start + per_triplet_batch]
                batch = {
                    "anchor": jnp.asarray(images[flat_idx[chunk[:, 0]]]),
                    "positive": jnp.asarray(images[flat_idx[chunk[:, 1]]]),
                    "negative": jnp.asarray(images[flat_idx[chunk[:, 2]]]),
                }
                state, metrics = step_fn(state, batch, jax.random.key(outer))
                outer += 1
            print(f"epoch {epoch} outer {outer} "
                  f"loss {float(metrics['loss']):.4f} "
                  f"triplets {len(triplets)}")
        mgr.save(int(state.step), state, wait=False)
        if args.lfwDir and args.lfwPairs:
            pairs = lfw.read_pairs(args.lfwPairs)
            paths, issame = lfw.get_paths(args.lfwDir, pairs)
            images = load_images(paths, args.imageSize)
            emb = get_embeddings(
                model,
                {"params": state.params, "batch_stats": state.batch_stats},
                images, args.batchSize)
            _, _, accuracy, val, val_std, far = lfw.evaluate(emb, issame)
            print(f"LFW accuracy {accuracy.mean():.4f}±{accuracy.std():.4f} "
                  f"VAL {val:.4f}±{val_std:.4f} @ FAR={far:.4f}")
    mgr.save(int(state.step), state, force=True)


if __name__ == "__main__":
    main()
