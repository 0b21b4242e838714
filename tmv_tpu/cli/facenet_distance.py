"""Embed a list of face images and print the pairwise distance matrix.

Parity surface: `facenet/test.py:24-56` — load N images, compute
embeddings, print squared-euclidean distances between every pair.
"""

import argparse

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("images", nargs="+")
    p.add_argument("--modelPath", required=True)
    p.add_argument("--backbone", default="InceptionResNetV1")
    p.add_argument("--embeddingSize", type=int, default=512)
    p.add_argument("--imageSize", type=int, default=160)
    return p.parse_args()


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from tmv_tpu.cli.train_facenet import load_images
    from tmv_tpu.core.checkpoint import CheckpointManager
    from tmv_tpu.core.train_state import TrainState
    from tmv_tpu.models.facenet import FaceNetModel, get_embeddings

    args = parse_args()
    model = FaceNetModel(embedding_size=args.embeddingSize,
                         backbone=args.backbone)
    x0 = jnp.zeros((1, args.imageSize, args.imageSize, 3))
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        x0, train=False)
    state = TrainState.create(variables["params"], variables["batch_stats"],
                              optax.sgd(1e-3))
    state = CheckpointManager(args.modelPath).restore_weights(state)
    images = load_images(args.images, args.imageSize)
    emb = get_embeddings(
        model, {"params": state.params, "batch_stats": state.batch_stats},
        images, batch_size=max(4, len(args.images)))
    n = len(args.images)
    print("Distance matrix (squared euclidean):")
    print("      " + "  ".join(f"{i:8d}" for i in range(n)))
    for i in range(n):
        row = [float(np.sum((emb[i] - emb[j]) ** 2)) for j in range(n)]
        print(f"{i:4d}  " + "  ".join(f"{d:8.4f}" for d in row))


if __name__ == "__main__":
    main()
