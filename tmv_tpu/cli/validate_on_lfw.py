"""LFW validation CLI: accuracy / VAL@FAR / EER / AUC.

Parity surface: `facenet/validate_on_lfw.py` (+ `facenet/test.py`): embed
the LFW pair list with a trained FaceNet checkpoint and report 10-fold
verification metrics.
"""

import argparse

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--lfwDir", required=True)
    p.add_argument("--lfwPairs", required=True)
    p.add_argument("--modelPath", required=True)
    p.add_argument("--backbone", default="InceptionResNetV1")
    p.add_argument("--embeddingSize", type=int, default=512)
    p.add_argument("--imageSize", type=int, default=160)
    p.add_argument("--batchSize", type=int, default=32)
    p.add_argument("--distanceMetric", type=int, default=0)
    p.add_argument("--subtractMean", action="store_true")
    return p.parse_args()


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from tmv_tpu.core.checkpoint import CheckpointManager
    from tmv_tpu.core.train_state import TrainState
    from tmv_tpu.models.facenet import FaceNetModel, get_embeddings
    from tmv_tpu.models.facenet import lfw
    from tmv_tpu.cli.train_facenet import load_images

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
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    pairs = lfw.read_pairs(args.lfwPairs)
    paths, issame = lfw.get_paths(args.lfwDir, pairs)
    images = load_images(paths, args.imageSize)
    emb = get_embeddings(model, variables, images, args.batchSize)
    tpr, fpr, accuracy, val, val_std, far = lfw.evaluate(
        emb, issame, distance_metric=args.distanceMetric,
        subtract_mean=args.subtractMean)
    auc = float(np.trapezoid(tpr, fpr))
    # EER: where FNR crosses FPR
    fnr = 1 - tpr
    eer_idx = int(np.argmin(np.abs(fnr - fpr)))
    eer = float((fnr[eer_idx] + fpr[eer_idx]) / 2)
    print(f"Accuracy: {accuracy.mean():.5f}+-{accuracy.std():.5f}")
    print(f"Validation rate: {val:.5f}+-{val_std:.5f} @ FAR={far:.5f}")
    print(f"Area Under Curve (AUC): {auc:.5f}")
    print(f"Equal Error Rate (EER): {eer:.5f}")


if __name__ == "__main__":
    main()
