"""FaceNet end-to-end demo: triplet training separates synthetic identities.

Builds a synthetic identity dataset (distinct color/texture patterns per
person, jittered per image), runs the full mining→triplet-loss loop, and
reports verification accuracy via the LFW evaluator — the complete FaceNet
vertical (embeddings, semi-hard mining, margin loss, 10-fold ROC eval).
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEOPLE = 8
IMAGES_PER = 6
SIZE = 64
EMBED = 64
OUTER = 12


def make_identity_images(rng):
    """(PEOPLE, IMAGES_PER, SIZE, SIZE, 3) float [0,1]: per-person pattern."""
    out = np.zeros((PEOPLE, IMAGES_PER, SIZE, SIZE, 3), np.float32)
    yy, xx = np.mgrid[0:SIZE, 0:SIZE] / SIZE
    for p in range(PEOPLE):
        base = rng.uniform(0.2, 1.0, 3)
        fy, fx = rng.integers(1, 6, 2)
        phase = rng.uniform(0, np.pi, 2)
        pattern = 0.5 + 0.5 * np.sin(
            2 * np.pi * (fy * yy + phase[0])) * np.cos(
            2 * np.pi * (fx * xx + phase[1]))
        for i in range(IMAGES_PER):
            jitter = rng.normal(0, 0.05, (SIZE, SIZE, 1))
            shift = rng.integers(-3, 4, 2)
            img = np.roll(pattern, shift, axis=(0, 1))[..., None] * base
            out[p, i] = np.clip(img + jitter, 0, 1)
    return out


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from tmv_tpu.core.train_state import TrainState, make_train_step
    from tmv_tpu.models.facenet import (
        FaceNetModel, get_embeddings, make_triplet_train_step,
        select_triplets,
    )
    from tmv_tpu.models.facenet import lfw

    rng = np.random.default_rng(0)
    images = make_identity_images(rng)
    flat = images.reshape(-1, SIZE, SIZE, 3)

    model = FaceNetModel(embedding_size=EMBED, backbone="RepVGG")
    x0 = jnp.zeros((1, SIZE, SIZE, 3))
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        x0, train=False)
    tx = optax.adam(1e-3)
    state = TrainState.create(variables["params"], variables["batch_stats"], tx)
    loss_fn = make_triplet_train_step(model, tx, alpha=0.2)
    step = jax.jit(make_train_step(loss_fn, tx))

    def eval_accuracy():
        emb = get_embeddings(
            model, {"params": state.params, "batch_stats": state.batch_stats},
            flat, batch_size=16)
        # build verification pairs: same-person and different-person
        pairs, issame = [], []
        for p in range(PEOPLE):
            pairs += [emb[p * IMAGES_PER], emb[p * IMAGES_PER + 1]]
            issame.append(True)
            q = (p + 1) % PEOPLE
            pairs += [emb[p * IMAGES_PER + 2], emb[q * IMAGES_PER + 2]]
            issame.append(False)
        _, _, accuracy, _, _, _ = lfw.evaluate(
            np.stack(pairs), issame, nrof_folds=4)
        return float(accuracy.mean())

    acc_before = eval_accuracy()
    for outer in range(OUTER):
        emb = get_embeddings(
            model, {"params": state.params, "batch_stats": state.batch_stats},
            flat, batch_size=16)
        grid = emb.reshape(PEOPLE, IMAGES_PER, EMBED)
        valid = np.ones((PEOPLE, IMAGES_PER), bool)
        triplets, tvalid = select_triplets(
            jnp.asarray(grid), jnp.asarray(valid), 0.2,
            jax.random.key(outer))
        tri = np.asarray(triplets)[np.asarray(tvalid)]
        if not len(tri):
            print(f"outer {outer}: no violations left")
            break
        np.random.default_rng(outer).shuffle(tri)
        tri = tri[:64]
        for start in range(0, len(tri) - 7, 8):
            chunk = tri[start : start + 8]
            batch = {
                "anchor": jnp.asarray(flat[chunk[:, 0]]),
                "positive": jnp.asarray(flat[chunk[:, 1]]),
                "negative": jnp.asarray(flat[chunk[:, 2]]),
            }
            state, metrics = step(state, batch, jax.random.key(outer))
        print(f"outer {outer}: {len(tri)} triplets "
              f"loss {float(metrics['loss']):.4f}")
    acc_after = eval_accuracy()
    result = {
        "accuracy_before": round(acc_before, 4),
        "accuracy_after": round(acc_after, 4),
    }
    print(json.dumps(result))
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "e2e_demo_result.json")
    data = json.load(open(path)) if os.path.exists(path) else {}
    data["facenet_synthetic"] = result
    json.dump(data, open(path, "w"), indent=2)


if __name__ == "__main__":
    main()
