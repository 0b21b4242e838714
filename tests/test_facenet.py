import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tmv_tpu.models.facenet.model import select_triplets
from tmv_tpu.models.facenet import lfw
from tmv_tpu.ops.losses import euclidean_distance_sq


class TestSelectTriplets:
    def test_semantics(self, rng):
        # 3 people × 3 images in 4-D space; persons clustered
        # overlapping clusters so semi-hard/hard negatives exist (with far
        # clusters the mining condition rejects everything — as in the
        # reference)
        P, I, D = 3, 3, 4
        centers = rng.normal(0, 0.5, size=(P, 1, D))
        emb = (centers + rng.normal(0, 0.5, size=(P, I, D))).astype(np.float32)
        valid = np.ones((P, I), bool)
        triplets, tvalid = select_triplets(
            jnp.asarray(emb), jnp.asarray(valid), alpha=0.2,
            key=jax.random.key(0))
        triplets = np.asarray(triplets)[np.asarray(tvalid)]
        flat = emb.reshape(-1, D)
        person_of = np.repeat(np.arange(P), I)
        image_of = np.tile(np.arange(I), P)
        assert len(triplets) > 0
        for a, p, n in triplets:
            # anchor and positive same person, positive later image
            assert person_of[a] == person_of[p]
            assert image_of[p] > image_of[a]
            assert person_of[n] != person_of[a]
            # mining condition
            pos_d = np.sum((flat[a] - flat[p]) ** 2)
            neg_d = np.sum((flat[a] - flat[n]) ** 2)
            assert (neg_d - pos_d < 0.2 and pos_d < neg_d) or neg_d < pos_d

    def test_invalid_images_excluded(self, rng):
        P, I, D = 2, 3, 4
        emb = rng.normal(size=(P, I, D)).astype(np.float32)
        valid = np.ones((P, I), bool)
        valid[1, 2] = False
        triplets, tvalid = select_triplets(
            jnp.asarray(emb), jnp.asarray(valid), 0.2, jax.random.key(1))
        triplets = np.asarray(triplets)[np.asarray(tvalid)]
        bad = 1 * I + 2
        assert not np.any(triplets == bad)


class TestLfwEvaluate:
    def test_separable_embeddings_reach_high_accuracy(self, rng):
        # pairs: same → nearby, diff → far
        n_pairs = 60
        issame = (np.arange(n_pairs) % 2 == 0)
        emb = np.zeros((2 * n_pairs, 8), np.float32)
        for i in range(n_pairs):
            base = rng.normal(size=8)
            base /= np.linalg.norm(base)
            e1 = base
            if issame[i]:
                e2 = base + rng.normal(0, 0.05, 8)
            else:
                e2 = rng.normal(size=8)
                e2 /= np.linalg.norm(e2)
            emb[2 * i] = e1
            emb[2 * i + 1] = e2 / np.linalg.norm(e2)
        tpr, fpr, accuracy, val, val_std, far = lfw.evaluate(emb, issame)
        assert accuracy.mean() > 0.9
        assert 0 <= val <= 1 and far <= 0.05

    def test_distance_metrics(self, rng):
        e1 = rng.normal(size=(4, 8))
        e2 = rng.normal(size=(4, 8))
        d0 = lfw.distance(e1, e2, 0)
        np.testing.assert_allclose(d0, np.sum((e1 - e2) ** 2, 1))
        d1 = lfw.distance(e1, e1, 1)
        np.testing.assert_allclose(d1, 0, atol=1e-6)


class TestRepVGGReparam:
    def test_train_deploy_equivalence(self, rng):
        from tmv_tpu.models.backbones.repvgg import (
            RepVGG, repvgg_convert_params,
        )
        train_model = RepVGG(num_blocks=(1, 1, 1, 1), num_classes=10,
                             width_multiplier=(0.25, 0.25, 0.25, 0.5))
        x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
        variables = train_model.init(jax.random.key(0), x, train=False)
        # make BN stats non-trivial
        _, mutated = train_model.apply(variables, x, train=True,
                                       mutable=["batch_stats"])
        variables = {"params": variables["params"],
                     "batch_stats": mutated["batch_stats"]}
        y_train = train_model.apply(variables, x, train=False)

        deploy_model = RepVGG(num_blocks=(1, 1, 1, 1), num_classes=10,
                              width_multiplier=(0.25, 0.25, 0.25, 0.5),
                              deploy=True)
        deploy_vars = repvgg_convert_params(variables, train_model)
        y_deploy = deploy_model.apply(deploy_vars, x, train=False)
        np.testing.assert_allclose(
            np.asarray(y_train), np.asarray(y_deploy), rtol=1e-3, atol=1e-4)
