"""FaceNet: embedding model + online semi-hard triplet mining.

Parity surface: `AIServer/ai_api/ai_models/facenet/facenet_model.py`:
- ``FaceNetModel`` (`:14-53`): selectable backbone (InceptionResNetV1/V2,
  InceptionV4, RepVGG-B2g4) → embedding → l2-normalize (ε=1e-10).
- ``get_embeddings`` (`:153-175`): batched, pad-to-batch inference over an
  image stack.
- ``select_triplets`` (`:197-266`): for each (anchor, later-positive) pair
  within a person, pick one random negative among those satisfying
  ``(neg−pos < α ∧ pos < neg) ∨ (neg < pos)`` — semi-hard ∪ hard.
- ``train_step`` (`:270-314`): triplet margin loss, gradient all-reduce
  across replicas (here: jit + mesh sharding inserts the psum), shadow-loss
  EMA, and shadow-*weight* EMA over all variables including BN stats.

TPU re-design: mining runs on a padded ``(people, images)`` grid — one
batched distance computation + masked Gumbel-max random negative choice —
no graph loops; the host compacts the fixed-capacity mined triplets into
training batches (the reference's outer fit loop is host-side too).
"""

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tmv_tpu.models.backbones import (
    InceptionResNetV1,
    InceptionResNetV2,
    InceptionV4,
    get_repvgg_by_name,
)
from tmv_tpu.ops.losses import triplet_loss


class FaceNetModel(nn.Module):
    embedding_size: int
    backbone: str = "InceptionResNetV1"
    dropout_rate: float = 0.2
    dtype: Any = jnp.float32
    remat: bool = False  # block-level rematerialization (see YoloV4.remat)

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.backbone == "InceptionResNetV1":
            net = InceptionResNetV1(self.embedding_size, self.dropout_rate,
                                    self.dtype, remat=self.remat)
        elif self.backbone == "InceptionResNetV2":
            net = InceptionResNetV2(self.embedding_size, self.dropout_rate,
                                    self.dtype, remat=self.remat)
        elif self.backbone == "InceptionV4":
            net = InceptionV4(self.embedding_size, self.dropout_rate,
                              self.dtype, remat=self.remat)
        elif self.backbone == "RepVGG":
            net = get_repvgg_by_name("RepVGG-B2g4", self.embedding_size,
                                     dtype=self.dtype, remat=self.remat)
        else:
            raise ValueError(f"unknown backbone {self.backbone!r}")
        x = net(x, train)
        norm = jnp.sqrt(jnp.maximum(jnp.sum(jnp.square(x), axis=1,
                                            keepdims=True), 1e-10))
        return x / norm


def get_embeddings(model: FaceNetModel, variables, images: np.ndarray,
                   batch_size: int) -> np.ndarray:
    """Batched inference with pad-to-batch (facenet_model.py:153-175)."""

    @jax.jit
    def fwd(imgs):
        return model.apply(variables, imgs, train=False)

    out = []
    n = images.shape[0]
    for start in range(0, n, batch_size):
        chunk = images[start : start + batch_size]
        pad = batch_size - chunk.shape[0]
        if pad:
            chunk = np.concatenate(
                [chunk, np.zeros((pad,) + chunk.shape[1:], chunk.dtype)]
            )
        emb = np.asarray(fwd(jnp.asarray(chunk)))
        out.append(emb[: batch_size - pad] if pad else emb)
    return np.concatenate(out, axis=0)


def select_triplets(
    embeddings_grid: jax.Array,
    valid_grid: jax.Array,
    alpha: float,
    key: jax.Array,
):
    """Semi-hard triplet mining over a padded (P, I, D) embedding grid.

    Args:
        embeddings_grid: ``(people, images, D)``; padded rows arbitrary.
        valid_grid: ``(people, images)`` bool.
        key: PRNG for the random-negative choice.

    Returns:
        (triplets, valid): ``(P*I*I, 3)`` flat indices into the flattened
        ``(P*I, D)`` embedding array, and a validity mask.  Semantics match
        `facenet_model.py:197-266` with the sequential "random qualifying
        negative" choice replaced by masked Gumbel-max (uniform over the
        qualifying set, identical distribution).
    """
    p_num, i_num, d = embeddings_grid.shape
    flat = embeddings_grid.reshape(-1, d)
    valid_flat = valid_grid.reshape(-1)
    n = flat.shape[0]

    # pairwise squared distances between all (P*I) embeddings
    sq = jnp.sum(jnp.square(flat), axis=1)
    dists = sq[:, None] + sq[None, :] - 2.0 * flat @ flat.T

    person_of = jnp.repeat(jnp.arange(p_num), i_num)
    image_of = jnp.tile(jnp.arange(i_num), p_num)

    # (a, p) anchor-positive pairs: same person, image_p > image_a
    same_person = person_of[:, None] == person_of[None, :]
    later = image_of[None, :] > image_of[:, None]
    ap_valid = same_person & later & valid_flat[:, None] & valid_flat[None, :]

    pos_dist = dists  # (a, p)
    neg_ok_base = (~same_person) & valid_flat[None, :]  # (a, n)

    # condition per (a, p, n): (neg - pos < alpha ∧ pos < neg) ∨ (neg < pos)
    neg = dists[:, None, :]  # (a, 1, n)
    pos = pos_dist[:, :, None]  # (a, p, 1)
    cond = ((neg - pos < alpha) & (pos < neg)) | (neg < pos)
    cond = cond & neg_ok_base[:, None, :] & ap_valid[:, :, None]

    gumbel = jax.random.gumbel(key, cond.shape)
    score = jnp.where(cond, gumbel, -jnp.inf)
    n_idx = jnp.argmax(score, axis=-1)  # (a, p)
    has_neg = jnp.any(cond, axis=-1)  # (a, p)

    a_idx = jnp.broadcast_to(jnp.arange(n)[:, None], (n, n))
    p_idx = jnp.broadcast_to(jnp.arange(n)[None, :], (n, n))
    triplets = jnp.stack(
        [a_idx.reshape(-1), p_idx.reshape(-1), n_idx.reshape(-1)], axis=-1
    )
    valid = (ap_valid & has_neg).reshape(-1)
    return triplets, valid


def make_triplet_train_step(model: FaceNetModel, tx, alpha: float,
                            ema_decay: Optional[float] = None):
    """Loss fn for ``core.train_state.make_train_step``.

    Batch: ``anchor``/``positive``/``negative`` image stacks + ``valid``.
    """

    def loss_fn(params, batch_stats, batch, rng):
        imgs = jnp.concatenate(
            [batch["anchor"], batch["positive"], batch["negative"]], axis=0
        )
        emb, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats}, imgs, train=True,
            mutable=["batch_stats"], rngs={"dropout": rng},
        )
        b = batch["anchor"].shape[0]
        a, p, n = emb[:b], emb[b : 2 * b], emb[2 * b :]
        loss = triplet_loss(a, p, n, alpha, valid=batch.get("valid"))
        return loss, (mutated["batch_stats"], {})

    return loss_fn
