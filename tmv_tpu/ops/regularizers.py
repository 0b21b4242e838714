"""Stochastic regularizers: drop_connect, DropBlock, Disout.

Parity surface: `utils/drop_connect.py:3-19` (stochastic depth, live in
Class/BoxNet), `utils/drop_block.py:4-59` (spatial block dropout, dormant)
and `utils/disout.py:4-162` (feature-distortion dropout, dormant).  JAX
re-design: explicit PRNG keys instead of global RNG state; train/eval is a
static Python bool so XLA traces a no-op graph in eval mode.
"""

import jax
import jax.numpy as jnp


def drop_connect(
    x: jax.Array, key: jax.Array, is_training: bool, survival_prob: float
) -> jax.Array:
    """Stochastic depth: drop the whole residual branch per sample.

    Train-time division by ``survival_prob`` (no eval-time rescale), matching
    `utils/drop_connect.py:10-19`.
    """
    if not is_training or survival_prob >= 1.0:
        return x
    batch = x.shape[0]
    shape = (batch,) + (1,) * (x.ndim - 1)
    random_tensor = survival_prob + jax.random.uniform(key, shape, dtype=x.dtype)
    binary = jnp.floor(random_tensor)
    return x / survival_prob * binary


def _block_mask(key, x_shape, block_size: int, dist_prob: float):
    """Shared DropBlock/Disout mask: seed centers in the interior, then
    max-pool to square blocks (`utils/drop_block.py:28-52`)."""
    b, h, w, c = x_shape
    bs = min(block_size, (h // 5) + 1 if block_size > h // 5 else block_size)
    block_num = (h * w) * dist_prob / (bs * bs)
    block_rate = block_num / ((h - bs + 1) * (w - bs + 1))
    centers = jax.random.uniform(key, (b, h - bs + 1, w - bs + 1, c))
    pad_t = bs // 2
    pad_b = h - pad_t - (h - bs + 1)
    pad_l = bs // 2
    pad_r = w - pad_l - (w - bs + 1)
    # Deliberate fix vs the reference: tf.pad zero-fills the border band and
    # `0 < rate` then seeds every border pixel (utils/drop_block.py:49-51),
    # unconditionally dropping the image frame.  Pad with 1.0 (no seed).
    padded = jnp.pad(
        centers, ((0, 0), (pad_t, pad_b), (pad_l, pad_r), (0, 0)),
        constant_values=1.0,
    )
    seeds = (padded < block_rate).astype(jnp.float32)
    block = jax.lax.reduce_window(
        seeds, -jnp.inf, jax.lax.max, (1, bs, bs, 1), (1, 1, 1, 1), "SAME"
    )
    return jnp.maximum(block, 0.0)


def drop_block(
    x: jax.Array,
    key: jax.Array,
    is_training: bool,
    dist_prob: float,
    block_size: int = 5,
) -> jax.Array:
    """DropBlock: zero contiguous spatial blocks (`utils/drop_block.py`)."""
    if not is_training or x.ndim != 4:
        return x
    block = _block_mask(key, x.shape, block_size, dist_prob)
    return x * (1.0 - block)


def disout(
    x: jax.Array,
    key: jax.Array,
    is_training: bool,
    dist_prob: float,
    block_size: int = 5,
    alpha: float = 1.0,
) -> jax.Array:
    """Disout (arXiv 2002.11022): replace blocks with feature-scaled noise.

    Matches the live branch of `utils/disout.py:22-97`: blocked positions are
    blended toward uniform noise in the per-channel [min, max] range with
    strength ``alpha * v + 0.3`` where v is the normalized channel-summed
    activation magnitude.
    """
    if not is_training or x.ndim != 4:
        return x
    k_mask, k_noise = jax.random.split(key)
    block = _block_mask(k_mask, x.shape, block_size, dist_prob)
    x_abs = jnp.abs(x)
    x_sum = jnp.sum(x_abs, axis=-1, keepdims=True)
    x_max_c = jnp.max(x_abs, axis=(1, 2), keepdims=True)
    x_sum_c = jnp.sum(x_max_c, axis=-1, keepdims=True)
    x_v = x_sum / x_sum_c
    x_max = jnp.max(x, axis=(1, 2), keepdims=True)
    x_min = jnp.min(x, axis=(1, 2), keepdims=True)
    noise = jax.random.uniform(k_noise, x.shape, dtype=x.dtype) * (x_max - x_min) + x_min
    mixed = noise * (alpha * x_v + 0.3) + x * (1.0 - alpha * x_v - 0.3)
    return x * (1.0 - block) + mixed * block


def disout_1d(
    x: jax.Array,
    key: jax.Array,
    is_training: bool,
    dist_prob: float,
    block_size: int = 5,
    alpha: float = 0.5,
) -> jax.Array:
    """1-D Disout over feature vectors (`utils/disout.py:105-162`)."""
    if not is_training or x.ndim != 2:
        return x
    b, n = x.shape
    k_mask, k_noise = jax.random.split(key)
    bs = block_size
    block_num = n * dist_prob / bs
    block_rate = block_num / (n - bs + 1)
    centers = jax.random.uniform(k_mask, (b, n - bs + 1))
    pad_t = bs // 2
    pad_b = n - pad_t - (n - bs + 1)
    padded = jnp.pad(centers, ((0, 0), (pad_t, pad_b)))
    seeds = (padded < block_rate).astype(jnp.float32)
    block = jax.lax.reduce_window(
        seeds, -jnp.inf, jax.lax.max, (1, bs), (1, 1), "SAME"
    )
    block = jnp.maximum(block, 0.0)
    x_max = jnp.max(x, axis=1, keepdims=True)
    x_min = jnp.min(x, axis=1, keepdims=True)
    noise = jax.random.uniform(k_noise, x.shape, dtype=x.dtype) * (x_max - x_min) + x_min
    mixed = noise * (1.0 - alpha) + x * alpha
    return x * (1.0 - block) + mixed * block
