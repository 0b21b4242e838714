"""Where does the D0 eval forward actually spend time?

Slope-method timings (see bench.py) for the three stages run standalone —
EfficientNet backbone, resample+BiFPN stack, Class/Box heads — plus the
full net.  Standalone stages lose a little cross-stage fusion, so the
parts can sum to slightly more than the whole; good enough to aim Pallas
fusion work at the real hot spot instead of guesses.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

K_SMALL, K_LARGE = 1, 9


def slope_time(run, reps=3):
    times = {}
    for k in (K_SMALL, K_LARGE):
        _ = run(k)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            _ = run(k)
            best = min(best, time.perf_counter() - t0)
        times[k] = best
    return (times[K_LARGE] - times[K_SMALL]) / (K_LARGE - K_SMALL)


def main():
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from tmv_tpu.models.efficientdet import (
        EfficientDetNet, get_efficientdet_config,
    )
    from tmv_tpu.models.efficientdet.backbone import BackboneModel
    from tmv_tpu.models.efficientdet.bifpn import BiFPN, ResampleFeatureMap
    from tmv_tpu.models.efficientdet.config import default_blocks_args
    from tmv_tpu.models.efficientdet.heads import BoxNet, ClassNet

    batch = 32
    cfg = get_efficientdet_config("efficientdet-d0")
    size = cfg.image_size
    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.uniform(size=(batch, size, size, 3)).astype(np.float32))

    bn_m, bn_e = cfg.batch_norm_momentum, cfg.batch_norm_epsilon

    backbone = BackboneModel(
        blocks_args=tuple(default_blocks_args()),
        width_coefficient=cfg.width_coefficient,
        depth_coefficient=cfg.depth_coefficient,
        depth_divisor=cfg.depth_divisor,
        bn_momentum=bn_m, bn_epsilon=bn_e, dtype=dtype)

    class FPNStack(nn.Module):
        @nn.compact
        def __call__(self, feats, train: bool = False):
            feats = list(feats)
            for level in range(6, cfg.max_level + 1):
                feats.append(ResampleFeatureMap(
                    cfg.fpn_num_filters, cfg.levels_size[level],
                    bn_m, bn_e, dtype)(feats[-1], train))
            levels_size = cfg.levels_size[cfg.min_level:cfg.max_level + 1]
            for _rep in range(cfg.fpn_cell_repeats):
                feats = BiFPN(cfg.fpn_num_filters, tuple(levels_size),
                              weight_method="fastattn",
                              bn_momentum=bn_m, bn_epsilon=bn_e,
                              dtype=dtype)(feats, train)
            return feats

    class Heads(nn.Module):
        @nn.compact
        def __call__(self, feats, train: bool = False):
            num_levels = cfg.max_level - cfg.min_level + 1
            num_anchors = len(cfg.aspect_ratios) * cfg.num_scales
            c = ClassNet(num_classes=cfg.num_classes,
                         num_anchors=num_anchors,
                         num_filters=cfg.fpn_num_filters,
                         num_levels=num_levels,
                         repeats=cfg.box_class_repeats,
                         survival_prob=cfg.survival_prob,
                         dtype=dtype)(feats, train)
            b = BoxNet(num_anchors=num_anchors,
                       num_filters=cfg.fpn_num_filters,
                       num_levels=num_levels,
                       repeats=cfg.box_class_repeats,
                       survival_prob=cfg.survival_prob,
                       dtype=dtype)(feats, train)
            return b, c

    bb_vars = backbone.init(jax.random.key(0), x[:1], False)
    feats1 = backbone.apply(bb_vars, x[:1], False)
    feats1 = list(feats1[cfg.min_level:cfg.max_level + 1])

    fpn = FPNStack()
    fpn_vars = fpn.init(jax.random.key(1), feats1, False)
    fpn_out1 = fpn.apply(fpn_vars, feats1, False)
    heads = Heads()
    heads_vars = heads.init(jax.random.key(2), fpn_out1, False)

    model = EfficientDetNet(config=cfg, dtype=dtype)
    full_vars = model.init(jax.random.key(0), x[:1], False)

    def chain(apply_fn, v, x0):
        @jax.jit
        def run(v, img, k):
            def body(i, carry):
                s = apply_fn(v, carry)
                return jax.tree.map(
                    lambda c: c + (s * 1e-12).astype(c.dtype), carry)
            out = jax.lax.fori_loop(0, k, body, x0)
            leaf = jax.tree_util.tree_leaves(out)[0]
            return jnp.sum(leaf.astype(jnp.float32))
        return lambda k: np.asarray(run(v, x0, k))

    def bb_fn(v, img):
        feats = backbone.apply(v, img, False)
        return sum(jnp.sum(f.astype(jnp.float32)) for f in feats)

    featsB = [jnp.tile(f, (batch, 1, 1, 1)) for f in feats1]
    fpn_outB = [jnp.tile(f, (batch, 1, 1, 1)) for f in fpn_out1]

    def fpn_fn(v, feats):
        out = fpn.apply(v, feats, False)
        return sum(jnp.sum(f.astype(jnp.float32)) for f in out)

    def heads_fn(v, feats):
        b, c = heads.apply(v, feats, False)
        return (sum(jnp.sum(t.astype(jnp.float32)) for t in b)
                + sum(jnp.sum(t.astype(jnp.float32)) for t in c))

    def full_fn(v, img):
        b, c = model.apply(v, img, train=False)
        return (sum(jnp.sum(t.astype(jnp.float32)) for t in b)
                + sum(jnp.sum(t.astype(jnp.float32)) for t in c))

    t_bb = slope_time(chain(bb_fn, bb_vars, x))
    t_fpn = slope_time(chain(fpn_fn, fpn_vars, featsB))
    t_heads = slope_time(chain(heads_fn, heads_vars, fpn_outB))
    t_full = slope_time(chain(full_fn, full_vars, x))
    print(f"b{batch} @ {size}px bf16 (per-iter device ms, standalone):")
    print(f"  backbone: {t_bb*1e3:8.2f}")
    print(f"  bifpn:    {t_fpn*1e3:8.2f}")
    print(f"  heads:    {t_heads*1e3:8.2f}")
    print(f"  full:     {t_full*1e3:8.2f}  ({batch/t_full:.0f} img/s)")


if __name__ == "__main__":
    main()
