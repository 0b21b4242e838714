"""EfficientDetNet: backbone → P6/P7 resample → BiFPN cells → heads.

Parity surface: `efficientnet/efficientdet_net.py:10-95` (structure) and
`efficientnet/efficientdet_net_train.py:11-133` (loss: l2(4e-5) on kernels +
per-level ``BoxLoss·50 + FocalLoss`` normalized by Σpositives+1; train step
clips global grad norm at 10).
"""

import os
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from tmv_tpu.models.efficientdet.backbone import BackboneModel
from tmv_tpu.models.efficientdet.bifpn import BiFPN, ResampleFeatureMap
from tmv_tpu.models.efficientdet.config import default_blocks_args
from tmv_tpu.models.efficientdet.heads import BoxNet, ClassNet
from tmv_tpu.ops.losses import box_loss, focal_loss, l2_regularization


def _resolve_fused_dw(value):
    """Resolve the ``fused_dw_eval`` config to a concrete module setting.

    Mirrors the NMS-backend convention (``ops/nms.py``): the Pallas
    depthwise kernel is used on its measured win region by default on TPU
    (``"auto"``: micro-batches 2..32 only — single-image serving and the
    b64 bench shape measurably prefer XLA's own graph, see the
    FUSED_DW_AUTO_* comment in backbone.py) and never elsewhere;
    ``TMV_FUSED_DW=off|on|auto`` overrides.
    """
    env = os.environ.get("TMV_FUSED_DW", "").lower()
    if env:
        value = {"off": False, "on": True}.get(env, env)
    if value == "auto" and jax.default_backend() != "tpu":
        return False  # interpret-mode Pallas on CPU is never a win
    return value


class EfficientDetNet(nn.Module):
    """Forward: image → (boxes_outputs, classes_outputs), tuples over levels."""

    config: Any  # Config from get_efficientdet_config
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.config
        bn_m, bn_e = cfg.batch_norm_momentum, cfg.batch_norm_epsilon
        # cfg.remat: block-level rematerialization (MBConv blocks, BiFPN
        # cells, head nets) — exact, same variable tree, the peak-HBM lever
        # for D4+ / high-res training on one chip (see YoloV4.remat)
        remat = cfg.get("remat", False)
        Cell = nn.remat(BiFPN, static_argnums=(2,)) if remat else BiFPN
        Cls = nn.remat(ClassNet, static_argnums=(2,)) if remat else ClassNet
        Box = nn.remat(BoxNet, static_argnums=(2,)) if remat else BoxNet

        backbone = BackboneModel(
            blocks_args=tuple(default_blocks_args()),
            width_coefficient=cfg.width_coefficient,
            depth_coefficient=cfg.depth_coefficient,
            depth_divisor=cfg.depth_divisor,
            bn_momentum=bn_m, bn_epsilon=bn_e, dtype=self.dtype,
            fused_dw_eval=_resolve_fused_dw(cfg.get("fused_dw_eval", "auto")),
            remat=remat,
            stem_s2d=cfg.get("stem_s2d", False),
            name="backbone",
        )
        all_feats = backbone(x, train)
        # [final, r1..r5] indexed 3..max_level → r3, r4, r5
        feats = list(all_feats[cfg.min_level : cfg.max_level + 1])

        for level in range(6, cfg.max_level + 1):
            feats.append(
                ResampleFeatureMap(
                    cfg.fpn_num_filters, cfg.levels_size[level],
                    bn_m, bn_e, self.dtype, name=f"resample_p{level}",
                )(feats[-1], train)
            )

        levels_size = cfg.levels_size[cfg.min_level : cfg.max_level + 1]
        for rep in range(cfg.fpn_cell_repeats):
            feats = Cell(
                cfg.fpn_num_filters, tuple(levels_size),
                weight_method=cfg.get("fpn_weight_method", "fastattn"),
                bn_momentum=bn_m, bn_epsilon=bn_e, dtype=self.dtype,
                name=f"fpn_cell_{rep}",
            )(feats, train)

        num_levels = cfg.max_level - cfg.min_level + 1
        num_anchors = len(cfg.aspect_ratios) * cfg.num_scales
        classes_outputs = Cls(
            num_classes=cfg.num_classes, num_anchors=num_anchors,
            num_filters=cfg.fpn_num_filters, num_levels=num_levels,
            repeats=cfg.box_class_repeats, survival_prob=cfg.survival_prob,
            dtype=self.dtype, name="class_net",
        )(feats, train)
        boxes_outputs = Box(
            num_anchors=num_anchors, num_filters=cfg.fpn_num_filters,
            num_levels=num_levels, repeats=cfg.box_class_repeats,
            survival_prob=cfg.survival_prob, dtype=self.dtype, name="box_net",
        )(feats, train)
        return boxes_outputs, classes_outputs


def make_efficientdet_loss_fn(model: EfficientDetNet,
                              weight_decay: float = 4e-5,
                              reference_focal_reduction: bool = False):
    """Loss for ``make_train_step`` — `efficientdet_net_train.py:41-52`.

    Batch: image (B,H,W,3), targets from ``Anchors.generate_targets``
    vmapped over the batch: boxes/classes/masks tuples per level.

    ``reference_focal_reduction``: the reference wraps its FocalLoss in a
    Keras ``Loss`` whose AUTO reduction takes the *mean over all elements*
    (≈ B·h·w·A·C ≈ 10⁵), on top of the num_positives normalizer — which
    underweights classification by ~5 orders of magnitude vs the box term
    and prevents the classifier from training (verified empirically: fg
    logits stay at the prior after full overfitting).  Default False uses
    the automl-standard ``sum / num_positives`` (google/automl efficientdet
    ``cls_loss`` semantics); True replicates the reference bit-for-bit.
    """
    cfg = model.config

    def loss_fn(params, batch_stats, batch, rng):
        (y_pred_boxes, y_pred_classes), mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["image"], train=True,
            mutable=["batch_stats"], rngs={"dropout": rng},
        )
        y_true_boxes = batch["boxes"]
        y_true_classes = batch["classes"]
        y_true_masks = batch["masks"]

        loss = l2_regularization(params, weight_decay)
        num_positives = 1.0
        for m in y_true_masks:
            num_positives += jnp.sum(m.astype(jnp.float32))
        for level in range(len(y_true_boxes)):
            loss_b = box_loss(
                y_true_boxes[level], y_pred_boxes[level], num_positives
            )
            per_elem = focal_loss(
                y_true_classes[level], y_pred_classes[level], num_positives,
                alpha=cfg.alpha, gamma=cfg.gamma,
            )
            if reference_focal_reduction:
                loss_c = jnp.mean(per_elem)  # Keras AUTO reduction
            else:
                loss_c = jnp.sum(per_elem)  # automl: sum / num_positives
            loss += loss_b * 50.0 + loss_c
        return loss, (mutated["batch_stats"], {})

    return loss_fn
