"""EfficientDet-style multiscale anchors: generation, targets, codecs, decode.

Capability parity with `AIServer/ai_api/ai_models/efficientnet/utils/anchors.py`
(class ``Anchors``) and `efficientnet/utils/get_feat_sizes.py`:

- anchor boxes per level: ``num_scales`` octaves × ``aspect_ratios``, size
  ``anchor_scale * stride * 2**(octave/num_scales)`` centered on the stride
  grid, yxyx corner format in *pixel* coordinates (anchors.py:46-84);
- target assignment: per-level argmax-IoU over GT boxes with an IoU >= 0.5
  gate (anchors.py:90-138) — note the reference assigns *per level*, not
  globally, and encodes class 0 as background;
- box codec ``ty=(y-ya)/ha, tx=(x-xa)/wa, th=log(h/ha), tw=log(w/wa)``
  (anchors.py:219-274);
- per-image output decode + DIoU-NMS at score_threshold=1e-4
  (anchors.py:160-202).

TPU re-design: anchors are precomputed host-side with numpy at construction
(static shapes; they become jit constants), target assignment is a single
batched IoU + argmax per level with a validity mask over padded GT boxes
(no dynamic shapes), and the decode path keeps a fixed candidate capacity.
"""

import math
from typing import List, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from tmv_tpu.ops.iou import iou_yxyx
from tmv_tpu.ops.nms import nms

EPSILON = 1e-8


def get_feat_sizes(image_size: Tuple[int, int], max_level: int) -> List[Tuple[int, int]]:
    """Per-level feature sizes: level 0 = image, then repeated halving.

    Matches `efficientnet/utils/get_feat_sizes.py:4-20` (`(s - 1) // 2 + 1`).
    """
    feat_size = (int(image_size[0]), int(image_size[1]))
    sizes = [feat_size]
    for _ in range(1, max_level + 1):
        feat_size = ((feat_size[0] - 1) // 2 + 1, (feat_size[1] - 1) // 2 + 1)
        sizes.append(feat_size)
    return sizes


class Anchors:
    """Multiscale anchor generator + target/output conversion (yxyx, pixels)."""

    def __init__(
        self,
        min_level: int,
        max_level: int,
        image_size: Tuple[int, int],
        num_scales: int,
        aspect_ratios: Sequence[Tuple[float, float]],
        anchor_scale: Union[float, Sequence[float]],
    ):
        self.min_level = min_level
        self.max_level = max_level
        self.image_size = (int(image_size[0]), int(image_size[1]))
        self.num_scales = num_scales
        self.aspect_ratios = list(aspect_ratios)
        if isinstance(anchor_scale, (list, tuple)):
            assert len(anchor_scale) == max_level - min_level + 1
            self.anchor_scales = list(anchor_scale)
        else:
            self.anchor_scales = [anchor_scale] * (max_level - min_level + 1)
        self.feat_sizes = get_feat_sizes(self.image_size, max_level)
        # list over levels of (h, w, A, 4) float32 numpy arrays (jit constants)
        self.boxes: List[np.ndarray] = self._generate_boxes()

    def _generate_boxes(self) -> List[np.ndarray]:
        boxes_all = []
        fs = self.feat_sizes
        for level in range(self.min_level, self.max_level + 1):
            stride = (fs[0][0] / float(fs[level][0]), fs[0][1] / float(fs[level][1]))
            anchor_scale = self.anchor_scales[level - self.min_level]
            boxes_level = []
            for scale_octave in range(self.num_scales):
                octave_scale = scale_octave / float(self.num_scales)
                for aspect in self.aspect_ratios:
                    base_x = anchor_scale * stride[1] * 2**octave_scale
                    base_y = anchor_scale * stride[0] * 2**octave_scale
                    half_x = base_x * aspect[1] / 2.0
                    half_y = base_y * aspect[0] / 2.0
                    x = np.arange(stride[1] / 2, self.image_size[1], stride[1])
                    y = np.arange(stride[0] / 2, self.image_size[0], stride[0])
                    xv, yv = np.meshgrid(x, y)
                    boxes = np.stack(
                        [yv - half_y, xv - half_x, yv + half_y, xv + half_x],
                        axis=-1,
                    )  # (h, w, 4)
                    boxes_level.append(boxes[:, :, None, :])
            boxes_all.append(
                np.concatenate(boxes_level, axis=-2).astype(np.float32)
            )
        return boxes_all

    def get_anchors_per_location(self) -> int:
        return self.num_scales * len(self.aspect_ratios)

    # ------------------------------------------------------------------ targets
    def generate_targets(
        self,
        boxes: jax.Array,
        classes: jax.Array,
        classes_num: int,
        valid: jax.Array | None = None,
        iou_threshold: float = 0.5,
    ):
        """Assign padded GT boxes to anchors, per level.

        Args:
            boxes: ``(max_boxes, 4)`` yxyx pixel GT boxes (zero padded).
            classes: ``(max_boxes,)`` int class ids (0 = background).
            valid: ``(max_boxes,)`` bool padding mask (None = all valid).

        Returns:
            (boxes_t, classes_t, mask_t): tuples over levels of
            ``(h, w, A, 4)`` encoded targets, ``(h, w, A, classes_num)``
            one-hot classes, and ``(h, w, A, 1)`` positive masks — same
            shapes/semantics as anchors.py:90-138.
        """
        if valid is None:
            valid = jnp.ones(classes.shape, dtype=bool)
        out_boxes, out_classes, out_mask = [], [], []
        for anchor_level_np in self.boxes:
            anchor_level = jnp.asarray(anchor_level_np)
            # (h, w, A, 1, 4) vs (max_boxes, 4) → iou (h, w, A, max_boxes)
            iou = iou_yxyx(anchor_level[..., None, :], boxes)
            iou = jnp.where(valid, iou, -1.0)  # padded GTs never match
            iou_index = jnp.argmax(iou, axis=-1)
            iou_max = jnp.max(iou, axis=-1)
            iou_mask = (iou_max >= iou_threshold)[..., None]
            boxes_level = boxes[iou_index]
            classes_level = classes[iou_index][..., None]
            boxes_level = self._boxes_encoder(anchor_level, boxes_level)
            boxes_level = jnp.where(iou_mask, boxes_level, 0.0)
            classes_level = jnp.where(iou_mask, classes_level, 0)
            classes_onehot = jax.nn.one_hot(
                classes_level[..., 0].astype(jnp.int32), classes_num,
                dtype=jnp.float32,
            )
            out_boxes.append(boxes_level)
            out_classes.append(classes_onehot)
            out_mask.append(iou_mask)
        return tuple(out_boxes), tuple(out_classes), tuple(out_mask)

    # ------------------------------------------------------------------ decode
    def convert_outputs_boxes(self, outputs_boxes):
        """Decode per-level ``(B, h, w, A, 4)`` regressions to yxyx boxes."""
        out = []
        for level, boxes_level in enumerate(outputs_boxes):
            anchor_level = jnp.asarray(self.boxes[level])
            out.append(self._boxes_decoder(anchor_level, boxes_level))
        return tuple(out)

    def convert_outputs_one(
        self,
        batch_index: int,
        outputs_boxes,
        outputs_classes,
        max_output_size: int = 200,
        iou_threshold: float = 0.5,
        score_threshold: float = 0.0001,
        iou_type: str = "diou",
        pre_nms_size: int = 1024,
        nms_backend: str = None,
    ):
        """Per-image decode → background filter → DIoU-NMS → sigmoid scores.

        Static-shape equivalent of anchors.py:160-202: instead of
        ``boolean_mask``-ing background anchors away, their scores are set to
        -inf so NMS's score threshold drops them; the top ``pre_nms_size``
        candidates by class score enter NMS (exact vs the reference as long
        as fewer foreground anchors than that survive — the sequential loop
        itself caps at ``max_output_size``).

        Returns (boxes, classes_id, scores, valid) padded to
        ``max_output_size``.
        """
        all_boxes, all_ids, all_scores = [], [], []
        for level in range(len(outputs_classes)):
            cls_logits = outputs_classes[level][batch_index]  # (h, w, A, C)
            classes_id = jnp.argmax(cls_logits, axis=-1)
            classes_scores = jnp.max(cls_logits, axis=-1)
            boxes_level = outputs_boxes[level][batch_index]  # (h, w, A, 4)
            fg = classes_id != 0
            classes_scores = jnp.where(fg, classes_scores, -jnp.inf)
            all_boxes.append(boxes_level.reshape(-1, 4))
            all_ids.append(classes_id.reshape(-1))
            all_scores.append(classes_scores.reshape(-1))
        boxes_cat = jnp.concatenate(all_boxes, axis=0)
        ids_cat = jnp.concatenate(all_ids, axis=0)
        scores_cat = jnp.concatenate(all_scores, axis=0)
        k = min(pre_nms_size, scores_cat.shape[0])
        _, cand = jax.lax.top_k(scores_cat, k)
        idx, valid = nms(
            boxes_cat[cand],
            scores_cat[cand],
            max_output_size=max_output_size,
            iou_threshold=iou_threshold,
            score_threshold=score_threshold,
            iou_type=iou_type,
            coord="yxyx",
            backend=nms_backend,
        )
        sel = cand[idx]
        nms_boxes = boxes_cat[sel]
        nms_ids = ids_cat[sel]
        nms_scores = jax.nn.sigmoid(scores_cat[sel])
        return nms_boxes, nms_ids, nms_scores, valid

    # ------------------------------------------------------------------ codecs
    @staticmethod
    def _center_sizes(boxes):
        ycenter = (boxes[..., 2] + boxes[..., 0]) / 2.0
        xcenter = (boxes[..., 3] + boxes[..., 1]) / 2.0
        h = boxes[..., 2] - boxes[..., 0]
        w = boxes[..., 3] - boxes[..., 1]
        return ycenter, xcenter, h, w

    def _boxes_encoder(self, anchors, boxes):
        """yxyx boxes → (ty, tx, th, tw) relative to anchors."""
        ycenter_a, xcenter_a, ha, wa = self._center_sizes(anchors)
        ycenter, xcenter, h, w = self._center_sizes(boxes)
        ha = jnp.maximum(EPSILON, ha)
        wa = jnp.maximum(EPSILON, wa)
        h = jnp.maximum(EPSILON, h)
        w = jnp.maximum(EPSILON, w)
        tx = (xcenter - xcenter_a) / wa
        ty = (ycenter - ycenter_a) / ha
        tw = jnp.log(w / wa)
        th = jnp.log(h / ha)
        return jnp.stack([ty, tx, th, tw], axis=-1)

    def _boxes_decoder(self, anchors, rel_codes):
        """(ty, tx, th, tw) → yxyx boxes."""
        ycenter_a, xcenter_a, ha, wa = self._center_sizes(anchors)
        ty, tx, th, tw = (rel_codes[..., i] for i in range(4))
        w = jnp.exp(tw) * wa
        h = jnp.exp(th) * ha
        ycenter = ty * ha + ycenter_a
        xcenter = tx * wa + xcenter_a
        return jnp.stack(
            [ycenter - h / 2.0, xcenter - w / 2.0, ycenter + h / 2.0,
             xcenter + w / 2.0],
            axis=-1,
        )
