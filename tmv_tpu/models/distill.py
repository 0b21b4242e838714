"""Teacher→student self-distillation (pseudo-label training).

Parity surface: `AIServer/ai_api/ai_models/unsupervised_learning/`:
- student/teacher network = the ResNet50V2-YOLOv3 variant
  (`unsupervised_learning/model.py:39-246`) — shared ``ResNetYoloV3`` from
  `models/moco.py`;
- on-the-fly pseudo-labels (`teacher_dataset.py:90-186`): run the teacher's
  predict with a *randomized* confidence threshold in [0.3, 0.5], feed the
  predicted boxes back as training targets for the student;
- teacher promotion (`create_teacher_weights.py:28-53`): copy student
  params into the teacher — here a pytree copy.

TPU re-design: the teacher inference runs as a jitted batched pass
(`make_pseudo_label_fn`) producing fixed-capacity padded boxes + masks that
feed the standard YOLO target builder — no Python-side model call per
sample inside the input pipeline.
"""

from typing import Tuple

import jax
import jax.numpy as jnp

from tmv_tpu.ops import yolo as yolo_ops


def make_pseudo_label_fn(model, anchors_wh, image_wh: Tuple[int, int],
                         classes_num: int, max_boxes: int = 100,
                         scores_thresh: float = 0.3,
                         iou_thresh: float = 0.5):
    """Jitted teacher labeler: images → padded (boxes, classes, valid).

    The confidence threshold is an input (the reference randomizes it in
    [0.3, 0.5] per sample, `teacher_dataset.py:141`).
    Boxes are returned in pixel xyxy of the letterboxed image.
    """

    anchors = jnp.asarray(anchors_wh, jnp.float32)

    @jax.jit
    def label(variables, images, conf_thresh_key):
        def one(image, key):
            conf = jax.random.uniform(key, (), minval=0.3, maxval=0.5)
            heads = model.apply(variables, image[None], train=False)
            heads_one = [h[0] for h in heads]
            boxes, ids, scores, _cls, _confs, valid = yolo_ops.nms_boxes(
                heads_one, anchors, image_wh, classes_num,
                confidence_thresh=conf,
                scores_thresh=scores_thresh,
                iou_thresh=iou_thresh,
                max_output_size=max_boxes,
            )
            scale = jnp.asarray(
                [image_wh[0], image_wh[1], image_wh[0], image_wh[1]],
                jnp.float32,
            )
            return boxes * scale, ids, valid

        keys = jax.random.split(conf_thresh_key, images.shape[0])
        return jax.vmap(one)(images, keys)

    return label


def promote_teacher(student_state, teacher_variables):
    """Copy student params/BN stats into the teacher
    (`create_teacher_weights.py:28-53`)."""
    return {
        "params": jax.tree.map(jnp.array, student_state.params),
        "batch_stats": jax.tree.map(jnp.array, student_state.batch_stats),
    }
