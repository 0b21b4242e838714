"""EfficientDet end-to-end demo: overfit synthetic boxes, report mAP.

Exercises the EfficientDet vertical: pipeline (host aug off, anchor targets
on device), focal+huber training with grad clip, decode → DIoU-NMS → the
quirk-faithful per-image mAP (eval harness).
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SIZE = 256
STEPS = 3500


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from tools.e2e_overfit_demo import make_dataset
    from tmv_tpu.core.train_state import TrainState, make_train_step
    from tmv_tpu.data.efficientdet_pipeline import EfficientDetPipeline
    from tmv_tpu.models.efficientdet import (
        EfficientDetNet, get_efficientdet_config,
    )
    from tmv_tpu.models.efficientdet.harness import make_efficientdet_eval
    from tmv_tpu.models.efficientdet.heads import init_class_prior_bias
    from tmv_tpu.models.efficientdet.net import make_efficientdet_loss_fn
    from tmv_tpu.ops.anchors import Anchors

    root = make_dataset("/tmp/e2e_demo_det")
    cfg = get_efficientdet_config("efficientdet-d0")
    cfg.image_size = SIZE
    cfg.num_classes = 3  # bg + cat + dog
    cfg.levels_size = [SIZE]
    for _ in range(cfg.max_level):
        cfg.levels_size.append((cfg.levels_size[-1] + 1) // 2)
    anchors = Anchors(cfg.min_level, cfg.max_level, (SIZE, SIZE),
                      cfg.num_scales, cfg.aspect_ratios, cfg.anchor_scale)
    pipeline = EfficientDetPipeline(
        os.path.join(root, "imgs"), os.path.join(root, "labels.txt"),
        os.path.join(root, "classes.txt"), batch_size=8, anchors=anchors,
        num_classes=cfg.num_classes, image_size=SIZE, augment=False,
        label_mean=False, with_raw_boxes=True,
    )
    model = EfficientDetNet(config=cfg, dtype=jnp.bfloat16)
    variables = model.init(jax.random.key(0),
                           jnp.zeros((1, SIZE, SIZE, 3)), train=False)
    params = init_class_prior_bias(variables["params"])
    tx = optax.adam(1e-3)
    state = TrainState.create(params, variables["batch_stats"], tx)
    loss_fn = make_efficientdet_loss_fn(model)
    step = jax.jit(make_train_step(loss_fn, tx, clip_global_norm=10.0))

    batch = next(iter(pipeline))
    first_loss = None
    for i in range(STEPS):
        state, metrics = step(state, batch, jax.random.key(i))
        if i == 0:
            first_loss = float(metrics["loss"])
        if i % 200 == 0:
            print(f"step {i} loss {float(metrics['loss']):.4f}")
    final_loss = float(metrics["loss"])

    eval_step = make_efficientdet_eval(model, anchors, loss_fn)
    out = eval_step({"params": state.params,
                     "batch_stats": state.batch_stats}, batch)
    result = {
        "first_loss": round(first_loss, 4),
        "final_loss": round(final_loss, 4),
        "train_mAP@0.5": round(out["mAP"], 4),
    }
    print(json.dumps(result))
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "e2e_demo_result.json")
    data = json.load(open(path)) if os.path.exists(path) else {}
    data["efficientdet_synthetic"] = result
    json.dump(data, open(path, "w"), indent=2)


if __name__ == "__main__":
    main()
