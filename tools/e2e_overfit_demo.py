"""End-to-end capability demo: train YOLOv3 to overfit a tiny synthetic
dataset, then run the full predict path (decode → NMS → un-letterbox) and
the quirk-faithful mAP evaluator on it.

Exercises: data pipeline (sampling, aug off for determinism, grid targets),
the jitted train step with shadow-loss EMA, checkpointing, the NMS predict
path (Pallas on TPU), and eval_map_step — the complete YOLO vertical.
Writes the result to e2e_demo_result.json.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ANCHORS = np.array(
    [[[116, 90], [156, 198], [373, 326]],
     [[30, 61], [62, 45], [59, 119]],
     [[10, 13], [16, 30], [33, 23]]], np.float32)


def make_dataset(root):
    from PIL import Image

    img_dir = os.path.join(root, "imgs")
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    lines = []
    for i in range(8):
        h, w = 320, 320
        img = rng.integers(0, 60, (h, w, 3), dtype=np.uint8)
        items = []
        for _ in range(2):
            x1 = int(rng.integers(10, w - 110))
            y1 = int(rng.integers(10, h - 110))
            bw = int(rng.integers(60, 100))
            bh = int(rng.integers(60, 100))
            cls = "cat" if rng.uniform() < 0.5 else "dog"
            img[y1:y1 + bh, x1:x1 + bw] = (
                [220, 40, 40] if cls == "cat" else [40, 220, 40])
            items.append(f"{cls},{x1},{y1},{x1 + bw},{y1 + bh}")
        name = f"img{i}.jpg"
        Image.fromarray(img).save(os.path.join(img_dir, name), quality=95)
        lines.append("|".join([name] + items) + "|")
    with open(os.path.join(root, "labels.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")
    with open(os.path.join(root, "classes.txt"), "w") as f:
        f.write("cat\ndog\n")
    return root


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from tmv_tpu.core.train_state import TrainState, make_train_step
    from tmv_tpu.data.yolo_pipeline import YoloDataPipeline
    from tmv_tpu.models.detector_harness import (
        eval_map_step, make_yolo_loss_fn, make_yolo_predict,
    )
    from tmv_tpu.models.yolo_v3 import YoloV3

    root = make_dataset("/tmp/e2e_demo")
    image_wh = (160, 160)
    pipeline = YoloDataPipeline(
        os.path.join(root, "imgs"), os.path.join(root, "labels.txt"),
        os.path.join(root, "classes.txt"), batch_size=8, anchors=ANCHORS,
        image_wh=image_wh, image_random=False, label_mean=False,
    )
    model = YoloV3(classes_num=2, dtype=jnp.bfloat16)
    x0 = jnp.zeros((1, 160, 160, 3))
    variables = model.init(jax.random.key(0), x0, train=False)
    tx = optax.adam(3e-4)
    state = TrainState.create(variables["params"], variables["batch_stats"], tx)
    loss_fn = make_yolo_loss_fn(model, image_wh, ANCHORS, iou_type="iou")
    step = jax.jit(make_train_step(loss_fn, tx, shadow_loss=True))

    it = iter(pipeline)
    batch = next(it)  # deterministic pipeline → fixed batch, pure overfit
    first_loss = None
    for i in range(2000):
        state, metrics = step(state, batch, jax.random.key(i))
        if i == 0:
            first_loss = float(metrics["raw_loss"])
        if i % 250 == 0:
            print(f"step {i} loss {float(metrics['raw_loss']):.3f}")
    final_loss = float(metrics["raw_loss"])

    predict = make_yolo_predict(
        model, image_wh, ANCHORS, 2,
        confidence_thresh=0.5, scores_thresh=0.3)
    vars_now = {"params": state.params, "batch_stats": state.batch_stats}
    maps = []
    eval_pipe = YoloDataPipeline(
        os.path.join(root, "imgs"), os.path.join(root, "labels.txt"),
        os.path.join(root, "classes.txt"), batch_size=1, anchors=ANCHORS,
        image_wh=image_wh, image_random=False, label_mean=False,
    )
    eit = iter(eval_pipe)
    for _ in range(8):
        maps.append(eval_map_step(predict, vars_now, next(eit), 2))
    result = {
        "first_loss": round(first_loss, 3),
        "final_loss": round(final_loss, 3),
        "train_mAP@0.5": round(float(np.mean(maps)), 4),
    }
    print(json.dumps(result))
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "e2e_demo_result.json"), "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
