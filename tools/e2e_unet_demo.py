"""UNet end-to-end demo on the reference's REAL shipped dataset.

Trains the UNet keypoint-heatmap model on
`/root/reference/AIServer/train_data` (10 real photos + labelme 4-corner
quadrilateral labels — read-only), then reports the mean pixel distance
between predicted heatmap peaks and the labeled corners.  Exercises the
labelme loader (corner ordering), augmentation, Gaussian soft labels, BCE
training with grad clip — the whole UNet vertical on real data.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DATA = "/root/reference/AIServer/train_data/json"
SIZE = 128
POINTS = 4
STEPS = 800


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from tmv_tpu.core.train_state import TrainState, make_train_step
    from tmv_tpu.data.unet_dataset import get_dataset
    from tmv_tpu.models.unet import UNetLogits, make_unet_loss_fn

    batches, gen = get_dataset(
        DATA, batch_size=8, points_num=POINTS, input_size=(SIZE, SIZE),
        output_size=(SIZE, SIZE), augment=False, first_shape=True)
    print(f"{gen.labels_num} real labels loaded")
    assert gen.labels_num > 0

    model = UNetLogits(depth=3, filters_base=16, output_filters=POINTS,
                       dtype=jnp.bfloat16)
    x0 = jnp.zeros((1, SIZE, SIZE, 3))
    variables = model.init(jax.random.key(0), x0, train=False)
    tx = optax.adam(1e-3)
    state = TrainState.create(variables["params"], variables["batch_stats"], tx)
    step = jax.jit(make_train_step(make_unet_loss_fn(model), tx,
                                   clip_global_norm=10.0))
    batch = next(batches)  # deterministic (aug off): fixed batch overfit
    first_loss = None
    for i in range(STEPS):
        state, metrics = step(state, batch, jax.random.key(i))
        if i == 0:
            first_loss = float(metrics["loss"])
        if i % 200 == 0:
            print(f"step {i} loss {float(metrics['loss']):.4f}")
    final_loss = float(metrics["loss"])

    # peak distance: predicted heatmap argmax vs target argmax, in pixels
    pred = jax.nn.sigmoid(model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        batch["image"], train=False))
    pred = np.asarray(pred, np.float32)
    target = np.asarray(batch["target"], np.float32)
    dists = []
    for b in range(pred.shape[0]):
        for c in range(POINTS):
            if target[b, :, :, c].max() == 0:
                continue
            py, px = np.unravel_index(pred[b, :, :, c].argmax(), (SIZE, SIZE))
            ty, tx_ = np.unravel_index(target[b, :, :, c].argmax(),
                                       (SIZE, SIZE))
            dists.append(float(np.hypot(py - ty, px - tx_)))
    result = {
        "real_labels": gen.labels_num,
        "first_loss": round(first_loss, 4),
        "final_loss": round(final_loss, 4),
        "mean_peak_distance_px": round(float(np.mean(dists)), 2),
    }
    print(json.dumps(result))
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "e2e_demo_result.json")
    data = {}
    if os.path.exists(out):
        data = json.load(open(out))
    data["unet_real_data"] = result
    json.dump(data, open(out, "w"), indent=2)


if __name__ == "__main__":
    main()
