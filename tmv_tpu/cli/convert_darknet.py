"""Darknet ``.weights`` → framework checkpoint converter CLI.

Parity surface: `yolo_v3/convert.py` + `convert_tf2.py` (and yolo_v4 twins)
collapsed into one step: parse the binary weights into the flax param
pytree (``tmv_tpu.convert.darknet``) and save an orbax checkpoint that the
train/serve CLIs resume from.
"""

import argparse


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--weights", required=True, help="darknet .weights file")
    p.add_argument("--version", default="v4", choices=["v3", "v4"])
    p.add_argument("--classesNum", type=int, default=80)
    p.add_argument("--imageSize", type=int, default=416)
    p.add_argument("--out", required=True, help="checkpoint dir")
    return p.parse_args()


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from tmv_tpu.convert.darknet import load_darknet_weights
    from tmv_tpu.core.checkpoint import CheckpointManager
    from tmv_tpu.core.train_state import TrainState
    from tmv_tpu.models.yolo_v3 import YoloV3
    from tmv_tpu.models.yolo_v4 import YoloV4

    args = parse_args()
    model_cls = YoloV4 if args.version == "v4" else YoloV3
    model = model_cls(classes_num=args.classesNum)
    x0 = jnp.zeros((1, args.imageSize, args.imageSize, 3))
    variables = model.init(jax.random.key(0), x0, train=False)
    params, stats = load_darknet_weights(
        variables["params"], variables["batch_stats"], args.weights,
        model=model, input_size=args.imageSize)
    state = TrainState.create(
        jax.tree.map(jnp.asarray, params),
        jax.tree.map(jnp.asarray, stats), optax.sgd(1e-3))
    mgr = CheckpointManager(args.out)
    mgr.save(0, state, force=True)
    print(f"converted {args.weights} → {args.out}")


if __name__ == "__main__":
    main()
