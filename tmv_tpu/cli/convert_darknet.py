"""Weight-import CLI: Darknet ``.weights`` / Keras ``.h5`` → checkpoint.

Parity surface: `yolo_v3/convert.py` + `convert_tf2.py` (and yolo_v4 twins)
collapsed into one step: parse the weights into the flax param pytree
(`tmv_tpu.convert.darknet` / `convert.h5_import`) and save an orbax
checkpoint that the train/serve CLIs resume from.  ``--cfg`` builds the
model from a Darknet config file instead of the built-in YoloV3/V4
(`convert.darknet_cfg`), matching the reference's cfg-driven converter.
"""

import argparse


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--weights", required=True,
                   help="darknet .weights or keras .h5 file")
    p.add_argument("--version", default="v4", choices=["v3", "v4"])
    p.add_argument("--cfg", default=None,
                   help="darknet .cfg: build the model from config instead "
                        "of the built-in architectures")
    p.add_argument("--classesNum", type=int, default=80)
    p.add_argument("--imageSize", type=int, default=416)
    p.add_argument("--out", required=True, help="checkpoint dir")
    return p.parse_args()


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from tmv_tpu.convert.darknet import load_darknet_weights
    from tmv_tpu.convert.h5_import import load_keras_h5_weights
    from tmv_tpu.core.checkpoint import CheckpointManager
    from tmv_tpu.core.train_state import TrainState

    args = parse_args()
    if args.cfg:
        from tmv_tpu.convert.darknet_cfg import build_from_cfg

        model, (h, w) = build_from_cfg(args.cfg)
        input_size = (h, w)
    else:
        from tmv_tpu.models.yolo_v3 import YoloV3
        from tmv_tpu.models.yolo_v4 import YoloV4

        model_cls = YoloV4 if args.version == "v4" else YoloV3
        model = model_cls(classes_num=args.classesNum)
        input_size = (args.imageSize, args.imageSize)

    x0 = jnp.zeros((1, input_size[0], input_size[1], 3))
    variables = model.init(jax.random.key(0), x0, train=False)
    if args.weights.endswith((".h5", ".hdf5")):
        params, stats, skipped = load_keras_h5_weights(
            variables["params"], variables["batch_stats"], args.weights,
            model=model, input_size=input_size)
        for i, path, got, want in skipped:
            print(f"skip: h5 layer {i} → {'/'.join(path)} "
                  f"(h5 {got} vs model {want})")
    else:
        params, stats = load_darknet_weights(
            variables["params"], variables["batch_stats"], args.weights,
            model=model, input_size=input_size)
    state = TrainState.create(
        jax.tree.map(jnp.asarray, params),
        jax.tree.map(jnp.asarray, stats), optax.sgd(1e-3))
    mgr = CheckpointManager(args.out)
    mgr.save(0, state, force=True)
    print(f"converted {args.weights} → {args.out}")


if __name__ == "__main__":
    main()
