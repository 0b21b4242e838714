"""Diagnose the YOLOv4 converged static-int8 mAP drop (round 4).

`converged_map_v4.json` recorded mAP_ref_global 0.9041 -> 0.5471 under
``--int8Static`` while the same-scale YOLOv3 artifact dropped only 0.002
(`converged_map.json`).  Random-weight head drift was a non-signal for
both versions (`tools/bench_int8_static.py`), so the collapse is a
property of *converged* v4 weights.  This probe reproduces the setup at
reduced scale and separates the two candidate causes:

- per-tensor quantization noise from outlier activations (a converged
  Mish network can grow per-layer absmax far beyond typical values; if
  so, clipping the calibrated scale -- ``margin < 1`` -- recovers mAP);
- an int8-path bug specific to v4 modules (SPP/CSP/Mish routing; nothing
  recovers, and the per-module drift trace shows a step change at one
  site rather than gradual noise growth).

Outputs: top calibrated-absmax sites, per-module float-vs-int8 drift in
call order, and a margin-sweep mAP table for v3 and v4.

Usage (TPU or CPU):
    python tools/probe_int8_v4_drop.py            # both versions
    TMV_PROBE_VERSIONS=v4 python tools/probe_int8_v4_drop.py
"""
import json
import os
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tools"))

# reduced-scale defaults (overridable): enough steps for the mish
# activations to leave the init regime, small enough to run in minutes
os.environ.setdefault("TMV_CMAP_N", "128")
os.environ.setdefault("TMV_CMAP_SIZE", "64")
os.environ.setdefault("TMV_CMAP_HW", "96")
os.environ.setdefault("TMV_CMAP_EPOCHS", "8")
os.environ.setdefault("TMV_CMAP_STEPS", "100")
os.environ.setdefault("TMV_CMAP_LR", "1e-3")

import numpy as np

if os.environ.get("TMV_PROBE_CPU"):
    # the axon TPU plugin ignores JAX_PLATFORMS (CLAUDE.md); this is the
    # only way to CPU-pin when the tunnel is wedged
    import jax
    jax.config.update("jax_platforms", "cpu")

import e2e_converged_map as cm  # noqa: E402  (dataset + CLI runner)

MARGINS = (1.0, 0.7, 0.5, 0.35, 0.25)


def flatten(tree, path=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from flatten(v, path + (k,))
    else:
        yield path, tree


def eval_version(version: str, root: str) -> dict:
    import jax.numpy as jnp

    from tmv_tpu.data.loaders import load_anchors
    from tmv_tpu.data.yolo_pipeline import YoloDataPipeline
    from tmv_tpu.models.detector_harness import (
        build_yolo_model,
        ground_truth_from_targets,
        make_yolo_predict_batched,
    )
    from tmv_tpu.ops.map_eval import get_map
    from tmv_tpu.quant import (
        calibrate_model,
        prepare_static_int8_variables,
        quantized,
    )

    size = int(os.environ["TMV_CMAP_SIZE"])
    ckpt = os.path.join(root, f"weights_{version}")
    cm.run_cli("tmv_tpu.cli.train_yolo", [
        "--classesFile", os.path.join(root, "classes.txt"),
        "--anchorsFile", os.path.join(root, "anchors.txt"),
        "--imageSize", str(size),
        "--version", version,
        "--trainData", os.path.join(root, "labels.txt"),
        "--trainImagePath", os.path.join(root, "imgs"),
        "--batchSize", "16",
        "--stepsPerEpoch", os.environ["TMV_CMAP_STEPS"],
        "--epochs", os.environ["TMV_CMAP_EPOCHS"],
        "--lr", os.environ["TMV_CMAP_LR"], "--warmupSteps", "0",
        "--modelPath", ckpt, "--earlyStopPatience", "0",
    ])

    anchors = load_anchors(os.path.join(root, "anchors.txt"))
    image_wh = (size, size)
    pipeline = YoloDataPipeline(
        os.path.join(root, "imgs"), os.path.join(root, "labels.txt"),
        os.path.join(root, "classes.txt"), batch_size=16,
        anchors=anchors, image_wh=image_wh, image_random=False,
        label_mean=False, prefetch=2,
    )
    classes_num = pipeline.classes_num
    model, iou_type = build_yolo_model(
        version, classes_num, anchors_per_scale=anchors.shape[1])

    import jax
    import optax

    from tmv_tpu.core.checkpoint import CheckpointManager
    from tmv_tpu.core.train_state import TrainState

    x0 = jnp.zeros((1, size, size, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x0, train=False)
    state = TrainState.create(
        variables["params"], variables["batch_stats"], optax.sgd(1e-3))
    state = CheckpointManager(ckpt).restore_weights(state)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    # ---- calibrate on the first 16 images (same recipe as eval_map)
    calib = [b["image"] for _, b in zip(range(1), pipeline)]
    absmax_tree = calibrate_model(model, variables, calib, train=False)

    def site_stats(v):
        # the sow now records a per-input-channel vector per site
        a = np.asarray(v[0] if isinstance(v, (tuple, list)) else v,
                       np.float32).ravel()
        return float(a.max()), float(a.max() / max(np.median(a), 1e-9))

    sites = sorted(
        ((*site_stats(v), "/".join(p)) for p, v in flatten(absmax_tree)),
        reverse=True)
    print(f"\n[{version}] calibrated absmax profile "
          f"({len(sites)} conv sites; skew = site max / median channel):")
    for v, skew, p in sites[:12]:
        print(f"  {v:10.2f}  skew={skew:7.1f}  {p}")
    med = float(np.median([v for v, _, _ in sites]))
    print(f"  median={med:.2f}  max/median={sites[0][0] / max(med, 1e-9):.1f}")

    # ---- per-module drift, float vs int8, in call order (one batch)
    x1 = calib[0][:2]

    def _cap(v, x):
        return model.apply(v, x, train=False, capture_intermediates=True,
                           mutable=["intermediates"])

    f_out, f_inter = jax.jit(_cap)(variables, x1)
    qvars = prepare_static_int8_variables(variables, absmax_tree, margin=1.0)
    with quantized("int8_static"):
        q_out, q_inter = jax.jit(_cap)(qvars, x1)
    f_flat = dict(flatten(f_inter["intermediates"]))
    q_flat = dict(flatten(q_inter["intermediates"]))
    drifts = []
    for p, fv in f_flat.items():
        qv = q_flat.get(p)
        if qv is None or not hasattr(fv, "shape") or fv.shape != qv.shape:
            continue
        if not p[-1].startswith("__call__"):
            continue
        fv = np.asarray(fv, np.float32)
        qv = np.asarray(qv, np.float32)
        denom = float(np.sqrt(np.mean(fv ** 2))) + 1e-9
        rel = float(np.sqrt(np.mean((fv - qv) ** 2))) / denom
        drifts.append((rel, "/".join(p[:-1])))
    drifts_by_depth = drifts  # capture order approximates call order
    print(f"[{version}] float-vs-int8 relative drift "
          f"(first 10 + worst 10 of {len(drifts)} module outputs):")
    for rel, p in drifts_by_depth[:10]:
        print(f"  {rel:8.4f}  {p}")
    print("  ---- worst:")
    for rel, p in sorted(drifts, reverse=True)[:10]:
        print(f"  {rel:8.4f}  {p}")

    # ---- margin-sweep mAP (+ per-channel activation scales)
    def run_eval(quant_mode, margin=None, per_channel=False):
        if quant_mode == "off":
            v = variables
        else:
            v = prepare_static_int8_variables(
                variables, absmax_tree, margin=margin,
                per_channel=per_channel)
        predict_b = make_yolo_predict_batched(
            model, image_wh, anchors, classes_num,
            confidence_thresh=0.2, scores_thresh=0.05, iou_thresh=0.5,
            iou_type=iou_type, quant=quant_mode)
        data = []
        n = pipeline.labels_num
        for bi, batch in zip(range((n + 15) // 16), pipeline):
            boxes_b, ids_b, scores_b, valid_b = predict_b(v, batch["image"])
            for j in range(min(16, n - bi * 16)):
                m = np.asarray(valid_b[j])
                pred = np.concatenate(
                    [np.asarray(boxes_b[j])[m],
                     np.asarray(ids_b[j])[m][:, None].astype(np.float64),
                     np.asarray(scores_b[j])[m][:, None]], axis=-1)
                gt = ground_truth_from_targets(
                    [np.asarray(t[j]) for t in batch["targets"]],
                    classes_num)
                data.append({"image_path": f"{bi * 16 + j}.jpg",
                             "groud_truth": gt.tolist(),
                             "prediction": pred.tolist()})
        return float(get_map(data, classes_num, 0.5, variant="reference"))

    out = {"float": run_eval("off")}
    print(f"[{version}] mAP float: {out['float']:.4f}")
    for m in MARGINS:
        out[f"int8_m{m}"] = run_eval("int8_static", m)
        print(f"[{version}] mAP int8 margin={m}: {out[f'int8_m{m}']:.4f}")
    out["int8_per_channel"] = run_eval("int8_static", 1.0, per_channel=True)
    print(f"[{version}] mAP int8 per-channel: "
          f"{out['int8_per_channel']:.4f}")
    out["absmax_top"] = sites[:12]
    out["absmax_median"] = med
    return out


def main():
    t0 = time.time()
    root = tempfile.mkdtemp(prefix="tmv_int8_probe_")
    cm.make_dataset(root)
    versions = os.environ.get("TMV_PROBE_VERSIONS", "v4,v3").split(",")
    results = {}
    for ver in versions:
        results[ver] = eval_version(ver.strip(), root)
    results["wall_sec"] = round(time.time() - t0, 1)
    with open(os.path.join(ROOT, "int8_v4_probe.json"), "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
