"""End-to-end production-loop validation across the real CLI surfaces.

Exercises the full lifecycle a user would run, with no shortcuts between
stages — every stage consumes the previous stage's on-disk artifact:

  1. train   — `cli.train_yolo` on a synthetic colored-box dataset
               (overfit regime), checkpoints via orbax;
  2. eval    — `cli.eval_map` on the checkpoint (reference per-batch
               semantics AND global COCO mAP);
  3. export  — `cli.export_model` bakes the predictor to a .tmvx
               StableHLO artifact;
  4. serve   — `cli.serve --artifact` + a real HTTP POST with a base64
               image through the reference JSON contract.

Writes `e2e_production_loop.json` at the repo root.  Run on TPU or CPU
(`jax.config.update('jax_platforms','cpu')` first on CPU).
"""
import base64
import io
import json
import os
import sys
import tempfile
import threading
import time
import urllib.request

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np
from PIL import Image


def make_dataset(root, n=8, hw=96):
    img_dir = os.path.join(root, "imgs")
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    lines = []
    for i in range(n):
        img = rng.integers(0, 60, (hw, hw, 3), dtype=np.uint8)
        x1 = int(rng.integers(4, hw - 40))
        y1 = int(rng.integers(4, hw - 40))
        w = int(rng.integers(24, 36))
        h = int(rng.integers(24, 36))
        cls = "red" if rng.uniform() < 0.5 else "green"
        img[y1:y1 + h, x1:x1 + w] = (
            [220, 30, 30] if cls == "red" else [30, 220, 30])
        name = f"im{i}.jpg"
        Image.fromarray(img).save(os.path.join(img_dir, name), quality=95)
        lines.append(f"{name}|{cls},{x1},{y1},{x1 + w},{y1 + h}|")
    with open(os.path.join(root, "labels.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")
    with open(os.path.join(root, "classes.txt"), "w") as f:
        f.write("red\ngreen\n")
    with open(os.path.join(root, "anchors.txt"), "w") as f:
        f.write("6,6, 8,8, 10,10, 12,12, 16,16, 20,20, "
                "24,24, 28,28, 32,32\n")


def run_cli(module, argv):
    import importlib

    mod = importlib.import_module(module)
    old = sys.argv
    sys.argv = [module.rsplit(".", 1)[-1]] + argv
    try:
        mod.main()
    finally:
        sys.argv = old


def main():
    result = {}
    t0 = time.time()
    root = tempfile.mkdtemp(prefix="tmv_e2e_loop_")
    make_dataset(root)
    size = 64
    ckpt = os.path.join(root, "weights")
    base = [
        "--classesFile", os.path.join(root, "classes.txt"),
        "--anchorsFile", os.path.join(root, "anchors.txt"),
        "--imageSize", str(size),
    ]

    # 1. train (overfit regime: small set, to convergence — 2000 shadow-
    #    loss-damped steps reach mAP ≈0.75 on this set, enough that the
    #    served artifact must yield detections, not just learn "a bit")
    run_cli("tmv_tpu.cli.train_yolo", base + [
        "--version", "v3",
        "--trainData", os.path.join(root, "labels.txt"),
        "--trainImagePath", os.path.join(root, "imgs"),
        "--batchSize", "8", "--stepsPerEpoch", "100", "--epochs", "20",
        "--lr", "5e-4", "--warmupSteps", "0", "--modelPath", ckpt,
        "--earlyStopPatience", "0",
    ])
    result["train_steps"] = 2000

    # 2. standalone eval CLI on the checkpoint, both modes
    import contextlib
    import io as _io

    for mode, variant, key in (("batch", "reference", "mAP_ref_per_batch"),
                               ("global", "coco", "mAP_coco_global")):
        buf = _io.StringIO()
        with contextlib.redirect_stdout(buf):
            run_cli("tmv_tpu.cli.eval_map", base + [
                "--family", "yolo", "--version", "v3",
                "--imagePath", os.path.join(root, "imgs"),
                "--labelFile", os.path.join(root, "labels.txt"),
                "--modelPath", ckpt,
                "--mode", mode, "--variant", variant,
                "--confidenceThresh", "0.2", "--scoresThresh", "0.05",
            ])
        out = json.loads(buf.getvalue().strip().splitlines()[-1])
        result[key] = out["mAP"]

    # 3. export the trained predictor to a .tmvx artifact
    artifact = os.path.join(root, "model.tmvx")
    run_cli("tmv_tpu.cli.export_model", base + [
        "--version", "v3", "--modelPath", ckpt, "--out", artifact,
        "--platforms", "tpu,cpu",
        "--confidenceThresh", "0.2", "--scoresThresh", "0.05",
    ])
    result["artifact_mb"] = round(os.path.getsize(artifact) / 1e6, 2)

    # 4. serve the artifact; POST a training image, expect the box back
    port = 8973
    t = threading.Thread(
        target=run_cli,
        args=("tmv_tpu.cli.serve",
              base + ["--artifact", artifact, "--port", str(port)]),
        daemon=True)
    t.start()
    deadline = time.time() + 300
    while time.time() < deadline:
        try:
            urllib.request.urlopen(f"http://127.0.0.1:{port}/", timeout=2)
            break
        except Exception:
            time.sleep(2)

    with open(os.path.join(root, "imgs", "im0.jpg"), "rb") as f:
        b64 = base64.b64encode(f.read()).decode()
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/ai_api/object_detection/predict",
        json.dumps({"img_data": "data:image/jpeg;base64," + b64,
                    "read": 1}).encode(),
        {"Content-Type": "application/json"})
    out = json.loads(urllib.request.urlopen(req, timeout=120).read())
    result["serve_contract_keys"] = sorted(out.keys())
    result["serve_boxes"] = len(out["boxes"])

    # IoU of the served detections (original-image pixel coords after
    # un-letterboxing, `views/object_detection.py:40-109` contract)
    # against im0's ground truth from the training labels
    with open(os.path.join(root, "labels.txt")) as f:
        first = f.readline().strip()
    gt = [float(v) for v in first.split("|")[1].split(",")[1:5]]

    def iou(a, b):
        ix1, iy1 = max(a[0], b[0]), max(a[1], b[1])
        ix2, iy2 = min(a[2], b[2]), min(a[3], b[3])
        inter = max(0.0, ix2 - ix1) * max(0.0, iy2 - iy1)
        ua = ((a[2] - a[0]) * (a[3] - a[1])
              + (b[2] - b[0]) * (b[3] - b[1]) - inter)
        return inter / ua if ua > 0 else 0.0

    result["serve_best_iou_vs_gt"] = round(
        max((iou(b, gt) for b in out["boxes"]), default=0.0), 4)
    result["wall_sec"] = round(time.time() - t0, 1)

    with open(os.path.join(ROOT, "e2e_production_loop.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    assert result["mAP_ref_per_batch"] > 0.3, "model failed to converge"
    assert result["serve_contract_keys"] == [
        "boxes", "classes", "random_img", "result_img"]
    # the chain must demonstrate *yield*: at least one detection survives
    # train → checkpoint → export → HTTP serving and lands on the object
    assert result["serve_boxes"] >= 1, "no detections through the artifact"
    assert result["serve_best_iou_vs_gt"] >= 0.25, (
        "served detections do not overlap the ground truth")
    print("E2E-PRODUCTION-LOOP-OK")


if __name__ == "__main__":
    main()
