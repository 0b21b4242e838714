"""Converged, non-toy mAP artifact (round-2 verdict weak #6 / item 7).

The production loop overfits 8 images to validate the lifecycle; every
other mAP number in the repo is a partially-trained or <=10-image demo.
This tool trains YoloV3 on a 64-image, ~2-boxes-per-image synthetic set
to convergence through the real CLI surface, then records a *stable* mAP
via the standalone eval CLI in both semantics:

- reference per-batch quirk mAP@0.5 (`utils/mAP.py` parity), and
- COCO-official global mAP@[.5:.95],

writing `converged_map.json` at the repo root.  Run on TPU (or CPU with
the platform pinned first).
"""
import contextlib
import io
import json
import os
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np
from PIL import Image

N_IMAGES = int(os.environ.get("TMV_CMAP_N", "64"))
SIZE = int(os.environ.get("TMV_CMAP_SIZE", "64"))   # network input
HW = int(os.environ.get("TMV_CMAP_HW", "96"))       # image size on disk

# scale overrides so the artifact can be produced on a CPU-only box
# (full scale on TPU: 40 epochs x 100 steps; a 1-CPU box runs the
# YoloV3@64 step at ~10 s, so the fallback trains fewer, larger-LR steps)
EPOCHS = int(os.environ.get("TMV_CMAP_EPOCHS", "40"))
STEPS_PER_EPOCH = int(os.environ.get("TMV_CMAP_STEPS", "100"))
LR = os.environ.get("TMV_CMAP_LR", "5e-4")


CLASS_COLORS = {
    "red": [220, 30, 30], "green": [30, 220, 30],
    "blue": [40, 60, 220], "yellow": [220, 200, 30],
}


def make_dataset(root, n=N_IMAGES, hw=HW):
    """Hardened r4 set (round-3 weak #6 / item 7): the r3 set scored a
    perfect VOC-global 1.0, so regressions near the top were invisible.
    This set adds headroom pressure: 4 classes, 1–6 boxes per image,
    smaller boxes (down to 12 px at hw=96), *partial overlaps allowed*
    (crowding stresses NMS + localization), varied aspect ratios, and
    unlabeled white distractor rectangles (false-positive bait)."""
    img_dir = os.path.join(root, "imgs")
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.default_rng(7)
    lines = []
    names = list(CLASS_COLORS)
    for i in range(n):
        img = rng.integers(0, 60, (hw, hw, 3), dtype=np.uint8)
        entries = []
        placed = []
        sc = hw / 96.0  # box scale follows the on-disk image size

        def overlap_frac(x1, y1, w, h):
            worst = 0.0
            for px, py, pw, ph in placed:
                ix = max(0, min(x1 + w, px + pw) - max(x1, px))
                iy = max(0, min(y1 + h, py + ph) - max(y1, py))
                worst = max(worst, ix * iy / min(w * h, pw * ph))
            return worst

        # unlabeled distractors first so real boxes can partly cover them
        for _ in range(int(rng.integers(0, 3))):
            dx = int(rng.integers(2, hw - int(16 * sc)))
            dy = int(rng.integers(2, hw - int(16 * sc)))
            dw = int(rng.integers(int(8 * sc), int(16 * sc)))
            dh = int(rng.integers(int(8 * sc), int(16 * sc)))
            img[dy:dy + dh, dx:dx + dw] = [225, 225, 225]

        for _ in range(int(rng.integers(1, 7))):
            for _attempt in range(10):
                w = int(rng.integers(int(12 * sc), int(34 * sc)))
                h = int(rng.integers(int(12 * sc), int(34 * sc)))
                x1 = int(rng.integers(2, hw - w - 2))
                y1 = int(rng.integers(2, hw - h - 2))
                # allow crowding, just not near-total occlusion
                if overlap_frac(x1, y1, w, h) < 0.45:
                    break
            else:
                continue
            placed.append((x1, y1, w, h))
            cls = names[int(rng.integers(len(names)))]
            img[y1:y1 + h, x1:x1 + w] = CLASS_COLORS[cls]
            entries.append(f"{cls},{x1},{y1},{x1 + w},{y1 + h}")
        name = f"im{i}.jpg"
        Image.fromarray(img).save(os.path.join(img_dir, name), quality=95)
        lines.append(f"{name}|{'|'.join(entries)}|")
    with open(os.path.join(root, "labels.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")
    with open(os.path.join(root, "classes.txt"), "w") as f:
        f.write("\n".join(names) + "\n")
    with open(os.path.join(root, "anchors.txt"), "w") as f:
        base = [6, 8, 10, 12, 16, 20, 24, 28, 32]
        asc = SIZE / 64.0  # anchors follow the network input size
        f.write(", ".join(f"{int(a * asc)},{int(a * asc)}"
                          for a in base) + "\n")


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
    t0 = time.time()
    # TMV_CMAP_VERSION=v4 trains/evals YOLOv4 (CIoU loss, DIoU-NMS) and
    # writes converged_map_v4.json; default stays the v3 artifact
    version = os.environ.get("TMV_CMAP_VERSION", "v3")
    # TMV_CMAP_KEEP=dir persists the dataset + trained weights;
    # TMV_CMAP_RESUME_DIR=<prior KEEP root> skips dataset+train and
    # re-runs only the eval stage (e.g. re-scoring int8 after a
    # calibration change without the 4000-step retrain) — same
    # convention as e2e_converged_map_ed.py
    resume = os.environ.get("TMV_CMAP_RESUME_DIR")
    keep = os.environ.get("TMV_CMAP_KEEP", "")
    root = resume or keep or tempfile.mkdtemp(prefix="tmv_converged_map_")
    if keep and not resume:
        os.makedirs(keep, exist_ok=True)
    if not resume:
        make_dataset(root)
    ckpt = os.path.join(root, f"weights_{version}")
    if resume and not os.path.isdir(ckpt):
        ckpt = os.path.join(root, "weights")  # pre-r4 KEEP layout
    base = [
        "--classesFile", os.path.join(root, "classes.txt"),
        "--anchorsFile", os.path.join(root, "anchors.txt"),
        "--imageSize", str(SIZE),
    ]
    if not resume:
        run_cli("tmv_tpu.cli.train_yolo", base + [
            "--version", version,
            "--trainData", os.path.join(root, "labels.txt"),
            "--trainImagePath", os.path.join(root, "imgs"),
            "--batchSize", "16", "--stepsPerEpoch", str(STEPS_PER_EPOCH),
            "--epochs", str(EPOCHS),
            "--lr", LR, "--warmupSteps", "0", "--modelPath", ckpt,
            "--earlyStopPatience", "0",
            # host staging is deterministic (CLAUDE.md): epochs 2+ serve
            # from the uint8 memmap instead of re-decoding the N_IMAGES
            # JPEGs each epoch.  Staged frames don't depend on the model
            # version, so train and every eval pass share one cache dir
            # (the StageCache fingerprint guards any mismatch).
            "--cacheDir", os.path.join(root, "cache"),
        ])

    # full run recipe in the artifact — prior rounds left hw/lr
    # unrecorded, making exact regeneration guesswork
    result = {"n_images": N_IMAGES,
              "train_steps": EPOCHS * STEPS_PER_EPOCH,
              "image_size": SIZE,
              "image_hw_on_disk": HW,
              "lr": LR,
              "model": f"yolo_{version}"}
    # stability: evaluate twice with different eval batch compositions
    passes = [
        ("batch", "reference", "mAP_ref_per_batch", []),
        ("global", "reference", "mAP_ref_global", []),
        ("global", "voc", "mAP_voc_global", []),
        ("global", "coco", "mAP_coco_global", []),
        # quantization accuracy delta: same eval through the int8 path
        ("global", "reference", "mAP_ref_global_int8_static",
         ["--int8Static"]),
        # per-input-channel activation scales: the r4 fix for the
        # converged-v4 per-tensor collapse (0.9041 -> 0.5471; outlier
        # Mish activations dominate the per-tensor absmax —
        # tools/probe_int8_v4_drop.py, tmv_tpu/quant/static.py)
        ("global", "reference", "mAP_ref_global_int8_static_pc",
         ["--int8Static", "--int8PerChannel"]),
    ]
    if version == "v4":
        # outlier-clipping margin sweep (per-tensor): isolates whether the
        # collapse is scale-resolution (per-channel fixes it) or plain
        # outlier range (clipping fixes it)
        passes.append(("global", "reference",
                       "mAP_ref_global_int8_static_m05",
                       ["--int8Static", "--int8Margin", "0.5"]))
        # pc+clipping combo (r5 measured 0.827 < pc-alone 0.852: clipping
        # on top of per-channel HURTS — per-channel alone is the v4 mode)
        passes.append(("global", "reference",
                       "mAP_ref_global_int8_static_pc_m05",
                       ["--int8Static", "--int8PerChannel",
                        "--int8Margin", "0.5"]))
    for mode, variant, key, extra in passes:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            run_cli("tmv_tpu.cli.eval_map", base + [
                "--family", "yolo", "--version", version,
                "--imagePath", os.path.join(root, "imgs"),
                "--labelFile", os.path.join(root, "labels.txt"),
                "--modelPath", ckpt,
                "--mode", mode, "--variant", variant,
                "--confidenceThresh", "0.2", "--scoresThresh", "0.05",
                # eval re-decodes the same frames as train: serve them
                # from the shared staging cache instead (advisor r4)
                "--cacheDir", os.path.join(root, "cache"),
            ] + extra)
        out = json.loads(buf.getvalue().strip().splitlines()[-1])
        result[key] = round(out["mAP"], 4)

    # same per-batch-vs-global explanation as the ED artifact (r4 weak #5)
    result["mAP_ref_per_batch_note"] = (
        "reference quirk semantics: utils/mAP.py accumulates AP over "
        "16-image eval buckets, so classes missing from a bucket score 0 "
        "for it; the global variant is the headline metric")
    result["wall_sec"] = round(time.time() - t0, 1)
    if resume:
        result["resumed_eval_only"] = True
    # self-describing pass/fail so a failing run can't look green
    result["converged"] = bool(result["mAP_ref_global"] > 0.5
                               and result["mAP_coco_global"] > 0.15)
    out_name = ("converged_map.json" if version == "v3"
                else f"converged_map_{version}.json")
    with open(os.path.join(ROOT, out_name), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    assert result["mAP_ref_global"] > 0.5, "did not converge"
    # COCO averages AP over IoU .5:.95 — at a 64 px network input the
    # high-IoU bands collapse (1 px of box error ≈ 0.05 IoU on a 20 px
    # box), so the floor is far below the @0.5 metrics (measured 0.25 at
    # ref-global 0.62)
    assert result["mAP_coco_global"] > 0.15, "coco mAP implausibly low"
    print("CONVERGED-MAP-OK")


if __name__ == "__main__":
    main()
