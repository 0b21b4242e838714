"""Dataset-level mAP evaluation CLI (cli/eval_map.py) smoke + semantics."""

import json
import sys

import numpy as np
import pytest
from PIL import Image


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("evalset")
    img_dir = root / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(1)
    lines = []
    for i in range(3):
        img = rng.integers(0, 80, (120, 160, 3), dtype=np.uint8)
        img[20:70, 30:90] = [200, 40, 40]
        Image.fromarray(img).save(img_dir / f"im{i}.jpg")
        lines.append(f"im{i}.jpg|cat,30,20,90,70|")
    (root / "labels.txt").write_text("\n".join(lines) + "\n")
    (root / "classes.txt").write_text("cat\ndog\n")
    anchors = "10,13, 16,30, 33,23, 30,61, 62,45, 59,119, 116,90, 156,198, 373,326"
    (root / "anchors.txt").write_text(anchors + "\n")
    return root


def run_cli(argv, capsys):
    from tmv_tpu.cli.eval_map import main

    old = sys.argv
    sys.argv = ["eval_map"] + argv
    try:
        main()
    finally:
        sys.argv = old
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return json.loads(out)


BASE = lambda root: [
    "--imagePath", str(root / "imgs"),
    "--labelFile", str(root / "labels.txt"),
    "--classesFile", str(root / "classes.txt"),
    "--anchorsFile", str(root / "anchors.txt"),
    "--imageSize", "64",
    "--confidenceThresh", "0.0", "--scoresThresh", "0.0",
]


class TestEvalCLI:
    def test_yolo_batch_mode(self, dataset, capsys):
        out = run_cli(BASE(dataset) + ["--version", "v3",
                                       "--maxImages", "2"], capsys)
        assert out["family"] == "yolo" and out["images"] == 2
        assert 0.0 <= out["mAP"] <= 1.0

    def test_yolo_global_coco(self, dataset, capsys):
        out = run_cli(BASE(dataset) + ["--version", "v3", "--maxImages", "2",
                                       "--mode", "global",
                                       "--variant", "coco"], capsys)
        assert out["mode"] == "global" and out["variant"] == "coco"
        assert 0.0 <= out["mAP"] <= 1.0

    def test_yolo_batch_coco_variant(self, dataset, capsys):
        """--mode batch --variant coco must run per-image COCO AP (was
        silently remapped to voc and mislabeled before round 3)."""
        out = run_cli(BASE(dataset) + ["--version", "v3", "--maxImages", "1",
                                       "--variant", "coco"], capsys)
        assert out["mode"] == "batch" and out["variant"] == "coco"
        assert 0.0 <= out["mAP"] <= 1.0

    @pytest.mark.slow  # compiles D0 eval stack; semantics pinned by faster tests
    def test_efficientdet_batch_mode(self, dataset, capsys):
        out = run_cli([
            "--family", "efficientdet",
            "--imagePath", str(dataset / "imgs"),
            "--labelFile", str(dataset / "labels.txt"),
            "--classesFile", str(dataset / "classes.txt"),
            "--imageSize", "64", "--maxImages", "1",
        ], capsys)
        assert out["family"] == "efficientdet" and out["images"] == 1
        assert 0.0 <= out["mAP"] <= 1.0

    def test_efficientdet_global_coco(self, dataset, capsys):
        """Global-mode COCO eval for the efficientdet family (previously the
        mode/variant flags were ignored and mislabeled in the JSON)."""
        out = run_cli([
            "--family", "efficientdet",
            "--imagePath", str(dataset / "imgs"),
            "--labelFile", str(dataset / "labels.txt"),
            "--classesFile", str(dataset / "classes.txt"),
            "--imageSize", "64", "--maxImages", "2",
            "--mode", "global", "--variant", "coco",
        ], capsys)
        assert out["mode"] == "global" and out["variant"] == "coco"
        assert out["images"] == 2
        assert 0.0 <= out["mAP"] <= 1.0

    def test_resnet_family_evaluable(self, dataset, capsys):
        """The MoCo/distill ResNetYoloV3 detector is a first-class CLI
        citizen (`momentum_contrast/test_object_detection.py` parity)."""
        out = run_cli(BASE(dataset) + ["--version", "resnet",
                                       "--maxImages", "1"], capsys)
        assert out["images"] == 1
        assert 0.0 <= out["mAP"] <= 1.0


@pytest.mark.slow  # compiles two predictor variants
class TestBatchedEval:
    def test_yolo_batchsize_matches_single(self, dataset, capsys):
        """--batchSize B returns the same mAP as per-image evaluation:
        the batched predictor and pipeline are exact, not approximate."""
        args = BASE(dataset) + ["--version", "v3", "--maxImages", "3",
                                "--mode", "global"]
        ref = run_cli(args, capsys)
        out = run_cli(args + ["--batchSize", "2"], capsys)
        assert out["images"] == ref["images"] == 3
        assert out["mAP"] == pytest.approx(ref["mAP"], abs=1e-6)

    def test_efficientdet_batchsize_runs(self, dataset, capsys):
        out = run_cli([
            "--family", "efficientdet",
            "--imagePath", str(dataset / "imgs"),
            "--labelFile", str(dataset / "labels.txt"),
            "--classesFile", str(dataset / "classes.txt"),
            "--imageSize", "64", "--maxImages", "3", "--batchSize", "2",
            "--mode", "global",
        ], capsys)
        assert out["images"] == 3
        assert 0.0 <= out["mAP"] <= 1.0


@pytest.mark.slow  # quantized trace compile
class TestInt8EvalCLI:
    def test_yolo_int8_static_batched(self, dataset, capsys):
        """--int8Static composes with --batchSize (calibration stays at
        ~16 images regardless of batch size)."""
        out = run_cli(BASE(dataset) + [
            "--version", "v3", "--maxImages", "2", "--batchSize", "2",
            "--mode", "global", "--int8Static"], capsys)
        assert out["quant"] == "int8_static"
        assert 0.0 <= out["mAP"] <= 1.0
