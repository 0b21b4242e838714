"""mAP parity: run the reference's numpy evaluator as an oracle.

`utils/mAP.py` is pure numpy, so we import it read-only from /root/reference
(shimming the removed `np.float` alias) and assert bit-equality with our
re-implementation, including the mrec/mpre name-swap quirk.
"""

import importlib.util
import sys

import numpy as np
import pytest

from tmv_tpu.ops.map_eval import get_ap, get_ap_voc, get_map, get_map_one

REF_MAP = "/root/reference/AIServer/ai_api/ai_models/utils/mAP.py"


@pytest.fixture(scope="module")
def ref_map():
    if not hasattr(np, "float"):
        np.float = float  # numpy>=1.24 removed the alias the reference uses
    spec = importlib.util.spec_from_file_location("ref_mAP", REF_MAP)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_mAP"] = mod
    spec.loader.exec_module(mod)
    return mod


def make_data(rng, n_images=3, n_classes=4, max_gt=6, max_pred=8):
    data = []
    for _ in range(n_images):
        gts, preds = [], []
        for _ in range(rng.integers(1, max_gt)):
            x1, y1 = rng.uniform(0, 80, 2)
            w, h = rng.uniform(5, 30, 2)
            gts.append([x1, y1, x1 + w, y1 + h, int(rng.integers(0, n_classes))])
        for g in gts:
            if rng.uniform() < 0.7:  # jittered copy of a GT
                dx, dy = rng.normal(0, 3, 2)
                preds.append([g[0] + dx, g[1] + dy, g[2] + dx, g[3] + dy,
                              g[4], float(rng.uniform(0.3, 1.0))])
        for _ in range(rng.integers(0, max_pred // 2)):  # false positives
            x1, y1 = rng.uniform(0, 80, 2)
            w, h = rng.uniform(5, 30, 2)
            preds.append([x1, y1, x1 + w, y1 + h,
                          int(rng.integers(0, n_classes)),
                          float(rng.uniform(0.1, 1.0))])
        if not preds:
            preds.append([0, 0, 1, 1, 0, 0.1])
        data.append({"image_path": "*.jpg", "groud_truth": gts,
                     "prediction": preds})
    return data


class TestReferenceParity:
    def test_reference_readme_example(self, ref_map):
        data = [
            {"image_path": "*.jpg",
             "groud_truth": [[1, 1, 2, 2, 1], [1, 1, 2, 2, 2],
                             [1, 1.3, 2.4, 2, 1], [3, 1, 4, 2, 2]],
             "prediction": [[1.1, 1, 2.1, 2.2, 1, 0.8],
                            [1.2, 1.2, 2.2, 2.2, 2, 0.7],
                            [1.1, 1.3, 2.4, 2.1, 1, 0.6],
                            [1.1, 1.1, 2.1, 2.1, 1, 0.9]]},
            {"image_path": "*.jpg",
             "groud_truth": [[1, 1, 2, 2, 1], [1, 1, 2, 2, 2],
                             [1, 1.3, 2.4, 2, 1], [3, 1, 4, 2, 2],
                             [3, 1, 4, 2, 0]],
             "prediction": [[1.1, 1, 2.1, 2.2, 1, 0.8],
                            [1.2, 1.2, 2.2, 2.2, 2, 0.7],
                            [1.1, 1.3, 2.4, 2.1, 1, 0.7],
                            [1.1, 1.1, 2.1, 2.1, 1, 0.6]]},
        ]
        want = ref_map.Get_mAP(data, class_num=3, thresh=0.5)
        got = get_map(data, class_num=3, thresh=0.5)
        assert got == pytest.approx(want, abs=1e-12)

    def test_random_data_parity(self, ref_map, rng):
        # single-image comparisons: the reference's multi-image path crashes
        # on ragged per-image prediction counts (`np.array(tp)` at
        # utils/mAP.py:60 needs equal shapes) — only Get_mAP_one is used
        # live, so parity is asserted per image.
        for _ in range(10):
            data = make_data(rng, n_images=1)
            for c in range(4):
                want = ref_map.Get_AP(data, c, thresh=0.5)
                got = get_ap(data, c, thresh=0.5)
                assert got == pytest.approx(want, abs=1e-12)

    def test_get_map_one(self, ref_map, rng):
        data = make_data(rng, n_images=1)
        want = ref_map.Get_mAP_one(data[0]["groud_truth"],
                                   data[0]["prediction"], 4, thresh=0.5)
        got = get_map_one(data[0]["groud_truth"], data[0]["prediction"], 4)
        assert got == pytest.approx(want, abs=1e-12)


class TestTieOrdering:
    """Tied scores (saturated sigmoids emitting exactly 1.0) are the regime
    where the reference's tie-reversing sort (`utils/mAP.py:63`:
    ``argsort(scores)[::-1]``) and our stable descending sort order rows
    differently.  Pins two facts: (1) the quirk `get_ap` is algebraically
    order-invariant (= final_recall × final_precision) so oracle parity
    survives ties; (2) the corrected variants keep TPs ranked above the
    duplicate FPs a saturated head emits after them."""

    def _tied_data(self):
        # 2 GTs, each matched by a TP at score 1.0, followed by two
        # duplicate near-miss FPs also at score 1.0 (classic NMS-survivor
        # duplicates from a saturated head).
        gts = [[10, 10, 40, 40, 0], [60, 60, 90, 90, 0]]
        preds = [
            [10, 10, 40, 40, 0, 1.0],      # TP for GT0
            [60, 60, 90, 90, 0, 1.0],      # TP for GT1
            [100, 100, 130, 130, 0, 1.0],  # FP duplicate
            [140, 140, 170, 170, 0, 1.0],  # FP duplicate
        ]
        return [{"image_path": "x", "groud_truth": gts, "prediction": preds}]

    def test_corrected_variants_keep_tps_above_tied_fps(self):
        from tmv_tpu.ops.map_eval import get_ap_coco
        data = self._tied_data()
        # TPs occupy ranks 1-2 → precision is 1.0 at full recall.
        assert get_ap_voc(data, 0) == pytest.approx(1.0, abs=1e-6)
        assert get_ap_coco(data, 0, 0.5) == pytest.approx(1.0, abs=1e-6)
        # the quirk metric is P×R = (2/4)·(2/2) regardless of order
        assert get_ap(data, 0) == pytest.approx(0.5, abs=1e-12)

    def test_quirk_ap_parity_holds_on_ties(self, ref_map):
        data = self._tied_data()
        want = ref_map.Get_AP(data, 0, thresh=0.5)
        assert get_ap(data, 0, thresh=0.5) == pytest.approx(want, abs=1e-12)

    def test_quirk_ap_parity_fuzz_with_ties(self, ref_map, rng):
        # random scenes where ~half the scores saturate to exactly 1.0
        for _ in range(50):
            gts, preds = [], []
            for _ in range(int(rng.integers(1, 6))):
                x1, y1 = rng.uniform(0, 80, 2)
                w, h = rng.uniform(5, 30, 2)
                gts.append([x1, y1, x1 + w, y1 + h, 0])
            for g in gts:
                if rng.uniform() < 0.7:
                    dx, dy = rng.normal(0, 3, 2)
                    s = 1.0 if rng.uniform() < 0.5 else float(rng.uniform(.3, 1))
                    preds.append([g[0] + dx, g[1] + dy, g[2] + dx, g[3] + dy,
                                  0, s])
            for _ in range(int(rng.integers(0, 5))):
                x1, y1 = rng.uniform(0, 80, 2)
                w, h = rng.uniform(5, 30, 2)
                s = 1.0 if rng.uniform() < 0.5 else float(rng.uniform(.1, 1))
                preds.append([x1, y1, x1 + w, y1 + h, 0, s])
            if not preds:
                preds.append([0, 0, 1, 1, 0, 1.0])
            data = [{"image_path": "x", "groud_truth": gts,
                     "prediction": preds}]
            want = ref_map.Get_AP(data, 0, thresh=0.5)
            assert get_ap(data, 0, thresh=0.5) == pytest.approx(want,
                                                                abs=1e-12)

    def test_quirk_ap_is_precision_times_recall(self, rng):
        # the closed form that makes get_ap order-invariant
        from tmv_tpu.ops.map_eval import _precision_recall, _tp_and_count
        for _ in range(10):
            data = make_data(rng, n_images=1)
            for c in range(4):
                tp, gt_num = _tp_and_count(data, c, 0.5)
                if tp.shape[0] == 0 or gt_num == 0:
                    continue
                p, r = _precision_recall(tp, gt_num)
                assert get_ap(data, c) == pytest.approx(p[-1] * r[-1],
                                                        abs=1e-12)


class TestManyClassProperty:
    """Property test vs the oracle on many-class data with empty classes
    (classes that have GT but no predictions, predictions but no GT, or
    neither) — the regime of the round-3 2-vs-81-class head bug."""

    def test_empty_and_sparse_classes_parity(self, ref_map, rng):
        for trial in range(8):
            n_classes = int(rng.integers(5, 12))
            data = make_data(rng, n_images=1, n_classes=n_classes)
            # strip all predictions of one class, all GTs of another
            drop_pred = int(rng.integers(0, n_classes))
            drop_gt = int(rng.integers(0, n_classes))
            d = data[0]
            d["prediction"] = [p for p in d["prediction"]
                               if p[4] != drop_pred] or [[0, 0, 1, 1, 0, .1]]
            d["groud_truth"] = [g for g in d["groud_truth"]
                                if g[4] != drop_gt] or [[0, 0, 9, 9, 0]]
            for c in range(n_classes):
                want = ref_map.Get_AP(data, c, thresh=0.5)
                got = get_ap(data, c, thresh=0.5)
                assert got == pytest.approx(want, abs=1e-12), (
                    f"trial={trial} class={c}")
            want_map = ref_map.Get_mAP(data, class_num=n_classes)
            got_map = get_map(data, class_num=n_classes)
            assert got_map == pytest.approx(want_map, abs=1e-12)


class TestVocVariant:
    def test_perfect_predictions_give_ap1(self):
        gts = [[10, 10, 30, 30, 0], [50, 50, 70, 80, 0]]
        preds = [g[:4] + [0, 0.9] for g in gts]
        data = [{"image_path": "x", "groud_truth": gts, "prediction": preds}]
        assert get_ap_voc(data, 0) == pytest.approx(1.0)

    def test_all_misses_give_ap0(self):
        data = [{"image_path": "x",
                 "groud_truth": [[10, 10, 30, 30, 0]],
                 "prediction": [[60, 60, 80, 80, 0, 0.9]]}]
        assert get_ap_voc(data, 0) == pytest.approx(0.0)


class TestCocoMap:
    """COCO-official evaluator (101-pt interpolation, mAP@[.5:.95])."""

    def _data(self, preds, gts):
        return [{"image_path": "a.jpg", "groud_truth": gts,
                 "prediction": preds}]

    def test_perfect_detection_ap1(self):
        from tmv_tpu.ops.map_eval import get_ap_coco
        gts = [[10, 10, 50, 50, 0]]
        preds = [[10, 10, 50, 50, 0, 0.9]]
        assert get_ap_coco(self._data(preds, gts), 0, 0.5) == 1.0

    def test_fp_before_tp_halves_ap(self):
        from tmv_tpu.ops.map_eval import get_ap_coco
        gts = [[10, 10, 50, 50, 0]]
        preds = [[100, 100, 140, 140, 0, 0.95],   # FP, higher score
                 [10, 10, 50, 50, 0, 0.9]]        # TP
        ap = get_ap_coco(self._data(preds, gts), 0, 0.5)
        # precision at all recall levels is 0.5 (1 TP out of 2 preds)
        assert ap == pytest.approx(0.5, abs=0.01)

    def test_trailing_fp_does_not_lower_ap(self):
        from tmv_tpu.ops.map_eval import get_ap_coco
        gts = [[10, 10, 50, 50, 0]]
        preds = [[10, 10, 50, 50, 0, 0.9],
                 [100, 100, 140, 140, 0, 0.1]]
        assert get_ap_coco(self._data(preds, gts), 0, 0.5) == 1.0

    def test_no_gt_class_excluded_from_mean(self):
        from tmv_tpu.ops.map_eval import get_ap_coco, get_map_coco
        gts = [[10, 10, 50, 50, 0]]
        preds = [[10, 10, 50, 50, 0, 0.9]]
        data = self._data(preds, gts)
        assert get_ap_coco(data, 1, 0.5) is None
        # class 1 has no GT: mean over class 0 only (not dragged to 0.5)
        assert get_map_coco(data, 2, threshs=[0.5]) == 1.0

    def test_iou_sweep_maps_to_expected_fraction(self):
        from tmv_tpu.ops.map_eval import get_map_coco
        # pred/GT IoU = 32*40 / (40*40 + 40*40 - 32*40) = 2/3:
        # TP for t in {.5,.55,.6,.65}, FP above → mAP = 4/10
        gts = [[0, 0, 40, 40, 0]]
        preds = [[8, 0, 48, 40, 0, 0.9]]
        m = get_map_coco(self._data(preds, gts), 1)
        assert m == pytest.approx(0.4, abs=0.01)

    def test_no_predictions_ap0(self):
        from tmv_tpu.ops.map_eval import get_ap_coco
        gts = [[10, 10, 50, 50, 0]]
        assert get_ap_coco(self._data([], gts), 0, 0.5) == 0.0
