import numpy as np

from tmv_tpu.visualize import (
    draw_bounding_box_on_image_array,
    draw_keypoints_on_image_array,
    draw_mask_on_image_array,
    visualize_boxes_and_labels_on_image_array,
)


class TestVisUtils:
    def test_draw_box_modifies_pixels(self):
        img = np.zeros((64, 64, 3), np.uint8)
        draw_bounding_box_on_image_array(
            img, 0.2, 0.2, 0.8, 0.8, color="red", thickness=2,
            display_str_list=["cat: 90%"])
        assert img.sum() > 0
        # box edge near y=0.2*64 (PIL line-width rounding)
        assert img[11:15, 32].max() > 0

    def test_draw_keypoints(self):
        img = np.zeros((64, 64, 3), np.uint8)
        draw_keypoints_on_image_array(img, [(0.5, 0.5)], color="red")
        assert img[32, 32].max() > 0

    def test_draw_mask_alpha_blend(self):
        img = np.full((32, 32, 3), 100, np.uint8)
        mask = np.zeros((32, 32), np.uint8)
        mask[8:16, 8:16] = 1
        draw_mask_on_image_array(img, mask, color="red", alpha=0.5)
        assert img[12, 12, 0] > img[0, 0, 0]  # red blended in
        assert (img[0, 0] == 100).all()  # outside unchanged

    def test_visualize_orchestration(self):
        img = np.zeros((64, 64, 3), np.uint8)
        boxes = np.array([[0.1, 0.1, 0.5, 0.5], [0.6, 0.6, 0.9, 0.9]])
        out = visualize_boxes_and_labels_on_image_array(
            img, boxes, classes=[1, 2], scores=[0.9, 0.3],
            category_index={1: {"name": "cat"}, 2: {"name": "dog"}},
            use_normalized_coordinates=True, min_score_thresh=0.5)
        assert out.sum() > 0
        # second box below threshold → its corner untouched
        assert out[int(0.75 * 64), int(0.75 * 64)].max() == 0


class TestSummaries:
    """Array-mode ports of the TF-summary visualizers
    (`vis_utils.py:916-1155`)."""

    def test_png_round_trip(self, tmp_path):
        from tmv_tpu.visualize import (
            encode_image_array_as_png_str, save_image_array_as_png,
        )
        from PIL import Image
        import io

        img = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
        p = str(tmp_path / "x.png")
        save_image_array_as_png(img, p)
        assert (np.asarray(Image.open(p)) == img).all()
        blob = encode_image_array_as_png_str(img)
        assert (np.asarray(Image.open(io.BytesIO(blob))) == img).all()

    def test_cdf_and_hist_images(self):
        from tmv_tpu.visualize import cdf_image, hist_image

        vals = np.random.default_rng(0).uniform(0, 1, 200).astype(np.float32)
        cdf = cdf_image(vals)
        assert cdf.dtype == np.uint8 and cdf.ndim == 4 and cdf.shape[0] == 1
        assert cdf.shape[3] == 3 and cdf.std() > 0  # something was plotted
        hist = hist_image(vals, bins=np.linspace(0, 1, 11))
        assert hist.dtype == np.uint8 and hist.shape[0] == 1
        assert hist.std() > 0

    def test_side_by_side_shapes_and_content(self):
        from tmv_tpu.visualize import draw_side_by_side_evaluation_image

        img = np.full((64, 64, 3), 120, np.uint8)  # gray: GT boxes are black
        out = draw_side_by_side_evaluation_image(
            img,
            detection_boxes=np.array([[0.1, 0.1, 0.5, 0.5]]),
            detection_classes=[1], detection_scores=[0.9],
            groundtruth_boxes=np.array([[0.2, 0.2, 0.6, 0.6]]),
            groundtruth_classes=[1],
            category_index={1: {"name": "cat"}},
        )
        assert out.shape == (64, 128, 3)
        # detections panel has colored (non-gray) pixels; GT panel has the
        # black box lines (reference draws GT in black, vis_utils.py:588)
        assert (out[:, :64] != 120).any()
        assert (out[:, 64:].min() < 60)

    def test_eval_visualization_accrues_and_clears(self, tmp_path):
        from tmv_tpu.visualize import EvalVisualization

        vis = EvalVisualization({1: {"name": "cat"}}, max_examples_to_draw=2)
        img = np.zeros((32, 32, 3), np.uint8)
        args = (img, np.array([[0.1, 0.1, 0.5, 0.5]]), [1], [0.9],
                np.array([[0.1, 0.1, 0.5, 0.5]]), [1])
        assert vis.add_example(*args)
        assert vis.add_example(*args)
        assert not vis.add_example(*args)  # full, like the reference cutoff
        assert len(vis.images()) == 2
        paths = vis.save(str(tmp_path / "vis"))
        assert len(paths) == 2
        import os

        assert all(os.path.exists(p) for p in paths)
        vis.clear()
        assert vis.images() == []
