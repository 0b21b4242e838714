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
