from tmv_tpu.visualize.vis_utils import (  # noqa: F401
    STANDARD_COLORS,
    draw_bounding_box_on_image_array,
    draw_bounding_boxes_on_image_array,
    draw_keypoints_on_image_array,
    draw_mask_on_image_array,
    visualize_boxes_and_labels_on_image_array,
)
