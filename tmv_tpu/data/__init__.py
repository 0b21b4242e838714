from tmv_tpu.data.loaders import (  # noqa: F401
    load_anchors,
    load_classes,
    load_labels,
)
