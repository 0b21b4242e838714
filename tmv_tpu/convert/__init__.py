from tmv_tpu.convert.darknet import (  # noqa: F401
    load_darknet_weights,
    save_darknet_weights,
)
