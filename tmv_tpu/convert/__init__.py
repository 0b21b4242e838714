from tmv_tpu.convert.darknet import (  # noqa: F401
    conv_call_order,
    load_darknet_weights,
    save_darknet_weights,
)
from tmv_tpu.convert.darknet_cfg import (  # noqa: F401
    build_from_cfg,
    load_cfg_weights,
    parse_darknet_cfg,
)
