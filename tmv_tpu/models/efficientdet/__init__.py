from tmv_tpu.models.efficientdet.config import (  # noqa: F401
    EfficientDetBlockArgs,
    default_blocks_args,
    default_detection_configs,
    efficientdet_model_param_dict,
    get_efficientdet_config,
)
from tmv_tpu.models.efficientdet.net import EfficientDetNet  # noqa: F401
