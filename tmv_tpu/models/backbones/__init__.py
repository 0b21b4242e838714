from tmv_tpu.models.backbones.inception_resnet_v1 import InceptionResNetV1  # noqa: F401
from tmv_tpu.models.backbones.inception_resnet_v2 import InceptionResNetV2  # noqa: F401
from tmv_tpu.models.backbones.inception_v4 import InceptionV4  # noqa: F401
from tmv_tpu.models.backbones.repvgg import (  # noqa: F401
    RepVGG,
    get_repvgg_by_name,
    repvgg_convert_params,
)
