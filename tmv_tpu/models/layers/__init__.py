from tmv_tpu.models.layers.common import ConvBN, DarknetConv  # noqa: F401
