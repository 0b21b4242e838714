from tmv_tpu.quant.dynamic import (  # noqa: F401
    dynamic_int8_conv,
    quant_mode,
    quantized,
)
