from tmv_tpu.quant.dynamic import (  # noqa: F401
    dynamic_int8_conv,
    quant_mode,
    quantized,
)
from tmv_tpu.quant.static import (  # noqa: F401
    calibrate_absmax,
    calibrate_model,
    prepare_static_int8_variables,
    static_int8_conv,
)
