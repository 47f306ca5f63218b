from cerberusdet_tpu.quant.ptq import (  # noqa: F401
    calibrate_amax,
    quantize_params,
    select_deep,
    select_all,
)
