from llama_nuts_and_bolts_tpu.quant.quantize import (
    QTensor,
    dequantize,
    init_random_params_q8,
    quantize_params,
    quantize_tensor,
)
