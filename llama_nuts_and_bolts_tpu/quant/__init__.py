from llama_nuts_and_bolts_tpu.quant.quantize import (
    QTensor,
    dequantize,
    init_random_params_q8,
    quantize_params,
    quantize_tensor,
)
from llama_nuts_and_bolts_tpu.quant.int4 import (
    Q4Native,
    Q4Tensor,
    host_quantize_q4,
    init_random_params_q4,
    nativize_q4,
    quantize_params_q4,
    quantize_tensor_q4,
    unpack_q4,
)
