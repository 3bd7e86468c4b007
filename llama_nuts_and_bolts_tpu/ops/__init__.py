from llama_nuts_and_bolts_tpu.ops.linear import linear, linear_t
from llama_nuts_and_bolts_tpu.ops.rmsnorm import rms_norm
from llama_nuts_and_bolts_tpu.ops.attention import gqa_attention
from llama_nuts_and_bolts_tpu.ops.swiglu import swiglu
from llama_nuts_and_bolts_tpu.ops.sampling import greedy, sample_token
