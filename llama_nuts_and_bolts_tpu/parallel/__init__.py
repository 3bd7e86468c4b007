from llama_nuts_and_bolts_tpu.parallel.mesh import make_mesh
from llama_nuts_and_bolts_tpu.parallel.sharding import (
    cache_sharding,
    param_sharding_fn,
    shard_cache,
    shard_params,
    token_sharding,
)
