from llama_nuts_and_bolts_tpu.parallel.mesh import initialize_multihost, make_mesh
from llama_nuts_and_bolts_tpu.parallel.sharding import (
    cache_sharding,
    param_sharding_fn,
    pool_sharding,
    shard_cache,
    shard_pool,
    shard_params,
    token_sharding,
)
