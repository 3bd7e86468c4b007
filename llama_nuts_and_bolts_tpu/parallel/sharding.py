"""Megatron-style tensor-parallel shardings for the Llama weight pytree.

The classic TP recipe (SURVEY.md §2.3): column-partition the input
projections (wq/wk/wv by heads, gate/up by FFN hidden), row-partition the
output projections (wo, down) so each transformer block needs exactly ONE
all-reduce after attention and one after the FFN — both emitted automatically
by XLA from these NamedShardings, riding ICI. The KV cache shards along its
kv-head axis so cache update and attention stay local to each chip.

Weight layouts are checkpoint layouts ``[out, in]`` stacked to ``[L, out, in]``
(models/llama/model.py), hence:

  wq/wk/wv  [L, heads*hd, D]  → P(None, "tp", None)   (column / by heads)
  wo        [L, D, heads*hd]  → P(None, None, "tp")   (row → psum)
  gate/up   [L, F, D]         → P(None, "tp", None)
  down      [L, D, F]         → P(None, None, "tp")   (row → psum)
  output    [V, D]            → P("tp", None)         (vocab-sharded logits)
  tok_emb   [V, D]            → replicated (1 GB bf16; gather stays local)
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from llama_nuts_and_bolts_tpu.models.llama.model import KVCache, LlamaParams

LAYER_SPECS = {
    "attn_norm": P(None, None),
    "ffn_norm": P(None, None),
    "wq": P(None, "tp", None),
    "wk": P(None, "tp", None),
    "wv": P(None, "tp", None),
    "wo": P(None, None, "tp"),
    "w_gate": P(None, "tp", None),
    "w_up": P(None, "tp", None),
    "w_down": P(None, None, "tp"),
}

TOP_SPECS = {
    "tok_embeddings": P(None, None),
    "norm": P(None),
    "output": P("tp", None),
    "rope": P(None, None),
}


def param_sharding_fn(mesh: Mesh):
    """``sharding_fn(weight_key)`` for the loader's direct sharded device_put."""

    def fn(key: str) -> Optional[NamedSharding]:
        spec = LAYER_SPECS.get(key) or TOP_SPECS.get(key)
        if spec is None:
            return None
        return NamedSharding(mesh, spec)

    return fn


def _fit_spec(spec: P, shape, mesh: Mesh) -> P:
    """Replicate any spec axis whose dim isn't divisible by the mesh axis
    (e.g. few int4 scale groups on a wide tp mesh)."""
    fitted = [ax if ax is None or shape[i] % mesh.shape[ax] == 0 else None
              for i, ax in enumerate(spec)]
    return P(*fitted)


def _put_weight(value, spec: P, mesh: Mesh):
    """device_put a weight leaf that may be quantized.

    Quantized scales follow the value tensor's spec: int4 group scales
    ``[..., out, groups]`` have the value's rank (groups split with the
    contraction dim); int8 per-channel scales ``[..., out]`` drop the
    contraction axis of the spec.
    """
    s = NamedSharding(mesh, spec)
    if hasattr(value, "packed"):          # Q4Tensor: grouped layout
        # logical spec (*lead, out_axis, in_axis) → packed [*lead, G, out, K/2]
        # puts the contraction axis on G and the out axis on rows
        lead, s_out, s_in = spec[:-2], spec[-2], spec[-1]
        p_spec = _fit_spec(P(*lead, s_in, s_out, None), value.packed.shape, mesh)
        sc_spec = _fit_spec(P(*lead, s_in, s_out), value.scale.shape, mesh)
        return type(value)(packed=jax.device_put(value.packed, NamedSharding(mesh, p_spec)),
                           scale=jax.device_put(value.scale, NamedSharding(mesh, sc_spec)))
    if hasattr(value, "q"):               # QTensor
        s_scale = NamedSharding(mesh, P(*spec[:-1]))
        return type(value)(q=jax.device_put(value.q, s),
                           scale=jax.device_put(value.scale, s_scale))
    return jax.device_put(value, s)


def shard_params(params: LlamaParams, mesh: Mesh) -> LlamaParams:
    """Reshard an already-materialized (possibly quantized) params pytree."""
    layers = {k: _put_weight(v, LAYER_SPECS[k], mesh)
              for k, v in params.layers.items()}
    return LlamaParams(
        tok_embeddings=jax.device_put(
            params.tok_embeddings, NamedSharding(mesh, TOP_SPECS["tok_embeddings"])),
        layers=layers,
        norm=jax.device_put(params.norm, NamedSharding(mesh, TOP_SPECS["norm"])),
        output=_put_weight(params.output, TOP_SPECS["output"], mesh),
        rope_cos=jax.device_put(params.rope_cos, NamedSharding(mesh, TOP_SPECS["rope"])),
        rope_sin=jax.device_put(params.rope_sin, NamedSharding(mesh, TOP_SPECS["rope"])),
    )


def cache_sharding(mesh: Mesh) -> NamedSharding:
    # [L, B, KV, T, hd]: batch on dp, kv heads on tp
    return NamedSharding(mesh, P(None, "dp", "tp", None, None))


def shard_cache(cache: KVCache, mesh: Mesh) -> KVCache:
    s = cache_sharding(mesh)
    if cache.quantized:
        # scales [L, B, KV, T]: batch on dp, kv heads on tp (match the values)
        ss = NamedSharding(mesh, P(None, "dp", "tp", None))
        return KVCache(k=jax.device_put(cache.k, s), v=jax.device_put(cache.v, s),
                       k_scale=jax.device_put(cache.k_scale, ss),
                       v_scale=jax.device_put(cache.v_scale, ss))
    return KVCache(k=jax.device_put(cache.k, s), v=jax.device_put(cache.v, s))


def token_sharding(mesh: Mesh, seq_parallel: bool = False) -> NamedSharding:
    """Tokens [B, S]: batch on dp; with ``seq_parallel`` the prefill sequence
    dim shards on sp — embeddings/norms/FFN partition along S for free and
    XLA all-gathers K/V for attention (sequence parallelism for prefill)."""
    return NamedSharding(mesh, P("dp", "sp" if seq_parallel else None))


def q4_shardings(dense_sharding: NamedSharding, packed_shape, scale_shape):
    """Adapt a dense weight's NamedSharding to the grouped int4 layout
    (packed [..., G, out, K/2], scale [..., G, out]) for direct sharded
    loading. Mirrors :func:`_put_weight`'s spec derivation."""
    mesh, spec = dense_sharding.mesh, dense_sharding.spec
    lead, s_out, s_in = spec[:-2], spec[-2], spec[-1]
    p_spec = _fit_spec(P(*lead, s_in, s_out, None), packed_shape, mesh)
    s_spec = _fit_spec(P(*lead, s_in, s_out), scale_shape, mesh)
    return NamedSharding(mesh, p_spec), NamedSharding(mesh, s_spec)


def pool_sharding(mesh: Mesh) -> NamedSharding:
    """Paged KV pool [L, n_blocks, KV, bs, D]: kv heads on tp (block writes,
    the gather path, and attention all stay chip-local; the batch axis lives
    in the block tables, so there is no dp dimension to shard)."""
    return NamedSharding(mesh, P(None, None, "tp", None, None))


def shard_pool(pool, mesh: Mesh):
    """Reshard a PagedKVPool (models/llama/paged.py) for tensor parallelism."""
    s = pool_sharding(mesh)
    if pool.quantized:
        ss = NamedSharding(mesh, P(None, None, "tp", None))   # scale pools
        return type(pool)(k=jax.device_put(pool.k, s), v=jax.device_put(pool.v, s),
                          k_scale=jax.device_put(pool.k_scale, ss),
                          v_scale=jax.device_put(pool.v_scale, ss))
    return type(pool)(k=jax.device_put(pool.k, s), v=jax.device_put(pool.v, s))
