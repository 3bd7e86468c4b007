"""shard_map wrappers: the Pallas attention kernels under tensor parallelism.

GSPMD cannot partition a ``pallas_call`` on its own, so on a tp mesh the
fused attention kernels run inside ``jax.shard_map`` regions: attention is
head-local (queries only ever meet their own KV head), so each device runs
the unmodified kernel on its local head shard and NO collectives are needed
inside the region — the per-block psums stay where the Megatron weight specs
put them (parallel/sharding.py).

Specs mirror the array layouts:
  q         [B, S, H, D]        → P("dp", None, "tp", None)
  k/v cache [B, KV, T, D]       → P("dp", "tp", None, None)
  kv scales [B, KV, T]          → P("dp", "tp", None)
  paged pool[n_blocks, KV, bs, D] → P(None, "tp", None, None)

Requires tp to divide the KV head count (8 for Llama-3.1) so every shard
keeps whole GQA groups; the q heads shard in lockstep (H/KV groups ride
with their KV head).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, PartitionSpec as P

from llama_nuts_and_bolts_tpu.kernels.attention import flash_gqa_attention
from llama_nuts_and_bolts_tpu.kernels.decode_attention import flash_decode_attention
from llama_nuts_and_bolts_tpu.kernels.paged_attention import paged_flash_decode


def _smap(fn, mesh: Mesh, in_specs, out_specs):
    return jax.shard_map(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                         check_vma=False)


def tp_flash_decode_attention(mesh: Mesh, q, k, v, start_pos,
                              k_scale=None, v_scale=None,
                              block_k: int = 512, layer=None,
                              fold_heads: bool = False,
                              int8_mxu: bool = False):
    """flash_decode_attention over a (dp, tp)-sharded batch/head layout.
    A [B] ``start_pos`` vector (continuous batching) shards with the batch
    rows it describes; a scalar replicates. With ``layer``, k/v are the
    whole stacked [L, B, KV, T, D] cache (layer axis replicated) and the
    kernel selects the layer via a prefetch scalar — no per-step layer
    copy (see kernels/decode_attention.py)."""
    q_spec = P("dp", None, "tp", None)
    stacked = layer is not None
    kv_spec = (P(None, "dp", "tp", None, None) if stacked
               else P("dp", "tp", None, None))
    s_spec = (P(None, "dp", "tp", None) if stacked
              else P("dp", "tp", None))
    sp_spec = P("dp") if getattr(start_pos, "ndim", 0) == 1 else P()
    if k_scale is not None:
        def fn(q, k, v, sp, ks, vs, li):
            return flash_decode_attention(q, k, v, sp, k_scale=ks, v_scale=vs,
                                          block_k=block_k,
                                          layer=li if stacked else None,
                                          fold_heads=fold_heads,
                                          int8_mxu=int8_mxu)
        return _smap(fn, mesh,
                     (q_spec, kv_spec, kv_spec, sp_spec, s_spec, s_spec, P()),
                     q_spec)(q, k, v, start_pos, k_scale, v_scale,
                             layer if stacked else 0)

    def fn(q, k, v, sp, li):
        return flash_decode_attention(q, k, v, sp, block_k=block_k,
                                      layer=li if stacked else None,
                                      fold_heads=fold_heads)
    return _smap(fn, mesh, (q_spec, kv_spec, kv_spec, sp_spec, P()), q_spec)(
        q, k, v, start_pos, layer if stacked else 0)


def tp_flash_gqa_attention(mesh: Mesh, q, k, v, start_pos,
                           block_k: int = 128):
    """flash_gqa_attention (prefill) over a (dp, tp)-sharded layout."""
    q_spec = P("dp", None, "tp", None)
    kv_spec = P("dp", "tp", None, None)

    def fn(q, k, v, sp):
        return flash_gqa_attention(q, k, v, sp, block_k=block_k)
    return _smap(fn, mesh, (q_spec, kv_spec, kv_spec, P()), q_spec)(
        q, k, v, start_pos)


def tp_paged_flash_decode(mesh: Mesh, q, pool_k, pool_v, tables, positions):
    """paged_flash_decode over a tp-sharded pool (batch lives in the block
    tables, so only heads shard)."""
    q_spec = P(None, None, "tp", None)
    pool_spec = P(None, "tp", None, None)

    def fn(q, pk, pv, tbl, pos):
        return paged_flash_decode(q, pk, pv, tbl, pos)
    return _smap(fn, mesh, (q_spec, pool_spec, pool_spec, P(), P()), q_spec)(
        q, pool_k, pool_v, tables, positions)
