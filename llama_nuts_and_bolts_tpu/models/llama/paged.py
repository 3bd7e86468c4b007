"""Paged KV cache: a shared block pool + per-request block tables.

The dense ``KVCache`` reserves ``max_seq`` slots per batch row, so a
continuous-batching server pays for its longest possible context times its
slot count whether requests use it or not. Here the cache is a POOL of
fixed-size blocks shared by every request (vLLM's PagedAttention idea,
rebuilt TPU-first); a request holds exactly ``ceil(len/bs)`` blocks and
releases them on completion, so the HBM footprint tracks live tokens, not
worst-case slots x context.

TPU-first design notes:

  * static shapes everywhere: the pool ``[L, n_blocks, KV, bs, D]`` and the
    block tables ``[B, max_blocks]`` are fixed at construction; growing a
    request = the HOST allocator writing a new block id into its table row —
    no device reshape, no recompilation.
  * block size is a sublane multiple (default 32) so each block
    ``[KV, bs, D]`` is a whole number of bf16 (16, 128) memory tiles: block
    reads/writes never straddle tile boundaries.
  * unallocated table entries point at block 0, a reserved TRASH block:
    prefill's padded tail chunks and freed slots' pad-token steps write
    there, and the attention mask (``t <= pos``) guarantees trash is never
    read into a real result — the same garbage-is-overwritten-or-masked
    argument the dense continuous batcher uses.
  * prefill never reads the pool: a fresh request starts at position 0, so
    its prompt self-attention is computed from the just-projected k/v with a
    causal mask, and the rows are then written out block by block.
  * decode attention has two paths: an XLA gather path (correctness oracle,
    works on CPU) and a Pallas kernel (kernels/paged_attention.py) whose
    grid walks each row's block table via scalar prefetch — only the blocks
    a request actually owns are streamed from HBM.

The reference has no batching or cache sharing at all — its InferenceContext
is one preallocated [seq_len, 8, 128] tensor per layer per generation
(reference: src/model/inferencecontext.go:29-43); this is the
production-serving replacement for that capability.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import struct
from jax import lax

from llama_nuts_and_bolts_tpu.io.params import ModelArgs
from llama_nuts_and_bolts_tpu.models.llama.model import LlamaParams, quantize_kv_rows
from llama_nuts_and_bolts_tpu.models.llama.rope import apply_rope
from llama_nuts_and_bolts_tpu.ops import gqa_attention, linear, rms_norm, swiglu

TRASH_BLOCK = 0
DEFAULT_BLOCK_SIZE = 32


@struct.dataclass
class PagedKVPool:
    """Shared block pool. ``k``/``v``: [L, n_blocks, KV, block_size, D].

    ``dtype=jnp.int8`` stores rows quantized per (position, head) with bf16
    scale pools ``k_scale/v_scale`` [L, n_blocks, KV, block_size] — the same
    write-once scheme as the dense int8 KVCache (models/llama/model.py), so
    dequantized values are bit-identical between the two cache designs."""

    k: jnp.ndarray
    v: jnp.ndarray
    k_scale: Any = None
    v_scale: Any = None

    @classmethod
    def create(cls, cfg: ModelArgs, n_blocks: int,
               block_size: int = DEFAULT_BLOCK_SIZE,
               dtype=jnp.bfloat16) -> "PagedKVPool":
        if n_blocks < 2:
            raise ValueError("need at least one real block beyond the trash block")
        shape = (cfg.n_layers, n_blocks, cfg.kv_heads, block_size, cfg.head_dim)
        if dtype == jnp.int8:
            return cls(k=jnp.zeros(shape, jnp.int8), v=jnp.zeros(shape, jnp.int8),
                       k_scale=jnp.zeros(shape[:-1], jnp.bfloat16),
                       v_scale=jnp.zeros(shape[:-1], jnp.bfloat16))
        return cls(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype))

    @property
    def block_size(self) -> int:
        return self.k.shape[3]

    @property
    def n_blocks(self) -> int:
        return self.k.shape[1]

    @property
    def quantized(self) -> bool:
        return self.k.dtype == jnp.int8


def _write_rows(pool_layer: jnp.ndarray, rows: jnp.ndarray,
                blocks: jnp.ndarray, offsets: jnp.ndarray) -> jnp.ndarray:
    """Write per-row k/v data into a layer's pool.

    Values: pool [n_blocks, KV, bs, D], rows [B, KV, D]. Scales (int8 mode):
    pool [n_blocks, KV, bs], rows [B, KV]. blocks/offsets: [B] int32.
    Sequential over B (B is the slot count, small); duplicate (block, offset)
    pairs only occur for trash writes.
    """
    B = rows.shape[0]
    vec = rows.ndim == 3                     # values carry a trailing D axis

    def body(b, pl_):
        upd = rows[b][None, :, None, :] if vec else rows[b][None, :, None]
        start = (blocks[b], 0, offsets[b]) + ((0,) if vec else ())
        return lax.dynamic_update_slice(pl_, upd.astype(pl_.dtype), start)

    return lax.fori_loop(0, B, body, pool_layer)


def _write_chunks(pool_layer: jnp.ndarray, rows: jnp.ndarray,
                  table_row: jnp.ndarray) -> jnp.ndarray:
    """Write a prompt's k/v data block by block.

    Values: pool [n_blocks, KV, bs, D], rows [1, KV, S, D]. Scales: pool
    [n_blocks, KV, bs], rows [1, KV, S]. S must be a multiple of bs;
    table_row entries beyond S/bs are trash and harmlessly overwritten there.
    """
    bs = pool_layer.shape[2]
    S = rows.shape[2]
    n_chunks = S // bs
    vec = rows.ndim == 4

    def body(i, pl_):
        if vec:
            chunk = lax.dynamic_slice(
                rows, (0, 0, i * bs, 0),
                (1, rows.shape[1], bs, rows.shape[3]))[0]      # [KV, bs, D]
        else:
            chunk = lax.dynamic_slice(
                rows, (0, 0, i * bs), (1, rows.shape[1], bs))[0]  # [KV, bs]
        return lax.dynamic_update_slice(
            pl_, chunk[None].astype(pl_.dtype),
            (table_row[i], 0, 0) + ((0,) if vec else ()))

    return lax.fori_loop(0, n_chunks, body, pool_layer)


def _dense_from_gathered(q, k, v, positions, ks=None, vs=None):
    """Dense GQA over per-row gathered blocks k/v [B, M, KV, bs, D]
    (+ optional int8 scales [B, M, KV, bs]). ``q`` may carry S > 1 rows
    (speculative verification): row s of batch b sees pool slots holding
    positions ≤ positions[b] + s."""
    B, M, KV, bs, D = k.shape
    S = q.shape[1]
    if ks is not None:
        k = k.astype(jnp.bfloat16) * ks[..., None].astype(jnp.bfloat16)
        v = v.astype(jnp.bfloat16) * vs[..., None].astype(jnp.bfloat16)
    k = k.transpose(0, 2, 1, 3, 4).reshape(B, KV, M * bs, D)
    v = v.transpose(0, 2, 1, 3, 4).reshape(B, KV, M * bs, D)
    t = lax.broadcasted_iota(jnp.int32, (B, S, M * bs), 2)
    s_row = lax.broadcasted_iota(jnp.int32, (B, S, M * bs), 1)
    mask = jnp.where(t <= positions[:, None, None] + s_row,
                     0.0, -jnp.inf).astype(jnp.float32)
    return gqa_attention(q, k, v, mask)


def _gathered_attention(q, pool_k, pool_v, tables, positions,
                        pool_ks=None, pool_vs=None):
    """XLA paged-attention path: gather each row's blocks, then dense GQA.

    q: [B, 1, H, D]; pool_k/v: [n_blocks, KV, bs, D]; tables: [B, M];
    positions: [B]. With an int8 pool, ``pool_ks/pool_vs`` carry the bf16
    scale pools and the gathered tiles dequantize before the einsum.
    Visible slots are t <= positions[b].
    """
    k = jnp.take(pool_k, tables, axis=0)                       # [B, M, KV, bs, D]
    v = jnp.take(pool_v, tables, axis=0)
    ks = vs = None
    if pool_ks is not None:
        ks = jnp.take(pool_ks, tables, axis=0)                 # [B, M, KV, bs]
        vs = jnp.take(pool_vs, tables, axis=0)
    return _dense_from_gathered(q, k, v, positions, ks, vs)


def _gather_stacked(buf, li, tables):
    """Gather per-row blocks of layer ``li`` straight out of a STACKED pool
    [L, n_blocks, ...] with ONE fused gather (flat indices li*n_blocks +
    table) — slicing the layer first would make XLA materialize a full
    per-layer pool copy inside the scan."""
    L, nb = buf.shape[0], buf.shape[1]
    flat = buf.reshape((L * nb,) + buf.shape[2:])
    return jnp.take(flat, li * nb + tables, axis=0)


def paged_prefill_shared(
    params: LlamaParams,
    cfg: ModelArgs,
    tokens: jnp.ndarray,      # int32 [1, S] — prompt SUFFIX, S % block_size == 0
    shared_len,               # traced int32, multiple of block_size
    logits_at,                # traced int32: suffix-local index of last real row
    pool: PagedKVPool,
    table_row: jnp.ndarray,   # int32 [max_blocks] — shared + owned blocks
) -> Tuple[jnp.ndarray, PagedKVPool]:
    """Suffix-only prefill for a prefix-cache hit.

    The request's first ``shared_len`` positions already live in shared pool
    blocks (table_row[: shared_len // bs], written by an earlier request with
    the same prompt prefix — see runtime/block_pool.py). Only the suffix rows
    are projected; their K/V land in the table row's blocks starting at block
    ``shared_len // bs``, and attention sees the gathered shared prefix
    (masked ``t < shared_len``) plus the causal suffix. Shared blocks are
    never written: suffix chunk writes start past them by construction.

    Returns (logits [1, vocab] at suffix row ``logits_at``, updated pool).
    """
    B, S = tokens.shape
    if B != 1:
        raise ValueError("paged_prefill_shared handles one request at a time")
    bs = pool.block_size
    if S % bs:
        raise ValueError(f"suffix length {S} must be a multiple of the "
                         f"block size {bs}")
    H, KV, D = cfg.n_heads, cfg.kv_heads, cfg.head_dim
    M = table_row.shape[0]
    quantized = pool.quantized

    x = jnp.take(params.tok_embeddings, tokens, axis=0)
    cos = lax.dynamic_slice_in_dim(params.rope_cos, shared_len, S)[None]
    sin = lax.dynamic_slice_in_dim(params.rope_sin, shared_len, S)[None]

    # suffix chunk i writes to table_row[shared_len // bs + i]; out-of-range
    # chunk slots (padding past the prompt's owned blocks) read trash
    padded_row = jnp.concatenate(
        [table_row, jnp.full((M,), TRASH_BLOCK, jnp.int32)])
    chunk_blocks = lax.dynamic_slice(padded_row, (shared_len // bs,), (M,))

    # masks: every suffix query sees the whole shared prefix; causal within
    # the suffix. Key axis = [M * bs pool slots] ++ [S suffix rows].
    t_pool = lax.broadcasted_iota(jnp.int32, (S, M * bs), 1)
    prefix_mask = jnp.where(t_pool < shared_len, 0.0, -jnp.inf)
    rows = lax.broadcasted_iota(jnp.int32, (S, S), 0)
    cols = lax.broadcasted_iota(jnp.int32, (S, S), 1)
    suffix_mask = jnp.where(cols <= rows, 0.0, -jnp.inf)
    mask = jnp.concatenate([prefix_mask, suffix_mask],
                           axis=1).astype(jnp.float32)[None]

    def gather_prefix(pl, scale=None):
        g = jnp.take(pl, table_row, axis=0)                # [M, KV, bs, D?]
        if scale is not None:
            gs = jnp.take(scale, table_row, axis=0)        # [M, KV, bs]
            g = g.astype(jnp.bfloat16) * gs[..., None].astype(jnp.bfloat16)
        return g.transpose(1, 0, 2, 3).reshape(1, KV, M * bs, D)

    def block_fn(x, scanned):
        if quantized:
            w, pk, pv, pks, pvs = scanned
        else:
            w, pk, pv = scanned
        h = rms_norm(x, w["attn_norm"], cfg.norm_eps)
        q = linear(h, w["wq"]).reshape(B, S, H, D)
        k = linear(h, w["wk"]).reshape(B, S, KV, D)
        v = linear(h, w["wv"]).reshape(B, S, KV, D)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin).transpose(0, 2, 1, 3)  # [1, KV, S, D]
        v = v.transpose(0, 2, 1, 3)
        if quantized:
            kq, ks = quantize_kv_rows(k)
            vq, vs = quantize_kv_rows(v)
            pk = _write_chunks(pk, kq, chunk_blocks)
            pv = _write_chunks(pv, vq, chunk_blocks)
            pks = _write_chunks(pks, ks, chunk_blocks)
            pvs = _write_chunks(pvs, vs, chunk_blocks)
            carry = (pk, pv, pks, pvs)
            # attend dequantized suffix rows for bit-parity with the
            # unshared quantized prefill (see paged_prefill)
            k = kq.astype(jnp.bfloat16) * ks[..., None].astype(jnp.bfloat16)
            v = vq.astype(jnp.bfloat16) * vs[..., None].astype(jnp.bfloat16)
            k_all = jnp.concatenate([gather_prefix(pk, pks), k], axis=2)
            v_all = jnp.concatenate([gather_prefix(pv, pvs), v], axis=2)
        else:
            pk = _write_chunks(pk, k, chunk_blocks)
            pv = _write_chunks(pv, v, chunk_blocks)
            carry = (pk, pv)
            k_all = jnp.concatenate([gather_prefix(pk), k], axis=2)
            v_all = jnp.concatenate([gather_prefix(pv), v], axis=2)
        att = gqa_attention(q, k_all, v_all, mask)
        x = x + linear(att.reshape(B, S, H * D), w["wo"])
        h2 = rms_norm(x, w["ffn_norm"], cfg.norm_eps)
        x = x + swiglu(h2, w["w_gate"], w["w_up"], w["w_down"])
        return x, carry

    if quantized:
        xs = (params.layers, pool.k, pool.v, pool.k_scale, pool.v_scale)
        x, (pk_new, pv_new, pks_new, pvs_new) = lax.scan(block_fn, x, xs)
        new_pool = PagedKVPool(k=pk_new, v=pv_new,
                               k_scale=pks_new, v_scale=pvs_new)
    else:
        x, (pk_new, pv_new) = lax.scan(block_fn, x, (params.layers, pool.k, pool.v))
        new_pool = PagedKVPool(k=pk_new, v=pv_new)
    x = lax.dynamic_slice_in_dim(x, logits_at, 1, axis=1)
    x = rms_norm(x, params.norm, cfg.norm_eps)
    logits = linear(x[:, 0], params.output, out_dtype=jnp.float32)
    return logits, new_pool


def paged_decode_step(
    params: LlamaParams,
    cfg: ModelArgs,
    tokens: jnp.ndarray,      # int32 [B, 1]
    positions: jnp.ndarray,   # int32 [B] — write/attend position per row
    pool: PagedKVPool,
    tables: jnp.ndarray,      # int32 [B, max_blocks]
    attn_impl: str = "xla",   # "xla" | "pallas"
) -> Tuple[jnp.ndarray, PagedKVPool]:
    """One batched decode step over paged caches. Returns (logits [B, vocab],
    updated pool). Rows whose table is all-trash still step harmlessly."""
    B = tokens.shape[0]
    H, KV, D = cfg.n_heads, cfg.kv_heads, cfg.head_dim
    bs = pool.block_size
    quantized = pool.quantized

    x = jnp.take(params.tok_embeddings, tokens, axis=0)        # [B, 1, dim]
    cos = jnp.take(params.rope_cos, positions, axis=0)[:, None, :]  # [B,1,D/2]
    sin = jnp.take(params.rope_sin, positions, axis=0)[:, None, :]
    blocks = jnp.take_along_axis(
        tables, (positions // bs)[:, None], axis=1)[:, 0]      # [B]
    offsets = positions % bs

    def block_carried(carry, w):
        """The WHOLE stacked pool rides the scan carry (in-place writes);
        the earlier xs/ys formulation re-materialized every layer's full
        pool into the stacked ys each step — the same full-buffer copy the
        dense cache path shed in round 3 (docs/07)."""
        if quantized:
            x, pk_all, pv_all, pks_all, pvs_all, li = carry
        else:
            x, pk_all, pv_all, li = carry
        h = rms_norm(x, w["attn_norm"], cfg.norm_eps)
        q = linear(h, w["wq"]).reshape(B, 1, H, D)
        k = linear(h, w["wk"]).reshape(B, 1, KV, D)
        v = linear(h, w["wv"]).reshape(B, 1, KV, D)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

        def write_l(buf, rows):
            # rows [B, KV, D] (values) or [B, KV] (scales) -> buf
            # [L, n_blocks, KV, bs(, D)] at (li, blocks[b], 0, offsets[b]).
            # UNROLLED over B (the slot count, static): a chain of plain
            # dynamic_update_slices aliases the carried buffer in place,
            # where a fori_loop would wrap the buffer in a nested while
            # carry the outer aliasing analysis can lose.
            vec = rows.ndim == 3
            for b in range(B):
                upd = (rows[b][None, None, :, None, :] if vec
                       else rows[b][None, None, :, None])
                start = (li, blocks[b], 0, offsets[b]) + ((0,) if vec else ())
                buf = lax.dynamic_update_slice(buf, upd.astype(buf.dtype),
                                               start)
            return buf

        if quantized:
            kq, ks = quantize_kv_rows(k[:, 0])                 # [B,KV,D], [B,KV]
            vq, vs = quantize_kv_rows(v[:, 0])
            pk_all = write_l(pk_all, kq)
            pv_all = write_l(pv_all, vq)
            pks_all = write_l(pks_all, ks)
            pvs_all = write_l(pvs_all, vs)
            if attn_impl == "pallas":
                from llama_nuts_and_bolts_tpu.kernels.paged_attention import (
                    paged_flash_decode,
                )

                # int8xint8-MXU path: pool tiles stay int8 into the MXU
                att = paged_flash_decode(q, pk_all, pv_all, tables,
                                         positions, layer=li,
                                         pool_ks=pks_all, pool_vs=pvs_all)
            else:
                att = _dense_from_gathered(
                    q, _gather_stacked(pk_all, li, tables),
                    _gather_stacked(pv_all, li, tables), positions,
                    _gather_stacked(pks_all, li, tables),
                    _gather_stacked(pvs_all, li, tables))
            out_carry = (pk_all, pv_all, pks_all, pvs_all)
        else:
            pk_all = write_l(pk_all, k[:, 0])
            pv_all = write_l(pv_all, v[:, 0])
            if attn_impl == "pallas":
                from llama_nuts_and_bolts_tpu.kernels.paged_attention import (
                    paged_flash_decode,
                )

                # stacked-pool mode: the kernel picks the layer via a
                # prefetch scalar — no per-step layer-slice materialization
                att = paged_flash_decode(q, pk_all, pv_all, tables,
                                         positions, layer=li)
            else:
                att = _dense_from_gathered(
                    q, _gather_stacked(pk_all, li, tables),
                    _gather_stacked(pv_all, li, tables), positions)
            out_carry = (pk_all, pv_all)
        x = x + linear(att.reshape(B, 1, H * D), w["wo"])
        h2 = rms_norm(x, w["ffn_norm"], cfg.norm_eps)
        x = x + swiglu(h2, w["w_gate"], w["w_up"], w["w_down"])
        return (x,) + out_carry + (li + 1,), None

    if quantized:
        init = (x, pool.k, pool.v, pool.k_scale, pool.v_scale, jnp.int32(0))
        (x, pk_new, pv_new, pks_new, pvs_new, _), _ = lax.scan(
            block_carried, init, params.layers)
        new_pool = PagedKVPool(k=pk_new, v=pv_new,
                               k_scale=pks_new, v_scale=pvs_new)
    else:
        (x, pk_new, pv_new, _), _ = lax.scan(
            block_carried, (x, pool.k, pool.v, jnp.int32(0)), params.layers)
        new_pool = PagedKVPool(k=pk_new, v=pv_new)
    x = rms_norm(x, params.norm, cfg.norm_eps)
    logits = linear(x[:, 0], params.output, out_dtype=jnp.float32)  # [B, vocab]
    return logits, new_pool


def paged_decode_step_spec(
    params: LlamaParams,
    cfg: ModelArgs,
    tokens: jnp.ndarray,      # int32 [B, K+1]: per-row feed token + K drafts
    positions: jnp.ndarray,   # int32 [B] — position of each row's FEED token
    pool: PagedKVPool,
    tables: jnp.ndarray,      # int32 [B, max_blocks]
) -> Tuple[jnp.ndarray, PagedKVPool]:
    """Speculative verification step over paged caches: row j of slot b
    runs at position ``positions[b] + j``. Returns the greedy argmax of
    EVERY row (``[B, K+1]`` — the verification chain) and the updated pool.

    The scheduler must back positions ``pos .. pos+K`` with allocated
    blocks for every ACTIVE slot before calling (it clamps the draft count
    otherwise); free slots' tables point at the trash block. Rejected
    rows' K/V writes land beyond the accepted point and are invisible
    until overwritten — the identical staleness argument as the dense
    batcher's ``_decode_step_spec``. Always the XLA gather path (the paged
    Pallas kernel is S=1-shaped)."""
    B, S = tokens.shape
    H, KV, D = cfg.n_heads, cfg.kv_heads, cfg.head_dim
    bs = pool.block_size
    quantized = pool.quantized
    max_pos = tables.shape[1] * bs - 1

    x = jnp.take(params.tok_embeddings, tokens, axis=0)        # [B, S, dim]
    pos_rows = jnp.minimum(
        positions[:, None] + jnp.arange(S, dtype=jnp.int32)[None, :],
        max_pos)                                               # [B, S]
    cos = jnp.take(params.rope_cos, pos_rows, axis=0)          # [B, S, D/2]
    sin = jnp.take(params.rope_sin, pos_rows, axis=0)
    blocks_bj = jnp.take_along_axis(tables, pos_rows // bs, axis=1)  # [B, S]
    offsets_bj = pos_rows % bs

    def block_carried(carry, w):
        if quantized:
            x, pk_all, pv_all, pks_all, pvs_all, li = carry
        else:
            x, pk_all, pv_all, li = carry
        h = rms_norm(x, w["attn_norm"], cfg.norm_eps)
        q = linear(h, w["wq"]).reshape(B, S, H, D)
        k = linear(h, w["wk"]).reshape(B, S, KV, D)
        v = linear(h, w["wv"]).reshape(B, S, KV, D)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

        def write_l(buf, rows):
            # rows [B, S, KV(, D)] -> buf [L, n_blocks, KV, bs(, D)] at
            # (li, blocks_bj[b, j], 0, offsets_bj[b, j]); unrolled B*S
            # in-place updates (see paged_decode_step's write_l)
            vec = rows.ndim == 4
            for b in range(B):
                for j in range(S):
                    upd = (rows[b, j][None, None, :, None, :] if vec
                           else rows[b, j][None, None, :, None])
                    start = ((li, blocks_bj[b, j], 0, offsets_bj[b, j])
                             + ((0,) if vec else ()))
                    buf = lax.dynamic_update_slice(
                        buf, upd.astype(buf.dtype), start)
            return buf

        if quantized:
            kq, ks = quantize_kv_rows(k)                       # [B,S,KV,D]
            vq, vs = quantize_kv_rows(v)
            pk_all = write_l(pk_all, kq)
            pv_all = write_l(pv_all, vq)
            pks_all = write_l(pks_all, ks)
            pvs_all = write_l(pvs_all, vs)
            att = _dense_from_gathered(
                q, _gather_stacked(pk_all, li, tables),
                _gather_stacked(pv_all, li, tables), positions,
                _gather_stacked(pks_all, li, tables),
                _gather_stacked(pvs_all, li, tables))
            out_carry = (pk_all, pv_all, pks_all, pvs_all)
        else:
            pk_all = write_l(pk_all, k)
            pv_all = write_l(pv_all, v)
            att = _dense_from_gathered(
                q, _gather_stacked(pk_all, li, tables),
                _gather_stacked(pv_all, li, tables), positions)
            out_carry = (pk_all, pv_all)
        x = x + linear(att.reshape(B, S, H * D), w["wo"])
        h2 = rms_norm(x, w["ffn_norm"], cfg.norm_eps)
        x = x + swiglu(h2, w["w_gate"], w["w_up"], w["w_down"])
        return (x,) + out_carry + (li + 1,), None

    if quantized:
        init = (x, pool.k, pool.v, pool.k_scale, pool.v_scale, jnp.int32(0))
        (x, pk_new, pv_new, pks_new, pvs_new, _), _ = lax.scan(
            block_carried, init, params.layers)
        new_pool = PagedKVPool(k=pk_new, v=pv_new,
                               k_scale=pks_new, v_scale=pvs_new)
    else:
        (x, pk_new, pv_new, _), _ = lax.scan(
            block_carried, (x, pool.k, pool.v, jnp.int32(0)), params.layers)
        new_pool = PagedKVPool(k=pk_new, v=pv_new)
    x = rms_norm(x, params.norm, cfg.norm_eps)
    logits = linear(x, params.output, out_dtype=jnp.float32)   # [B, S, vocab]
    return logits, new_pool


def paged_prefill(
    params: LlamaParams,
    cfg: ModelArgs,
    tokens: jnp.ndarray,      # int32 [1, S], S % block_size == 0 (padded)
    logits_at,                # traced int32: prompt's last real row
    pool: PagedKVPool,
    table_row: jnp.ndarray,   # int32 [max_blocks] — this request's blocks
) -> Tuple[jnp.ndarray, PagedKVPool]:
    """Prefill a fresh request (positions 0..S-1) into its pool blocks.

    Never reads the pool: prompt self-attention runs on the just-projected
    k/v with a causal mask. Returns (logits [1, vocab] at ``logits_at``,
    updated pool). Padded tail rows land in trash or are overwritten by
    later decode writes before any visible query can attend them.
    """
    B, S = tokens.shape
    if B != 1:
        raise ValueError("paged_prefill handles one request at a time")
    if S % pool.block_size:
        raise ValueError(f"prefill length {S} must be a multiple of the "
                         f"block size {pool.block_size}")
    H, KV, D = cfg.n_heads, cfg.kv_heads, cfg.head_dim

    x = jnp.take(params.tok_embeddings, tokens, axis=0)
    cos = params.rope_cos[:S][None]                            # [1, S, D/2]
    sin = params.rope_sin[:S][None]
    rows = lax.broadcasted_iota(jnp.int32, (S, S), 0)
    cols = lax.broadcasted_iota(jnp.int32, (S, S), 1)
    mask = jnp.where(cols <= rows, 0.0, -jnp.inf).astype(jnp.float32)[None]

    quantized = pool.quantized

    def block_fn(x, scanned):
        if quantized:
            w, pk, pv, pks, pvs = scanned
        else:
            w, pk, pv = scanned
        h = rms_norm(x, w["attn_norm"], cfg.norm_eps)
        q = linear(h, w["wq"]).reshape(B, S, H, D)
        k = linear(h, w["wk"]).reshape(B, S, KV, D)
        v = linear(h, w["wv"]).reshape(B, S, KV, D)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin).transpose(0, 2, 1, 3)      # [1, KV, S, D]
        v = v.transpose(0, 2, 1, 3)
        if quantized:
            kq, ks = quantize_kv_rows(k)                       # [1,KV,S,*]
            vq, vs = quantize_kv_rows(v)
            pk = _write_chunks(pk, kq, table_row)
            pv = _write_chunks(pv, vq, table_row)
            pks = _write_chunks(pks, ks, table_row)
            pvs = _write_chunks(pvs, vs, table_row)
            carry = (pk, pv, pks, pvs)
            # attend the DEQUANTIZED rows — the dense int8 cache's prefill
            # attention reads back the cache it just wrote, so the paged
            # pool must see the same quantization error to stay token-exact
            # with it (prefill still never reads the pool itself)
            k = kq.astype(jnp.bfloat16) * ks[..., None].astype(jnp.bfloat16)
            v = vq.astype(jnp.bfloat16) * vs[..., None].astype(jnp.bfloat16)
        else:
            pk = _write_chunks(pk, k, table_row)
            pv = _write_chunks(pv, v, table_row)
            carry = (pk, pv)
        att = gqa_attention(q, k, v, mask)
        x = x + linear(att.reshape(B, S, H * D), w["wo"])
        h2 = rms_norm(x, w["ffn_norm"], cfg.norm_eps)
        x = x + swiglu(h2, w["w_gate"], w["w_up"], w["w_down"])
        return x, carry

    if quantized:
        xs = (params.layers, pool.k, pool.v, pool.k_scale, pool.v_scale)
        x, (pk_new, pv_new, pks_new, pvs_new) = lax.scan(block_fn, x, xs)
        new_pool = PagedKVPool(k=pk_new, v=pv_new,
                               k_scale=pks_new, v_scale=pvs_new)
    else:
        x, (pk_new, pv_new) = lax.scan(block_fn, x, (params.layers, pool.k, pool.v))
        new_pool = PagedKVPool(k=pk_new, v=pv_new)
    x = lax.dynamic_slice_in_dim(x, logits_at, 1, axis=1)      # [1, 1, dim]
    x = rms_norm(x, params.norm, cfg.norm_eps)
    logits = linear(x[:, 0], params.output, out_dtype=jnp.float32)
    return logits, new_pool
