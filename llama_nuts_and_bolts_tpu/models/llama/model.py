"""Functional Llama transformer: pure forward pass over a params pytree.

Capability parity with the reference's LlamaTransformer (reference:
src/model/llamatransformer.go:16-660) rebuilt TPU-first:

  * per-layer weights are STACKED along a leading layer axis and the block
    loop is a ``lax.scan`` — one traced block, compiled once, instead of the
    reference's 32 sequential Go object calls;
  * the KV cache is an explicit pytree threaded through the scan (the
    reference mutates InferenceContext state, src/model/inferencecontext.go);
  * GQA never materializes repeat-KV (ops/attention.py);
  * one additive mask covers prefill and decode: cache slot ``t`` is visible
    to query row ``s`` iff ``t <= start_pos + s`` — this is both the causal
    mask the reference builds for seqlen>1 (llamatransformer.go:115-143) and
    the cache-length bound it gets by slicing the cache (…go:409-416);
  * numerics: bf16 weights/activations, fp32 matmul accumulation, fp32
    norm statistics and softmax, fp32 logits — same precision story as the
    reference, with a max-subtracted (stable) softmax instead of its raw one.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import struct
from jax import lax

from llama_nuts_and_bolts_tpu.io.params import ModelArgs
from llama_nuts_and_bolts_tpu.models.llama.rope import apply_rope, precompute_rope_tables
from llama_nuts_and_bolts_tpu.ops import (
    gqa_attention,
    linear,
    linear_t,
    rms_norm,
    swiglu,
)


@struct.dataclass
class LlamaParams:
    """Weights pytree. ``layers`` holds arrays stacked to ``[n_layers, ...]``;
    ``rope_cos/rope_sin`` are the precomputed fp32 tables (device-resident)."""

    tok_embeddings: jnp.ndarray        # [vocab, dim] bf16
    layers: Dict[str, jnp.ndarray]     # each [L, ...] bf16
    norm: jnp.ndarray                  # [dim] bf16
    output: jnp.ndarray                # [vocab, dim] bf16
    rope_cos: jnp.ndarray              # [2*max_seq, head_dim//2] fp32
    rope_sin: jnp.ndarray              # [2*max_seq, head_dim//2] fp32


@struct.dataclass
class KVCache:
    """Preallocated cache: k/v of shape [n_layers, batch, kv_heads, max_seq, head_dim].

    kv-heads-major layout: per-head key/value rows are contiguous, which is
    what both the XLA attention einsum and the Pallas flash kernel's
    (batch, kv_head) grid programs want to stream.

    ``dtype=jnp.int8`` stores K/V rows quantized per (position, head) with
    bf16 scales (``k_scale/v_scale`` [L, B, KV, T]): halves the cache's HBM
    traffic — which dominates long-context decode — and doubles the context
    that fits. Rows are quantized once on write, never re-quantized, so
    there is no error accumulation; the dequantize fuses into the attention
    einsum's operand read.
    """

    k: jnp.ndarray
    v: jnp.ndarray
    k_scale: Any = None     # bf16 [L, B, KV, T] iff k.dtype == int8
    v_scale: Any = None

    @classmethod
    def create(cls, cfg: ModelArgs, batch: int, max_seq: int,
               dtype=jnp.bfloat16) -> "KVCache":
        shape = (cfg.n_layers, batch, cfg.kv_heads, max_seq, cfg.head_dim)
        if dtype == jnp.int8:
            return cls(k=jnp.zeros(shape, jnp.int8), v=jnp.zeros(shape, jnp.int8),
                       k_scale=jnp.zeros(shape[:-1], jnp.bfloat16),
                       v_scale=jnp.zeros(shape[:-1], jnp.bfloat16))
        return cls(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype))

    def truncated(self, max_seq: int) -> "KVCache":
        """An independent copy of the first ``max_seq`` positions (a full
        copy when the buffer is already no longer). Used when a prefix-cache
        snapshot (sized at the engine context) seeds a request whose cache
        bucket is smaller — the copy keeps the snapshot immutable against
        the decode loop's donation."""
        if max_seq >= self.max_seq:
            return jax.tree_util.tree_map(jnp.copy, self)
        k = jnp.copy(self.k[:, :, :, :max_seq, :])
        v = jnp.copy(self.v[:, :, :, :max_seq, :])
        if self.k_scale is None:
            return KVCache(k=k, v=v)
        return KVCache(k=k, v=v,
                       k_scale=jnp.copy(self.k_scale[..., :max_seq]),
                       v_scale=jnp.copy(self.v_scale[..., :max_seq]))

    @property
    def max_seq(self) -> int:
        return self.k.shape[3]

    @property
    def quantized(self) -> bool:
        return self.k.dtype == jnp.int8


def quantize_kv_rows(rows: jnp.ndarray):
    """Per-(…, position) symmetric int8 over the head dim: returns
    (int8 rows, bf16 scales with the last axis dropped). Shared by the dense
    int8 KV cache and the paged int8 pool so both store identical values."""
    s = jnp.maximum(jnp.max(jnp.abs(rows.astype(jnp.float32)), axis=-1),
                    1e-8) / 127.0
    qr = jnp.clip(jnp.round(rows.astype(jnp.float32) / s[..., None]),
                  -127, 127).astype(jnp.int8)
    return qr, s.astype(jnp.bfloat16)


def attention_mask(seq_len: int, cache_len: int, start_pos) -> jnp.ndarray:
    """Additive fp32 mask [seq_len, cache_len]: 0 where visible, -inf where not."""
    rows = lax.broadcasted_iota(jnp.int32, (seq_len, cache_len), 0)
    cols = lax.broadcasted_iota(jnp.int32, (seq_len, cache_len), 1)
    visible = cols <= rows + start_pos
    return jnp.where(visible, 0.0, -jnp.inf).astype(jnp.float32)


def attention_mask_per_row(seq_len: int, cache_len: int,
                           start_pos: jnp.ndarray) -> jnp.ndarray:
    """Per-row variant for vector ``start_pos[B]`` (continuous batching):
    [B, seq_len, cache_len], row b sees cache slot t iff t <= start_pos[b]+s."""
    rows = lax.broadcasted_iota(jnp.int32, (1, seq_len, cache_len), 1)
    cols = lax.broadcasted_iota(jnp.int32, (1, seq_len, cache_len), 2)
    visible = cols <= rows + start_pos[:, None, None]
    return jnp.where(visible, 0.0, -jnp.inf).astype(jnp.float32)


def forward(
    params: LlamaParams,
    cfg: ModelArgs,
    tokens: jnp.ndarray,      # int32 [B, S]
    start_pos,                # traced int32 scalar, or [B] vector (per-row)
    cache: KVCache,
    attn_impl: str = "xla",   # "xla" | "flash" (Pallas) | "ring" (seq-parallel)
    logits_at=None,           # traced row index: project only this position
    mesh=None,                # jax.sharding.Mesh: flash kernels via shard_map
) -> Tuple[jnp.ndarray, KVCache]:
    """One forward pass (prefill when S>1, decode step when S==1).

    Returns fp32 logits ``[B, S, vocab]`` and the updated cache. When
    ``logits_at`` is given, only that sequence position is projected through
    the vocab head (returns ``[B, 1, vocab]``) — prefill only ever consumes
    one row, and the full-S projection is ~9% of prefill FLOPs at S=1024.

    ``start_pos`` may be a [B] vector: every batch row runs at its own
    position (continuous batching, runtime/continuous.py) — RoPE rows are
    gathered per row, the mask is per-row, and cache updates land at per-row
    offsets. Vector mode supports the XLA path (any S) and the flash decode
    kernel (S=1, its grid takes per-row positions as prefetch scalars).
    """
    B, S = tokens.shape
    H, KV, D = cfg.n_heads, cfg.kv_heads, cfg.head_dim
    T = cache.max_seq
    per_row = getattr(start_pos, "ndim", 0) == 1
    flashy = attn_impl in ("flash", "flash_folded")
    if per_row and attn_impl != "xla" and not (flashy and S == 1):
        raise ValueError("vector start_pos requires attn_impl='xla' "
                         "(or 'flash'/'flash_folded' at S=1)")
    if attn_impl == "flash_folded" and S != 1:
        raise ValueError("attn_impl='flash_folded' is the folded-heads "
                         "DECODE kernel (S=1); use 'flash' for prefill")
    if attn_impl == "ring" and (mesh is None or S == 1):
        raise ValueError("attn_impl='ring' is the sequence-parallel PREFILL "
                         "path: needs a mesh with an sp axis and S > 1")

    x = jnp.take(params.tok_embeddings, tokens, axis=0)          # [B,S,dim] bf16
    if per_row:
        pos = start_pos[:, None] + jnp.arange(S, dtype=jnp.int32)[None, :]
        cos = jnp.take(params.rope_cos, pos, axis=0)              # [B,S,D/2]
        sin = jnp.take(params.rope_sin, pos, axis=0)
    else:
        cos = lax.dynamic_slice_in_dim(params.rope_cos, start_pos, S, 0)
        sin = lax.dynamic_slice_in_dim(params.rope_sin, start_pos, S, 0)
    mask = None
    if attn_impl == "xla":
        if per_row:
            mask = attention_mask_per_row(S, T, start_pos)        # [B,S,T]
        else:
            mask = attention_mask(S, T, start_pos)[None, :, :]    # [1,S,T]

    def attend(q, ck, cv, cks=None, cvs=None, layer=None):
        """``layer`` (decode only): ck/cv are the WHOLE stacked cache and
        the flash kernel indexes the layer itself via a prefetch scalar —
        slicing the layer out first would make XLA materialize a full
        [B, KV, T, D] copy per step as the pallas operand."""
        if flashy:
            # decode (S=1) prefers LARGE cache tiles: fewer grid steps mean
            # less per-tile fixed cost, and a [2048, 128] bf16 tile is only
            # 512 KB of VMEM — measured 0.174 (XLA) / 0.133 (bk512) / 0.096
            # (bk2048) ms per 8K attention call on v5e. Prefill keeps
            # smaller tiles (its VMEM also holds q/o blocks).
            sizes = (2048, 1024, 512, 256, 128) if S == 1 else (512, 256, 128)
            block_k = next((b for b in sizes if T % b == 0), T)
            if S == 1 and block_k == T and T > 2048:
                # no block size divides this buffer: one whole-buffer tile
                # would blow VMEM past ~8K and defeat the tiling either way
                raise ValueError(
                    f"flash decode needs a cache length divisible by 128 "
                    f"(got {T}); use attn_impl='xla' or a padded buffer")
            if mesh is not None:
                # GSPMD cannot partition pallas_call: on a tp mesh the kernel
                # runs head-local inside shard_map (parallel/kernel_shard.py)
                from llama_nuts_and_bolts_tpu.parallel.kernel_shard import (
                    tp_flash_decode_attention,
                    tp_flash_gqa_attention,
                )

                if S == 1:
                    return tp_flash_decode_attention(
                        mesh, q, ck, cv, start_pos, k_scale=cks, v_scale=cvs,
                        block_k=block_k, layer=layer,
                        fold_heads=fold, int8_mxu=quantized)
                return tp_flash_gqa_attention(mesh, q, ck, cv, start_pos,
                                              block_k=block_k)
            if S == 1:
                from llama_nuts_and_bolts_tpu.kernels.decode_attention import (
                    flash_decode_attention,
                )

                # int8 caches default to the folded-heads int8xint8-MXU
                # kernel: per-position scales fold into the small score/
                # prob matrices, so no tile is ever dequantized
                # elementwise (measured +19.5% at B=4/8K, docs/07).
                # "flash_folded" opts a bf16 cache into the folded-heads
                # variant too: one grid program per cache tile serves all
                # KV heads, amortizing per-program fixed cost 8x — the
                # same argument that won for int8, now selectable for
                # batched bf16 decode (A/B in bench.py stage "kern").
                return flash_decode_attention(q, ck, cv, start_pos,
                                              k_scale=cks, v_scale=cvs,
                                              block_k=block_k, layer=layer,
                                              fold_heads=fold,
                                              int8_mxu=quantized)
            from llama_nuts_and_bolts_tpu.kernels.attention import flash_gqa_attention

            return flash_gqa_attention(q, ck, cv, start_pos, block_k=block_k)
        if cks is not None:
            # XLA path: dequantize before the einsum (materializes; the flash
            # decode kernel is the traffic-optimal path for int8 caches)
            ck = ck.astype(jnp.bfloat16) * cks[..., None].astype(jnp.bfloat16)
            cv = cv.astype(jnp.bfloat16) * cvs[..., None].astype(jnp.bfloat16)
        return gqa_attention(q, ck, cv, mask)

    quantized = cache.quantized
    fold = quantized or attn_impl == "flash_folded"
    if quantized and attn_impl == "flash" and S != 1:
        raise ValueError(
            "int8 KV cache + flash is decode-only (S=1); use attn_impl='xla' "
            "for prefill (compute-bound, dequant materialization is fine)")

    # decode-optimized fused layout (fuse_decode_params): qkv and gate+up are
    # single [in, out] matmuls — fewer, longer HBM streams per block
    fused = "wqkv" in params.layers

    def project_qkv(x, w):
        h = rms_norm(x, w["attn_norm"], cfg.norm_eps)
        if fused:
            qkv = linear_t(h, w["wqkv"])
            q = qkv[..., : H * D].reshape(B, S, H, D)
            k = qkv[..., H * D:(H + KV) * D].reshape(B, S, KV, D)
            v = qkv[..., (H + KV) * D:].reshape(B, S, KV, D)
        else:
            q = linear(h, w["wq"]).reshape(B, S, H, D)
            k = linear(h, w["wk"]).reshape(B, S, KV, D)
            v = linear(h, w["wv"]).reshape(B, S, KV, D)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin).transpose(0, 2, 1, 3)         # [B,KV,S,D]
        v = v.transpose(0, 2, 1, 3)
        return q, k, v

    def ring_attention(q, k, v):
        # sequence-parallel exact prefill attention over the CURRENT
        # segment (whole-prompt prefill: no prior cache content). K/V
        # still land in the cache for the decode steps that follow.
        from llama_nuts_and_bolts_tpu.parallel.ring_attention import (
            ring_gqa_attention,
        )

        return ring_gqa_attention(mesh, q, k, v, start_pos)

    def finish_block(x, att, w):
        if fused:
            x = x + linear_t(att.reshape(B, S, H * D), w["wo"])
            h2 = rms_norm(x, w["ffn_norm"], cfg.norm_eps)
            gu = linear_t(h2, w["w_gate_up"])
            F = cfg.ffn_hidden_dim
            gate, up = gu[..., :F], gu[..., F:]
            act = jax.nn.silu(gate.astype(jnp.float32)).astype(gu.dtype) * up
            return x + linear_t(act, w["w_down"])
        x = x + linear(att.reshape(B, S, H * D), w["wo"])
        h2 = rms_norm(x, w["ffn_norm"], cfg.norm_eps)
        return x + swiglu(h2, w["w_gate"], w["w_up"], w["w_down"])

    def block_carried(carry, w):
        """The WHOLE cache rides the scan carry and only the S new rows are
        written per layer (in place — XLA aliases loop carries). An earlier
        xs/ys formulation instead re-materialized every layer's full
        [B, KV, T, D] K and V into stacked ys each step — measured
        ~0.21 ms/layer of pure copy traffic at an 8K buffer
        (docs/07-PERFORMANCE.md), which made decode cost track the cache
        BUFFER size rather than the attended length. Vector ``start_pos``
        (continuous batching) writes per-row offsets via a vmapped update
        on the same carried buffer, so the serving path shares the
        no-copy property."""
        if quantized:
            x, ck_all, cv_all, cks_all, cvs_all, li = carry
        else:
            x, ck_all, cv_all, li = carry
        q, k, v = project_qkv(x, w)
        if attn_impl == "ring":
            att_ring = ring_attention(q, k, v)

        def write_rows(buf, rows):
            # rows [B,KV,S,...] -> buf [L,B,KV,T,...] at (li, 0|b, 0, pos, 0)
            pad = (0,) * (rows.ndim - 3)
            if per_row:
                # per-row offsets as B unrolled updates (B = the slot count,
                # static): each dynamic_update_slice aliases the carried
                # buffer in place, like the scalar path. (A vmapped DUS over
                # the batch axis instead makes XLA materialize full cache
                # copies inside the loop — measured 2x1GB HLO temps at an
                # 8K buffer.)
                rows = rows.astype(buf.dtype)
                for b in range(rows.shape[0]):
                    buf = lax.dynamic_update_slice(
                        buf, rows[b][None, None],
                        (li, b, 0, start_pos[b]) + pad)
                return buf
            return lax.dynamic_update_slice(
                buf, rows[None].astype(buf.dtype), (li, 0, 0, start_pos) + pad)

        # flash decode reads its tiles straight from the stacked buffers
        # (layer picked by a prefetch scalar); every other impl gets the
        # layer sliced out, which the XLA einsum fuses into its operand read
        stacked = attn_impl == "flash" and S == 1

        def layer_of(buf):
            return buf if stacked else lax.dynamic_index_in_dim(
                buf, li, 0, keepdims=False)

        lkw = {"layer": li} if stacked else {}
        if quantized:
            kq, ks = quantize_kv_rows(k)
            vq, vs = quantize_kv_rows(v)
            ck_all = write_rows(ck_all, kq)
            cv_all = write_rows(cv_all, vq)
            cks_all = write_rows(cks_all, ks)
            cvs_all = write_rows(cvs_all, vs)
            att = att_ring if attn_impl == "ring" else attend(
                q, layer_of(ck_all), layer_of(cv_all),
                layer_of(cks_all), layer_of(cvs_all), **lkw)
            new_carry = (finish_block(x, att, w), ck_all, cv_all,
                         cks_all, cvs_all, li + 1)
        else:
            ck_all = write_rows(ck_all, k)
            cv_all = write_rows(cv_all, v)
            att = att_ring if attn_impl == "ring" else attend(
                q, layer_of(ck_all), layer_of(cv_all), **lkw)
            new_carry = (finish_block(x, att, w), ck_all, cv_all, li + 1)
        return new_carry, None

    if quantized:
        init = (x, cache.k, cache.v, cache.k_scale, cache.v_scale,
                jnp.int32(0))
        (x, ck_new, cv_new, cks_new, cvs_new, _), _ = lax.scan(
            block_carried, init, params.layers)
        new_cache = KVCache(k=ck_new, v=cv_new,
                            k_scale=cks_new, v_scale=cvs_new)
    else:
        (x, ck_new, cv_new, _), _ = lax.scan(
            block_carried, (x, cache.k, cache.v, jnp.int32(0)), params.layers)
        new_cache = KVCache(k=ck_new, v=cv_new)
    if logits_at is not None:
        x = lax.dynamic_slice_in_dim(x, logits_at, 1, axis=1)     # [B,1,dim]
    x = rms_norm(x, params.norm, cfg.norm_eps)
    if fused:   # fused layout also transposes the head to [dim, vocab]
        logits = linear_t(x, params.output, out_dtype=jnp.float32)
    else:
        logits = linear(x, params.output, out_dtype=jnp.float32)  # [B,S|1,vocab]
    return logits, new_cache


# --------------------------------------------------------------------------
# weight layout spec shared by the loader and random init


def layer_weight_shapes(cfg: ModelArgs) -> Dict[str, Tuple[int, ...]]:
    d, f = cfg.dim, cfg.ffn_hidden_dim
    return {
        "attn_norm": (d,),
        "ffn_norm": (d,),
        "wq": (cfg.n_heads * cfg.head_dim, d),
        "wk": (cfg.kv_heads * cfg.head_dim, d),
        "wv": (cfg.kv_heads * cfg.head_dim, d),
        "wo": (d, cfg.n_heads * cfg.head_dim),
        "w_gate": (f, d),
        "w_up": (f, d),
        "w_down": (d, f),
    }


def fused_layer_weight_shapes(cfg: ModelArgs) -> Dict[str, Tuple[int, ...]]:
    """Decode-optimized fused layout: qkv and gate+up concatenated along the
    OUT dim, every matmul weight stored TRANSPOSED ``[in, out]``. Measured on
    v5e b=1 decode: fusing + transposing streams ~3.5% more HBM bandwidth
    than the checkpoint layout (docs/07-PERFORMANCE.md §roofline)."""
    d, f = cfg.dim, cfg.ffn_hidden_dim
    qkv_out = (cfg.n_heads + 2 * cfg.kv_heads) * cfg.head_dim
    return {
        "attn_norm": (d,),
        "ffn_norm": (d,),
        "wqkv": (d, qkv_out),
        "wo": (cfg.n_heads * cfg.head_dim, d),
        "w_gate_up": (d, 2 * f),
        "w_down": (f, d),
    }


def fuse_decode_params(params: LlamaParams) -> LlamaParams:
    """Repack canonical checkpoint-layout params into the fused decode layout
    (see fused_layer_weight_shapes). Device-side transform: suitable for
    models that leave transient headroom (the loader fuses HOST-side for big
    checkpoints). Quantized or already-fused params are rejected."""
    lw = params.layers
    if "wqkv" in lw:
        return params
    if any(hasattr(w, "q") or hasattr(w, "packed") or hasattr(w, "w4")
           for w in lw.values()):
        raise ValueError("fuse_decode_params supports plain (bf16) weights only")
    t = lambda a: jnp.swapaxes(a, 1, 2)
    layers = {
        "attn_norm": lw["attn_norm"],
        "ffn_norm": lw["ffn_norm"],
        "wqkv": t(jnp.concatenate([lw["wq"], lw["wk"], lw["wv"]], axis=1)),
        "wo": t(lw["wo"]),
        "w_gate_up": t(jnp.concatenate([lw["w_gate"], lw["w_up"]], axis=1)),
        "w_down": t(lw["w_down"]),
    }
    return LlamaParams(
        tok_embeddings=params.tok_embeddings,
        layers=layers,
        norm=params.norm,
        output=params.output.T,
        rope_cos=params.rope_cos,
        rope_sin=params.rope_sin,
    )


def init_random_params(cfg: ModelArgs, key: jax.Array,
                       dtype=jnp.bfloat16, fused: bool = False) -> LlamaParams:
    """Random-initialized params with the checkpoint's shapes (tests/bench).
    ``fused=True`` generates the decode-optimized fused layout directly —
    no transient duplicate on device (a 24-layer 8B-architecture stack plus
    its fused copy would not fit one 16 GB chip)."""
    keys = iter(jax.random.split(key, 16))
    scale = 1.0 / math.sqrt(cfg.dim)

    def rand(shape):
        return (jax.random.normal(next(keys), shape, jnp.float32) * scale).astype(dtype)

    L = cfg.n_layers
    shapes = fused_layer_weight_shapes(cfg) if fused else layer_weight_shapes(cfg)
    layers = {}
    for name, shape in shapes.items():
        if name.endswith("norm"):
            layers[name] = jnp.ones((L,) + shape, dtype)
        else:
            layers[name] = rand((L,) + shape)
    cos, sin = precompute_rope_tables(
        cfg.head_dim, 2 * cfg.max_sequence_length, cfg.rope_theta, cfg.use_scaled_rope,
        cfg.rope_scale_factor, cfg.rope_high_freq_factor
    )
    out_shape = ((cfg.dim, cfg.vocab_size) if fused
                 else (cfg.vocab_size, cfg.dim))
    return LlamaParams(
        tok_embeddings=rand((cfg.vocab_size, cfg.dim)),
        layers=layers,
        norm=jnp.ones((cfg.dim,), dtype),
        output=rand(out_shape),
        rope_cos=jnp.asarray(cos),
        rope_sin=jnp.asarray(sin),
    )
