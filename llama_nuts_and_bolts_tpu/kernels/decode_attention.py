"""Fused GQA decode-attention Pallas kernel (S=1), bf16 or int8 KV cache.

Long-context decode is dominated by streaming the KV cache; at 8K context the
cache read rivals the weight read. Two problems with the XLA path: (1) an
int8 cache's dequantize (convert + per-row scale) does NOT fuse into the
attention einsum — XLA materializes the dequantized bf16 cache in HBM every
step, making int8 SLOWER than bf16 (measured 40 vs 46 tok/s at 8K); (2) the
separate QKᵀ/softmax/PV ops bounce [1, T] intermediates. This kernel streams
each KV head's cache through VMEM once, dequantizing int8 tiles in-register,
with a flash-style online softmax — cache bytes are the only HBM traffic, so
an int8 cache halves the CACHE read. Honesty note (measured, docs/08): at
small batch the cache is a minority of step traffic (weights dominate) and
the quant math costs a few percent, so int8 KV decodes ~3-7% SLOWER than
bf16 through this kernel at b<=4/8K; its real, measured value is CAPACITY —
2x the context x batch per chip. Pick int8 KV to fit, not to speed up.

Grid: (batch, kv_head). Each program owns the G = H/KV query rows that share
its KV head (folded into the MXU row dim — GQA never materializes repeat-KV,
same as kernels/attention.py) and loops over block_k cache tiles up to the
current position (prefetched scalar), masking slots beyond it.

Capability anchor: the reference's attention pipeline
(src/model/llamatransformer.go:289-527) at decode shapes.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from llama_nuts_and_bolts_tpu.kernels.quant_attn_math import (
    int8_pv,
    int8_scores,
    quantize_q_rows,
)

NEG_INF = -1e30


def _decode_kernel_blocked(start_pos_ref, layer_ref, q_ref, k_ref, v_ref,
                           ks_ref, vs_ref, o_ref, acc_ref, m_ref, l_ref,
                           *, block_k: int, groups: int, head_dim: int,
                           scale: float, quantized: bool, nkb: int):
    """One grid step = one block_k cache tile of one (batch, kv_head).

    The k-tile axis is the innermost grid dimension, so each tile's DMA
    overlaps the previous tile's compute (the whole-head variant below DMAs
    the full [T, D] head before computing), and the index map re-targets
    every INVISIBLE tile (beyond start_pos) to the LAST VISIBLE block —
    Pallas skips the DMA for a repeated index, so masked cache slots are
    never read and the step's HBM traffic is ∝ position, not buffer size.
    Online-softmax state lives in VMEM scratch across the tile iterations.

    ``start_pos`` is a [B] prefetch-scalar vector — each batch row attends
    up to its OWN position (continuous batching; a single-request decode
    just broadcasts its scalar). ``layer`` is a second prefetch scalar
    selecting the layer block of a STACKED [L, B, KV, T, D] cache: inside
    the per-layer scan the kernel reads its tiles straight out of the whole
    cache buffer, where slicing the layer first (dynamic_index_in_dim)
    would make XLA materialize a full [B, KV, T, D] copy per step just to
    have a contiguous pallas operand (the attention einsum fuses that slice;
    a pallas_call cannot)."""
    del layer_ref  # consumed by the index maps only
    start_pos = start_pos_ref[pl.program_id(0)]
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    @pl.when(kb * block_k <= start_pos)
    def _compute():
        q = q_ref[0, 0].reshape(groups, head_dim)

        def tile(ref, s_ref):
            t = ref[0, 0, 0]
            if quantized:
                # dequantize on the bf16 VPU path: int8 values (7 bits) and
                # bf16 scales are exactly representable, so f32 math only
                # cost throughput. The minor-dim reshape must happen in f32
                # (Mosaic: non-no-op minor-dim insertion is 32-bit only).
                s = s_ref[0, 0, 0, 0].astype(jnp.float32)
                s = s.reshape(block_k, 1).astype(jnp.bfloat16)
                t = t.astype(jnp.bfloat16) * s
            return t                                     # [block_k, D] bf16

        k_tile = tile(k_ref, ks_ref)
        v_tile = tile(v_ref, vs_ref)
        s = lax.dot_general(
            q, k_tile, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale                                        # [G, block_k]
        k_pos = kb * block_k + lax.broadcasted_iota(
            jnp.int32, (groups, block_k), 1)
        s = jnp.where(k_pos <= start_pos, s, NEG_INF)

        m = m_ref[...]
        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        corr = jnp.exp(m - m_new)
        l_ref[...] = l_ref[...] * corr + jnp.sum(p, axis=1, keepdims=True)
        pv = lax.dot_general(
            p.astype(v_tile.dtype), v_tile, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_ref[...] = acc_ref[...] * corr + pv
        m_ref[...] = m_new

    @pl.when(kb == nkb - 1)
    def _fin():
        out = acc_ref[...] / jnp.maximum(l_ref[...], 1e-30)
        o_ref[0, 0] = out.reshape(1, groups, head_dim).astype(o_ref.dtype)


def _decode_kernel_blocked_heads(start_pos_ref, layer_ref, q_ref, k_ref,
                                 v_ref, ks_ref, vs_ref, o_ref,
                                 acc_ref, m_ref, l_ref,
                                 *, block_k: int, kv_heads: int, groups: int,
                                 head_dim: int, scale: float, quantized: bool,
                                 nkb: int, int8_mxu: bool):
    """Folded-heads variant: grid (batch, k_tile) — ONE program per cache
    tile serves ALL KV heads (their tiles arrive in one strided DMA block).
    At batched decode the (B, KV, k_tile) grid's per-program fixed cost
    (index maps, q load, softmax epilogue) dominates; folding the KV axis
    amortizes it 8x for Llama's 8 KV heads. Costs VMEM: the k/v blocks are
    KV x block_k x D, so block_k shrinks vs the per-head kernel.

    ``int8_mxu`` (quantized caches only): keep the int8 cache tiles int8
    all the way into the MXU. The query row is quantized per-row to int8
    (one scale per row), QKᵀ runs as an int8xint8→s32 MXU dot, and ALL
    scales (q rows, per-position k) apply to the small [G, block_k] score
    matrix. For p·V, the per-position v scales fold into p BEFORE p is
    quantized per-row to int8 — so no [block_k, D] tensor is ever
    dequantized elementwise; the VPU only ever touches [G, block_k]
    matrices (64x smaller at Llama shapes)."""
    del layer_ref
    start_pos = start_pos_ref[pl.program_id(0)]
    kb = pl.program_id(1)

    @pl.when(kb == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    @pl.when(kb * block_k <= start_pos)
    def _compute():
        k_pos = kb * block_k + lax.broadcasted_iota(
            jnp.int32, (groups, block_k), 1)
        vis = k_pos <= start_pos
        for h in range(kv_heads):          # static unroll: resident tiles
            q = q_ref[0, 0, h].reshape(groups, head_dim)
            kt = k_ref[0, 0, h]
            vt = v_ref[0, 0, h]
            if quantized and int8_mxu:
                q_i, qs = quantize_q_rows(q)
                ks_row = ks_ref[0, 0, h, 0].astype(jnp.float32)  # [block_k]
                s = int8_scores(q_i, qs, kt, ks_row, scale)
            else:
                if quantized:
                    sk = ks_ref[0, 0, h, 0].astype(jnp.float32)
                    sk = sk.reshape(block_k, 1).astype(jnp.bfloat16)
                    sv = vs_ref[0, 0, h, 0].astype(jnp.float32)
                    sv = sv.reshape(block_k, 1).astype(jnp.bfloat16)
                    kt = kt.astype(jnp.bfloat16) * sk
                    vt = vt.astype(jnp.bfloat16) * sv
                s = lax.dot_general(
                    q, kt, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * scale                                 # [G, block_k]
            s = jnp.where(vis, s, NEG_INF)
            sl = slice(h * groups, (h + 1) * groups)
            m = m_ref[sl, :]
            m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
            p = jnp.exp(s - m_new)
            corr = jnp.exp(m - m_new)
            l_ref[sl, :] = l_ref[sl, :] * corr + jnp.sum(p, axis=1,
                                                         keepdims=True)
            if quantized and int8_mxu:
                vs_row = vs_ref[0, 0, h, 0].astype(jnp.float32)  # [block_k]
                pv = int8_pv(p, vt, vs_row)
            else:
                pv = lax.dot_general(
                    p.astype(vt.dtype), vt, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            acc_ref[sl, :] = acc_ref[sl, :] * corr + pv
            m_ref[sl, :] = m_new

    @pl.when(kb == nkb - 1)
    def _fin():
        out = acc_ref[...] / jnp.maximum(l_ref[...], 1e-30)
        o_ref[0, 0] = out.reshape(kv_heads, groups,
                                  head_dim).astype(o_ref.dtype)


def _decode_kernel(start_pos_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref, o_ref,
                   *, block_k: int, groups: int, head_dim: int, scale: float,
                   quantized: bool):
    start_pos = start_pos_ref[pl.program_id(0)]
    t_total = k_ref.shape[2]

    q = q_ref[0, 0].reshape(groups, head_dim)            # [G, D] bf16

    # stream only the visible tiles: slots [0, start_pos] (the query's own
    # row was written before attention, at start_pos)
    num_k_blocks = lax.min(
        lax.div(start_pos + block_k, block_k),      # ceil((start_pos+1)/bk)
        (t_total + block_k - 1) // block_k,
    )

    def load_tile(ref, s_ref, kb):
        tile = ref[0, 0, pl.ds(kb * block_k, block_k), :]
        if quantized:
            # scales arrive as [1, 1, 1, T] so the block obeys lane tiling
            s = s_ref[0, 0, 0, pl.ds(kb * block_k, block_k)].astype(jnp.float32)
            tile = (tile.astype(jnp.float32) * s.reshape(block_k, 1))
            tile = tile.astype(jnp.bfloat16)
        return tile                                       # [block_k, D] bf16

    def body(kb, carry):
        acc, m, l = carry
        k_tile = load_tile(k_ref, ks_ref, kb)
        v_tile = load_tile(v_ref, vs_ref, kb)
        s = lax.dot_general(
            q, k_tile, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale                                         # [G, block_k]
        k_pos = kb * block_k + lax.broadcasted_iota(
            jnp.int32, (groups, block_k), 1)
        s = jnp.where(k_pos <= start_pos, s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        corr = jnp.exp(m - m_new)
        l_new = l * corr + jnp.sum(p, axis=1, keepdims=True)
        pv = lax.dot_general(
            p.astype(v_tile.dtype), v_tile, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                 # [G, D]
        return acc * corr + pv, m_new, l_new

    acc = jnp.zeros((groups, head_dim), jnp.float32)
    m = jnp.full((groups, 1), NEG_INF, jnp.float32)
    l = jnp.zeros((groups, 1), jnp.float32)
    acc, m, l = lax.fori_loop(0, num_k_blocks, body, (acc, m, l))

    out = acc / jnp.maximum(l, 1e-30)
    o_ref[0, 0] = out.reshape(1, groups, head_dim).astype(o_ref.dtype)


def flash_decode_attention(
    q: jnp.ndarray,        # [B, 1, H, D]
    k: jnp.ndarray,        # [B, KV, T, D] bf16/int8 — or [L, B, KV, T, D] with layer
    v: jnp.ndarray,        # same shape as k
    start_pos,             # int32 scalar, or [B] vector of per-row positions
    k_scale=None,          # [B, KV, T] bf16 when k is int8 ([L, ...] with layer)
    v_scale=None,
    scale: float | None = None,
    block_k: int = 512,
    interpret: bool | None = None,
    blocked: bool = True,
    layer=None,            # traced int32: k/v are the WHOLE stacked cache
    fold_heads: bool = False,  # one program per tile serves ALL KV heads
    int8_mxu: bool = False,    # int8 caches: int8xint8 MXU dots, scales
                               # folded into the small score/prob matrices
) -> jnp.ndarray:
    """Returns [B, 1, H, D] in q.dtype. Each query attends slots ≤ its
    start_pos (which includes its own just-written row); a [B] ``start_pos``
    gives every batch row its own position (continuous batching).

    ``blocked=True`` (default) runs the tiled-grid kernel: per-tile DMA
    overlaps compute and invisible tiles (beyond ``start_pos``) are never
    read from HBM, so a step's cache traffic is proportional to the
    position rather than the buffer size. ``blocked=False`` keeps the
    original whole-head-block kernel.

    ``layer`` (with a stacked [L, B, KV, T, D] cache) makes the kernel
    index the layer via a prefetch scalar instead of the caller slicing it
    out — inside the per-layer scan, ``dynamic_index_in_dim`` would force
    XLA to materialize a full layer copy each step as the pallas operand
    (measured ~2 ms/step at an 8K x B=2 bf16 cache)."""
    if interpret is None:
        # compiled on TPU, interpreter on CPU (CPU-mesh tests)
        interpret = jax.devices()[0].platform == "cpu"

    B, S, H, D = q.shape
    if S != 1:
        raise ValueError("flash_decode_attention is the S=1 kernel")
    if layer is None:
        # lift to a 1-layer stack: same kernel, free reshape
        k, v = k[None], v[None]
        if k_scale is not None:
            k_scale, v_scale = k_scale[None], v_scale[None]
        layer = 0
    elif not blocked:
        raise ValueError("stacked-cache layer mode requires blocked=True")
    L, _, KV, T, _ = k.shape
    G = H // KV
    if scale is None:
        scale = 1.0 / math.sqrt(D)
    quantized = k.dtype == jnp.int8
    block_k = min(block_k, T)
    if T % block_k:
        raise ValueError(f"cache length {T} must be a multiple of block_k={block_k}")

    if not quantized:
        # uniform kernel signature: feed dummy scales (never read)
        k_scale = jnp.zeros((1, B, KV, block_k if blocked else 128),
                            jnp.bfloat16)
        v_scale = k_scale
    s_len = k_scale.shape[3]
    SL = k_scale.shape[0]
    k_scale = k_scale.reshape(SL, B, KV, 1, s_len)
    v_scale = v_scale.reshape(SL, B, KV, 1, s_len)

    qg = q.reshape(B, 1, KV, G, D)
    # prefetch scalars are always a [B] vector; a scalar position broadcasts
    start_arr = jnp.broadcast_to(
        jnp.asarray(start_pos, jnp.int32).reshape(-1), (B,))
    layer_arr = jnp.asarray(layer, jnp.int32).reshape(1)

    if blocked and fold_heads:
        # one program per cache tile serves ALL KV heads; k AND v blocks,
        # each double-buffered, share the 16 MB VMEM with q/o/scratch —
        # bound each block to 2 MB
        per_slot = KV * D * (1 if quantized else 2)
        while block_k * per_slot > 2 * 1024 * 1024 and block_k > 128:
            block_k //= 2
        if T % block_k:
            block_k = next((b for b in (512, 256, 128) if T % b == 0), T)
        nkb = T // block_k
        kernel = functools.partial(
            _decode_kernel_blocked_heads, block_k=block_k, kv_heads=KV,
            groups=G, head_dim=D, scale=scale, quantized=quantized, nkb=nkb,
            int8_mxu=int8_mxu and quantized)

        def kv_index_h(b, kb, sp_ref, li_ref):
            vis = kb * block_k <= sp_ref[b]
            return (li_ref[0], b, 0,
                    jnp.where(vis, kb, sp_ref[b] // block_k), 0)

        def scale_index_h(b, kb, sp_ref, li_ref):
            if not quantized:
                return (0, b, 0, 0, 0)
            vis = kb * block_k <= sp_ref[b]
            return (li_ref[0], b, 0, 0,
                    jnp.where(vis, kb, sp_ref[b] // block_k))

        out = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(B, nkb),
                in_specs=[
                    pl.BlockSpec((1, 1, KV, G, D),
                                 lambda b, kb, sp, li: (b, 0, 0, 0, 0)),
                    pl.BlockSpec((1, 1, KV, block_k, D), kv_index_h),
                    pl.BlockSpec((1, 1, KV, block_k, D), kv_index_h),
                    pl.BlockSpec((1, 1, KV, 1, block_k if quantized else s_len),
                                 scale_index_h),
                    pl.BlockSpec((1, 1, KV, 1, block_k if quantized else s_len),
                                 scale_index_h),
                ],
                out_specs=pl.BlockSpec(
                    (1, 1, KV, G, D), lambda b, kb, sp, li: (b, 0, 0, 0, 0)),
                scratch_shapes=[
                    pltpu.VMEM((KV * G, D), jnp.float32),
                    pltpu.VMEM((KV * G, 1), jnp.float32),
                    pltpu.VMEM((KV * G, 1), jnp.float32),
                ],
            ),
            out_shape=jax.ShapeDtypeStruct((B, 1, KV, G, D), q.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")),
            interpret=interpret,
        )(start_arr, layer_arr, qg, k, v, k_scale, v_scale)
        return out.reshape(B, 1, H, D)

    if blocked:
        nkb = T // block_k
        kernel = functools.partial(
            _decode_kernel_blocked, block_k=block_k, groups=G, head_dim=D,
            scale=scale, quantized=quantized, nkb=nkb)

        def kv_index(b, kv, kb, sp_ref, li_ref):
            # invisible tiles re-map to the LAST VISIBLE block: the index
            # repeats the tile already resident, so no DMA is issued at all
            # for slots past this row's start_pos (re-mapping to block 0
            # would re-fetch it once per (batch, kv_head))
            vis = kb * block_k <= sp_ref[b]
            return (li_ref[0], b, kv,
                    jnp.where(vis, kb, sp_ref[b] // block_k), 0)

        def scale_index(b, kv, kb, sp_ref, li_ref):
            if not quantized:
                return (0, b, kv, 0, 0)   # dummy block; never read
            vis = kb * block_k <= sp_ref[b]
            return (li_ref[0], b, kv, 0,
                    jnp.where(vis, kb, sp_ref[b] // block_k))

        out = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(B, KV, nkb),
                in_specs=[
                    pl.BlockSpec((1, 1, 1, G, D),
                                 lambda b, kv, kb, sp, li: (b, 0, kv, 0, 0)),
                    pl.BlockSpec((1, 1, 1, block_k, D), kv_index),
                    pl.BlockSpec((1, 1, 1, block_k, D), kv_index),
                    pl.BlockSpec((1, 1, 1, 1, block_k if quantized else s_len),
                                 scale_index),
                    pl.BlockSpec((1, 1, 1, 1, block_k if quantized else s_len),
                                 scale_index),
                ],
                out_specs=pl.BlockSpec(
                    (1, 1, 1, G, D), lambda b, kv, kb, sp, li: (b, 0, kv, 0, 0)),
                scratch_shapes=[
                    pltpu.VMEM((G, D), jnp.float32),
                    pltpu.VMEM((G, 1), jnp.float32),
                    pltpu.VMEM((G, 1), jnp.float32),
                ],
            ),
            out_shape=jax.ShapeDtypeStruct((B, 1, KV, G, D), q.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary", "arbitrary")),
            interpret=interpret,
        )(start_arr, layer_arr, qg, k, v, k_scale, v_scale)
        return out.reshape(B, 1, H, D)

    # legacy whole-head kernel: single-layer operands only
    k, v = k[0], v[0]
    k_scale, v_scale = k_scale[0], v_scale[0]
    kernel = functools.partial(
        _decode_kernel, block_k=block_k, groups=G, head_dim=D, scale=scale,
        quantized=quantized)

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, KV),
            in_specs=[
                pl.BlockSpec((1, 1, 1, G, D), lambda b, kv, _sp: (b, 0, kv, 0, 0)),
                pl.BlockSpec((1, 1, T, D), lambda b, kv, _sp: (b, kv, 0, 0)),
                pl.BlockSpec((1, 1, T, D), lambda b, kv, _sp: (b, kv, 0, 0)),
                pl.BlockSpec((1, 1, 1, s_len), lambda b, kv, _sp: (b, kv, 0, 0)),
                pl.BlockSpec((1, 1, 1, s_len), lambda b, kv, _sp: (b, kv, 0, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, 1, G, D), lambda b, kv, _sp: (b, 0, kv, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((B, 1, KV, G, D), q.dtype),
        interpret=interpret,
    )(start_arr, qg, k, v, k_scale, v_scale)

    return out.reshape(B, 1, H, D)
