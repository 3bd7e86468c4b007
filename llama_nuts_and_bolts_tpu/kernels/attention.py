"""Fused GQA flash-attention Pallas kernel (TPU).

The TPU-native replacement for the reference's attention pipeline
(reference: src/model/llamatransformer.go:289-559 + the goroutine batched
matmul in src/ml/operations_matmul.go): one kernel fuses QKᵀ·scale, the
causal/cache-length mask, an online (streaming) max-subtracted softmax, and
the ×V contraction — never materializing the [S, T] score matrix in HBM
(at 8K context that matrix is gigabytes; here it lives in VMEM one tile at a
time) and never materializing the 8→32 repeat-KV expansion (the G query heads
sharing a KV head are folded into the MXU row dimension instead).

Layout: grid (batch, kv_head, q_block). Each program streams the KV-head's
keys/values from VMEM in block_k tiles, maintaining flash-style running max,
normalizer, and accumulator. Cache slots beyond ``start_pos + row`` are
masked, which covers prefill causality and decode cache bounds in one rule
(same rule as models/llama/model.py::attention_mask).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(start_pos_ref, q_ref, k_ref, v_ref, o_ref,
                  *, block_q: int, block_k: int, groups: int, head_dim: int,
                  scale: float):
    i = pl.program_id(2)                       # q-block index
    start_pos = start_pos_ref[0]
    rows = block_q * groups

    q = q_ref[0].reshape(rows, head_dim)       # [(block_q·G), D] bf16
    t_total = k_ref.shape[2]

    # row r ↔ query position i·block_q + r//G
    q_pos = start_pos + i * block_q + (
        lax.broadcasted_iota(jnp.int32, (rows, block_k), 0) // groups)

    # stream KV tiles up to the last block any row in this q-block may see
    last_visible = start_pos + (i + 1) * block_q
    num_k_blocks = lax.min(
        lax.div(last_visible + block_k - 1, block_k),
        (t_total + block_k - 1) // block_k,
    )

    def body(kb, carry):
        acc, m, l = carry
        k_tile = k_ref[0, 0, pl.ds(kb * block_k, block_k), :]       # [block_k, D]
        v_tile = v_ref[0, 0, pl.ds(kb * block_k, block_k), :]
        s = lax.dot_general(
            q, k_tile, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale                                                    # [rows, block_k]
        k_pos = kb * block_k + lax.broadcasted_iota(
            jnp.int32, (rows, block_k), 1)
        s = jnp.where(k_pos <= q_pos, s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)                                       # [rows, block_k]
        corr = jnp.exp(m - m_new)
        l_new = l * corr + jnp.sum(p, axis=1, keepdims=True)
        pv = lax.dot_general(
            p.astype(v_tile.dtype), v_tile, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                            # [rows, D]
        acc_new = acc * corr + pv
        return acc_new, m_new, l_new

    acc = jnp.zeros((rows, head_dim), jnp.float32)
    m = jnp.full((rows, 1), NEG_INF, jnp.float32)
    l = jnp.zeros((rows, 1), jnp.float32)
    acc, m, l = lax.fori_loop(0, num_k_blocks, body, (acc, m, l))

    out = acc / jnp.maximum(l, 1e-30)
    o_ref[0] = out.reshape(block_q, 1, groups, head_dim).astype(o_ref.dtype)


def flash_gqa_attention(
    q: jnp.ndarray,        # [B, S, H, D]
    k: jnp.ndarray,        # [B, KV, T, D]  (the cache layout: kv-heads-major)
    v: jnp.ndarray,        # [B, KV, T, D]
    start_pos,             # scalar int32: queries occupy [start_pos, start_pos+S)
    scale: float | None = None,
    block_q: int = 32,
    block_k: int = 128,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Returns [B, S, H, D] in q.dtype. Causal+cache mask built in."""
    if interpret is None:
        # compiled on TPU, interpreter on CPU (CPU-mesh tests)
        interpret = jax.devices()[0].platform == "cpu"

    B, S, H, D = q.shape
    _, KV, T, _ = k.shape
    G = H // KV
    if scale is None:
        scale = 1.0 / math.sqrt(D)

    # tile geometry: fold G into the MXU row dim; pad q rows to a block
    block_q = min(block_q, S)
    if S % block_q != 0:
        pad = block_q - S % block_q
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0), (0, 0)))
        S_padded = S + pad
    else:
        S_padded = S
    if T % block_k != 0:
        raise ValueError(f"cache length {T} must be a multiple of block_k={block_k}")

    # [B, S, H, D] -> [B, S, KV, G, D] so one (b, kv) owns its G query heads
    qg = q.reshape(B, S_padded, KV, G, D)

    grid = (B, KV, S_padded // block_q)
    kernel = functools.partial(
        _flash_kernel, block_q=block_q, block_k=block_k, groups=G,
        head_dim=D, scale=scale)

    start_arr = jnp.asarray(start_pos, jnp.int32).reshape(1)

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (1, block_q, 1, G, D),
                    lambda b, kv, i, _sp: (b, i, kv, 0, 0),
                ),
                pl.BlockSpec((1, 1, T, D), lambda b, kv, i, _sp: (b, kv, 0, 0)),
                pl.BlockSpec((1, 1, T, D), lambda b, kv, i, _sp: (b, kv, 0, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, block_q, 1, G, D), lambda b, kv, i, _sp: (b, i, kv, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((B, S_padded, KV, G, D), q.dtype),
        interpret=interpret,
    )(start_arr, qg, k, v)

    return out.reshape(B, S_padded, H, D)[:, :S]
