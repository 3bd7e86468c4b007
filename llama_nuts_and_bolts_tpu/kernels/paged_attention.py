"""Paged GQA decode-attention Pallas kernel: block tables via scalar prefetch.

The XLA paged path (models/llama/paged.py::_gathered_attention) first
GATHERS every row's blocks into a dense [B, KV, M*bs, D] copy — write + read
of the whole gathered cache on top of the pool read. This kernel removes the
copy: the grid's innermost axis walks a request's block table directly, with
the table and positions delivered as PREFETCHED SCALARS so each step's
``index_map`` computes WHICH pool block to DMA next — HBM traffic is exactly
the blocks a request owns, nothing is materialized.

Two TPU-specific tricks:
  * grid steps beyond a request's last used block clamp the index map to the
    last used block — Pallas skips the DMA when consecutive steps map to the
    same block, so short requests don't stream the table's trash tail;
  * flash-style online softmax in VMEM scratch (fp32 m/l/acc) across the
    sequential block walk, GQA folded into the MXU row dim (G = H/KV query
    rows per program), same as kernels/decode_attention.py.

Capability anchor: the reference's attention at decode shapes
(src/model/llamatransformer.go:289-527), extended to the paged cache the
production server needs.
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


def _paged_kernel(tbl_ref, pos_ref, q_ref, k_ref, v_ref, o_ref,
                  acc_ref, m_ref, l_ref,
                  *, bs: int, groups: int, head_dim: int, scale: float,
                  num_blocks: int):
    b = pl.program_id(0)
    m = pl.program_id(2)
    pos = pos_ref[b]
    used = pos // bs                       # index of the last block in use

    @pl.when(m == 0)
    def _init():
        acc_ref[:] = jnp.zeros(acc_ref.shape, jnp.float32)
        m_ref[:] = jnp.full(m_ref.shape, NEG_INF, jnp.float32)
        l_ref[:] = jnp.zeros(l_ref.shape, jnp.float32)

    @pl.when(m <= used)
    def _tile():
        q = q_ref[0, 0, 0]                                    # [G, D] bf16
        k_tile = k_ref[0, 0]                                  # [bs, D]
        v_tile = v_ref[0, 0]
        s = lax.dot_general(
            q, k_tile, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale                                             # [G, bs]
        t_pos = m * bs + lax.broadcasted_iota(jnp.int32, (groups, bs), 1)
        s = jnp.where(t_pos <= pos, s, NEG_INF)

        m_prev, l_prev = m_ref[:], l_ref[:]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        corr = jnp.exp(m_prev - m_new)
        l_ref[:] = l_prev * corr + jnp.sum(p, axis=1, keepdims=True)
        pv = lax.dot_general(
            p.astype(v_tile.dtype), v_tile, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                     # [G, D]
        acc_ref[:] = acc_ref[:] * corr + pv
        m_ref[:] = m_new

    @pl.when(m == num_blocks - 1)
    def _flush():
        out = acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)
        o_ref[0, 0, 0] = out.astype(o_ref.dtype)


def _paged_kernel_heads(tbl_ref, pos_ref, layer_ref, *refs,
                        bs: int, kv_heads: int, groups: int,
                        head_dim: int, scale: float, grid_m: int, chunk: int,
                        quantized: bool):
    """Folded-heads, multi-block paged kernel: grid (batch, block_group).

    One program serves ALL KV heads for a GROUP of ``chunk`` consecutive
    table entries: each entry's pool block arrives as its own DMA (blocks
    are scattered in the pool), but in-kernel they concatenate into one
    [chunk*bs, D] tile per head, so the MXU sees 512-deep dots instead of
    64-deep ones. Measured motivation: with one 64-row block per grid step
    the per-step op latency (~27 µs across the 8-head unroll) made the
    kernel 4x slower than the XLA gather path — the work per step was too
    small, not the bytes. ``layer`` (third prefetch scalar) selects the
    layer of the stacked pool (flattened to [L*n_blocks, KV, bs, D]), so
    the per-layer scan feeds the carried pool without a slice
    materialization (see kernels/decode_attention.py)."""
    q_ref = refs[0]
    k_refs = refs[1:1 + chunk]
    v_refs = refs[1 + chunk:1 + 2 * chunk]
    n = 1 + 2 * chunk
    if quantized:
        ks_refs = refs[n:n + chunk]
        vs_refs = refs[n + chunk:n + 2 * chunk]
        n += 2 * chunk
    o_ref = refs[n]
    acc_ref, m_ref, l_ref = refs[n + 1:]
    del layer_ref  # consumed by the index maps only
    b = pl.program_id(0)
    m = pl.program_id(1)
    pos = pos_ref[b]
    used = pos // bs

    @pl.when(m == 0)
    def _init():
        acc_ref[:] = jnp.zeros(acc_ref.shape, jnp.float32)
        m_ref[:] = jnp.full(m_ref.shape, NEG_INF, jnp.float32)
        l_ref[:] = jnp.zeros(l_ref.shape, jnp.float32)

    @pl.when(m * chunk <= used)
    def _tile():
        # consecutive table entries hold consecutive positions: the whole
        # group is one contiguous position range
        span = chunk * bs
        t_pos = m * span + lax.broadcasted_iota(jnp.int32, (groups, span), 1)
        vis = t_pos <= pos
        if quantized:
            # int8xint8 MXU path (kernels/decode_attention.py): q quantized
            # per row; per-position scales fold into the SMALL score/prob
            # matrices — tiles stay int8 throughout. Scale vectors cannot
            # concatenate across pieces (Mosaic: lane concat of 64-wide
            # vectors), so the online softmax updates per (head, piece).
            for h in range(kv_heads):
                q = q_ref[0, 0, h]                            # [G, D] bf16
                q_i, qs = quantize_q_rows(q)
                sl = slice(h * groups, (h + 1) * groups)
                for j in range(chunk):
                    t0 = (m * chunk + j) * bs
                    t_pos = t0 + lax.broadcasted_iota(
                        jnp.int32, (groups, bs), 1)
                    k_tile = k_refs[j][0, h]                  # [bs, D] int8
                    v_tile = v_refs[j][0, h]
                    ks_row = ks_refs[j][0, h].astype(jnp.float32)   # [bs]
                    vs_row = vs_refs[j][0, h].astype(jnp.float32)
                    s = int8_scores(q_i, qs, k_tile, ks_row, scale)
                    s = jnp.where(t_pos <= pos, s, NEG_INF)
                    m_prev = m_ref[sl, :]
                    m_new = jnp.maximum(m_prev,
                                        jnp.max(s, axis=1, keepdims=True))
                    p = jnp.exp(s - m_new)
                    corr = jnp.exp(m_prev - m_new)
                    l_ref[sl, :] = l_ref[sl, :] * corr + jnp.sum(
                        p, axis=1, keepdims=True)
                    acc_ref[sl, :] = (acc_ref[sl, :] * corr
                                      + int8_pv(p, v_tile, vs_row))
                    m_ref[sl, :] = m_new
            return

        for h in range(kv_heads):          # static unroll: resident blocks
            q = q_ref[0, 0, h]                                # [G, D] bf16
            k_tile = jnp.concatenate([kr[0, h] for kr in k_refs], axis=0)
            v_tile = jnp.concatenate([vr[0, h] for vr in v_refs], axis=0)
            s = lax.dot_general(
                q, k_tile, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale                                         # [G, span]
            s = jnp.where(vis, s, NEG_INF)
            sl = slice(h * groups, (h + 1) * groups)
            m_prev = m_ref[sl, :]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
            p = jnp.exp(s - m_new)
            corr = jnp.exp(m_prev - m_new)
            l_ref[sl, :] = l_ref[sl, :] * corr + jnp.sum(p, axis=1,
                                                         keepdims=True)
            pv = lax.dot_general(
                p.astype(v_tile.dtype), v_tile, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc_ref[sl, :] = acc_ref[sl, :] * corr + pv
            m_ref[sl, :] = m_new

    @pl.when(m == grid_m - 1)
    def _flush():
        out = acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)
        o_ref[0, 0] = out.reshape(kv_heads, groups,
                                  head_dim).astype(o_ref.dtype)


def paged_flash_decode(
    q: jnp.ndarray,          # [B, 1, H, D]
    pool_k: jnp.ndarray,     # [n_blocks, KV, bs, D] bf16 or int8
    pool_v: jnp.ndarray,
    tables: jnp.ndarray,     # int32 [B, M]
    positions: jnp.ndarray,  # int32 [B]
    scale: float | None = None,
    interpret: bool | None = None,
    fold_heads: bool = True,
    layer=None,              # traced int32: pools are the WHOLE [L, ...] stack
    pool_ks=None,            # bf16 [n_blocks, KV, bs] when pools are int8
    pool_vs=None,
) -> jnp.ndarray:
    """Returns [B, 1, H, D] in q.dtype; row b attends pool slots holding its
    positions <= positions[b] (including the just-written row).

    ``interpret=None`` auto-selects: compiled on TPU, interpreter on CPU (so
    the paged batcher's "pallas" path is testable on the CPU mesh).
    ``layer`` (with stacked [L, n_blocks, KV, bs, D] pools) lets the
    per-layer scan feed the whole carried pool without a per-step slice
    materialization; requires fold_heads. int8 pools (``pool_ks/pool_vs``
    scale pools given) run the int8xint8-MXU path — tiles stay int8 into
    the MXU, scales fold into the small score/prob matrices."""
    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    B, S, H, D = q.shape
    if S != 1:
        raise ValueError("paged_flash_decode is the S=1 kernel")
    quantized = pool_ks is not None
    if layer is None:
        pool_k, pool_v = pool_k[None], pool_v[None]
        if quantized:
            pool_ks, pool_vs = pool_ks[None], pool_vs[None]
        layer = 0
    elif not fold_heads:
        raise ValueError("stacked-pool layer mode requires fold_heads=True")
    if quantized and not fold_heads:
        raise ValueError("int8 pools require the fold_heads kernel")
    L, n_blocks, KV, bs, _ = pool_k.shape
    M = tables.shape[1]
    G = H // KV
    if scale is None:
        scale = 1.0 / math.sqrt(D)

    qg = q.reshape(B, 1, KV, G, D)
    tables = tables.astype(jnp.int32)
    positions = positions.astype(jnp.int32)
    layer_arr = jnp.asarray(layer, jnp.int32).reshape(1)

    if fold_heads:
        # flatten [L, n_blocks, ...] -> [L*n_blocks, ...] (a free view of
        # the contiguous stack) and index blocks flat: li*n_blocks + table
        pool_k = pool_k.reshape((L * n_blocks,) + pool_k.shape[2:])
        pool_v = pool_v.reshape((L * n_blocks,) + pool_v.shape[2:])
        if quantized:
            # scales stay [L*nb, KV, bs]: the (1, KV, bs) block's last
            # two dims EQUAL the array dims, which the tiling rules allow
            pool_ks = pool_ks.reshape((L * n_blocks,) + pool_ks.shape[2:])
            pool_vs = pool_vs.reshape((L * n_blocks,) + pool_vs.shape[2:])
        # blocks per grid step: enough that each step's dots are >=512 deep
        chunk = max(1, min(M, 512 // bs))
        while M % chunk:
            chunk -= 1
        grid_m = M // chunk

        def mk_index(j, rank4=True):
            def k_index_h(b, m, tbl, pos, li):
                mm = jnp.minimum(m * chunk + j, pos[b] // bs)
                flat = li[0] * n_blocks + tbl[b, mm]
                return (flat, 0, 0, 0) if rank4 else (flat, 0, 0)
            return k_index_h

        kernel = functools.partial(
            _paged_kernel_heads, bs=bs, kv_heads=KV, groups=G, head_dim=D,
            scale=scale, grid_m=grid_m, chunk=chunk, quantized=quantized)
        kv_specs = [pl.BlockSpec((1, KV, bs, D), mk_index(j))
                    for j in range(chunk)]
        scale_specs = ([pl.BlockSpec((1, KV, bs), mk_index(j, rank4=False))
                        for j in range(chunk)] if quantized else [])
        operands = ([pool_k] * chunk + [pool_v] * chunk
                    + ([pool_ks] * chunk + [pool_vs] * chunk
                       if quantized else []))
        out = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3,
                grid=(B, grid_m),
                in_specs=[
                    pl.BlockSpec((1, 1, KV, G, D),
                                 lambda b, m, tbl, pos, li: (b, 0, 0, 0, 0)),
                    *kv_specs, *kv_specs, *scale_specs, *scale_specs,
                ],
                out_specs=pl.BlockSpec(
                    (1, 1, KV, G, D),
                    lambda b, m, tbl, pos, li: (b, 0, 0, 0, 0)),
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
        )(tables, positions, layer_arr, qg, *operands)
        return out.reshape(B, 1, H, D)

    pool_k, pool_v = pool_k[0], pool_v[0]

    def k_index(b, kv, m, tbl, pos):
        # clamp past-the-end steps to the last used block: same index as the
        # previous step -> Pallas skips the DMA
        mm = jnp.minimum(m, pos[b] // bs)
        return (tbl[b, mm], kv, 0, 0)

    kernel = functools.partial(
        _paged_kernel, bs=bs, groups=G, head_dim=D, scale=scale, num_blocks=M)

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B, KV, M),
            in_specs=[
                pl.BlockSpec((1, 1, 1, G, D),
                             lambda b, kv, m, tbl, pos: (b, 0, kv, 0, 0)),
                pl.BlockSpec((1, 1, bs, D), k_index),
                pl.BlockSpec((1, 1, bs, D), k_index),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, 1, G, D), lambda b, kv, m, tbl, pos: (b, 0, kv, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((G, D), jnp.float32),
                pltpu.VMEM((G, 1), jnp.float32),
                pltpu.VMEM((G, 1), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, 1, KV, G, D), q.dtype),
        interpret=interpret,
    )(tables, positions, qg, pool_k, pool_v)

    return out.reshape(B, 1, H, D)
