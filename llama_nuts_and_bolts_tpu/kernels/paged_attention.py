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


def paged_flash_decode(
    q: jnp.ndarray,          # [B, 1, H, D]
    pool_k: jnp.ndarray,     # [n_blocks, KV, bs, D] bf16
    pool_v: jnp.ndarray,
    tables: jnp.ndarray,     # int32 [B, M]
    positions: jnp.ndarray,  # int32 [B]
    scale: float | None = None,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Returns [B, 1, H, D] in q.dtype; row b attends pool slots holding its
    positions <= positions[b] (including the just-written row).

    ``interpret=None`` auto-selects: compiled on TPU, interpreter on CPU (so
    the paged batcher's "pallas" path is testable on the CPU mesh)."""
    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    B, S, H, D = q.shape
    if S != 1:
        raise ValueError("paged_flash_decode is the S=1 kernel")
    n_blocks, KV, bs, _ = pool_k.shape
    M = tables.shape[1]
    G = H // KV
    if scale is None:
        scale = 1.0 / math.sqrt(D)

    qg = q.reshape(B, 1, KV, G, D)
    tables = tables.astype(jnp.int32)
    positions = positions.astype(jnp.int32)

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
