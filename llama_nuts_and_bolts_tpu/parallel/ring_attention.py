"""Ring attention: sequence-parallel exact attention for long-context prefill.

The reference has no sequence parallelism of any kind (SURVEY.md §5.7); this
is the TPU-native stretch goal: shard the prefill sequence across the mesh's
``sp`` axis and compute EXACT causal attention by rotating K/V chunks around
the ring with ``lax.ppermute`` while each device keeps a flash-style online
softmax over its local query rows. Peak activation memory per device drops
from O(S²) to O(S²/sp²) per (head, ring-step) tile and K/V never
materialize fully on any chip — the communication rides ICI neighbor links,
overlapping with each step's compute.

Layouts match the rest of the stack (models/llama/model.py):
  q   [B, S, H, D]   sharded P(dp, sp, tp, None)
  k,v [B, KV, S, D]  sharded P(dp, tp, sp, None)
  out [B, S, H, D]   sharded like q

Causality is evaluated in GLOBAL positions: query row ``start_pos + i`` sees
key column ``start_pos + j`` iff ``j <= i`` — identical to the unsharded
``attention_mask`` semantics for a prefill starting at ``start_pos``.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

NEG_INF = -1e30


def _local_ring(q, k, v, start_pos, *, axis: str, sp: int, scale: float):
    """Per-shard body (runs inside shard_map). q [B,Sl,H,D]; k/v [B,KV,Sl,D]."""
    B, Sl, H, D = q.shape
    KV = k.shape[1]
    G = H // KV
    idx = lax.axis_index(axis)

    qg = q.reshape(B, Sl, KV, G, D).astype(jnp.bfloat16)
    row_pos = start_pos + idx * Sl + jnp.arange(Sl, dtype=jnp.int32)  # [Sl]

    acc = jnp.zeros((B, KV, G, Sl, D), jnp.float32)
    m = jnp.full((B, KV, G, Sl), NEG_INF, jnp.float32)
    l = jnp.zeros((B, KV, G, Sl), jnp.float32)

    perm = [(i, (i + 1) % sp) for i in range(sp)]

    def step(r, carry):
        acc, m, l, k, v = carry
        # the chunk currently held originated on shard (idx - r) mod sp
        src = (idx - r) % sp
        col_pos = start_pos + src * Sl + jnp.arange(Sl, dtype=jnp.int32)
        # scores [B,KV,G,Sq,Sk] in fp32; qg [B,Sl,KV,G,D] -> [B,KV,G,Sl,D]
        s = jnp.einsum("bkgqd,bksd->bkgqs", qg.transpose(0, 2, 3, 1, 4),
                       k.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32) * scale
        visible = (col_pos[None, :] <= row_pos[:, None])          # [Sq,Sk]
        s = jnp.where(visible[None, None, None], s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=-1))
        p = jnp.exp(s - m_new[..., None])
        correction = jnp.exp(m - m_new)
        l = l * correction + jnp.sum(p, axis=-1)
        pv = jnp.einsum("bkgqs,bksd->bkgqd", p.astype(jnp.bfloat16),
                        v.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
        acc = acc * correction[..., None] + pv
        m = m_new
        k2 = lax.ppermute(k, axis, perm)
        v2 = lax.ppermute(v, axis, perm)
        return acc, m, l, k2, v2

    acc, m, l, _, _ = lax.fori_loop(0, sp, step, (acc, m, l, k, v))
    out = acc / jnp.maximum(l[..., None], 1e-30)                  # [B,KV,G,Sl,D]
    return out.transpose(0, 3, 1, 2, 4).reshape(B, Sl, H, D).astype(q.dtype)


def ring_gqa_attention(mesh: Mesh, q, k, v, start_pos, *, scale=None,
                       axis: str = "sp"):
    """Exact causal GQA attention with the sequence dim sharded over ``axis``.

    ``q [B,S,H,D]``, ``k/v [B,KV,S,D]`` (global shapes; S divisible by the
    axis size, H/KV divisible by tp). Returns ``[B,S,H,D]``.
    """
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    sp = mesh.shape[axis]
    fn = partial(_local_ring, axis=axis, sp=sp, scale=scale)
    mapped = jax.shard_map(
        lambda q, k, v, s: fn(q, k, v, s),
        mesh=mesh,
        in_specs=(P("dp", axis, "tp", None), P("dp", "tp", axis, None),
                  P("dp", "tp", axis, None), P()),
        out_specs=P("dp", axis, "tp", None),
        check_vma=False,
    )
    return mapped(q, k, v, jnp.asarray(start_pos, jnp.int32))
