"""Shared int8×int8-MXU attention math for the Pallas decode kernels.

One implementation of the numerically delicate steps (quantization clamp
epsilons, clip bounds, scale-fold order) used by both the dense flash
decode kernel (decode_attention.py) and the paged kernel
(paged_attention.py) — so a numerics fix in one can never silently miss
the other. The recipe (measured rationale in docs/07, round-4 section):
keep the int8 cache tiles int8 all the way into the MXU and apply every
scale to the SMALL [G, block] matrices:

  scores[g, t] = (q_i[g] · k_i[t]) · qs[g] · softmax_scale · ks[t]
  pv[g, d]     = (p_i[g] · v_i[:, d]) · ps[g],   p_i = round((p·vs)/ps)

The per-position v scales fold into the probability matrix BEFORE it is
quantized per-row — the only formulation in which Σ p·v·vs[t] stays exact
under a single per-row scale.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def quantize_q_rows(q):
    """bf16 [G, D] query rows → (int8 rows, fp32 per-row scales [G, 1])."""
    qf = q.astype(jnp.float32)
    qs = jnp.maximum(jnp.max(jnp.abs(qf), axis=1, keepdims=True),
                     1e-8) / 127.0
    q_i = jnp.clip(jnp.round(qf / qs), -127, 127).astype(jnp.int8)
    return q_i, qs


def int8_scores(q_i, qs, k_tile, ks_row, scale):
    """int8×int8→s32 QKᵀ on the MXU; all scales applied to the small
    [G, block] result. ``ks_row`` is the fp32 per-position k-scale vector."""
    s32 = lax.dot_general(
        q_i, k_tile, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)
    return s32.astype(jnp.float32) * (qs * scale) * ks_row[None, :]


def int8_pv(p, v_tile, vs_row):
    """p·V with V kept int8: fold the per-position v scales into ``p``,
    quantize the folded probabilities per row, dot in int8, rescale."""
    pf = p * vs_row[None, :]
    ps = jnp.maximum(jnp.max(jnp.abs(pf), axis=1, keepdims=True),
                     1e-30) / 127.0
    p_i = jnp.clip(jnp.round(pf / ps), -127, 127).astype(jnp.int8)
    pv32 = lax.dot_general(
        p_i, v_tile, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return pv32.astype(jnp.float32) * ps
