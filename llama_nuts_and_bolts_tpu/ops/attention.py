"""Grouped-query attention without materializing repeat-KV.

TPU-native replacement for the reference's attention math (reference:
src/model/llamatransformer.go:289-559): where the Go code materializes the
8→32 head expansion (`attentionRepeatKV`) and four full transposes, here the
query heads are reshaped to ``[kv_heads, group]`` and the expansion is a
broadcast inside one einsum — zero extra HBM traffic. Softmax runs in fp32
(max-subtracted — fixing the reference's unstabilized softmax,
src/ml/operations_impl.go:478-511). A fused Pallas flash kernel lives in
kernels/attention.py; this is the XLA reference path and correctness oracle.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from jax import lax


def gqa_attention(
    q: jnp.ndarray,            # [B, S, n_heads, head_dim]
    k: jnp.ndarray,            # [B, kv_heads, T, head_dim]  (cache layout)
    v: jnp.ndarray,            # [B, kv_heads, T, head_dim]
    mask: Optional[jnp.ndarray] = None,  # broadcastable to [B, S, T], 0/-inf additive
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Returns [B, S, n_heads, head_dim] in q.dtype."""
    B, S, H, D = q.shape
    _, KV, T, _ = k.shape
    G = H // KV
    if scale is None:
        scale = 1.0 / (D ** 0.5)

    qg = q.reshape(B, S, KV, G, D)
    # scores[b, kv, g, s, t] — fp32 accumulate on the MXU
    scores = jnp.einsum(
        "bskgd,bktd->bkgst", qg, k, preferred_element_type=jnp.float32
    ) * scale
    if mask is not None:
        scores = scores + mask[:, None, None, :, :].astype(jnp.float32)
    probs = jnp.exp(scores - lax.stop_gradient(
        jnp.max(scores, axis=-1, keepdims=True)))
    probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
    # operand order matters: v-first lowers to a supported bf16 batched dot
    # on XLA:CPU (p-first hits an UNIMPLEMENTED DotThunk at some shapes)
    out = jnp.einsum(
        "bktd,bkgst->bskgd", v, probs.astype(q.dtype),
        preferred_element_type=jnp.float32,
    )
    return out.reshape(B, S, H, D).astype(q.dtype)
