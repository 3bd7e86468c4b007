"""Token selection: greedy argmax (reference parity) + standard sampling.

The reference supports greedy only (reference: src/inference/inference.go:211,
src/ml/operations_impl.go:513-546); temperature/top-k/top-p are the idiomatic
extension every serving stack needs, kept jit-friendly (static shapes).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def greedy(logits: jnp.ndarray) -> jnp.ndarray:
    """Argmax over the last dim; ties resolve to the lowest index like the
    reference's scan (reference: src/ml/operations_impl.go:526-543)."""
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


def sample_token(
    logits: jnp.ndarray,           # [..., vocab] fp32
    key: Optional[jax.Array] = None,
    temperature: float = 0.0,
    top_k: int = 0,
    top_p: float = 1.0,
) -> jnp.ndarray:
    if temperature <= 0.0 or key is None:
        return greedy(logits)
    logits = logits / temperature
    if top_k > 0:
        kth = jnp.sort(logits, axis=-1)[..., -top_k][..., None]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    if top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep the smallest prefix with cumulative prob ≥ top_p
        cutoff_idx = jnp.sum(cum < top_p, axis=-1, keepdims=True)
        cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx, axis=-1)
        logits = jnp.where(logits < cutoff, -jnp.inf, logits)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)
