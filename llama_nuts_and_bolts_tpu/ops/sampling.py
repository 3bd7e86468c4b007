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


def sample_tokens_batched(
    logits: jnp.ndarray,       # [B, vocab] fp32
    keys: jnp.ndarray,         # [B, 2] uint32 — per-row base RNG keys
    positions: jnp.ndarray,    # [B] int32 — folded into the key per step
    temperature: jnp.ndarray,  # [B] fp32; rows <= 0 decode greedily
    top_k: jnp.ndarray,        # [B] int32; rows <= 0 mean "no top-k"
    top_p: jnp.ndarray,        # [B] fp32; rows >= 1 mean "no top-p"
) -> jnp.ndarray:
    """Row-wise sampling for a shared batched decode step (continuous
    batching): every argument is traced, so one executable serves any mix of
    greedy and differently-parameterized sampled requests. Determinism: the
    step key is ``fold_in(key_row, position)`` — a request's tokens depend
    only on its seed, prompt, and position, never on its batch neighbors."""
    B, V = logits.shape
    safe_t = jnp.where(temperature > 0.0, temperature, 1.0)[:, None]
    scaled = logits / safe_t

    sorted_desc = jnp.sort(scaled, axis=-1)[:, ::-1]               # [B, V]
    # top-k: mask rows' logits below their k-th largest (k <= 0 -> keep all)
    k_idx = jnp.clip(jnp.where(top_k > 0, top_k, V) - 1, 0, V - 1)
    kth = jnp.take_along_axis(sorted_desc, k_idx[:, None], axis=-1)
    scaled = jnp.where(scaled < kth, -jnp.inf, scaled)
    # top-p AFTER top-k (same order as sample_token): the cutoff comes from
    # the top-k-masked distribution — masked tail softmaxes to 0, so the
    # cumulative prefix lives inside the surviving top-k set
    sorted_masked = jnp.sort(scaled, axis=-1)[:, ::-1]
    probs = jax.nn.softmax(sorted_masked, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    cutoff_idx = jnp.sum(cum < top_p[:, None], axis=-1, keepdims=True)
    cutoff = jnp.take_along_axis(sorted_masked, jnp.minimum(cutoff_idx, V - 1),
                                 axis=-1)
    scaled = jnp.where(scaled < cutoff, -jnp.inf, scaled)

    def draw(key, pos, row):
        k = jax.random.fold_in(jax.random.wrap_key_data(key, impl="threefry2x32"),
                               pos)
        return jax.random.categorical(k, row)

    sampled = jax.vmap(draw)(keys, positions, scaled).astype(jnp.int32)
    return jnp.where(temperature > 0.0, sampled, greedy(logits))


def top_logprobs_batched(logits: jnp.ndarray, chosen: jnp.ndarray, k: int):
    """Per-row log-softmax info for OpenAI-style ``logprobs``:
    returns (chosen_logprob [B], top_vals [B, k], top_ids [B, k]).
    ``k`` is static (one executable); cost is one log-softmax + top-k over
    the logits the step already produced."""
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)     # [B, V]
    chosen_lp = jnp.take_along_axis(lp, chosen[:, None], axis=-1)[:, 0]
    top_vals, top_ids = jax.lax.top_k(lp, k)
    return chosen_lp, top_vals, top_ids.astype(jnp.int32)
