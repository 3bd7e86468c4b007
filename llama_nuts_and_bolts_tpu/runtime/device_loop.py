"""On-device multi-token generation: the whole decode loop inside one jit.

Non-streaming serving, batch jobs, and benchmarking want the loop ON the
device: a ``lax.while_loop`` that decodes until a stop token or the token
budget, with the KV cache threaded in place. One dispatch, one transfer of
the finished token block. (Through an RPC-attached TPU this is the difference
between ~30 ms/token of dispatch overhead and none at all.) The STREAMING
paths (CLI/SSE) close the same gap with fixed-k chunked scans —
``InferenceArgs.decode_chunk`` / ``InferenceEngine._decode_chunk`` — which
keep per-token replay to the detokenizer while dispatching 1/k as often.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from llama_nuts_and_bolts_tpu.io.params import ModelArgs
from llama_nuts_and_bolts_tpu.models.llama.model import KVCache, LlamaParams, forward


@functools.partial(jax.jit, static_argnums=(1, 5), donate_argnums=(4,),
                   static_argnames=("attn_impl",))
def decode_block(
    params: LlamaParams,
    cfg: ModelArgs,
    first_token: jnp.ndarray,     # int32 [B, 1] — from the prefill argmax
    start_pos,                    # int32 scalar: position of first_token
    cache: KVCache,
    max_new_tokens: int,
    stop_ids: jnp.ndarray = None,  # int32 [n_stop]
    attn_impl: str = "xla",
) -> Tuple[jnp.ndarray, jnp.ndarray, KVCache]:
    """Greedy-decode up to ``max_new_tokens`` starting from ``first_token``.

    Returns (tokens [B, max_new_tokens] — entries past the stop token are the
    stop token repeated, count [B] — tokens actually produced incl. the stop
    token, cache). Stops early when EVERY row has hit a stop id.
    """
    B = first_token.shape[0]
    if stop_ids is None:
        stop_ids = jnp.asarray([-1], jnp.int32)

    # int4 params: unpack to native int4 ONCE, amortized over the whole block
    # (inside this jit — int4 can't cross the jit boundary on axon)
    from llama_nuts_and_bolts_tpu.quant.int4 import nativize_q4

    params = nativize_q4(params)

    tokens0 = jnp.zeros((B, max_new_tokens), jnp.int32)
    tokens0 = lax.dynamic_update_slice(tokens0, first_token, (0, 0))
    stopped0 = jnp.isin(first_token[:, 0], stop_ids)
    count0 = jnp.ones((B,), jnp.int32)

    def cond(state):
        i, _tok, _cache, _tokens, stopped, _count = state
        return jnp.logical_and(i < max_new_tokens, ~jnp.all(stopped))

    def body(state):
        i, tok, cache, tokens, stopped, count = state
        logits, cache = forward(params, cfg, tok, start_pos + i - 1, cache,
                                attn_impl=attn_impl)
        nxt = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
        # rows already stopped keep repeating their stop token
        nxt = jnp.where(stopped[:, None], tok, nxt)
        tokens = lax.dynamic_update_slice(tokens, nxt, (0, i))
        newly = jnp.isin(nxt[:, 0], stop_ids)
        count = jnp.where(stopped, count, count + 1)
        stopped = jnp.logical_or(stopped, newly)
        return i + 1, nxt, cache, tokens, stopped, count

    _, _, cache, tokens, stopped, count = lax.while_loop(
        cond, body, (jnp.int32(1), first_token, cache, tokens0, stopped0, count0))
    return tokens, count, cache


def generate_block(engine, prompt_tokens: Sequence[int],
                   max_new_tokens: int = 128) -> Tuple[list, str]:
    """Prefill + on-device decode; returns (token_ids, finish_reason)."""
    import numpy as np

    from llama_nuts_and_bolts_tpu.runtime.engine import prefill_bucket

    cfg = engine.model.cfg
    vocab = engine.model.vocab
    prompt_len = len(prompt_tokens)
    if prompt_len >= engine.seq_len:
        raise ValueError("prompt longer than context")
    max_new = min(max_new_tokens, engine.seq_len - prompt_len)

    # request-bucketed cache buffer: step cost tracks buffer size, not
    # attended length (engine.cache_bucket)
    cache_len = engine.cache_bucket(prompt_len, max_new)
    cache = engine.new_cache(1, cache_len)
    bucket = prefill_bucket(prompt_len, cache_len)
    padded = np.zeros((1, bucket), dtype=np.int32)
    padded[0, :prompt_len] = prompt_tokens
    logits, cache = engine._fwd(engine.model.params, cfg, jnp.asarray(padded), 0,
                                cache, attn_impl=engine._attn_impl(bucket),
                                logits_at=prompt_len - 1)
    first = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)

    stop_ids = jnp.asarray(sorted(vocab.stop_token_ids), jnp.int32)
    # first_token sits at position prompt_len; the loop's step i feeds the
    # token at start_pos + i - 1
    tokens, count, cache = decode_block(
        engine.model.params, cfg, first, prompt_len, cache, max_new,
        stop_ids)
    n = int(count[0])
    ids = [int(t) for t in np.asarray(tokens[0, :n])]
    finish = "stop" if ids and vocab.is_stop(ids[-1]) else "length"
    return ids, finish
