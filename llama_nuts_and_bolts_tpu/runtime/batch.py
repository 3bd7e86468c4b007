"""Batched multi-prompt generation (position-synchronous, ragged prompts).

The reference generates one sequence at a time but carries the seeds of
batching: TokenizeBatch (reference: src/inference/tokenize.go:97-107) and the
"only replace token if prompt has already been generated" rule in its decode
loop (reference: src/inference/inference.go:218-226, inherited from Meta's
generation.py) — which only matters when prompts of different lengths share a
step loop. This module makes that real, TPU-style: all B sequences advance
position-synchronously through ONE jitted forward per step, so the batch rides
a single set of MXU matmuls (BASELINE config #4).

Mechanics: prefill runs to the SHORTEST prompt's bucket (every row's tokens
are real up to there); the ragged region and generation proceed one position
at a time, feeding each row its own prompt token while the prompt lasts
(prompt-echo suppression) and its previously sampled token afterwards.
Finished rows keep stepping with their stop token (cache slots are written but
never attended by other rows) until every row terminates.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from llama_nuts_and_bolts_tpu.runtime.types import GenerationState


@dataclass
class BatchStepResult:
    """One generated token for one row at one step."""

    row: int
    position: int
    token_id: int
    state: GenerationState
    is_prompt_echo: bool   # token came from the row's own prompt (ragged phase)


def generate_tokens_batched(engine, prompts: Sequence[Sequence[int]]):
    """Yields lists of BatchStepResult, one list per position step.

    ``engine`` is an InferenceEngine; rows that finished stop appearing in
    the per-step lists, and the generator ends when all rows are done.
    """
    from llama_nuts_and_bolts_tpu.runtime.engine import prefill_bucket

    cfg = engine.model.cfg
    vocab = engine.model.vocab
    B = len(prompts)
    lens = [len(p) for p in prompts]
    if not B or min(lens) == 0:
        raise ValueError("batched generation requires non-empty prompts")
    max_len, min_len = max(lens), min(lens)
    if max_len >= engine.seq_len:
        raise ValueError(
            f"context sequence length {engine.seq_len} must be higher than "
            f"longest prompt length {max_len}")

    cache = engine.new_cache(B)
    bucket = prefill_bucket(min_len, engine.seq_len)
    # prefill only to the shortest prompt: every row is real up to min_len
    padded = np.zeros((B, bucket), dtype=np.int32)
    for b, p in enumerate(prompts):
        padded[b, : min(bucket, lens[b])] = p[: min(bucket, lens[b])]
    logits, cache = engine._fwd(engine.model.params, cfg, jnp.asarray(padded), 0,
                                cache, attn_impl=engine._attn_impl(bucket),
                                logits_at=min_len - 1)
    # next token per row as of position min_len
    next_np = np.asarray(jnp.argmax(logits[:, 0], axis=-1))

    finished: List[Optional[GenerationState]] = [None] * B
    pos = min_len
    while True:
        step_results: List[BatchStepResult] = []
        fed = np.empty((B, 1), dtype=np.int32)
        for b in range(B):
            if pos < lens[b]:
                tok = int(prompts[b][pos])      # prompt echo: keep own prompt
                echo = True
            else:
                tok = int(next_np[b])
                echo = False
            fed[b, 0] = tok
            if finished[b] is not None:
                continue
            state = GenerationState.IN_PROGRESS
            if not echo and vocab.is_stop(tok):
                state = GenerationState.FINISHED_BY_REACHING_EOS
            elif pos + 1 >= engine.seq_len:
                state = GenerationState.FINISHED_BY_REACHING_SEQ_LEN
            if state != GenerationState.IN_PROGRESS:
                finished[b] = state
            if not echo:
                step_results.append(BatchStepResult(
                    row=b, position=pos, token_id=tok, state=state,
                    is_prompt_echo=echo))
        if step_results:
            yield step_results
        if all(f is not None for f in finished) or pos + 1 >= engine.seq_len:
            return
        logits, cache = engine._fwd(engine.model.params, cfg, jnp.asarray(fed),
                                    pos, cache, attn_impl=engine._attn_impl(1))
        next_np = np.asarray(jnp.argmax(logits[:, -1], axis=-1))
        pos += 1
