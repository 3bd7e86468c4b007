"""Batched ragged-prompt generation tests (BASELINE config #4) and
long-context generation mechanics (config #3)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from llama_nuts_and_bolts_tpu.runtime.batch import generate_tokens_batched
from llama_nuts_and_bolts_tpu.runtime.types import GenerationState

from tests.test_streaming import ENGINE


def collect(prompts, engine=ENGINE):
    per_row = {b: [] for b in range(len(prompts))}
    for step in generate_tokens_batched(engine, prompts):
        for r in step:
            per_row[r.row].append(r)
    return per_row


def test_duplicate_prompts_produce_identical_rows():
    rows = collect([[1, 5, 9], [1, 5, 9]])
    toks0 = [(r.position, r.token_id) for r in rows[0]]
    toks1 = [(r.position, r.token_id) for r in rows[1]]
    assert toks0 == toks1
    assert rows[0][-1].state in (GenerationState.FINISHED_BY_REACHING_EOS,
                                 GenerationState.FINISHED_BY_REACHING_SEQ_LEN)


def test_ragged_prompts_echo_suppression():
    short = [1, 5, 9]
    long = [1, 5, 9, 20, 21, 22, 23, 24]
    rows = collect([short, long])
    # the long row's first generated token appears only at its prompt end
    assert rows[1][0].position == len(long)
    # the short row starts generating right after its own prompt
    assert rows[0][0].position == len(short)
    # no prompt tokens leak into the outputs
    assert not any(r.is_prompt_echo for rr in rows.values() for r in rr)
    # every row terminates
    for b in rows:
        assert rows[b][-1].state != GenerationState.IN_PROGRESS


def test_batched_matches_single_run():
    single = [(s, t) for s, t in ENGINE.generate_tokens([1, 5, 9])]
    rows = collect([[1, 5, 9], [2, 7]])
    batched = [(r.state, r.token_id) for r in rows[0]]
    assert batched == single


def test_rejects_empty_and_too_long():
    with pytest.raises(ValueError):
        list(generate_tokens_batched(ENGINE, []))
    with pytest.raises(ValueError):
        list(generate_tokens_batched(ENGINE, [[1], []]))
    with pytest.raises(ValueError):
        list(generate_tokens_batched(ENGINE, [list(range(ENGINE.seq_len))]))


def test_long_context_generation():
    """Decode correctly at positions in the thousands (8K-style config):
    RoPE table coverage, mask indices, cache update far from origin."""
    from llama_nuts_and_bolts_tpu.io.params import ModelArgs
    from llama_nuts_and_bolts_tpu.models.llama import forward, init_random_params
    from llama_nuts_and_bolts_tpu.models.llama.model import KVCache

    cfg = ModelArgs(dim=32, n_layers=2, n_heads=4, n_kv_heads=2, vocab_size=64,
                    multiple_of=16, use_scaled_rope=True,
                    max_sequence_length=8192)
    params = jax.jit(init_random_params, static_argnums=(0,))(cfg, jax.random.PRNGKey(0))
    assert params.rope_cos.shape[0] == 16384
    fwd = jax.jit(forward, static_argnums=(1,))

    cache = KVCache.create(cfg, 1, 8192)
    tokens = jnp.asarray([[3, 1, 4, 1, 5, 9, 2, 6]], dtype=jnp.int32)
    logits, cache = fwd(params, cfg, tokens, 0, cache)
    tok = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
    # jump to a deep position: decode steps at ~8K
    for pos in (8000, 8100, 8190):
        logits, cache = fwd(params, cfg, tok, pos, cache)
        tok = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
        assert np.isfinite(np.asarray(logits)).all()
    # scaled-RoPE table actually differs from unscaled at deep positions
    cfg_u = cfg.with_(use_scaled_rope=False)
    params_u = jax.jit(init_random_params, static_argnums=(0,))(cfg_u, jax.random.PRNGKey(0))
    assert not np.allclose(np.asarray(params.rope_cos[8000]),
                           np.asarray(params_u.rope_cos[8000]))
