"""Prompt-lookup speculative decoding: proposer unit tests + exact greedy
equivalence (speculative decode must emit the vanilla greedy sequence)."""

import pytest

from llama_nuts_and_bolts_tpu.runtime.speculative import (
    NgramProposer,
    longest_accepted_prefix,
)
from tests.test_streaming import make_engine


# ------------------------------------------------------------ proposer unit

def test_proposer_finds_repeat():
    # ... 7 8 9 | 5 6 [7 8 9] → after suffix (7,8,9) earlier comes 5, 6
    p = NgramProposer([1, 7, 8, 9, 5, 6, 7, 8, 9])
    assert p.propose(2) == [5, 6]


def test_proposer_prefers_longest_then_most_recent():
    # suffix (2,3) occurs twice; the most recent earlier occurrence wins
    p = NgramProposer([2, 3, 10, 2, 3, 20, 2, 3])
    assert p.propose(1) == [20]


def test_proposer_falls_back_to_shorter_ngram():
    p = NgramProposer([5, 1, 5, 2, 5])   # no bigram repeat ending at 5
    # unigram 5 seen before; most recent earlier occurrence at idx 2 → next is 2
    assert p.propose(1) == [2]


def test_proposer_no_match():
    assert NgramProposer([1, 2, 3]).propose(3) == []
    assert NgramProposer([]).propose(3) == []
    assert NgramProposer([7]).propose(3) == []


def test_proposer_extend():
    p = NgramProposer([1, 2])
    p.extend([3, 1, 2])
    assert p.propose(1) == [3]


def test_longest_accepted_prefix():
    assert longest_accepted_prefix([1, 2, 3], [1, 2, 3, 9]) == 3
    assert longest_accepted_prefix([1, 2, 3], [1, 9, 3]) == 1
    assert longest_accepted_prefix([1], [2]) == 0
    assert longest_accepted_prefix([], [5]) == 0


# --------------------------------------------------- greedy equivalence e2e

@pytest.mark.parametrize("k", [1, 2, 4])
def test_speculative_matches_vanilla_greedy(k):
    prompt = [1, 5, 9, 1, 5]             # repetition seeds the n-gram table
    vanilla = list(make_engine(sequence_length=32).generate_tokens(prompt))
    spec_engine = make_engine(sequence_length=32, speculate_k=k)
    spec = list(spec_engine.generate_tokens(prompt))
    assert spec == vanilla
    stats = spec_engine.spec_stats
    assert stats["accepted"] <= stats["drafted"]
    # device steps must not exceed emitted tokens (each step emits ≥ 1)
    assert stats["steps"] <= len(spec)


def test_speculative_accepts_on_repetitive_model():
    """Random tiny-model greedy output degenerates into repetition, so the
    n-gram proposer must land accepted drafts and save device steps."""
    prompt = [3, 3, 3, 3]
    eng = make_engine(sequence_length=48, speculate_k=4)
    out = list(eng.generate_tokens(prompt))
    vanilla = list(make_engine(sequence_length=48).generate_tokens(prompt))
    assert out == vanilla
    if len(out) > 12:                     # long generations must speculate
        assert eng.spec_stats["accepted"] > 0
        assert eng.spec_stats["steps"] < len(out)


def test_speculative_respects_seq_len_cap():
    prompt = [1, 5, 9, 1, 5, 9]
    eng = make_engine(sequence_length=10, speculate_k=4)
    out = list(eng.generate_tokens(prompt))
    vanilla = list(make_engine(sequence_length=10).generate_tokens(prompt))
    assert out == vanilla


def test_speculation_ignored_when_sampling():
    eng = make_engine(sequence_length=16, temperature=0.7, speculate_k=4)
    out = list(eng.generate_tokens([1, 2, 3]))
    assert len(out) >= 1                  # sampled path runs, no spec stats
    assert not hasattr(eng, "spec_stats")


# -------------------------------------------------- draft-model speculation

def make_draft_engine(draft_seed, **args):
    """Target engine (seed 0 weights, same as make_engine) plus a draft model
    with ``draft_seed`` weights — seed 0 makes the draft identical."""
    import jax

    from llama_nuts_and_bolts_tpu.models.llama import init_random_params
    from llama_nuts_and_bolts_tpu.models.llama.loader import LoadedModel
    from llama_nuts_and_bolts_tpu.runtime import InferenceArgs, InferenceEngine
    from tests.test_streaming import RANKS, TINY, VOCAB

    def loaded(seed):
        params = jax.jit(init_random_params, static_argnums=(0,))(
            TINY, jax.random.PRNGKey(seed))
        return LoadedModel(params=params, cfg=TINY, vocab=VOCAB,
                           mergeable_ranks=RANKS, tensor_meta={})

    return InferenceEngine(loaded(0), InferenceArgs(**args),
                           draft_model=loaded(draft_seed))


def test_draft_model_identical_draft_accepts_everything():
    """Draft == target: every draft must be accepted and the output must be
    the vanilla greedy sequence."""
    prompt = [1, 5, 9]
    vanilla = list(make_engine(sequence_length=32).generate_tokens(prompt))
    eng = make_draft_engine(0, sequence_length=32, speculate_k=3)
    out = list(eng.generate_tokens(prompt))
    assert out == vanilla
    stats = eng.spec_stats
    assert stats["drafted"] > 0
    assert stats["accepted"] == stats["drafted"]
    assert stats["steps"] < len(out)      # accepted drafts saved device steps


def test_draft_model_different_weights_exact_equivalence():
    """A BAD draft (different random weights) may be rejected constantly but
    the emitted sequence must still be exactly the vanilla greedy one."""
    prompt = [1, 5, 9, 2]
    vanilla = list(make_engine(sequence_length=24).generate_tokens(prompt))
    eng = make_draft_engine(123, sequence_length=24, speculate_k=3)
    out = list(eng.generate_tokens(prompt))
    assert out == vanilla
    assert eng.spec_stats["accepted"] <= eng.spec_stats["drafted"]


def test_draft_proposer_state_survives_rejection():
    """After a rejection (extend with tokens that differ from its own drafts)
    the proposer's catch-up must leave it proposing exactly what a FRESH
    proposer for the same context proposes."""
    import jax

    from llama_nuts_and_bolts_tpu.models.llama import init_random_params
    from llama_nuts_and_bolts_tpu.models.llama.loader import LoadedModel
    from llama_nuts_and_bolts_tpu.runtime.speculative import DraftModelProposer
    from tests.test_streaming import RANKS, TINY, VOCAB

    params = jax.jit(init_random_params, static_argnums=(0,))(
        TINY, jax.random.PRNGKey(0))
    model = LoadedModel(params=params, cfg=TINY, vocab=VOCAB,
                        mergeable_ranks=RANKS, tensor_meta={})

    ctx = [1, 5, 9, 2]
    p = DraftModelProposer(model, ctx, seq_len=32)
    first = p.propose(3)
    assert len(first) == 3
    # pretend the target rejected everything and emitted two other tokens
    correction = [7, 3]
    p.extend(correction)
    fresh = DraftModelProposer(model, ctx + correction, seq_len=32)
    assert p.propose(3) == fresh.propose(3)


def test_draft_proposer_respects_seq_cap():
    eng = make_draft_engine(0, sequence_length=8, speculate_k=4)
    prompt = [1, 5, 9]
    out = list(eng.generate_tokens(prompt))
    vanilla = list(make_engine(sequence_length=8).generate_tokens(prompt))
    assert out == vanilla
