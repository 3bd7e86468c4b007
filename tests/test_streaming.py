"""Streaming detokenizer/emoji tests with scripted token replays — the same
scenarios the reference drives through its fake console (reference:
cmd/main_test.go:148-323): flag emoji built from byte fragments, emoji+text,
multiple emojis, ZWJ composites — plus engine-level generation on a tiny model.

Aliases come from the inlined gemoji table (runtime/gemoji.py) and match
the reference's ``enescakir/emoji`` aliases exactly (``:flag_for_turkey:``,
``:man_superhero:``, …); segmentation is table-driven like the reference's
``searchMinimumEmojiCount``.
"""


import numpy as np
import pytest

import jax

from llama_nuts_and_bolts_tpu.io.params import ModelArgs
from llama_nuts_and_bolts_tpu.models.llama import init_random_params
from llama_nuts_and_bolts_tpu.models.llama.loader import LoadedModel
from llama_nuts_and_bolts_tpu.runtime import (
    GenerationState,
    InferenceArgs,
    InferenceEngine,
)
from llama_nuts_and_bolts_tpu.runtime.emoji import (
    emoji_alias,
    is_emoji_sequence,
    segment_emoji,
)
from llama_nuts_and_bolts_tpu.tokenizer import TiktokenModel, Vocabulary
from llama_nuts_and_bolts_tpu.tokenizer.tiktoken_io import build_special_tokens


from llama_nuts_and_bolts_tpu.utils.hexcodes import replace_hex_with_bytes as hex_to_bytes


def make_vocab_and_ranks():
    ranks = {bytes([i]): i for i in range(256)}
    for i, tok in enumerate([b" I", b"hello", b" world", b"Hi"]):
        ranks[tok] = 256 + i
    special = build_special_tokens(len(ranks))
    model = TiktokenModel(
        mergeable_ranks=ranks, special_tokens=special,
        bos_id=special["<|begin_of_text|>"], eos_id=special["<|end_of_text|>"],
        stop_token_ids=[special["<|eom_id|>"], special["<|eot_id|>"]],
    )
    return Vocabulary.from_tiktoken(model), ranks


VOCAB, RANKS = make_vocab_and_ranks()

TINY = ModelArgs(
    dim=32, n_layers=2, n_heads=4, n_kv_heads=2, vocab_size=VOCAB.size,
    multiple_of=16, norm_eps=1e-5, max_sequence_length=64,
)


def make_engine(**args):
    params = jax.jit(init_random_params, static_argnums=(0,))(TINY, jax.random.PRNGKey(0))
    model = LoadedModel(params=params, cfg=TINY, vocab=VOCAB,
                        mergeable_ranks=RANKS, tensor_meta={})
    return InferenceEngine(model, InferenceArgs(**args))


def byte_token_ids(byte_str: str):
    return [b for b in hex_to_bytes(byte_str)]  # single-byte tokens are ids 0..255


def replay(engine, ids):
    return list(engine.generate_string_from_output_tokens(ids))


ENGINE = make_engine(sequence_length=24)


# -------------------------------------------------------- emoji primitives


def test_is_emoji_sequence():
    assert is_emoji_sequence("\U0001F1F9\U0001F1F7")      # flag pair
    assert is_emoji_sequence("\U0001F440")                # eyes
    assert not is_emoji_sequence("\U0001F1F9")            # lone regional
    assert not is_emoji_sequence("\U0001F570")            # mantelpiece clock without VS16: not a gemoji key
    assert is_emoji_sequence("\U0001F570\uFE0F")         # with VS16 it is
    assert is_emoji_sequence("\U0001F9B8\u200d\u2642\ufe0f")  # man superhero ZWJ
    assert not is_emoji_sequence("A")
    assert not is_emoji_sequence("")


def test_emoji_alias():
    assert emoji_alias("\U0001F1F9\U0001F1F7") == ":flag_for_turkey:"
    assert emoji_alias("\U0001F440") == ":eyes:"
    assert emoji_alias("\U0001F570") is None
    assert emoji_alias("x") is None


def test_segment_emoji():
    assert segment_emoji("\U0001F1F9\U0001F1F7") == ["\U0001F1F9\U0001F1F7"]
    assert segment_emoji("\U0001F6EC\U0001F570") == ["\U0001F6EC", "\U0001F570"]
    fam = "\U0001F468\u200d\U0001F469\u200d\U0001F467"
    assert segment_emoji(fam + "\U0001F440") == [fam, "\U0001F440"]


# ------------------------------------------------------ scripted streaming


def test_turkey_flag_stream():
    """Byte-by-byte flag assembly (reference: TestSimulatedEmojiOutputTurkeyFlag)."""
    ids = byte_token_ids("<0xF0><0x9F><0x87><0xB9>") + byte_token_ids("<0xF0><0x9F><0x87><0xB7>")
    parts = replay(ENGINE, ids)
    assert [p.added_to_waiting for p in parts] == [True, True, True, False] * 2
    # waiting-bytes display states while assembling the first rune
    assert parts[0].token.byte_fallback_string() == "<0xF0>"
    # 4th token completes 🇹: emitted, annotated with the per-rune name fallback
    assert parts[3].decoded_string == "\U0001F1F9"
    assert parts[3].waiting_runes_extra_str == \
        "[:REGIONAL INDICATOR SYMBOL LETTER T:\\U0001F1F9]"
    # 8th token completes 🇷: the pair is recognized as one flag emoji
    assert parts[7].decoded_string == "\U0001F1F7"
    assert parts[7].waiting_runes_extra_str == \
        "[:flag_for_turkey:\\U0001F1F9\\U0001F1F7]"


def test_emoji_then_text_stream():
    """Eyes emoji then a normal text token flushes the pending annotation
    (reference: TestSimulatedEmojiOutputEmojiWithText)."""
    ids = byte_token_ids("<0xF0><0x9F><0x91><0x80>") + [RANKS[b" I"]]
    parts = replay(ENGINE, ids)
    assert parts[3].decoded_string == "\U0001F440"
    assert parts[3].waiting_runes_extra_str == "[:eyes:\\U0001F440]"
    # the text token emits the pending annotation followed by its piece
    assert parts[4].decoded_string == "[:eyes:\\U0001F440] I"
    assert parts[4].waiting_runes_extra_str == ""


def test_multiple_emojis_stream():
    """Sequential distinct emojis each annotated; non-presentation rune falls
    back to its name (reference: TestSimulatedEmojiOutputMultipleEmojis)."""
    ids = (byte_token_ids("<0xF0><0x9F><0x9B><0xAC>")     # 🛬 airplane arriving
           + byte_token_ids("<0xF0><0x9F><0x95><0xB0>"))  # 🕰 mantelpiece clock
    parts = replay(ENGINE, ids)
    assert parts[3].waiting_runes_extra_str == "[:airplane_arrival:\\U0001F6EC]"
    assert parts[7].waiting_runes_extra_str == (
        "[:airplane_arrival:\\U0001F6EC]"
        "[:MANTELPIECE CLOCK:\\U0001F570]"
    )


def test_zwj_composite_stream():
    """Man-superhero ZWJ sequence composes into one annotated emoji
    (reference: TestSimulatedEmojiOutputMultipleCompositeEmojis)."""
    ids = (byte_token_ids("<0xF0><0x9F><0xA6><0xB8>")   # 🦸
           + byte_token_ids("<0xE2><0x80><0x8D>")       # ZWJ
           + byte_token_ids("<0xEF><0xB8><0x8F>"))      # nothing yet: VS16 alone
    # feed 🦸 + ZWJ + ♂ + VS16
    ids = (byte_token_ids("<0xF0><0x9F><0xA6><0xB8>")
           + byte_token_ids("<0xE2><0x80><0x8D>")
           + byte_token_ids("<0xE2><0x99><0x82>")
           + byte_token_ids("<0xEF><0xB8><0x8F>"))
    parts = replay(ENGINE, ids)
    final = parts[-1]
    assert final.waiting_runes_extra_str == \
        "[:man_superhero:\\U0001F9B8\\U0000200D\\U00002642\\U0000FE0F]"


def test_incomplete_bytes_flushed_at_end():
    """Generation ending mid-codepoint resends waiting parts as <0xNN> text
    (reference: src/inference/inference.go:134-156)."""
    ids = byte_token_ids("<0xF0><0x9F>")
    parts = replay(ENGINE, ids)
    assert len(parts) == 4  # 2 waiting + 2 resends
    assert parts[0].added_to_waiting and parts[1].added_to_waiting
    assert parts[2].is_resend_of_waiting and parts[2].decoded_string == "<0xF0>"
    assert parts[3].is_resend_of_waiting and parts[3].decoded_string == "<0x9F>"


def test_plain_text_stream():
    ids = [RANKS[b"hello"], RANKS[b" world"]]
    parts = replay(ENGINE, ids)
    assert "".join(p.decoded_string for p in parts) == "hello world"
    assert not any(p.added_to_waiting for p in parts)


# ------------------------------------------------------- engine generation


def test_generate_tokens_terminates_and_is_deterministic():
    prompt = [1, 5, 9]
    out1 = list(ENGINE.generate_tokens(prompt))
    out2 = list(ENGINE.generate_tokens(prompt))
    assert out1 == out2
    assert len(out1) <= ENGINE.seq_len - len(prompt)
    states = [s for s, _ in out1]
    assert all(s == GenerationState.IN_PROGRESS for s in states[:-1])
    assert states[-1] in (GenerationState.FINISHED_BY_REACHING_EOS,
                          GenerationState.FINISHED_BY_REACHING_SEQ_LEN)


def test_generate_rejects_long_prompt():
    with pytest.raises(ValueError):
        list(ENGINE.generate_tokens(list(range(30))))


def test_prefill_bucketing_shares_executables():
    from llama_nuts_and_bolts_tpu.runtime.engine import prefill_bucket

    assert prefill_bucket(3, 200) == 16
    assert prefill_bucket(16, 200) == 16
    assert prefill_bucket(17, 200) == 32
    assert prefill_bucket(300, 200) == 200


def test_generate_string_end_to_end():
    prompt = [1, 5, 9]
    parts = list(ENGINE.generate_string(prompt))
    assert parts, "no parts generated"
    assert parts[-1].generation_state in (
        GenerationState.FINISHED_BY_REACHING_EOS,
        GenerationState.FINISHED_BY_REACHING_SEQ_LEN,
    )


def test_sampling_mode_runs():
    engine = make_engine(sequence_length=16, temperature=0.8, top_k=8, top_p=0.9)
    out = list(engine.generate_tokens([1, 2]))
    assert out and all(0 <= t < VOCAB.size for _, t in out)


# ---------------------------------------------------------- prefix caching


def test_prefix_cache_matches_cold_generation():
    engine = make_engine(sequence_length=24)
    prompt = [1, 5, 9, 2, 7]
    cold = list(engine.generate_tokens(prompt))
    engine.cache_prefix(prompt[:3])
    assert engine._match_prefix(prompt) == tuple(prompt[:3])
    warm = list(engine.generate_tokens(prompt))
    assert warm == cold
    # snapshot must survive reuse (decode donates its copy, not the original)
    warm2 = list(engine.generate_tokens(prompt))
    assert warm2 == cold


def test_prefix_cache_exact_prompt_match():
    engine = make_engine(sequence_length=24)
    prompt = [1, 5, 9]
    cold = list(engine.generate_tokens(prompt))
    engine.cache_prefix(prompt)  # prefix == whole prompt
    warm = list(engine.generate_tokens(prompt))
    assert warm == cold


def test_prefix_cache_longest_match_wins_and_evicts():
    engine = make_engine(sequence_length=24)
    engine.cache_prefix([1])
    engine.cache_prefix([1, 5])
    assert engine._match_prefix([1, 5, 9]) == (1, 5)
    assert engine._match_prefix([2, 5]) is None
    for i in range(engine.MAX_CACHED_PREFIXES):
        engine.cache_prefix([3, i])
    assert len(engine._prefix_cache) == engine.MAX_CACHED_PREFIXES
    assert engine._match_prefix([1]) is None  # FIFO-evicted


def test_chunked_prefill_matches_unchunked():
    prompt = list(np.random.RandomState(7).randint(0, 256, size=21))
    cold = list(make_engine(sequence_length=48).generate_tokens(prompt))
    for chunk in (4, 5, 16, 21, 64):
        chunked = make_engine(sequence_length=48, prefill_chunk=chunk)
        assert list(chunked.generate_tokens(prompt)) == cold, f"chunk={chunk}"


def test_chunked_prefill_near_capacity_prompt():
    # tail lands close to the end of the cache: its bucket must be capped by
    # the remaining room, not the whole cache (regression: ValueError)
    prompt = list(np.random.RandomState(11).randint(0, 256, size=21))
    cold = list(make_engine(sequence_length=24).generate_tokens(prompt))
    warm = list(make_engine(sequence_length=24, prefill_chunk=4)
                .generate_tokens(prompt))
    assert warm == cold


def test_prefix_cache_near_capacity_prompt():
    # suffix prefill close to the cache end must also cap its bucket
    prompt = list(np.random.RandomState(13).randint(0, 256, size=21))
    cold = list(make_engine(sequence_length=24).generate_tokens(prompt))
    engine = make_engine(sequence_length=24)
    engine.cache_prefix(prompt[:15])
    assert list(engine.generate_tokens(prompt)) == cold


def test_chunked_prefill_composes_with_prefix_cache():
    prompt = list(np.random.RandomState(3).randint(0, 256, size=18))
    cold = list(make_engine(sequence_length=48).generate_tokens(prompt))
    engine = make_engine(sequence_length=48, prefill_chunk=4)
    engine.cache_prefix(prompt[:9])  # prefix itself prefills chunked
    assert list(engine.generate_tokens(prompt)) == cold


def test_prefix_cache_rejects_bad_prefix():
    engine = make_engine(sequence_length=16)
    with pytest.raises(ValueError):
        engine.cache_prefix([])
    with pytest.raises(ValueError):
        engine.cache_prefix(list(range(16)))


# ----------------------------------------------------------- gemoji table

def test_gemoji_table_coverage_and_tiebreak():
    from llama_nuts_and_bolts_tpu.runtime.gemoji import alias_table

    t = alias_table()
    # all 258 regional-indicator flags + the 3 tag-sequence flags present
    flags = [k for k in t if len(k) == 2 and all(
        0x1F1E6 <= ord(c) <= 0x1F1FF for c in k)]
    assert len(flags) == 258
    assert t["\U0001F3F4\U000E0067\U000E0062\U000E0073\U000E0063"
             "\U000E0074\U000E007F"] == "flag_for_scotland"
    # all 25 RGI family ZWJ sequences generated
    fams = [a for a in t.values() if a.startswith("family_")]
    assert len(fams) == 25
    # gendered roles ride their base emoji + ZWJ + gender sign + VS16
    assert t["\U0001F9D9‍♀️"] == "woman_mage"
    assert t["\U0001F9DC‍♂️"] == "merman"
    assert t["\U0001F469‍\U0001F680"] == "woman_astronaut"
    # exact-match keys: text-default emoji require VS16, like the gemoji map
    assert "❤" not in t and t["❤️"] == "red_heart"


def test_segmentation_prefers_longest_table_key():
    """ZWJ families segment as ONE emoji when complete, per-rune when not —
    exactly the reference's table-driven greedy segmentation."""
    fam = "\U0001F468‍\U0001F469‍\U0001F467‍\U0001F466"
    assert segment_emoji(fam) == [fam]
    partial = "\U0001F468‍\U0001F469"       # man ZWJ woman: not a key
    assert segment_emoji(partial) == ["\U0001F468", "‍", "\U0001F469"]


# ------------------------------------------------------- chunked decode


def test_chunked_decode_matches_per_token():
    """decode_chunk=k must produce the identical (state, token) stream as the
    per-token path — the scan body IS the single-step program."""
    prompt = [1, 5, 9]
    ref = list(make_engine(sequence_length=24, decode_chunk=1)
               .generate_tokens(prompt))
    for k in (2, 4, 7):
        out = list(make_engine(sequence_length=24, decode_chunk=k)
                   .generate_tokens(prompt))
        assert out == ref, f"chunk={k} diverged"


def test_chunked_decode_seq_len_tail():
    """Termination by sequence length must be exact with chunking: the tail
    that doesn't fit a whole chunk falls back to per-token steps."""
    for k in (3, 4, 16):
        eng1 = make_engine(sequence_length=12, decode_chunk=1)
        engk = make_engine(sequence_length=12, decode_chunk=k)
        prompt = [2, 4]
        assert list(engk.generate_tokens(prompt)) == \
            list(eng1.generate_tokens(prompt))


def test_chunked_decode_string_transcript_identical():
    prompt = [1, 5, 9]
    p1 = [(p.decoded_string, p.generation_state) for p in
          make_engine(sequence_length=24, decode_chunk=1).generate_string(prompt)]
    p4 = [(p.decoded_string, p.generation_state) for p in
          make_engine(sequence_length=24, decode_chunk=4).generate_string(prompt)]
    assert p4 == p1


def test_chunked_decode_dispatch_count():
    """The point of chunking: ~1/k device dispatches on the decode path."""
    calls = {"n": 0}
    eng = make_engine(sequence_length=24, decode_chunk=4)
    real = eng._decode_chunk(4)

    def counting(*a, **kw):
        calls["n"] += 1
        return real(*a, **kw)

    # greedy chunk executables are keyed (k, cache_bucket, "g")
    eng._chunk_fns[(4, eng.seq_len, "g")] = counting
    out = list(eng.generate_tokens([1, 5, 9]))
    n_decoded = len(out)
    assert calls["n"] > 0, "chunk path never engaged"
    assert calls["n"] <= (n_decoded // 4) + 2


def test_sampled_chunked_decode_matches_per_token():
    """Chunked sampling splits the RNG key per scan step exactly like the
    per-token loop, so a given seed yields the identical token stream."""
    for params in ({"temperature": 0.8},
                   {"temperature": 1.3, "top_k": 8, "top_p": 0.9}):
        ref = list(make_engine(sequence_length=16, decode_chunk=1, seed=5,
                               **params).generate_tokens([1, 2]))
        for k in (3, 8):
            out = list(make_engine(sequence_length=16, decode_chunk=k, seed=5,
                                   **params).generate_tokens([1, 2]))
            assert out == ref, (params, k)
    # different seed still diverges (the RNG is actually consumed)
    other = list(make_engine(sequence_length=16, decode_chunk=8, seed=6,
                             temperature=0.8).generate_tokens([1, 2]))
    base = list(make_engine(sequence_length=16, decode_chunk=8, seed=5,
                            temperature=0.8).generate_tokens([1, 2]))
    assert other != base


# ------------------------------------------------------- attn-impl probe


def test_attn_impl_probe_picks_measured_fastest():
    eng = make_engine(sequence_length=24, attn_impl="probe")
    chosen = eng.autotune_attn_impl(iters=2)
    assert chosen == min(eng._probe_timings, key=eng._probe_timings.get)
    assert eng._attn_impl(1) == chosen
    # prefill impl still follows the auto rules, not the decode probe
    assert eng._attn_impl(16) in ("xla", "flash")
    # generation works end-to-end in probe mode and stays deterministic
    ref = list(make_engine(sequence_length=24).generate_tokens([1, 5, 9]))
    assert list(eng.generate_tokens([1, 5, 9])) == ref


def test_attn_impl_probe_is_one_shot_per_bucket():
    eng = make_engine(sequence_length=24, attn_impl="probe")
    eng._attn_impl(1)
    first = dict(eng._probed_decode_impl)
    assert set(first) == {24}
    # same bucket never re-probes (re-entry would TypeError on None)
    eng.autotune_attn_impl = None
    assert eng._attn_impl(1) == first[24]
    assert eng._attn_impl(1, cache_len=24) == first[24]


def test_attn_impl_probe_keyed_by_cache_bucket():
    """cache_bucket means requests decode at different buffer lengths; the
    probe result is cached per bucket, not once per engine lifetime."""
    eng = make_engine(sequence_length=64, attn_impl="probe")
    eng._attn_impl(1, cache_len=16)
    eng._attn_impl(1, cache_len=64)
    assert set(eng._probed_decode_impl) == {16, 64}
    seen = dict(eng._probed_decode_impl)
    eng.autotune_attn_impl = None  # any further probe would TypeError
    assert eng._attn_impl(1, cache_len=16) == seen[16]
    assert eng._attn_impl(1, cache_len=64) == seen[64]


def test_chunked_decode_under_tensor_parallelism():
    """decode_chunk with an active tp mesh: the chunk scan runs the same
    sharded per-step program; transcripts match the unsharded per-token
    stream exactly."""
    from llama_nuts_and_bolts_tpu.models.llama.loader import LoadedModel
    from llama_nuts_and_bolts_tpu.parallel import make_mesh, shard_params

    ref = list(make_engine(sequence_length=16, decode_chunk=1)
               .generate_tokens([1, 5, 9]))

    params = jax.jit(init_random_params, static_argnums=(0,))(
        TINY, jax.random.PRNGKey(0))
    mesh = make_mesh(tp=2, dp=1)
    model = LoadedModel(params=shard_params(params, mesh), cfg=TINY,
                        vocab=VOCAB, mergeable_ranks=RANKS, tensor_meta={})
    eng = InferenceEngine(model, InferenceArgs(sequence_length=16,
                                               decode_chunk=4), mesh=mesh)
    assert list(eng.generate_tokens([1, 5, 9])) == ref


# -------------------------------------------------- request cache bucketing


def test_max_new_tokens_caps_stream_exactly():
    prompt = [1, 5, 9]
    full = list(make_engine(sequence_length=48).generate_tokens(prompt))
    for m in (1, 3, 5):
        capped = list(make_engine(sequence_length=48)
                      .generate_tokens(prompt, max_new_tokens=m))
        assert capped == full[:m]
    assert list(make_engine(sequence_length=48)
                .generate_tokens(prompt, max_new_tokens=0)) == []


def test_max_new_tokens_buckets_cache_buffer():
    """A long-context engine serving a short-budget request must allocate a
    SMALL cache buffer (the measured perf point: step cost tracks buffer
    size, not attended length)."""
    cfg = TINY.with_(max_sequence_length=1024)
    params = jax.jit(init_random_params, static_argnums=(0,))(
        cfg, jax.random.PRNGKey(0))
    model = LoadedModel(params=params, cfg=cfg, vocab=VOCAB,
                        mergeable_ranks=RANKS, tensor_meta={})

    def engine():
        return InferenceEngine(model, InferenceArgs(sequence_length=600))

    eng = engine()
    assert eng.cache_bucket(3, 5) == 256
    assert eng.cache_bucket(3, None) == 600
    assert eng.cache_bucket(250, 100) == 512
    assert eng.cache_bucket(500, 600) == 600   # capped at the context

    sizes = []
    eng2 = engine()
    orig = eng2.new_cache

    def spy(batch=1, max_seq=None):
        sizes.append(max_seq or eng2.seq_len)
        return orig(batch, max_seq)

    eng2.new_cache = spy
    capped = list(eng2.generate_tokens([1, 5, 9], max_new_tokens=4))
    assert sizes == [256], sizes
    # tokens identical to the full-buffer run's prefix
    eng3 = engine()
    full = []
    for i, st in enumerate(eng3.generate_tokens([1, 5, 9])):
        full.append(st)
        if i >= 3:
            break
    assert capped == full[:4]


def test_bucketed_cache_with_prefix_snapshot():
    """Prefix-cache snapshots (sized at the engine context) seed bucketed
    requests via truncation; output equals the cold run."""
    cfg = TINY.with_(max_sequence_length=1024)
    params = jax.jit(init_random_params, static_argnums=(0,))(
        cfg, jax.random.PRNGKey(0))
    model = LoadedModel(params=params, cfg=cfg, vocab=VOCAB,
                        mergeable_ranks=RANKS, tensor_meta={})
    eng = InferenceEngine(model, InferenceArgs(sequence_length=600))
    prompt = [1, 5, 9, 2, 7]
    cold = list(eng.generate_tokens(prompt, max_new_tokens=4))
    eng.cache_prefix(prompt[:3])
    warm = list(eng.generate_tokens(prompt, max_new_tokens=4))
    assert warm == cold
    # the snapshot itself must stay intact for a second use
    assert list(eng.generate_tokens(prompt, max_new_tokens=4)) == cold


def test_sampled_rng_state_exact_after_mid_chunk_end():
    """A sampled request ending mid-chunk (cap or stop) must leave the
    engine RNG where per-token decoding would have: a SECOND unseeded
    request on the same engine is identical across decode_chunk settings."""
    def two_requests(chunk):
        eng = make_engine(sequence_length=32, temperature=0.9, seed=11,
                          decode_chunk=chunk)
        a = list(eng.generate_tokens([1, 5, 9], max_new_tokens=3))
        b = list(eng.generate_tokens([2, 4], max_new_tokens=6))
        return a, b

    ref = two_requests(1)
    for k in (4, 8):
        assert two_requests(k) == ref, f"chunk={k}"


def test_forced_attn_impl_honored_for_int8_decode():
    """--attn-impl xla must actually disable the flash kernel for int8
    decode (the int8 auto rule must not shadow a forced impl); int8 +
    forced flash still falls back to xla for prefill, which the forward
    pass would reject."""
    eng = make_engine(sequence_length=24, kv_cache_dtype="int8",
                      attn_impl="xla")
    assert eng._attn_impl(1) == "xla"
    eng2 = make_engine(sequence_length=24, kv_cache_dtype="int8",
                       attn_impl="flash")
    assert eng2._attn_impl(1) == "flash"
    assert eng2._attn_impl(16) == "xla"   # prefill fallback


def test_int8_auto_rule_gates_on_bucket_divisibility(monkeypatch):
    """--kv-cache int8 at a cache length no flash block size divides (e.g.
    --context 5000) must route decode to XLA instead of raising at first
    trace in model.py (round-4 advisor finding)."""
    import types

    import llama_nuts_and_bolts_tpu.runtime.engine as engine_mod

    eng = make_engine(sequence_length=64, kv_cache_dtype="int8")
    monkeypatch.setattr(engine_mod.jax, "devices",
                        lambda: [types.SimpleNamespace(platform="tpu")])
    monkeypatch.setattr(eng, "_kernels_viable", lambda: True)
    assert eng._attn_impl(1, cache_len=5000) == "xla"   # 5000 % 128 != 0
    assert eng._attn_impl(1, cache_len=4096) == "flash"


def test_probe_excludes_candidates_that_fail_to_trace(monkeypatch):
    """attn_impl='probe' must survive a candidate impl raising at
    trace/compile time: the candidate is dropped, the survivor wins
    (round-4 advisor finding — previously the exception escaped the
    probe). Here the faked-TPU platform makes the Pallas flash candidate
    fail to lower on the CPU backend."""
    import types

    import llama_nuts_and_bolts_tpu.runtime.engine as engine_mod

    eng = make_engine(sequence_length=24, attn_impl="probe")
    monkeypatch.setattr(engine_mod.jax, "devices",
                        lambda: [types.SimpleNamespace(platform="tpu")])
    monkeypatch.setattr(eng, "_kernels_viable", lambda: True)
    choice = eng.autotune_attn_impl(iters=1)
    assert choice == "xla"
    assert eng._probed_decode_impl[24] == "xla"


def test_chunk_executable_eviction_prefers_sampled():
    """Greedy chunk executables (one per cache bucket) must survive a
    client cycling distinct sampled (top_k, top_p) keys: when the cache
    is full, _decode_chunk evicts a SAMPLED entry, not the hot greedy."""
    eng = make_engine(sequence_length=16, decode_chunk=4)
    g_keys = [(4, 256 * (1 << i), "g") for i in range(4)]
    for k in g_keys:
        eng._chunk_fns[k] = f"greedy-{k[1]}"
    for i in range(eng.MAX_CHUNK_EXECUTABLES - len(g_keys)):
        eng._chunk_fns[(4, eng.seq_len, "s", i, 0.9)] = f"sampled-{i}"
    assert len(eng._chunk_fns) == eng.MAX_CHUNK_EXECUTABLES
    # the real path: a new sampled config must evict a sampled entry
    eng.args.temperature = 0.7
    eng.args.top_k = 999
    eng._decode_chunk(4, sampled=True)
    assert all(k in eng._chunk_fns for k in g_keys)
    assert (4, eng.seq_len, "s", 999, 1.0) in eng._chunk_fns
