"""Tokenizer tests: exact-match fuzzing against the real tiktoken library,
ranks-file ingest, special-token table, and chat-template framing.

The reference validates its BPE against tiktoken's Rust implementation
(reference: src/inference/tokenize.go:109 comment); here the pip ``tiktoken``
package is the same oracle, driven with identical ranks + pattern.
"""

import base64
import random
import string

import pytest
import tiktoken

from llama_nuts_and_bolts_tpu.tokenizer import (
    PromptPart,
    TiktokenModel,
    Vocabulary,
    byte_pair_merge,
    encode_ordinary,
    load_tiktoken_model,
    render_chat_tokens,
)
from llama_nuts_and_bolts_tpu.tokenizer.bpe import LLAMA3_SPLIT_PATTERN
from llama_nuts_and_bolts_tpu.tokenizer.tiktoken_io import build_special_tokens


def make_ranks():
    """Synthetic but BPE-shaped ranks: all 256 bytes + trained merges."""
    ranks = {bytes([i]): i for i in range(256)}
    corpus = (
        "the quick brown fox jumps over the lazy dog. "
        "What is your name? I'll tell you, it's 42! "
        "hello world ümläut café 日本語 \U0001F600\U0001F1FA\U0001F1F8 "
        "    indented\n\nnewlines\r\n 12345 987 tokens tokens tokens"
    ).encode("utf-8")
    words = [bytes([b]) for b in corpus]
    next_rank = 256
    for _ in range(200):
        pairs = {}
        for a, b in zip(words, words[1:]):
            merged = a + b
            if merged not in ranks:
                pairs[merged] = pairs.get(merged, 0) + 1
        if not pairs:
            break
        best = max(pairs, key=lambda k: (pairs[k], -len(k)))
        ranks[best] = next_rank
        next_rank += 1
        out, i = [], 0
        while i < len(words):
            if i + 1 < len(words) and words[i] + words[i + 1] == best:
                out.append(best)
                i += 2
            else:
                out.append(words[i])
                i += 1
        words = out
    return ranks


RANKS = make_ranks()
SPECIAL = build_special_tokens(len(RANKS))
ORACLE = tiktoken.Encoding(
    name="synthetic",
    pat_str=LLAMA3_SPLIT_PATTERN,
    mergeable_ranks=RANKS,
    special_tokens=SPECIAL,
)


FUZZ_STRINGS = [
    "",
    "hello",
    "Hello, World!",
    "What is your name?",
    "I'll you've we're don't it's",
    "    leading spaces",
    "trailing spaces    ",
    "a  b   c    d",
    "\n\n",
    "line1\nline2\r\nline3",
    "12345678901234567890",
    "3.14159 is pi; 2,718 too",
    "café naïve über",
    "日本語のテスト",
    "\U0001F600\U0001F601\U0001F602",
    "mixed \U0001F600 text 日本 and 123 numbers!",
    "\U0001F1FA\U0001F1F8 flags \U0001F1F9\U0001F1F7",
    "tab\tseparated\tvalues",
    "!@#$%^&*()_+-=[]{}|;':\",./<>?",
    "   nbsp",
    "‍ zwj sequences \U0001F468‍\U0001F469‍\U0001F467",
]


@pytest.mark.parametrize("text", FUZZ_STRINGS, ids=range(len(FUZZ_STRINGS)))
def test_encode_matches_tiktoken(text):
    assert encode_ordinary(text, RANKS) == ORACLE.encode_ordinary(text)


def test_encode_random_fuzz():
    rng = random.Random(1234)
    alphabet = (
        string.ascii_letters + string.digits + string.punctuation + " \t\n\r"
        + "éü日本\U0001F600‍"
    )
    for _ in range(300):
        n = rng.randrange(0, 60)
        text = "".join(rng.choice(alphabet) for _ in range(n))
        assert encode_ordinary(text, RANKS) == ORACLE.encode_ordinary(text), repr(text)


def test_byte_pair_merge_decodes_back():
    rng = random.Random(99)
    for _ in range(100):
        piece = bytes(rng.randrange(256) for _ in range(rng.randrange(1, 20)))
        ids = byte_pair_merge(piece, RANKS)
        decoded = b"".join(
            next(tok for tok, r in RANKS.items() if r == i) for i in ids
        )
        assert decoded == piece


def test_ranks_file_ingest(tmp_path):
    path = tmp_path / "tokenizer.model"
    with open(path, "wb") as f:
        for token, rank in sorted(RANKS.items(), key=lambda kv: kv[1]):
            f.write(base64.b64encode(token) + b" " + str(rank).encode() + b"\n")
    model = load_tiktoken_model(str(path))
    assert model.mergeable_ranks == RANKS
    assert len(model.special_tokens) == 256
    assert model.bos_id == len(RANKS)
    assert model.special_tokens["<|end_of_text|>"] == len(RANKS) + 1
    assert model.special_tokens["<|start_header_id|>"] == len(RANKS) + 6
    assert model.special_tokens["<|eot_id|>"] == len(RANKS) + 9
    assert model.special_tokens["<|reserved_special_token_2|>"] == len(RANKS) + 11
    assert model.special_tokens["<|reserved_special_token_246|>"] == len(RANKS) + 255
    assert model.pad_id == -1 and model.unknown_id == -1
    assert model.stop_token_ids == [len(RANKS) + 8, len(RANKS) + 9]


def make_vocab():
    model = TiktokenModel(
        mergeable_ranks=RANKS,
        special_tokens=SPECIAL,
        bos_id=SPECIAL["<|begin_of_text|>"],
        eos_id=SPECIAL["<|end_of_text|>"],
        stop_token_ids=[SPECIAL["<|eom_id|>"], SPECIAL["<|eot_id|>"]],
    )
    return Vocabulary.from_tiktoken(model)


def test_special_token_text_is_not_special():
    """A user TYPING '<|eot_id|>' must get ordinary text tokens, never the
    special id — otherwise chat input could forge message boundaries.
    encode_ordinary has no special-token path by design (docs/02)."""
    vocab = make_vocab()
    ids = encode_ordinary("<|eot_id|>", RANKS)
    assert SPECIAL["<|eot_id|>"] not in ids
    assert ids == ORACLE.encode_ordinary("<|eot_id|>")
    # and the chat template embeds user-supplied special text as text
    chat = render_chat_tokens([PromptPart("user", "<|eot_id|>")], vocab, RANKS)
    assert chat.count(SPECIAL["<|eot_id|>"]) == 1  # only the framing one


def test_chat_template_framing():
    vocab = make_vocab()
    parts = [PromptPart("system", "Be brief."), PromptPart("user", "Hi?")]
    ids = render_chat_tokens(parts, vocab, RANKS)

    s = SPECIAL
    expected = (
        [s["<|begin_of_text|>"]]
        + [s["<|start_header_id|>"]] + ORACLE.encode_ordinary("system")
        + [s["<|end_header_id|>"]] + ORACLE.encode_ordinary("\n\n")
        + ORACLE.encode_ordinary("Be brief.") + [s["<|eot_id|>"]]
        + [s["<|start_header_id|>"]] + ORACLE.encode_ordinary("user")
        + [s["<|end_header_id|>"]] + ORACLE.encode_ordinary("\n\n")
        + ORACLE.encode_ordinary("Hi?") + [s["<|eot_id|>"]]
        # implicit empty assistant part, no trailing <|eot_id|>
        + [s["<|start_header_id|>"]] + ORACLE.encode_ordinary("assistant")
        + [s["<|end_header_id|>"]] + ORACLE.encode_ordinary("\n\n")
    )
    assert ids == expected


def test_render_prefix_tokens_is_exact_chat_prefix():
    from llama_nuts_and_bolts_tpu.tokenizer import render_prefix_tokens

    vocab = make_vocab()
    sys_part = PromptPart("system", "Be brief.")
    prefix = render_prefix_tokens([sys_part], vocab, RANKS)
    for user_text in ("Hi?", "", "a much longer user question here"):
        full = render_chat_tokens([sys_part, PromptPart("user", user_text)],
                                  vocab, RANKS)
        assert full[:len(prefix)] == prefix
    # empty parts are skipped, matching render_chat_tokens
    assert render_prefix_tokens([PromptPart("system", "")], vocab, RANKS) == [
        SPECIAL["<|begin_of_text|>"]]


def test_chat_template_skips_empty_parts():
    vocab = make_vocab()
    with_empty = render_chat_tokens(
        [PromptPart("system", ""), PromptPart("user", "Q")], vocab, RANKS
    )
    without = render_chat_tokens([PromptPart("user", "Q")], vocab, RANKS)
    assert with_empty == without


def test_vocab_roundtrip_and_debug_string():
    vocab = make_vocab()
    ids = encode_ordinary("hello world", RANKS)
    text = b"".join(vocab.piece(i) for i in ids).decode("utf-8")
    assert text == "hello world"
    assert vocab.is_stop(SPECIAL["<|eot_id|>"])
    assert not vocab.is_stop(SPECIAL["<|begin_of_text|>"])
    dbg = vocab.debug_string(ids[:2])
    assert dbg.startswith("[id: ")


def test_real_tokenizer_golden_prompt(model_dir):
    """Reference golden prompt ids (reference:
    src/model/llamatransformer_simulated_test.go:1369)."""
    import os

    model = load_tiktoken_model(os.path.join(model_dir, "tokenizer.model"))
    vocab = Vocabulary.from_tiktoken(model)
    ids = render_chat_tokens(
        [PromptPart("user", "What is your name?")], vocab, model.mergeable_ranks
    )
    assert ids == [128000, 128006, 882, 128007, 271, 3923, 374, 701, 836, 30,
                   128009, 128006, 78191, 128007, 271]
