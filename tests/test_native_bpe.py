"""Native C++ BPE merge: build, cross-check against the Python merge and the
tiktoken oracle, and confirm the speedup that justifies its existence."""

import random
import string
import time

import pytest

from llama_nuts_and_bolts_tpu.tokenizer.bpe import byte_pair_merge, encode_ordinary
from llama_nuts_and_bolts_tpu.tokenizer.native import NativeBpe, native_available

from tests.test_tokenizer import ORACLE, RANKS


pytestmark = pytest.mark.skipif(
    not native_available(), reason="g++ unavailable; native BPE not built")


@pytest.fixture(scope="module")
def native():
    return NativeBpe(RANKS)


def test_pieces_match_python(native):
    rng = random.Random(42)
    for _ in range(300):
        piece = bytes(rng.randrange(256) for _ in range(rng.randrange(1, 24)))
        assert native.encode_piece(piece) == byte_pair_merge(piece, RANKS), piece


def test_encode_ordinary_native_matches_oracle():
    texts = [
        "the quick brown fox", "What is your name?", "1234 tokens",
        "café 日本語 \U0001F600", "   spaces\n\nnewlines",
    ]
    for t in texts:
        assert encode_ordinary(t, RANKS, use_native=True) == ORACLE.encode_ordinary(t)
        assert encode_ordinary(t, RANKS, use_native=False) == ORACLE.encode_ordinary(t)


def test_unencodable_piece_returns_none():
    partial = {tok: r for tok, r in RANKS.items() if len(tok) > 1 or tok != b"q"}
    n = NativeBpe(partial)
    assert n.encode_piece(b"q") is None


def test_native_is_faster():
    rng = random.Random(7)
    words = ["".join(rng.choice(string.ascii_lowercase) for _ in range(rng.randrange(2, 12)))
             for _ in range(200)]
    text = " ".join(words) * 20
    native = NativeBpe(RANKS)
    from llama_nuts_and_bolts_tpu.tokenizer.bpe import _SPLIT_RE

    pieces = [m.group().encode() for m in _SPLIT_RE.finditer(text)]

    t0 = time.perf_counter()
    for p in pieces:
        native.encode_piece(p)
    t_native = time.perf_counter() - t0

    t0 = time.perf_counter()
    for p in pieces:
        if p not in RANKS:
            byte_pair_merge(p, RANKS)
        else:
            [RANKS[p]]
    t_python = time.perf_counter() - t0
    # the native merge should win clearly; allow slack for CI noise
    assert t_native < t_python, (t_native, t_python)


def test_native_encode_thread_safe():
    """Concurrent encode_piece calls on ONE NativeBpe (the serving layer
    shares the engine's tokenizer across handler threads) must produce
    exactly the serial results. Regression: a shared output buffer made
    concurrent requests corrupt each other's prompt token ids."""
    import threading

    from llama_nuts_and_bolts_tpu.tokenizer.native import NativeBpe, native_available

    if not native_available():
        import pytest
        pytest.skip("native library unavailable")

    ranks = {bytes([i]): i for i in range(256)}
    ranks[b"he"] = 256
    ranks[b"ll"] = 257
    ranks[b"hell"] = 258
    ranks[b"hello"] = 259
    ranks[b" wo"] = 260
    nb = NativeBpe(ranks)
    pieces = [b"hello", b" world", b"hello hello hello", b"abcdefgh" * 8,
              b"\xf0\x9f\x87\xb9\xf0\x9f\x87\xb7"]
    serial = {p: nb.encode_piece(p) for p in pieces}

    errors = []
    def worker(seed):
        import random
        rnd = random.Random(seed)
        for _ in range(300):
            p = pieces[rnd.randrange(len(pieces))]
            got = nb.encode_piece(p)
            if got != serial[p]:
                errors.append((p, got, serial[p]))
    threads = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors[:3]
