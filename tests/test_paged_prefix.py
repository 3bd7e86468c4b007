"""Automatic prefix caching for the paged KV pool.

Covers: the refcounted hash-addressed allocator (Python twin + C++ native,
driven with the same random op stream), chained block hashing, suffix-only
shared prefill parity with the unshared path, scheduler-level sharing
(tokens identical with and without the cache, fewer prefill blocks written),
int8 pools, eviction under pressure, and stat reporting.
"""

import random

import pytest

from llama_nuts_and_bolts_tpu.runtime.block_pool import (
    PrefixBlockAllocator,
    _PyPool,
    chain_block_hashes,
    native_available,
)
from llama_nuts_and_bolts_tpu.runtime.paged import PagedBatcher
from tests.test_continuous import drain, seq_tokens
from tests.test_streaming import make_engine

BS = 8  # test block size


# ---------------------------------------------------------------- hashing

def test_chain_hashes_full_blocks_only():
    assert chain_block_hashes([1, 2, 3], 4) == []
    assert len(chain_block_hashes(list(range(9)), 4)) == 2


def test_chain_hashes_depend_on_whole_prefix():
    a = chain_block_hashes([1, 2, 3, 4, 5, 6, 7, 8], 4)
    b = chain_block_hashes([9, 2, 3, 4, 5, 6, 7, 8], 4)
    assert a[0] != b[0]
    assert a[1] != b[1]          # same second block, different prefix
    c = chain_block_hashes([1, 2, 3, 4, 9, 9, 9, 9], 4)
    assert a[0] == c[0] and a[1] != c[1]


# ------------------------------------------------------------- allocator

@pytest.fixture(params=["python"] + (["native"] if native_available() else []))
def alloc(request):
    return PrefixBlockAllocator(8, BS, backend=request.param)


def test_alloc_release_refcount(alloc):
    got = alloc.alloc(3)
    assert len(got) == 3 and alloc.available == 4
    alloc.release(got)
    assert alloc.available == 7


def test_shared_block_released_once_per_holder(alloc):
    [b] = alloc.alloc(1)
    alloc.register(123, b)
    assert alloc.lookup(123) == b            # second holder
    alloc.release([b])
    assert alloc.refcount(b) == 1            # still held
    alloc.release([b])
    assert alloc.refcount(b) == 0
    assert alloc.available == 7              # cached-free counts as available


def test_cached_block_revives_after_full_release(alloc):
    [b] = alloc.alloc(1)
    alloc.register(55, b)
    alloc.release([b])
    assert alloc.lookup(55) == b             # revived from cached-free
    assert alloc.refcount(b) == 1
    alloc.release([b])


def test_eviction_is_lru_and_drops_hash(alloc):
    blocks = alloc.alloc(7)                  # whole pool
    for i, b in enumerate(blocks):
        alloc.register(1000 + i, b)
    alloc.release(blocks)                    # all cached-free now
    assert alloc.lookup(1003) == blocks[3]   # touch -> MRU
    alloc.release([blocks[3]])
    fresh = alloc.alloc(2)                   # evicts LRU-oldest: blocks 0, 1
    assert set(fresh) == {blocks[0], blocks[1]}
    assert alloc.lookup(1000) is None and alloc.lookup(1001) is None
    assert alloc.lookup(1002) == blocks[2]   # survivors intact
    assert alloc.stats["evictions"] == 2


def test_release_invalid_raises(alloc):
    with pytest.raises(ValueError):
        alloc.release([0])
    [b] = alloc.alloc(1)
    alloc.release([b])
    with pytest.raises(ValueError):
        alloc.release([b])                   # double free


def test_register_requires_live_block(alloc):
    with pytest.raises(ValueError):
        alloc.register(9, 5)                 # never allocated


def test_register_collisions_are_noops(alloc):
    a, b = alloc.alloc(2)
    alloc.register(7, a)
    alloc.register(7, b)                     # hash taken: no-op
    alloc.register(8, a)                     # block already hashed: no-op
    assert alloc.lookup(7) == a
    assert alloc.lookup(8) is None
    alloc.release([a, a, b])                 # a: owner + lookup(7) holder


@pytest.mark.skipif(not native_available(), reason="g++ build unavailable")
def test_native_matches_python_on_random_op_stream():
    """Property test: both implementations observe identical results for an
    arbitrary interleaving of alloc/release/lookup/register."""
    rng = random.Random(1234)
    py, cc = _PyPool(16), PrefixBlockAllocator(16, BS, backend="native")._impl
    live: list = []                          # parallel view of live ids
    hashes = list(range(100, 120))
    for step in range(3000):
        op = rng.choice(["alloc", "release", "lookup", "register", "avail"])
        if op == "alloc":
            n = rng.randint(0, 4)
            a, b = py.alloc(n), cc.alloc(n)
            assert (a is None) == (b is None), step
            if a is not None:
                assert a == b, step          # identical free-list policy
                live.extend(a)
        elif op == "release" and live:
            b = live.pop(rng.randrange(len(live)))
            py.release([b]), cc.release([b])
        elif op == "lookup":
            h = rng.choice(hashes)
            a, b = py.lookup(h), cc.lookup(h)
            assert (a is None) == (b is None) and (a == b or a is None), step
            if a is not None:
                live.append(a)
        elif op == "register" and live:
            b = rng.choice(live)
            h = rng.choice(hashes)
            py.register(h, b), cc.register(h, b)
        assert py.available() == cc.available(), step
        assert py.cached_count() == cc.cached_count(), step
    assert py.lookups == cc.lookups and py.hits == cc.hits
    assert py.evictions == cc.evictions


# ---------------------------------------------------------- scheduler e2e

def make_paged(seq_len=24, n_slots=2, n_blocks=None, prefix_cache=True,
               **engine_args):
    eng = make_engine(sequence_length=seq_len, **engine_args)
    return PagedBatcher(eng, n_slots=n_slots, n_blocks=n_blocks,
                        block_size=BS, prefix_cache=prefix_cache)


LONG = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8, 9, 7, 9, 3, 2]   # 17 = 2 blocks + 1


def test_prefix_hit_outputs_identical():
    """Same prompt twice: second run rides the first's blocks and must emit
    token-identical output to the sequential engine."""
    cb = make_paged()
    ref = seq_tokens(LONG)
    r1 = cb.submit(LONG)
    cb.run_until_idle()
    assert drain(r1) == ref
    hits_before = cb.allocator.stats["prefix_hits"]
    r2 = cb.submit(LONG)
    cb.run_until_idle()
    assert drain(r2) == ref
    assert cb.allocator.stats["prefix_hits"] >= hits_before + 2  # both blocks


def test_partial_prefix_hit_outputs_identical():
    """Second prompt shares only the first block; the differing tail must be
    recomputed and the output match the sequential engine."""
    other = LONG[:BS] + [9, 9, 4, 2, 7]
    cb = make_paged()
    r1 = cb.submit(LONG)
    cb.run_until_idle()
    drain(r1)
    r2 = cb.submit(other)
    cb.run_until_idle()
    assert drain(r2) == seq_tokens(other)
    assert cb.allocator.stats["prefix_hits"] >= 1


def test_block_multiple_prompt_keeps_one_suffix_token():
    """A prompt of exactly N blocks may share at most N-1 of them — the
    admission prefill must still compute the last row's logits."""
    prompt = LONG[:16]                       # exactly 2 blocks
    cb = make_paged()
    r1 = cb.submit(prompt)
    cb.run_until_idle()
    drain(r1)
    r2 = cb.submit(prompt)
    cb.run_until_idle()
    assert drain(r2) == seq_tokens(prompt)


def test_prefix_cache_off_matches_on():
    on, off = make_paged(), make_paged(prefix_cache=False)
    for cb in (on, off):
        r = cb.submit(LONG)
        cb.run_until_idle()
        drain(r)
    ra = on.submit(LONG)
    on.run_until_idle()
    rb = off.submit(LONG)
    off.run_until_idle()
    assert drain(ra) == drain(rb)
    assert on.allocator.stats["prefix_hits"] > 0
    assert off.allocator.stats["prefix_lookups"] == 0


def test_concurrent_identical_prompts_share():
    """Two identical prompts admitted in the same step: the second shares the
    first's just-registered blocks while the first is still decoding."""
    cb = make_paged(n_slots=2)
    ref = seq_tokens(LONG)
    r1, r2 = cb.submit(LONG), cb.submit(LONG)
    cb.run_until_idle()
    assert drain(r1) == ref and drain(r2) == ref
    assert cb.allocator.stats["prefix_hits"] >= 2


def test_shared_blocks_survive_first_requests_release():
    """The sharer keeps decoding correctly after the original finishes and
    releases its references."""
    cb = make_paged(n_slots=2)
    r1 = cb.submit(LONG, max_new_tokens=1)   # finishes almost immediately
    r2 = cb.submit(LONG)
    cb.run_until_idle()
    assert [t for _, t in drain(r1)] == [t for _, t in seq_tokens(LONG)[:1]]
    assert drain(r2) == seq_tokens(LONG)


def test_eviction_under_pressure_stays_correct():
    """A pool too small to keep cached blocks around evicts them; later
    identical prompts miss but still produce correct output."""
    cb = make_paged(n_slots=1, n_blocks=5)   # 4 usable blocks
    ref_long = seq_tokens(LONG)
    other = [8, 8, 8, 8, 8, 8, 8, 8, 1, 2, 3]
    for prompt, ref in ((LONG, ref_long), (other, seq_tokens(other)),
                        (LONG, ref_long)):
        r = cb.submit(prompt)
        cb.run_until_idle()
        assert drain(r) == ref, prompt
    assert cb.allocator.stats["evictions"] > 0


def test_int8_pool_prefix_hit_outputs_identical():
    cb = make_paged(kv_cache_dtype="int8")
    assert cb.pool.quantized
    r1 = cb.submit(LONG)
    cb.run_until_idle()
    out1 = drain(r1)
    r2 = cb.submit(LONG)
    cb.run_until_idle()
    assert drain(r2) == out1
    assert cb.allocator.stats["prefix_hits"] >= 2


def test_sampled_request_seed_unaffected_by_prefix_hit():
    """Seeded sampling folds in the request's own positions, so a cache hit
    must not change the sampled stream."""
    cb = make_paged(n_slots=1)
    a = cb.submit(LONG, max_new_tokens=5, temperature=1.1, seed=42)
    cb.run_until_idle()
    b = cb.submit(LONG, max_new_tokens=5, temperature=1.1, seed=42)  # hit
    cb.run_until_idle()
    assert [t for _, t in drain(a)] == [t for _, t in drain(b)]
    assert cb.allocator.stats["prefix_hits"] >= 2


def test_all_blocks_returned_after_shared_requests():
    cb = make_paged(n_slots=2)
    for r in [cb.submit(LONG), cb.submit(LONG)]:
        cb.run_until_idle()
        drain(r)
    assert cb.allocator.available == cb.allocator.n_blocks - 1
