"""Paged KV cache: allocator rules, paged-vs-dense forward parity, the Pallas
paged-attention kernel (interpret mode), and PagedBatcher scheduler
equivalence with the sequential engine — including pool-starvation behavior."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from llama_nuts_and_bolts_tpu.kernels.paged_attention import paged_flash_decode
from llama_nuts_and_bolts_tpu.models.llama.model import KVCache, forward
from llama_nuts_and_bolts_tpu.models.llama.paged import (
    PagedKVPool,
    _gathered_attention,
    paged_decode_step,
    paged_prefill,
)
from llama_nuts_and_bolts_tpu.runtime.paged import BlockAllocator, PagedBatcher
from llama_nuts_and_bolts_tpu.runtime.types import GenerationState
from tests.test_continuous import drain, seq_tokens
from tests.test_streaming import ENGINE, make_engine

FWD = jax.jit(forward, static_argnums=(1,))
BS = 8  # test block size


# ---------------------------------------------------------------- allocator

def test_allocator_all_or_nothing():
    a = BlockAllocator(n_blocks=5, block_size=BS)   # ids 1..4 usable
    assert a.available == 4
    got = a.alloc(3)
    assert len(got) == 3 and all(0 < b < 5 for b in got)
    assert a.alloc(2) is None                        # only 1 left
    assert a.available == 1
    a.free(got)
    assert a.available == 4


def test_allocator_rejects_trash_free():
    a = BlockAllocator(n_blocks=4, block_size=BS)
    with pytest.raises(ValueError):
        a.free([0])


# ------------------------------------------------- forward parity vs dense

def greedy_dense(prompt, steps, seq_cap=32):
    cfg, params = ENGINE.model.cfg, ENGINE.model.params
    cache = KVCache.create(cfg, 1, seq_cap)
    toks = jnp.asarray([prompt], jnp.int32)
    logits, cache = FWD(params, cfg, toks, 0, cache)
    out = [int(jnp.argmax(logits[0, len(prompt) - 1]))]
    pos = len(prompt)
    for _ in range(steps - 1):
        t = jnp.asarray([[out[-1]]], jnp.int32)
        logits, cache = FWD(params, cfg, t, pos, cache)
        out.append(int(jnp.argmax(logits[0, -1])))
        pos += 1
    return out


def greedy_paged(prompt, steps, n_blocks=16, attn_impl="xla"):
    cfg, params = ENGINE.model.cfg, ENGINE.model.params
    pool = PagedKVPool.create(cfg, n_blocks, BS)
    max_blocks = 4
    blocks = list(range(1, max_blocks + 1))          # plenty for the test
    table = np.array(blocks, np.int32)
    S = -(-len(prompt) // BS) * BS                   # round up to whole blocks
    padded = np.zeros((1, S), np.int32)
    padded[0, :len(prompt)] = prompt
    logits, pool = jax.jit(paged_prefill, static_argnums=(1,))(
        params, cfg, jnp.asarray(padded), len(prompt) - 1, pool,
        jnp.asarray(table))
    out = [int(jnp.argmax(logits[0]))]
    pos = len(prompt)
    step = jax.jit(paged_decode_step, static_argnums=(1, 6))
    for _ in range(steps - 1):
        logits, pool = step(params, cfg, jnp.asarray([[out[-1]]], jnp.int32),
                            jnp.asarray([pos], jnp.int32), pool,
                            jnp.asarray(table[None]), attn_impl)
        out.append(int(jnp.argmax(logits[0])))
        pos += 1
    return out


def test_paged_matches_dense_greedy():
    prompt = [1, 5, 9, 2, 7]
    assert greedy_paged(prompt, 10) == greedy_dense(prompt, 10)


def test_paged_pallas_matches_dense_greedy():
    prompt = [3, 1, 4, 1, 5, 9, 2, 6, 5]             # crosses a block boundary
    assert greedy_paged(prompt, 8, attn_impl="pallas") == greedy_dense(prompt, 8)


def test_paged_prefill_rejects_ragged_length():
    cfg, params = ENGINE.model.cfg, ENGINE.model.params
    pool = PagedKVPool.create(cfg, 4, BS)
    with pytest.raises(ValueError):
        paged_prefill(params, cfg, jnp.zeros((1, BS + 1), jnp.int32), 0, pool,
                      jnp.asarray([1, 2], jnp.int32))


# ------------------------------------------------------------ pallas kernel

def test_paged_kernel_matches_gather_path():
    """Random pools/tables: kernel == gather+dense-attention oracle, with
    per-row positions mid-block and repeated trash entries."""
    key = jax.random.PRNGKey(0)
    B, H, KV, D, bs, n_blocks, M = 3, 4, 2, 8, 8, 9, 4
    ks = jax.random.split(key, 4)
    q = jax.random.normal(ks[0], (B, 1, H, D), jnp.float32).astype(jnp.bfloat16)
    pool_k = jax.random.normal(ks[1], (n_blocks, KV, bs, D), jnp.float32).astype(jnp.bfloat16)
    pool_v = jax.random.normal(ks[2], (n_blocks, KV, bs, D), jnp.float32).astype(jnp.bfloat16)
    tables = jnp.asarray([[1, 2, 3, 0], [4, 0, 0, 0], [5, 6, 7, 8]], jnp.int32)
    positions = jnp.asarray([19, 3, 31], jnp.int32)

    ref = _gathered_attention(q, pool_k, pool_v, tables, positions)
    got = paged_flash_decode(q, pool_k, pool_v, tables, positions, interpret=True)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32), rtol=3e-2, atol=3e-2)


# ------------------------------------------------------------ scheduler e2e

def make_paged(seq_len=24, n_slots=2, n_blocks=None):
    eng = make_engine(sequence_length=seq_len)
    return PagedBatcher(eng, n_slots=n_slots, n_blocks=n_blocks, block_size=BS)


def test_paged_batcher_matches_sequential():
    cb = make_paged(n_slots=4)
    prompts = [[1, 5, 9], [7, 8], [3, 3, 3, 3]]
    reqs = [cb.submit(p) for p in prompts]
    cb.run_until_idle()
    for p, r in zip(prompts, reqs):
        assert drain(r) == seq_tokens(p), f"divergence for prompt {p}"


def test_paged_slot_reuse_and_block_recycling():
    cb = make_paged(n_slots=1)
    r1 = cb.submit([1, 5, 9])
    cb.run_until_idle()
    free_after_r1 = cb.allocator.available
    r2 = cb.submit([7, 8])
    cb.run_until_idle()
    assert drain(r1) == seq_tokens([1, 5, 9])
    assert drain(r2) == seq_tokens([7, 8])
    assert cb.allocator.available == free_after_r1  # everything returned


def test_paged_more_requests_than_slots():
    cb = make_paged(n_slots=2)
    prompts = [[1, 5, 9], [7, 8], [3, 3, 3, 3], [2, 4], [9, 9, 1]]
    reqs = [cb.submit(p) for p in prompts]
    cb.run_until_idle()
    for p, r in zip(prompts, reqs):
        assert drain(r) == seq_tokens(p), f"divergence for prompt {p}"


def test_pool_starvation_finishes_gracefully_then_recovers():
    """A pool too small for both requests: the second waits (FIFO), every
    request still terminates, and each token matches the sequential engine
    for as long as the starved request was allowed to run."""
    # 4 usable blocks of 8 slots = 32 positions; seq_len 24 means one request
    # can use at most 3-4 blocks, leaving the second stalled until frees
    cb = make_paged(n_slots=2, n_blocks=5)
    r1 = cb.submit([1, 5, 9], max_new_tokens=6)
    r2 = cb.submit([7, 8], max_new_tokens=6)
    cb.run_until_idle()
    out1, out2 = drain(r1), drain(r2)
    ref1 = seq_tokens([1, 5, 9])[:6]
    ref2 = seq_tokens([7, 8])[:6]
    # prefixes must match the sequential engine; lengths may be cut short by
    # pool exhaustion but never exceed the cap
    assert [t for _, t in out1] == [t for _, t in ref1][:len(out1)]
    assert [t for _, t in out2] == [t for _, t in ref2][:len(out2)]
    assert out1[-1][0] != GenerationState.IN_PROGRESS
    assert out2[-1][0] != GenerationState.IN_PROGRESS
    # all blocks returned at the end
    assert cb.allocator.available == 4


def test_paged_step_quantum_matches_sequential():
    """step_quantum=4 over the paged pool: same streams as the sequential
    engine, including slot churn (more requests than slots) and caps that
    land mid-quantum."""
    eng = make_engine(sequence_length=24)
    cb = PagedBatcher(eng, n_slots=2, block_size=BS, step_quantum=4)
    prompts = [[1, 5, 9], [7, 8], [3, 3, 3, 3]]
    reqs = [cb.submit(p) for p in prompts]
    capped = cb.submit([2, 4], max_new_tokens=5)
    cb.run_until_idle()
    for p, r in zip(prompts, reqs):
        assert drain(r) == seq_tokens(p), f"divergence for prompt {p}"
    out = drain(capped)
    assert len(out) == 5
    assert [t for _s, t in out] == [t for _s, t in seq_tokens([2, 4])][:5]


def test_paged_step_quantum_pool_starvation():
    """Pool runs dry mid-quantum: the affected request force-finishes at its
    last backed position (tail tokens dropped, writes in the trash block),
    the other request is untouched, and every block returns to the pool."""
    eng = make_engine(sequence_length=24)
    cb = PagedBatcher(eng, n_slots=2, n_blocks=5, block_size=BS,
                      step_quantum=4)
    r1 = cb.submit([1, 5, 9], max_new_tokens=6)
    r2 = cb.submit([7, 8], max_new_tokens=6)
    cb.run_until_idle()
    out1, out2 = drain(r1), drain(r2)
    ref1 = seq_tokens([1, 5, 9])[:6]
    ref2 = seq_tokens([7, 8])[:6]
    assert [t for _, t in out1] == [t for _, t in ref1][:len(out1)]
    assert [t for _, t in out2] == [t for _, t in ref2][:len(out2)]
    assert out1[-1][0] != GenerationState.IN_PROGRESS
    assert out2[-1][0] != GenerationState.IN_PROGRESS
    assert cb.allocator.available == 4


def test_paged_sampled_deterministic():
    """Sampling state rides the paged scheduler too: same seed → same tokens,
    greedy neighbors untouched."""
    cb = make_paged(n_slots=2)
    a = cb.submit([1, 5, 9], max_new_tokens=8, temperature=1.2, seed=11)
    g = cb.submit([7, 8], max_new_tokens=8)
    cb.run_until_idle()
    b = cb.submit([1, 5, 9], max_new_tokens=8, temperature=1.2, seed=11)
    cb.run_until_idle()
    assert [t for _, t in drain(a)] == [t for _, t in drain(b)]
    assert [t for _, t in drain(g)] == [t for _, t in seq_tokens([7, 8])[:8]]


# ------------------------------------------------------- review regressions

def test_submit_rejects_prompt_larger_than_pool():
    """A prompt the pool can never hold must be rejected at submit, not
    left to wedge the FIFO head forever."""
    cb = make_paged(n_slots=2, n_blocks=3)      # 2 usable blocks of 8
    with pytest.raises(ValueError, match="blocks"):
        cb.submit(list(range(1, 18)))            # needs 17//8+1 = 3 blocks


def test_paged_honors_int8_kv_engine():
    eng = make_engine(sequence_length=24, kv_cache_dtype="int8")
    cb = PagedBatcher(eng, n_slots=1, block_size=BS)
    assert cb.pool.quantized and cb.pool.k_scale is not None


def test_cancel_releases_slot_and_blocks():
    cb = make_paged(n_slots=1, n_blocks=8)
    req = cb.submit([1, 5, 9], max_new_tokens=1000)
    cb.step()                                    # admit + first decode
    assert cb.slots[0] is req and cb.allocator.available < 7
    req.cancel()
    cb.step()                                    # sweep releases everything
    assert cb.slots[0] is None
    assert cb.allocator.available == 7
    # the freed slot admits a new request that behaves normally
    r2 = cb.submit([7, 8], max_new_tokens=4)
    cb.run_until_idle()
    assert [t for _, t in drain(r2)] == [t for _, t in seq_tokens([7, 8])[:4]]


# ------------------------------------------------------------- int8 KV pool

def greedy_dense_int8(prompt, steps, seq_cap=32):
    cfg, params = ENGINE.model.cfg, ENGINE.model.params
    cache = KVCache.create(cfg, 1, seq_cap, dtype=jnp.int8)
    toks = jnp.asarray([prompt], jnp.int32)
    logits, cache = FWD(params, cfg, toks, 0, cache)
    out = [int(jnp.argmax(logits[0, len(prompt) - 1]))]
    pos = len(prompt)
    for _ in range(steps - 1):
        t = jnp.asarray([[out[-1]]], jnp.int32)
        logits, cache = FWD(params, cfg, t, pos, cache)
        out.append(int(jnp.argmax(logits[0, -1])))
        pos += 1
    return out


def greedy_paged_int8(prompt, steps, n_blocks=16):
    cfg, params = ENGINE.model.cfg, ENGINE.model.params
    pool = PagedKVPool.create(cfg, n_blocks, BS, dtype=jnp.int8)
    table = np.arange(1, 5, dtype=np.int32)
    S = -(-len(prompt) // BS) * BS
    padded = np.zeros((1, S), np.int32)
    padded[0, :len(prompt)] = prompt
    logits, pool = jax.jit(paged_prefill, static_argnums=(1,))(
        params, cfg, jnp.asarray(padded), len(prompt) - 1, pool,
        jnp.asarray(table))
    out = [int(jnp.argmax(logits[0]))]
    pos = len(prompt)
    step = jax.jit(paged_decode_step, static_argnums=(1, 6))
    for _ in range(steps - 1):
        logits, pool = step(params, cfg, jnp.asarray([[out[-1]]], jnp.int32),
                            jnp.asarray([pos], jnp.int32), pool,
                            jnp.asarray(table[None]), "xla")
        out.append(int(jnp.argmax(logits[0])))
        pos += 1
    return out


def test_paged_int8_matches_dense_int8_greedy():
    """int8 paged pool stores the identical per-row quantization the dense
    int8 cache stores, so greedy tokens must match token-for-token."""
    prompt = [1, 5, 9, 2, 7]
    assert greedy_paged_int8(prompt, 10) == greedy_dense_int8(prompt, 10)


def test_paged_batcher_int8_end_to_end():
    eng = make_engine(sequence_length=24, kv_cache_dtype="int8")
    cb = PagedBatcher(eng, n_slots=2, block_size=BS)
    assert cb.pool.quantized
    prompts = [[1, 5, 9], [7, 8]]
    reqs = [cb.submit(p, max_new_tokens=8) for p in prompts]
    cb.run_until_idle()
    # oracle: the dense continuous batcher with the same int8 engine args
    from llama_nuts_and_bolts_tpu.runtime.continuous import ContinuousBatcher

    eng2 = make_engine(sequence_length=24, kv_cache_dtype="int8")
    cb2 = ContinuousBatcher(eng2, n_slots=2)
    refs = [cb2.submit(p, max_new_tokens=8) for p in prompts]
    cb2.run_until_idle()
    for r, ref in zip(reqs, refs):
        assert [t for _, t in drain(r)] == [t for _, t in drain(ref)]


def test_paged_pallas_int8_pool_matches_gather():
    """int8 pool through the paged Pallas kernel (int8xint8-MXU path,
    interpret mode) must agree with the gather-dequant oracle within the
    pool's own quantization noise."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from llama_nuts_and_bolts_tpu.kernels.paged_attention import (
        paged_flash_decode,
    )
    from llama_nuts_and_bolts_tpu.models.llama.paged import (
        _gathered_attention,
    )

    B, H, KV, D, bs, nb, M = 2, 8, 2, 128, 8, 7, 3
    ks_ = jax.random.split(jax.random.PRNGKey(2), 3)
    q = jax.random.normal(ks_[0], (B, 1, H, D), jnp.float32).astype(jnp.bfloat16)
    kf = np.asarray(jax.random.normal(ks_[1], (nb, KV, bs, D), jnp.float32))
    vf = np.asarray(jax.random.normal(ks_[2], (nb, KV, bs, D), jnp.float32))
    s_k = np.abs(kf).max(-1).clip(1e-8) / 127.0
    s_v = np.abs(vf).max(-1).clip(1e-8) / 127.0
    k8 = jnp.asarray(np.clip(np.rint(kf / s_k[..., None]), -127, 127), jnp.int8)
    v8 = jnp.asarray(np.clip(np.rint(vf / s_v[..., None]), -127, 127), jnp.int8)
    ksc = jnp.asarray(s_k, jnp.bfloat16)
    vsc = jnp.asarray(s_v, jnp.bfloat16)
    tables = jnp.asarray([[1, 2, 3], [4, 5, 6]], jnp.int32)
    positions = jnp.asarray([13, 21], jnp.int32)

    ref = np.asarray(_gathered_attention(q, k8, v8, tables, positions,
                                         ksc, vsc), np.float32)
    got = np.asarray(paged_flash_decode(q, k8, v8, tables, positions,
                                        interpret=True, pool_ks=ksc,
                                        pool_vs=vsc), np.float32)
    np.testing.assert_allclose(got, ref, rtol=5e-2, atol=5e-2)


def test_paged_batcher_int8_pallas_e2e():
    """--paged + int8 KV + pallas impl end to end on the CPU mesh."""
    eng = make_engine(sequence_length=24, kv_cache_dtype="int8")
    b = PagedBatcher(eng, n_slots=2, block_size=BS, attn_impl="pallas")
    reqs = [b.submit([3, 1, 4], max_new_tokens=5),
            b.submit([2, 7], max_new_tokens=5)]
    b.run_until_idle()
    ref_eng = make_engine(sequence_length=24, kv_cache_dtype="int8")
    rb = PagedBatcher(ref_eng, n_slots=2, block_size=BS, attn_impl="xla")
    ref_reqs = [rb.submit([3, 1, 4], max_new_tokens=5),
                rb.submit([2, 7], max_new_tokens=5)]
    rb.run_until_idle()
    for r, rr in zip(reqs, ref_reqs):
        assert list(r.tokens(timeout=5)) == list(rr.tokens(timeout=5))


# --------------------------------------------- speculative over paged pools

def test_paged_spec_matches_plain_greedy():
    """Speculative paged batching emits the sequential engine's greedy
    tokens for every slot on these configs (blocks backed ahead of each
    verify step). Note: the K+1-row verify forward is a separately compiled
    program, so argmax near-ties COULD resolve differently on another
    platform — this equivalence is empirical, mirroring the chunked-decode
    contract (runtime/engine.py docstring)."""
    eng = make_engine(sequence_length=32)
    cb = PagedBatcher(eng, n_slots=3, block_size=BS, speculate_k=3)
    prompts = [[3, 3, 3, 3], [1, 5, 9], [7, 8]]
    reqs = [cb.submit(p) for p in prompts]
    cb.run_until_idle()
    for p, r in zip(prompts, reqs):
        assert drain(r) == seq_tokens(p, seq_len=32), \
            f"divergence for prompt {p}"
    assert cb.spec_stats["spec_steps"] > 0
    # every block returned
    assert cb.allocator.available == cb.allocator.n_blocks - 1


def test_paged_spec_accepts_and_crosses_block_boundaries():
    """Accepted chains must stride across block boundaries (the backed
    pos..pos+K window spans blocks at BS=8, K=4)."""
    eng = make_engine(sequence_length=48)
    cb = PagedBatcher(eng, n_slots=2, block_size=BS, speculate_k=4)
    r = cb.submit([3, 3, 3, 3])
    cb.run_until_idle()
    ref = seq_tokens([3, 3, 3, 3], seq_len=48)
    assert drain(r) == ref
    if len(ref) > 12:
        assert cb.spec_stats["accepted"] > 0


def test_paged_spec_pool_starvation_clamps_drafts():
    """A pool too small to back pos..pos+K clamps the draft count instead of
    stalling; every request still terminates with sequential-prefix tokens
    and all blocks come back."""
    eng = make_engine(sequence_length=32)
    cb = PagedBatcher(eng, n_slots=2, block_size=BS, n_blocks=5,
                      speculate_k=4)
    r1 = cb.submit([1, 5, 9], max_new_tokens=6)
    r2 = cb.submit([7, 8], max_new_tokens=6)
    cb.run_until_idle()
    out1, out2 = drain(r1), drain(r2)
    ref1 = seq_tokens([1, 5, 9])[:6]
    ref2 = seq_tokens([7, 8])[:6]
    assert [t for _, t in out1] == [t for _, t in ref1][:len(out1)]
    assert [t for _, t in out2] == [t for _, t in ref2][:len(out2)]
    assert out1[-1][0] != GenerationState.IN_PROGRESS
    assert out2[-1][0] != GenerationState.IN_PROGRESS
    assert cb.allocator.available == 4


def test_paged_spec_mixed_greedy_and_sampled():
    """Sampled slots ride the paged speculative step without speculating;
    greedy neighbors still match the sequential engine, sampled slots stay
    seed-deterministic."""
    eng = make_engine(sequence_length=32)
    cb = PagedBatcher(eng, n_slots=2, block_size=BS, speculate_k=3)
    rg = cb.submit([1, 5, 9])
    rs = cb.submit([7, 8], temperature=0.9, seed=11)
    cb.run_until_idle()
    assert drain(rg) == seq_tokens([1, 5, 9], seq_len=32)
    out_s1 = [t for _, t in drain(rs)]
    cb2 = PagedBatcher(make_engine(sequence_length=32), n_slots=2,
                       block_size=BS, speculate_k=3)
    rs2 = cb2.submit([7, 8], temperature=0.9, seed=11)
    cb2.run_until_idle()
    assert [t for _, t in drain(rs2)] == out_s1


def test_fuzzed_paged_schedule_matches_sequential():
    """Randomized submit/cancel/step interleavings against the PAGED batcher
    with a deliberately tight pool (starvation in the mix): surviving
    requests match the sequential engine exactly; cancelled or
    pool-starved requests deliver a prefix. Twin of the continuous fuzz."""
    rng = np.random.RandomState(4242)
    cb = make_paged(n_slots=2, n_blocks=9)  # 8 usable blocks of 8 slots
    cb.step_quantum = 2
    prompts = [[1 + int(rng.randint(90))
                for _ in range(1 + int(rng.randint(6)))]
               for _ in range(8)]
    expected = {i: seq_tokens(p) for i, p in enumerate(prompts)}
    reqs, cancelled, nxt = {}, set(), 0
    while nxt < len(prompts) or cb.has_work:
        act = rng.rand()
        if act < 0.35 and nxt < len(prompts):
            reqs[nxt] = cb.submit(prompts[nxt])
            nxt += 1
        elif act < 0.45 and reqs:
            i = int(rng.choice(sorted(reqs)))
            if i not in cancelled:
                reqs[i].cancel()
                cancelled.add(i)
        else:
            cb.step()
    for i, r in reqs.items():
        got = drain(r)
        if i in cancelled:
            assert got == expected[i][:len(got)], i
        else:
            # a starved request finishes early at a sequential PREFIX with
            # a SEQ_LEN terminal — full equality unless the pool cut it off
            toks = [t for _s, t in got]
            exp = [t for _s, t in expected[i]]
            assert toks == exp[:len(toks)], i
            assert len(toks) > 0, i
