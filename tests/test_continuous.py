"""Continuous batching: per-row-position forward correctness + scheduler
equivalence — requests admitted mid-flight must produce exactly the tokens
the sequential engine produces for the same prompts."""

import numpy as np

import jax
import jax.numpy as jnp

from llama_nuts_and_bolts_tpu.models.llama.model import KVCache, forward
from llama_nuts_and_bolts_tpu.runtime.continuous import ContinuousBatcher
from llama_nuts_and_bolts_tpu.runtime.types import GenerationState
from tests.test_streaming import ENGINE, make_engine

FWD = jax.jit(forward, static_argnums=(1,))


def seq_tokens(prompt, seq_len=24):
    return list(make_engine(sequence_length=seq_len).generate_tokens(prompt))


# ------------------------------------------------- vector-position forward

def test_vector_start_pos_matches_scalar():
    """A batch where every row happens to share the same position must equal
    the scalar-start_pos forward bit-for-bit."""
    cfg = ENGINE.model.cfg
    params = ENGINE.model.params
    tokens = jnp.asarray([[3], [9]], dtype=jnp.int32)

    cache_s = KVCache.create(cfg, 2, 16)
    ref, cache_s = FWD(params, cfg, tokens, 5, cache_s)
    cache_v = KVCache.create(cfg, 2, 16)
    got, cache_v = FWD(params, cfg, tokens, jnp.asarray([5, 5], jnp.int32), cache_v)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    np.testing.assert_array_equal(np.asarray(cache_v.k), np.asarray(cache_s.k))


def test_vector_start_pos_rows_independent():
    """Two rows at different positions = each row run alone at its position."""
    cfg = ENGINE.model.cfg
    params = ENGINE.model.params

    # row contexts: prefill each row alone to its own depth first
    pa = jnp.asarray([[1, 2, 3, 4]], dtype=jnp.int32)
    pb = jnp.asarray([[7, 8]], dtype=jnp.int32)
    ca = KVCache.create(cfg, 1, 16)
    cb = KVCache.create(cfg, 1, 16)
    la, ca = FWD(params, cfg, pa, 0, ca)
    lb, cb = FWD(params, cfg, pb, 0, cb)

    # single-row decode steps (scalar path)
    ta = jnp.argmax(la[:, -1:], -1).astype(jnp.int32)
    tb = jnp.argmax(lb[:, -1:], -1).astype(jnp.int32)
    ra, _ = FWD(params, cfg, ta, 4, ca)
    rb, _ = FWD(params, cfg, tb, 2, cb)

    # same two rows in one batch at vector positions
    cache = KVCache(k=jnp.concatenate([ca.k, cb.k], axis=1),
                    v=jnp.concatenate([ca.v, cb.v], axis=1))
    toks = jnp.concatenate([ta, tb], axis=0)
    got, _ = FWD(params, cfg, toks, jnp.asarray([4, 2], jnp.int32), cache)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ra[0]),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(rb[0]),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_array_equal(np.asarray(got).argmax(-1),
                                  np.vstack([np.asarray(ra).argmax(-1)[0],
                                             np.asarray(rb).argmax(-1)[0]]))


# ------------------------------------------------------- scheduler e2e

def drain(req):
    return [(s, t) for s, t in req.tokens(timeout=30)]


def test_single_request_matches_sequential():
    eng = make_engine(sequence_length=24)
    cb = ContinuousBatcher(eng, n_slots=4)
    req = cb.submit([1, 5, 9])
    cb.run_until_idle()
    assert drain(req) == seq_tokens([1, 5, 9])


def test_concurrent_requests_match_sequential():
    eng = make_engine(sequence_length=24)
    cb = ContinuousBatcher(eng, n_slots=4)
    prompts = [[1, 5, 9], [7, 8], [3, 3, 3, 3]]
    reqs = [cb.submit(p) for p in prompts]
    cb.run_until_idle()
    for p, r in zip(prompts, reqs):
        assert drain(r) == seq_tokens(p), f"divergence for prompt {p}"


def test_staggered_admission_matches_sequential():
    """A request admitted mid-flight (slots already decoding) is unaffected
    by its neighbors, and doesn't disturb them."""
    eng = make_engine(sequence_length=24)
    cb = ContinuousBatcher(eng, n_slots=2)
    r1 = cb.submit([1, 5, 9])
    for _ in range(3):
        cb.step()
    r2 = cb.submit([7, 8])
    cb.run_until_idle()
    assert drain(r1) == seq_tokens([1, 5, 9])
    assert drain(r2) == seq_tokens([7, 8])


def test_more_requests_than_slots():
    """Requests queue for slots; every one completes with correct output."""
    eng = make_engine(sequence_length=24)
    cb = ContinuousBatcher(eng, n_slots=2)
    prompts = [[1, 5, 9], [7, 8], [3, 3, 3, 3], [2, 4], [9, 9, 1]]
    reqs = [cb.submit(p) for p in prompts]
    cb.run_until_idle()
    for p, r in zip(prompts, reqs):
        assert drain(r) == seq_tokens(p), f"divergence for prompt {p}"


def test_slot_reuse_after_finish():
    """A slot whose request finished gets reused; the newcomer must not see
    the previous occupant's cache."""
    eng = make_engine(sequence_length=24)
    cb = ContinuousBatcher(eng, n_slots=1)
    r1 = cb.submit([1, 5, 9])
    cb.run_until_idle()
    r2 = cb.submit([7, 8])
    cb.run_until_idle()
    assert drain(r1) == seq_tokens([1, 5, 9])
    assert drain(r2) == seq_tokens([7, 8])


def test_pipelined_step_keeps_one_step_in_flight():
    """The plain scheduler keeps exactly one decode step in flight (its
    fetch overlaps the next step's execution); a pending submission flushes
    the pipeline BEFORE admission so a freed slot can never be re-admitted
    under a live step."""
    eng = make_engine(sequence_length=24)
    cb = ContinuousBatcher(eng, n_slots=2)
    r1 = cb.submit([1, 5, 9])
    cb.step()
    assert len(cb._inflight) == 1            # steps stay in flight...
    cb.step()
    cb.step()
    assert len(cb._inflight) == cb.PIPELINE_DEPTH   # ...up to the depth cap
    r2 = cb.submit([7, 8])
    cb.step()                                 # must flush, then admit r2
    assert r2.slot is not None
    cb.run_until_idle()
    assert drain(r1) == seq_tokens([1, 5, 9])
    assert drain(r2) == seq_tokens([7, 8])


def test_step_quantum_matches_sequential():
    """step_quantum=4 (4 chained decode steps per dispatch, the RPC-device
    default shape) must deliver exactly the sequential engine's streams —
    including EOS/cap mid-quantum (later tokens in the quantum dropped) and
    staggered admission at quantum granularity."""
    eng = make_engine(sequence_length=24)
    cb = ContinuousBatcher(eng, n_slots=2, step_quantum=4)
    r1 = cb.submit([1, 5, 9])
    cb.step()
    r2 = cb.submit([7, 8])
    r3 = cb.submit([3, 3, 3, 3])          # queues behind the first two
    cb.run_until_idle()
    assert drain(r1) == seq_tokens([1, 5, 9])
    assert drain(r2) == seq_tokens([7, 8])
    assert drain(r3) == seq_tokens([3, 3, 3, 3])


def test_step_quantum_respects_max_new_tokens():
    """A cap that lands mid-quantum must truncate exactly (no quantum
    overshoot in the delivered stream)."""
    eng = make_engine(sequence_length=24)
    cb = ContinuousBatcher(eng, n_slots=1, step_quantum=4)
    r = cb.submit([1, 5, 9], max_new_tokens=6)
    cb.run_until_idle()
    toks = drain(r)
    assert len(toks) == 6
    assert [t for _s, t in toks] == [t for _s, t in seq_tokens([1, 5, 9])][:6]


def test_finish_mid_pipeline_identity_drop_and_reuse():
    """A request that finishes while later quanta are in flight leaves
    stale rows in the pipeline; the per-entry occupancy snapshots drop
    them by request IDENTITY, and the freed slot's next occupant (admitted
    after a flush) streams exactly the sequential tokens — including under
    a quantum, where the stale rows span multiple steps."""
    eng = make_engine(sequence_length=24)
    cb = ContinuousBatcher(eng, n_slots=1, step_quantum=2)
    r1 = cb.submit([1, 5, 9], max_new_tokens=3)
    cb.run_until_idle()
    r2 = cb.submit([7, 8])
    cb.run_until_idle()
    out1 = drain(r1)
    assert len(out1) == 3
    assert [t for _s, t in out1] == [t for _s, t in seq_tokens([1, 5, 9])][:3]
    assert drain(r2) == seq_tokens([7, 8])
    # backlog + churn at quantum granularity stays exact
    rs = [cb.submit(p) for p in ([3, 3, 3, 3], [2, 4], [9, 9, 1])]
    cb.run_until_idle()
    for p, r in zip([[3, 3, 3, 3], [2, 4], [9, 9, 1]], rs):
        assert drain(r) == seq_tokens(p)


def test_cancel_mid_flight_with_pipeline():
    """Cancelling while a step is in flight flushes first, frees the slot,
    and the surviving neighbor's stream is untouched."""
    eng = make_engine(sequence_length=24)
    cb = ContinuousBatcher(eng, n_slots=2)
    r1 = cb.submit([1, 5, 9])
    r2 = cb.submit([7, 8])
    for _ in range(3):
        cb.step()
    r2.cancel()
    cb.run_until_idle()
    assert drain(r1) == seq_tokens([1, 5, 9])
    assert cb.slots == [None, None]
    # the freed slot is reusable and clean
    r3 = cb.submit([3, 3, 3, 3])
    cb.run_until_idle()
    assert drain(r3) == seq_tokens([3, 3, 3, 3])


def test_fuzzed_admission_cancel_schedule_matches_sequential():
    """Randomized interleavings of submit/cancel/step (seeded, 3 schedules)
    against a quantum-2 pipelined batcher: every surviving request's stream
    must equal the sequential engine's exactly; a cancelled request must
    have delivered a PREFIX of it. Covers the interactions no directed test
    enumerates — admission splicing into a live chain, cancel of a
    just-admitted request, back-to-back slot reuse."""
    for seed in (1234, 99, 7):
        rng = np.random.RandomState(seed)
        eng = make_engine(sequence_length=24)
        cb = ContinuousBatcher(eng, n_slots=2, step_quantum=2)
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
                assert got == expected[i][:len(got)], (seed, i)
            else:
                assert got == expected[i], (seed, i)


def test_fuzzed_speculative_schedule_matches_sequential():
    """The same randomized schedule against the SPECULATIVE batcher
    (speculate_k=2): draft acceptance/rejection storms interleaved with
    admission and cancellation must still deliver exact sequential streams
    (or prefixes for cancelled requests)."""
    rng = np.random.RandomState(31337)
    eng = make_engine(sequence_length=24)
    cb = ContinuousBatcher(eng, n_slots=2, speculate_k=2)
    # repetitive prompts raise the n-gram proposer's fire rate
    prompts = [[1 + int(rng.randint(8))
                for _ in range(2 + int(rng.randint(5)))] * 2
               for _ in range(6)]
    expected = {i: seq_tokens(p) for i, p in enumerate(prompts)}
    reqs, cancelled, nxt = {}, set(), 0
    while nxt < len(prompts) or cb.has_work:
        act = rng.rand()
        if act < 0.35 and nxt < len(prompts):
            reqs[nxt] = cb.submit(prompts[nxt])
            nxt += 1
        elif act < 0.42 and reqs:
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
            assert got == expected[i], i


def test_max_new_tokens_cap():
    eng = make_engine(sequence_length=24)
    cb = ContinuousBatcher(eng, n_slots=1)
    req = cb.submit([1, 5, 9], max_new_tokens=3)
    cb.run_until_idle()
    out = drain(req)
    assert len(out) == 3
    assert out[-1][0] != GenerationState.IN_PROGRESS


# ------------------------------------------------------- per-request sampling

def toks_of(req):
    return [t for _, t in drain(req)]


def test_sampled_request_deterministic_and_neighbor_independent():
    """Same (prompt, seed, params) must yield the same tokens whether the
    request runs alone or next to other traffic."""
    eng = make_engine(sequence_length=24)
    cb = ContinuousBatcher(eng, n_slots=4)
    alone = cb.submit([1, 5, 9], max_new_tokens=8, temperature=0.9, seed=42)
    cb.run_until_idle()
    crowd_reqs = [cb.submit([7, 8], max_new_tokens=8),
                  cb.submit([1, 5, 9], max_new_tokens=8, temperature=0.9, seed=42),
                  cb.submit([3, 3, 3], max_new_tokens=8, temperature=1.5, seed=7)]
    cb.run_until_idle()
    assert toks_of(alone) == toks_of(crowd_reqs[1])
    # greedy neighbor unaffected by sampled rows (token values; its final
    # state is the max_new_tokens cap, not the reference's IN_PROGRESS)
    assert toks_of(crowd_reqs[0]) == [t for _, t in seq_tokens([7, 8])[:8]]


def test_sampled_top_k1_equals_greedy():
    eng = make_engine(sequence_length=24)
    cb = ContinuousBatcher(eng, n_slots=2)
    g = cb.submit([1, 5, 9], max_new_tokens=6)
    s = cb.submit([1, 5, 9], max_new_tokens=6, temperature=0.8, top_k=1, seed=3)
    cb.run_until_idle()
    assert toks_of(g) == toks_of(s)


def test_sampled_different_seeds_diverge():
    """High temperature + different seeds should (overwhelmingly) differ —
    and slot reuse must not leak the previous occupant's sampling state."""
    eng = make_engine(sequence_length=32)
    cb = ContinuousBatcher(eng, n_slots=1)
    a = cb.submit([1, 5, 9], max_new_tokens=12, temperature=2.0, seed=1)
    cb.run_until_idle()
    b = cb.submit([1, 5, 9], max_new_tokens=12, temperature=2.0, seed=2)
    cb.run_until_idle()
    c = cb.submit([1, 5, 9], max_new_tokens=12)   # greedy after sampled slot
    cb.run_until_idle()
    assert toks_of(a) != toks_of(b)
    assert toks_of(c) == [t for _, t in seq_tokens([1, 5, 9])[:12]]


def test_batched_topp_applies_after_topk():
    """top-p must be computed on the top-k-masked distribution (the
    sequential sample_token order): with top_k=2 and top_p below the top-1's
    renormalized mass, only the argmax can ever be drawn."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from llama_nuts_and_bolts_tpu.ops.sampling import sample_tokens_batched

    row = np.full(64, -20.0, np.float32)
    row[0], row[1], row[2] = 10.0, 9.0, 8.9
    logits = jnp.asarray(np.tile(row, (16, 1)))   # 16 rows, different keys
    keys = jnp.asarray(np.random.RandomState(0)
                       .randint(0, 2**31, (16, 2)).astype(np.uint32))
    pos = jnp.arange(16, dtype=jnp.int32)
    # renormalized top-2 is {0: 0.73, 1: 0.27}; top_p=0.6 keeps only token 0.
    # (computed over the FULL distribution the cutoff would keep token 1 too)
    toks = sample_tokens_batched(
        logits, keys, pos, jnp.full(16, 1.0), jnp.full(16, 2, jnp.int32),
        jnp.full(16, 0.6))
    assert np.asarray(toks).tolist() == [0] * 16


# ------------------------------------------------- speculative batched decode

def test_spec_batcher_matches_plain_greedy():
    """Speculative continuous batching must emit exactly the plain batcher's
    (= sequential engine's) greedy tokens for every slot."""
    eng = make_engine(sequence_length=32)
    cb = ContinuousBatcher(eng, n_slots=3, speculate_k=3)
    prompts = [[3, 3, 3, 3], [1, 5, 9], [7, 8]]
    reqs = [cb.submit(p) for p in prompts]
    cb.run_until_idle()
    for p, r in zip(prompts, reqs):
        ref = list(make_engine(sequence_length=32).generate_tokens(p))
        assert drain(r) == ref, f"divergence for prompt {p}"
    assert cb.spec_stats["drafted"] >= 0


def test_spec_batcher_accepts_on_repetitive_prompts():
    eng = make_engine(sequence_length=48)
    cb = ContinuousBatcher(eng, n_slots=2, speculate_k=4)
    r = cb.submit([3, 3, 3, 3])
    cb.run_until_idle()
    ref = list(make_engine(sequence_length=48).generate_tokens([3, 3, 3, 3]))
    assert drain(r) == ref
    if len(ref) > 12:
        assert cb.spec_stats["accepted"] > 0


def test_spec_batcher_mixed_greedy_and_sampled():
    """Sampled slots ride the same speculative step without speculating;
    greedy neighbors still match, sampled ones stay seed-deterministic."""
    eng = make_engine(sequence_length=32)
    cb = ContinuousBatcher(eng, n_slots=3, speculate_k=3)
    g = cb.submit([1, 5, 9], max_new_tokens=10)
    s1 = cb.submit([7, 8], max_new_tokens=10, temperature=1.1, seed=4)
    cb.run_until_idle()
    s2 = cb.submit([7, 8], max_new_tokens=10, temperature=1.1, seed=4)
    cb.run_until_idle()
    ref = list(make_engine(sequence_length=32).generate_tokens([1, 5, 9]))[:10]
    assert [t for _, t in drain(g)] == [t for _, t in ref]
    assert toks_of(s1) == toks_of(s2)


def test_spec_batcher_respects_seq_cap():
    eng = make_engine(sequence_length=10)
    cb = ContinuousBatcher(eng, n_slots=1, speculate_k=4)
    r = cb.submit([1, 5, 9, 1, 5, 9])
    cb.run_until_idle()
    ref = list(make_engine(sequence_length=10).generate_tokens([1, 5, 9, 1, 5, 9]))
    assert drain(r) == ref


# ------------------------------------------ adversarial speculation staleness
# Rejected-draft K/V writes land at cache rows beyond the accepted point; the
# correctness claim (runtime/continuous.py:_decode_step_spec) is that those
# rows are invisible until overwritten by real tokens. These tests FORCE the
# worst cases: max-K drafts rejected at every step (every row repeatedly
# written with garbage then overwritten and re-read), accept-then-reject at
# every step, and rejection pressure right against the sequence cap.

def _patched_proposer(monkeypatch, propose_fn):
    from llama_nuts_and_bolts_tpu.runtime import speculative
    monkeypatch.setattr(speculative.NgramProposer, "propose", propose_fn)


def test_spec_all_drafts_rejected_rows_reread(monkeypatch):
    """Every step proposes K garbage drafts (always rejected): every decode
    position is first written with garbage K/V, then overwritten by the real
    token and re-read by all later steps. Token parity must hold exactly."""
    calls = {"n": 0}

    def garbage(self, k):
        calls["n"] += 1
        # valid ids, extremely unlikely to equal the model argmax chain
        return [(7 + 13 * i + 29 * calls["n"]) % 250 for i in range(k)]

    _patched_proposer(monkeypatch, garbage)
    eng = make_engine(sequence_length=24)
    cb = ContinuousBatcher(eng, n_slots=2, speculate_k=4)
    prompts = [[1, 5, 9], [7, 8]]
    reqs = [cb.submit(p) for p in prompts]
    cb.run_until_idle()
    assert calls["n"] > 0 and cb.spec_stats["accepted"] == 0
    # near the cap the batcher proposes fewer than K drafts; every step that
    # did draft must have drafted the full K it asked for
    assert cb.spec_stats["drafted"] > 0
    for p, r in zip(prompts, reqs):
        assert drain(r) == seq_tokens(p), f"divergence for prompt {p}"


def test_spec_accept_then_reject_every_step(monkeypatch):
    """First draft correct (accepted), rest garbage (rejected): every step
    leaves K-1 garbage rows right after an accepted row — the accepted row
    must survive, the garbage rows must be overwritten before being read."""
    prompt = [1, 5, 9]
    truth = [t for _, t in seq_tokens(prompt)]

    def oracle_prefix(self, k):
        emitted = len(self.context) - len(prompt) - 1  # minus prefill token
        good = truth[emitted + 1:emitted + 2]          # exactly 1 true token
        return good + [(11 + 17 * i) % 250 for i in range(k - len(good))]

    _patched_proposer(monkeypatch, oracle_prefix)
    eng = make_engine(sequence_length=24)
    cb = ContinuousBatcher(eng, n_slots=1, speculate_k=4)
    r = cb.submit(prompt)
    cb.run_until_idle()
    assert drain(r) == seq_tokens(prompt)
    assert cb.spec_stats["accepted"] > 0
    assert cb.spec_stats["accepted"] < cb.spec_stats["drafted"]


def test_spec_max_drafts_rejected_at_seq_cap(monkeypatch):
    """Max-K garbage drafts proposed while the context runs into the
    sequence cap: draft rows spill into the [seq_len, seq_len+K) headroom
    region and must never corrupt rows below the cap."""

    def garbage(self, k):
        return [(3 + 5 * i) % 250 for i in range(k)]

    _patched_proposer(monkeypatch, garbage)
    for cap in (10, 11, 12):
        eng = make_engine(sequence_length=cap)
        cb = ContinuousBatcher(eng, n_slots=1, speculate_k=4)
        prompt = [1, 5, 9, 1, 5]
        r = cb.submit(prompt)
        cb.run_until_idle()
        assert drain(r) == seq_tokens(prompt, seq_len=cap), f"cap={cap}"


def test_spec_interleaved_admission_with_rejections(monkeypatch):
    """A fresh request admitted while a neighbor slot is mid-rejection-storm
    must not read the neighbor's garbage rows (cross-slot isolation)."""

    def garbage(self, k):
        return [(19 + 7 * i) % 250 for i in range(k)]

    _patched_proposer(monkeypatch, garbage)
    eng = make_engine(sequence_length=24)
    cb = ContinuousBatcher(eng, n_slots=2, speculate_k=4)
    r1 = cb.submit([1, 5, 9])
    for _ in range(3):
        cb.step()
    r2 = cb.submit([7, 8])
    cb.run_until_idle()
    assert drain(r1) == seq_tokens([1, 5, 9])
    assert drain(r2) == seq_tokens([7, 8])
