"""Continuous batching: requests join and leave a shared decode loop.

The production-serving scheduler the one-request-at-a-time reference never
needed (its engine is strictly sequential, src/inference/inference.go:173):
B cache SLOTS advance through ONE jitted decode step per iteration, each row
at its OWN position (models/llama/model.py's vector ``start_pos``), so a new
request admitted mid-flight immediately shares the step's weight reads with
the requests already decoding — batch-1 decode is bandwidth-bound, so riding
along is nearly free. TPU-first design notes:

  * static shapes everywhere: the slot count and cache length are fixed at
    construction; admission swaps a slot's contents, never reshapes anything
    (one compiled prefill executable per prompt bucket, one decode step).
  * prefill targets one slot: the slot's cache is carved out with a traced
    dynamic slice on the batch axis and written back, so admitting never
    recompiles and never copies other slots' state.
  * free/finished slots keep stepping with a pad token; their cache writes
    are harmless — a slot's garbage at position p is overwritten by the
    forward that consumes the real token at p before any query row ≥ p runs
    (the same staleness argument as speculative verification).

Per-request sampling: each slot carries its own (temperature, top-k, top-p,
seed); the decode step samples row-wise with ``fold_in(seed_key, position)``
so a request's tokens depend only on its own seed, prompt, and position —
never on its batch neighbors. Temperature 0 rows take the argmax path
(exactly the reference's greedy decode, src/inference/inference.go:211).
"""

from __future__ import annotations

import functools
import queue
import threading
from dataclasses import dataclass, field
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from llama_nuts_and_bolts_tpu.models.llama.model import KVCache, forward
from llama_nuts_and_bolts_tpu.ops.sampling import (
    sample_tokens_batched,
    top_logprobs_batched,
)
from llama_nuts_and_bolts_tpu.runtime.types import GenerationState


LOGPROBS_K = 5   # OpenAI caps top_logprobs at 5 for completions


def make_base_key(seed: int) -> np.ndarray:
    """Host-side twin of ``jax.random.PRNGKey`` (threefry2x32 key layout:
    [seed >> 32, seed & 0xffffffff]) — no device round-trip per admission."""
    seed = int(seed) & ((1 << 64) - 1)
    return np.array([seed >> 32, seed & 0xFFFFFFFF], dtype=np.uint32)


def _map_cache(fn, *caches: KVCache) -> KVCache:
    """Apply ``fn`` leaf-wise across caches (handles optional int8 scales)."""
    quantized = caches[0].quantized
    fields = ("k", "v", "k_scale", "v_scale") if quantized else ("k", "v")
    return KVCache(**{f: fn(*(getattr(c, f) for c in caches)) for f in fields})


@functools.partial(jax.jit, static_argnums=(1,), donate_argnums=(4,))
def _prefill_slot(params, cfg, tokens, logits_at, cache: KVCache, slot,
                  key, temp, top_k, top_p):
    """Run prefill for one request inside slot ``slot`` of the shared cache.

    ``tokens`` is [1, bucket] (padded); returns (first generated token [ ],
    updated cache). One executable per bucket length; ``slot``,
    ``logits_at``, and the sampling params are traced (greedy = temp 0)."""
    sub = _map_cache(lambda a: lax.dynamic_slice_in_dim(a, slot, 1, axis=1), cache)
    logits, sub = forward(params, cfg, tokens, 0, sub, logits_at=logits_at)
    cache = _map_cache(
        lambda a, s: lax.dynamic_update_slice_in_dim(a, s, slot, axis=1),
        cache, sub)
    tok = sample_tokens_batched(logits[:, 0], key[None], logits_at[None],
                                temp[None], top_k[None], top_p[None])
    lp = top_logprobs_batched(logits[:, 0], tok, LOGPROBS_K)
    return tok[0], (lp[0][0], lp[1][0], lp[2][0]), cache


@functools.partial(jax.jit, static_argnums=(1, 5),
                   static_argnames=("attn_impl", "mesh"), donate_argnums=(4,))
def _decode_scan(params, cfg, tokens, positions, cache: KVCache, k,
                 keys, temps, top_ks, top_ps, attn_impl="xla", mesh=None):
    """``k`` chained decode steps in ONE dispatch — the scheduler QUANTUM.

    Each scheduler iteration through an RPC-attached device pays a fixed
    host cost (dispatch + device_puts + the result round trip, ~30-45 ms
    through a tunnel) that dwarfs the ~18 ms device step; a quantum of k
    amortizes it k-ways by running the per-step program in an on-device
    ``lax.scan`` (per-row positions advance inside; each step samples with
    ``fold_in(key, position)`` exactly like the single-step path, so
    delivered tokens are identical). Admission/stop granularity becomes k
    tokens: tokens generated past a row's stop are dropped at delivery and
    their cache writes are invisible (the standard staleness argument), and
    a pending request waits at most one quantum for its slot. Returns the
    per-step tokens [k, B], per-step logprob info, the final carry token
    [B, 1] / positions [B] (device-resident, chaining the next dispatch
    with zero host round trips), and the cache."""
    pos_cap = cache.max_seq - 1

    def body(carry, _):
        toks, poss, cache = carry
        logits, cache = forward(params, cfg, toks, poss, cache,
                                attn_impl=attn_impl, mesh=mesh)
        nxt = sample_tokens_batched(logits[:, -1], keys, poss,
                                    temps, top_ks, top_ps)
        lp = top_logprobs_batched(logits[:, -1], nxt, LOGPROBS_K)
        nposs = jnp.minimum(poss + 1, pos_cap)
        return (nxt[:, None], nposs, cache), (nxt, lp)

    (toks, poss, cache), (all_toks, all_lp) = lax.scan(
        body, (tokens, positions, cache), None, length=k)
    return all_toks, all_lp, toks, poss, cache


@functools.partial(jax.jit, static_argnums=(1,), donate_argnums=(4,))
def _decode_step_spec(params, cfg, tokens, positions, cache: KVCache,
                      keys, temps, top_ks, top_ps):
    """Speculative shared step: tokens [B, K+1] = per-row feed token + K
    drafts, at per-row ``positions``. Returns the greedy argmax of EVERY row
    (the verification chain), a sampled token from row 0 (for sampled slots,
    which never speculate), row-0 logprob info, and the cache. Rejected
    rows' K/V writes are invisible until overwritten — the same staleness
    argument as the sequential speculative engine."""
    logits, cache = forward(params, cfg, tokens, positions, cache)
    preds = jnp.argmax(logits, axis=-1).astype(jnp.int32)      # [B, K+1]
    sampled0 = sample_tokens_batched(logits[:, 0], keys, positions,
                                     temps, top_ks, top_ps)
    lp0 = top_logprobs_batched(logits[:, 0], sampled0, LOGPROBS_K)
    return preds, sampled0, lp0, cache


@dataclass
class Request:
    """A submitted prompt and its streaming output queue."""

    prompt: List[int]
    max_new_tokens: int
    temperature: float = 0.0          # 0 = greedy (reference parity)
    top_k: int = 0
    top_p: float = 1.0
    seed: int = 0                     # with temperature > 0: reproducible,
                                      # independent of batch neighbors
    want_logprobs: int = 0            # per-token top-N info (N <= 5);
                                      # filled into .logprobs when > 0
    out: "queue.Queue[Tuple[GenerationState, int]]" = field(
        default_factory=queue.Queue)
    slot: Optional[int] = None
    produced: int = 0
    cancelled: bool = False
    # per emitted token, when want_logprobs > 0:
    # (token_id, chosen_logprob, [(top_id, top_logprob) x want_logprobs])
    logprobs: List[tuple] = field(default_factory=list)

    def cancel(self) -> None:
        """Stop generating for this request: its slot and any cache blocks
        are released at the scheduler's next step, which also delivers a
        terminal CANCELLED sentinel so a consumer blocked in ``tokens()``
        ends cleanly (round-5 fuzz finding: without it, draining a
        cancelled request waited out its full timeout). Safe to call at any
        time, from any thread, including after completion (no-op then)."""
        self.cancelled = True

    def tokens(self, timeout: Optional[float] = None):
        """Iterate (state, token_id) until the request finishes. A
        cancelled request's stream simply ENDS (the CANCELLED sentinel is
        consumed here, never yielded): whatever was delivered before the
        cancel took effect is a valid prefix of the sequential stream."""
        while True:
            state, tok = self.out.get(timeout=timeout)
            if state is GenerationState.CANCELLED:
                return
            yield state, tok
            if state != GenerationState.IN_PROGRESS:
                return


class ContinuousBatcher:
    """Slot-based continuous batching scheduler over one InferenceEngine.

    ``step()`` advances the world by one iteration: admit waiting requests
    into free slots (one prefill each), then run ONE batched decode step for
    every active slot. Host-side bookkeeping is O(slots); device work is one
    dispatch per admission plus one per step.
    """

    # plain decode steps kept in flight (see step()): 2 hides a result
    # fetch's full round trip behind two steps of device execution — the
    # operative bound on RPC-attached TPUs, where a fetch costs ~30 ms
    PIPELINE_DEPTH = 2

    def __init__(self, engine, n_slots: int = 8, speculate_k: int = 0,
                 step_quantum: Optional[int] = None):
        self.engine = engine
        self.cfg = engine.model.cfg
        self.vocab = engine.model.vocab
        self.n_slots = n_slots
        self.seq_len = engine.seq_len
        self.speculate_k = speculate_k
        # scheduler quantum: decode steps per dispatch (see _decode_scan).
        # None = auto: 8 on RPC-attached devices (each dispatch costs a
        # network round trip), 1 host-attached (per-step admission/latency)
        if step_quantum is None:
            from llama_nuts_and_bolts_tpu.utils.compile_cache import (
                is_rpc_attached,
            )

            step_quantum = 4 if is_rpc_attached() else 1
        self.step_quantum = max(1, int(step_quantum))
        if speculate_k:
            # cache rows [seq_len, seq_len + K): draft rows past the cap may
            # be written (then masked/overwritten) — never clamp a
            # dynamic_update_slice back onto valid rows
            self.cache = KVCache.create(
                self.cfg, n_slots, self.seq_len + speculate_k,
                dtype=(jnp.int8 if engine.args.kv_cache_dtype == "int8"
                       else jnp.bfloat16))
            self._proposers = [None] * n_slots
        else:
            self.cache = engine.new_cache(n_slots)
        self.slots: List[Optional[Request]] = [None] * n_slots
        # decode attention impl: the engine's measured RULES — on TPU with
        # an int8 cache this picks the flash decode kernel, whose grid
        # takes the per-row position vector as prefetch scalars. The
        # engine's "probe" mode is bypassed here: its micro-benchmark runs
        # at batch 1 with a scalar position, and that winner does not
        # transfer to this batcher's [n_slots]-row per-row step (per-tile
        # fixed costs scale with the batch — docs/07 round-4 section).
        if engine.args.attn_impl == "probe":
            saved = engine.args.attn_impl
            engine.args.attn_impl = "auto"
            try:
                self._decode_impl = engine._attn_impl(1)
            finally:
                engine.args.attn_impl = saved
        else:
            self._decode_impl = engine._attn_impl(1)
        # per-slot feed token and position of that token (= next write pos)
        self._feed = np.zeros(n_slots, dtype=np.int32)
        self._pos = np.zeros(n_slots, dtype=np.int32)
        self._init_sampling_state(n_slots)
        self.pending: "queue.Queue[Request]" = queue.Queue()
        self.spec_stats = {"spec_steps": 0, "drafted": 0, "accepted": 0}
        self._lock = threading.Lock()
        # pipelined work in flight, oldest first; tagged entries:
        #   ("q", all_toks, all_lp, slots_snapshot)          — one quantum
        #   ("admit", slot, req, first_dev, lp_dev)          — a deferred
        #     admission: the prefill's first token, fetched+emitted in
        #     delivery order so _admit never blocks the host
        self._inflight: list = []
        # the last dispatched quantum's final (token, positions) device
        # carry — the next dispatch chains from it; None = dispatch from
        # host state
        self._last_carry = None
        # rows whose feed/position must come from HOST state (or the
        # deferred prefill scalar in _first_dev) at the next dispatch:
        # the device chain carries the old occupant's garbage for them
        self._splice = np.zeros(n_slots, dtype=bool)
        self._first_dev: list = [None] * n_slots

    # ------------------------------------------------------------- public

    def submit(self, prompt_tokens: Sequence[int],
               max_new_tokens: int = 1 << 30, temperature: float = 0.0,
               top_k: int = 0, top_p: float = 1.0, seed: int = 0,
               logprobs: int = 0) -> Request:
        prompt = list(prompt_tokens)
        if not prompt or len(prompt) >= self.seq_len:
            raise ValueError("prompt must be non-empty and shorter than context")
        if not 0 <= logprobs <= LOGPROBS_K:
            raise ValueError(f"logprobs must be in [0, {LOGPROBS_K}]")
        req = Request(prompt=prompt, max_new_tokens=max_new_tokens,
                      temperature=temperature, top_k=top_k, top_p=top_p,
                      seed=seed, want_logprobs=logprobs)
        self.pending.put(req)
        return req

    # ----------------------------------------------- per-slot sampling state

    def _init_sampling_state(self, n_slots: int) -> None:
        self._key = np.zeros((n_slots, 2), dtype=np.uint32)
        self._temp = np.zeros(n_slots, dtype=np.float32)
        self._topk = np.zeros(n_slots, dtype=np.int32)
        self._topp = np.ones(n_slots, dtype=np.float32)

    def _set_sampling(self, slot: int, req: Request) -> None:
        self._key[slot] = make_base_key(req.seed)
        self._temp[slot] = req.temperature
        self._topk[slot] = req.top_k
        self._topp[slot] = req.top_p

    def _clear_sampling(self, slot: int) -> None:
        self._key[slot] = 0
        self._temp[slot] = 0.0
        self._topk[slot] = 0
        self._topp[slot] = 1.0

    @property
    def has_work(self) -> bool:
        return any(r is not None for r in self.slots) or not self.pending.empty()

    def run_until_idle(self) -> None:
        while self.has_work:
            self.step()

    # ------------------------------------------------------------ internal

    def _admit(self) -> None:
        from llama_nuts_and_bolts_tpu.runtime.engine import prefill_bucket

        for slot in range(self.n_slots):
            if self.slots[slot] is not None:
                continue
            try:
                req = self.pending.get_nowait()
            except queue.Empty:
                return
            if req.cancelled:
                req.out.put((GenerationState.CANCELLED, -1))
                continue
            plen = len(req.prompt)
            self._set_sampling(slot, req)
            bucket = prefill_bucket(plen, self.seq_len)
            padded = np.zeros((1, bucket), dtype=np.int32)
            padded[0, :plen] = req.prompt
            first, lp, self.cache = _prefill_slot(
                self.engine.model.params, self.cfg, jnp.asarray(padded),
                plen - 1, self.cache, slot,
                jnp.asarray(self._key[slot]), self._temp[slot],
                self._topk[slot], self._topp[slot])
            req.slot = slot
            self.slots[slot] = req
            self._pos[slot] = plen
            self._splice[slot] = True   # next dispatch feeds this row anew
            if self.speculate_k:
                # the speculative scheduler steps synchronously and its
                # proposer needs the first token NOW
                self._feed[slot] = int(first)
                if self._speculates(req):
                    from llama_nuts_and_bolts_tpu.runtime.speculative import (
                        NgramProposer,
                    )

                    self._proposers[slot] = NgramProposer(
                        req.prompt + [int(first)])
                self._record_logprobs(slot, int(first), lp)
                self._emit(slot, int(first))
            else:
                # ASYNC admission: the first token stays a device scalar.
                # The prefill executes behind any in-flight quanta (device
                # order); its result is fetched + emitted in DELIVERY order
                # via a pseudo-entry, and the next dispatch splices the
                # scalar into the feed — the host never blocks, so the
                # pipeline keeps streaming through admissions.
                self._first_dev[slot] = first
                self._inflight.append(("admit", slot, req, first, lp))

    def _accepted_chain(self, slot: int, drafts, preds, sampled0):
        """The tokens slot ``slot`` emits after a speculative verify step:
        the accepted draft prefix plus the model's own continuation for
        speculating slots; the row-0 sample otherwise."""
        from llama_nuts_and_bolts_tpu.runtime.speculative import (
            longest_accepted_prefix,
        )

        if self._proposers[slot] is None:
            return [int(sampled0[slot])]
        acc = longest_accepted_prefix(drafts,
                                      preds[slot, :len(drafts)].tolist())
        self.spec_stats["spec_steps"] += 1
        self.spec_stats["drafted"] += len(drafts)
        self.spec_stats["accepted"] += acc
        return drafts[:acc] + [int(preds[slot, acc])]

    def _replay_chain(self, slot: int, chain, p0: int, lp, pos_cap: int,
                      end_hook=None) -> None:
        """Emit an accepted chain token by token: advance the position,
        update the feed, proposer/logprob bookkeeping, and the shared stop
        rules — identical for the dense and paged schedulers.
        ``end_hook(slot)`` (paged) runs before the FINAL token's emission
        and may return True to force-finish (next write position not
        backable)."""
        for j, tok in enumerate(chain):
            if self.slots[slot] is None:
                break                      # a stop token ended it
            self._pos[slot] = min(p0 + j + 1, pos_cap)
            self._feed[slot] = tok
            if self._proposers[slot] is not None:
                self._proposers[slot].extend([tok])
            else:
                self._record_logprobs(slot, tok, lp, row=slot)
            force_finish = bool(end_hook(slot)) if (
                end_hook is not None and j + 1 == len(chain)) else False
            self._emit(slot, tok, force_finish=force_finish)

    def _speculates(self, req: Request) -> bool:
        """Only greedy, no-logprobs requests draft (sampled rows can't be
        verified by argmax; logprobs need one step per token)."""
        return req.temperature <= 0.0 and not req.want_logprobs

    def _record_logprobs(self, slot: int, tok: int, lp, row=None) -> None:
        """Append (token, chosen_lp, top list) for slot's request if asked.
        ``lp`` = (chosen [.], top_vals [., K], top_ids [., K]) device arrays;
        ``row`` indexes batched arrays (None = scalar prefill result)."""
        req = self.slots[slot]
        if req is None or not req.want_logprobs:
            return
        chosen, vals, ids = lp
        if row is not None:
            chosen, vals, ids = chosen[row], vals[row], ids[row]
        vals = np.asarray(vals, np.float32)
        ids = np.asarray(ids, np.int32)
        n = req.want_logprobs
        req.logprobs.append(
            (tok, float(np.asarray(chosen)),
             [(int(i), float(v)) for i, v in zip(ids[:n], vals[:n])]))

    def _emit(self, slot: int, tok: int, force_finish: bool = False,
              pos: Optional[int] = None) -> None:
        """Classify + deliver one generated token for the request in ``slot``
        (same stop rules as the sequential engine loop). ``force_finish``
        ends the request after this token even if no stop rule fired (the
        paged batcher uses it when the block pool is exhausted). ``pos`` is
        the emitted token's position when it differs from the LIVE
        ``self._pos`` — the pipelined paged scheduler advances positions at
        dispatch time, so at delivery time the live value is up to
        PIPELINE_DEPTH steps ahead of the token being classified."""
        req = self.slots[slot]
        req.produced += 1
        if pos is None:
            pos = int(self._pos[slot])
        state = GenerationState.IN_PROGRESS
        if self.vocab.is_stop(tok):
            state = GenerationState.FINISHED_BY_REACHING_EOS
        elif pos + 1 >= self.seq_len:
            state = GenerationState.FINISHED_BY_REACHING_SEQ_LEN
        elif req.produced >= req.max_new_tokens:
            state = GenerationState.FINISHED_BY_REACHING_SEQ_LEN
        elif force_finish:
            state = GenerationState.FINISHED_BY_REACHING_SEQ_LEN
        req.out.put((state, tok))
        if state != GenerationState.IN_PROGRESS:
            self._release_slot(slot)

    def _release_slot(self, slot: int) -> None:
        """Free the slot; while free it keeps stepping with a pad token —
        garbage writes are provably overwritten by the next occupant before
        any of its query rows can attend them. (The paged batcher extends
        this to return the request's blocks to the pool.)"""
        self.slots[slot] = None
        self._feed[slot] = 0
        self._clear_sampling(slot)
        if self.speculate_k:
            self._proposers[slot] = None

    def _sweep_cancelled(self) -> None:
        for slot, r in enumerate(self.slots):
            if r is not None and r.cancelled:
                self._release_slot(slot)
                # AFTER release: any in-flight delivery for this slot is
                # identity-dropped from here on, so the sentinel is the
                # queue's final entry
                r.out.put((GenerationState.CANCELLED, -1))

    # ------------------------------------------------- pipelined plain step

    def _dispatch_plain(self, toks, poss):
        """One quantum dispatch (``step_quantum`` chained decode steps in a
        single on-device scan); returns device handles, no sync.

        Host arrays are snapshotted (``.copy()``) before device_put: on the
        CPU backend ``jnp.asarray`` can ALIAS the numpy buffer zero-copy,
        and the pipelined step() mutates these arrays (release/admission
        bookkeeping) while the dispatched step may still be executing —
        without the copy that mutation races the in-flight compute."""
        all_toks, all_lp, fin_tok, fin_poss, self.cache = _decode_scan(
            self.engine.model.params, self.cfg, toks, poss, self.cache,
            self.step_quantum,
            jnp.asarray(self._key.copy()), jnp.asarray(self._temp.copy()),
            jnp.asarray(self._topk.copy()), jnp.asarray(self._topp.copy()),
            attn_impl=self._decode_impl, mesh=self.engine.mesh)
        try:
            all_toks.copy_to_host_async()   # stream back before the fetch
        except AttributeError:
            pass
        self._last_carry = (fin_tok, fin_poss)
        # the occupancy snapshot makes delivery occupancy-safe WITHOUT
        # pipeline flushes: a token row is delivered only if the slot still
        # holds the request it held at dispatch (identity, not equality)
        return ("q", all_toks, all_lp, list(self.slots))

    def _process_plain_results(self, nxt, lp, snapshot) -> None:
        """Host bookkeeping for one completed step (``nxt`` is on host).
        Rows whose slot changed hands since dispatch (``snapshot[slot]`` is
        no longer the live occupant) are DROPPED — their tokens belong to a
        finished/cancelled request's garbage chain, and their position
        bookkeeping is frozen (admission reset it)."""
        for slot in range(self.n_slots):
            if snapshot[slot] is None or snapshot[slot] is not self.slots[slot]:
                continue
            self._pos[slot] = min(int(self._pos[slot]) + 1, self.seq_len - 1)
            self._feed[slot] = int(nxt[slot])
            self._record_logprobs(slot, int(nxt[slot]), lp, row=slot)
            self._emit(slot, int(nxt[slot]))

    def _process_quantum(self, all_toks, all_lp, snapshot) -> None:
        """Deliver one completed quantum: k per-step token rows, in order.
        A row whose request finished at step j has its later tokens DROPPED
        (its slot is already None when they replay) — their cache writes
        are invisible until the slot's next occupant overwrites them."""
        for j in range(all_toks.shape[0]):
            self._process_plain_results(
                all_toks[j], (all_lp[0][j], all_lp[1][j], all_lp[2][j]),
                snapshot)

    def _process_admit(self, slot, req, first_dev, lp) -> None:
        """Deliver a deferred admission's first token (device scalar fetch;
        by delivery time it computed long ago). Skipped if the request was
        cancelled before its first token could be delivered."""
        if self.slots[slot] is not req:
            return
        tok = int(first_dev)
        self._feed[slot] = tok
        self._record_logprobs(slot, tok, lp)
        self._emit(slot, tok)

    def _process_entry(self, entry) -> None:
        if entry[0] == "admit":
            self._process_admit(*entry[1:])
        else:
            _tag, all_toks, all_lp, snap = entry
            self._process_quantum(np.asarray(all_toks), all_lp, snap)

    def _quanta_in_flight(self) -> int:
        return sum(1 for e in self._inflight if e[0] == "q")

    def _flush_inflight(self) -> None:
        while self._inflight:
            self._process_entry(self._inflight.pop(0))
        self._last_carry = None

    def step(self) -> None:
        """Advance the world by one iteration — PIPELINED: up to
        ``PIPELINE_DEPTH`` decode steps stay in flight, and iteration N+1's
        dispatch uses iteration N's output tokens ON DEVICE (the step's
        sampled tokens ARE the next feed; positions advance by +1 on
        device), so the host fetch/delivery of a step overlaps the NEXT
        steps' device execution. Depth matters on an RPC-attached device:
        a result fetch costs a full round trip (~30 ms through a tunnel),
        and with depth d the fetch of step N overlaps steps N+1..N+d —
        depth 1 caps throughput at one token per round trip even when the
        device step is faster (measured: b4 sched 85 vs 217 tok/s raw at
        depth 1 on a tunneled v5e). Results also start copying host-ward
        right at dispatch (copy_to_host_async), so the eventual np.asarray
        usually finds the bytes already local. Occupancy changes (admit /
        cancel / finish) do NOT flush the pipeline: every entry carries a
        slots snapshot and delivery drops rows whose slot changed hands
        (request identity), while the next dispatch splices just-admitted
        rows' host feed/position into the device chain. Delivered token
        streams are IDENTICAL to the unpipelined scheduler: the device
        chain feeds the same values the host round trip would have, and
        finished slots' extra in-flight rows are dropped at processing
        (same cache-staleness argument as admission into a previously-used
        slot)."""
        if self.speculate_k:
            self._step_speculative()
            return
        with self._lock:
            # occupancy changes never flush: cancels/finishes are handled
            # by per-entry identity snapshots at delivery, and admission is
            # ASYNC (the prefill's first token rides the pipeline as a
            # pseudo-entry; _admit never blocks the host). The only drain
            # left is at idle.
            self._sweep_cancelled()
            self._admit()
            if not any(r is not None for r in self.slots):
                self._flush_inflight()   # drain steps whose rows all ended
                return
            if self._last_carry is None:
                # .copy(): see _dispatch_plain — these numpy buffers mutate
                # under later bookkeeping while this step is in flight
                toks = jnp.asarray(self._feed[:, None].copy())
                poss = jnp.asarray(self._pos.copy())
            else:
                # chain from the previous quantum's FINAL carry — device-
                # resident and shape-ready, zero host round trips — with
                # spliced rows (just-admitted slots) overridden below
                toks, poss = self._last_carry
                if self._splice.any():
                    mask = jnp.asarray(self._splice.copy())
                    poss = jnp.where(mask, jnp.asarray(self._pos.copy()),
                                     poss)
            if self._splice.any():
                # per-row feed override: the deferred prefill's device
                # scalar when one is pending, else the host feed value
                for slot in np.nonzero(self._splice)[0]:
                    fd = self._first_dev[int(slot)]
                    if fd is not None:
                        toks = toks.at[int(slot), 0].set(fd)
                        self._first_dev[int(slot)] = None
                    else:
                        toks = toks.at[int(slot), 0].set(
                            int(self._feed[int(slot)]))
                self._splice[:] = False
            self._inflight.append(self._dispatch_plain(toks, poss))
            while self._quanta_in_flight() > self.PIPELINE_DEPTH:
                self._process_entry(self._inflight.pop(0))
            # deliver deferred first tokens NOW: their prefills are ordered
            # BEFORE the quantum just dispatched, so this blocks at most
            # the prefill's own tail (~ms) — not the pipeline — and keeps
            # TTFT at one prefill instead of PIPELINE_DEPTH quanta.
            # (Inter-request delivery order is free: rows of pre-admission
            # quanta for this slot are identity-dropped regardless.)
            if any(e[0] == "admit" for e in self._inflight):
                keep = []
                for e in self._inflight:
                    if e[0] == "admit":
                        self._process_entry(e)
                    else:
                        keep.append(e)
                self._inflight = keep

    def _step_speculative(self) -> None:
        """One speculative iteration: every slot's feed token plus up to K
        n-gram drafts verify in ONE [B, K+1] forward (per-row positions);
        each greedy slot emits its accepted chain, sampled slots emit their
        row-0 sample. The step costs the same weight read as S=1."""
        from llama_nuts_and_bolts_tpu.runtime.speculative import (
            longest_accepted_prefix,
        )

        K = self.speculate_k
        with self._lock:
            self._sweep_cancelled()
            self._admit()
            if not any(r is not None for r in self.slots):
                return
            step_tokens = np.tile(self._feed[:, None], (1, K + 1))
            draft_lists = [[] for _ in range(self.n_slots)]
            for slot in range(self.n_slots):
                prop = self._proposers[slot] if self.slots[slot] else None
                if prop is not None and int(self._pos[slot]) + 1 + K < self.seq_len:
                    drafts = prop.propose(K)
                    draft_lists[slot] = drafts
                    step_tokens[slot, 1:1 + len(drafts)] = drafts

            preds, sampled0, lp, self.cache = _decode_step_spec(
                self.engine.model.params, self.cfg,
                jnp.asarray(step_tokens), jnp.asarray(self._pos), self.cache,
                jnp.asarray(self._key), jnp.asarray(self._temp),
                jnp.asarray(self._topk), jnp.asarray(self._topp))
            preds = np.asarray(preds)
            sampled0 = np.asarray(sampled0)

            pos_cap = int(self.cache.max_seq) - 1
            for slot in range(self.n_slots):
                req = self.slots[slot]
                p0 = int(self._pos[slot])
                if req is None:
                    self._pos[slot] = min(p0 + 1, pos_cap)
                    continue
                chain = self._accepted_chain(slot, draft_lists[slot],
                                             preds, sampled0)
                self._replay_chain(slot, chain, p0, lp, pos_cap)

    # -------------------------------------------------------- serving glue

    def serve_forever_in_thread(self) -> threading.Thread:
        """Background scheduler thread for the HTTP server: steps whenever
        there is work, sleeps briefly when idle."""
        import time

        def loop():
            while True:
                if self.has_work:
                    self.step()
                else:
                    time.sleep(0.002)

        t = threading.Thread(target=loop, daemon=True)
        t.start()
        return t
