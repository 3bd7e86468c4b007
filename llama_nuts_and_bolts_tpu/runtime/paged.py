"""Paged continuous batching: block-pool memory management for the scheduler.

``ContinuousBatcher`` reserves a full dense cache row per slot
(slots x max_seq positions resident whether used or not). ``PagedBatcher``
replaces the rows with a shared block pool (models/llama/paged.py): a
request holds ``pos // bs + 1`` blocks at any moment, takes them
incrementally as it decodes, and returns them the instant it finishes — HBM
tracks live tokens, so the same pool admits far more concurrent requests
than dense slots would (or the same requests in far less memory).

Speculative decoding composes with the pool: each verify step writes K+1
rows per slot, so the scheduler backs positions pos..pos+K with blocks
before the step and clamps a slot's draft count to what the pool could
back — a dry pool degrades to fewer (or zero) drafts, never a stall.

Scheduling policy (host-side, O(slots) per step):
  * admission needs ``prompt_len // bs + 1`` free blocks (prompt + the next
    write position); requests that don't fit wait in FIFO order — admission
    never preempts running requests.
  * decode growth takes one block each time a request crosses a block
    boundary; if the pool is empty at that moment the request finishes
    gracefully after its current token (FINISHED_BY_REACHING_SEQ_LEN), the
    same backstop the dense batcher hits at the context cap.
  * free slots keep stepping with a pad token into the TRASH block
    (block 0) — the paged twin of the dense batcher's garbage-write
    argument.

The reference processes exactly one request at a time with a preallocated
per-generation cache (src/model/inferencecontext.go:29-43); this subsystem
is the production-serving capability built on top of that parity.
"""

from __future__ import annotations

import functools
import math
import queue
from collections import deque
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from llama_nuts_and_bolts_tpu.models.llama.paged import (
    DEFAULT_BLOCK_SIZE,
    TRASH_BLOCK,
    PagedKVPool,
    paged_decode_step,
    paged_decode_step_spec,
    paged_prefill,
    paged_prefill_shared,
)
from llama_nuts_and_bolts_tpu.runtime.block_pool import (
    PrefixBlockAllocator,
    chain_block_hashes,
)
from llama_nuts_and_bolts_tpu.ops.sampling import (
    sample_tokens_batched,
    top_logprobs_batched,
)
from llama_nuts_and_bolts_tpu.runtime.types import GenerationState
from llama_nuts_and_bolts_tpu.runtime.continuous import (
    LOGPROBS_K,
    ContinuousBatcher,
    Request,
)


class BlockAllocator:
    """Free-list allocator over pool block ids (block 0 is reserved trash)."""

    def __init__(self, n_blocks: int, block_size: int) -> None:
        self.n_blocks = n_blocks
        self.block_size = block_size
        self._free: deque[int] = deque(range(1, n_blocks))

    @property
    def available(self) -> int:
        return len(self._free)

    def alloc(self, n: int) -> Optional[List[int]]:
        """n blocks, or None (all-or-nothing) if the pool can't supply them."""
        if n < 0 or len(self._free) < n:
            return None
        return [self._free.popleft() for _ in range(n)]

    def free(self, blocks: List[int]) -> None:
        for b in blocks:
            if not 0 < b < self.n_blocks:
                raise ValueError(f"freeing invalid block id {b}")
        self._free.extend(blocks)


@functools.partial(jax.jit, static_argnums=(1,), donate_argnums=(4,))
def _prefill_jit(params, cfg, tokens, logits_at, pool, table_row,
                 key, temp, top_k, top_p):
    logits, pool = paged_prefill(params, cfg, tokens, logits_at, pool, table_row)
    tok = sample_tokens_batched(logits, key[None], logits_at[None],
                                temp[None], top_k[None], top_p[None])
    lp = top_logprobs_batched(logits, tok, LOGPROBS_K)
    return tok[0], (lp[0][0], lp[1][0], lp[2][0]), pool


@functools.partial(jax.jit, static_argnums=(1,), donate_argnums=(5,))
def _prefill_shared_jit(params, cfg, tokens, shared_len, logits_at, pool,
                        table_row, sample_pos, key, temp, top_k, top_p):
    """Suffix-only prefill on a prefix-cache hit. ``sample_pos`` is the
    GLOBAL position of the sampled token (prompt_len - 1) so seeded sampling
    folds in the same position as an unshared prefill would — a cache hit
    never changes the sampled stream."""
    logits, pool = paged_prefill_shared(params, cfg, tokens, shared_len,
                                        logits_at, pool, table_row)
    tok = sample_tokens_batched(logits, key[None], sample_pos[None],
                                temp[None], top_k[None], top_p[None])
    lp = top_logprobs_batched(logits, tok, LOGPROBS_K)
    return tok[0], (lp[0][0], lp[1][0], lp[2][0]), pool


@functools.partial(jax.jit, static_argnums=(1, 5, 6), donate_argnums=(4,))
def _decode_scan_jit(params, cfg, tokens, positions, pool, k, attn_impl,
                     tables, keys, temps, top_ks, top_ps):
    """``k`` chained paged decode steps in ONE dispatch — the paged
    scheduler quantum (see continuous._decode_scan for the rationale).
    ``tables`` is fixed for the whole quantum: the scheduler backs every
    position the quantum will write BEFORE dispatching; a row whose pool
    ran dry mid-quantum writes its tail to the trash block (block 0) and
    the host drops those tokens at delivery."""
    bs = pool.k.shape[3]
    pos_cap = tables.shape[1] * bs - 1

    def body(carry, _):
        toks, poss, pool = carry
        logits, pool = paged_decode_step(params, cfg, toks, poss, pool,
                                         tables, attn_impl=attn_impl)
        nxt = sample_tokens_batched(logits, keys, poss, temps, top_ks, top_ps)
        lp = top_logprobs_batched(logits, nxt, LOGPROBS_K)
        nposs = jnp.minimum(poss + 1, pos_cap)
        return (nxt[:, None], nposs, pool), (nxt, lp)

    (toks, poss, pool), (all_toks, all_lp) = lax.scan(
        body, (tokens, positions, pool), None, length=k)
    return all_toks, all_lp, toks, poss, pool


@functools.partial(jax.jit, static_argnums=(1,), donate_argnums=(4,))
def _decode_spec_jit(params, cfg, tokens, positions, pool, tables,
                     keys, temps, top_ks, top_ps):
    """Paged speculative step: greedy argmax of every row (the verification
    chain), a row-0 sample for non-speculating slots, row-0 logprob info."""
    logits, pool = paged_decode_step_spec(params, cfg, tokens, positions,
                                          pool, tables)
    preds = jnp.argmax(logits, axis=-1).astype(jnp.int32)      # [B, K+1]
    sampled0 = sample_tokens_batched(logits[:, 0], keys, positions,
                                     temps, top_ks, top_ps)
    lp0 = top_logprobs_batched(logits[:, 0], sampled0, LOGPROBS_K)
    return preds, sampled0, lp0, pool


class PagedBatcher(ContinuousBatcher):
    """Continuous batcher over a paged KV pool.

    ``n_blocks`` sizes the pool (default: enough for every slot at full
    context — set it lower to realize the memory saving); ``attn_impl``
    picks the decode-attention path ("pallas" streams only owned blocks,
    "xla" is the gather-based oracle that also runs on CPU).
    """

    def __init__(self, engine, n_slots: int = 8,
                 n_blocks: Optional[int] = None,
                 block_size: int = DEFAULT_BLOCK_SIZE,
                 attn_impl: Optional[str] = None,
                 prefix_cache: bool = True,
                 allocator_backend: str = "auto",
                 speculate_k: int = 0,
                 step_quantum: Optional[int] = None) -> None:
        import threading

        # scheduler quantum (see ContinuousBatcher): decode steps per
        # dispatch; None = auto (8 on RPC-attached devices, 1 local)
        if step_quantum is None:
            from llama_nuts_and_bolts_tpu.utils.compile_cache import (
                is_rpc_attached,
            )

            step_quantum = 4 if is_rpc_attached() else 1
        self.step_quantum = max(1, int(step_quantum))
        self.engine = engine
        self.cfg = engine.model.cfg
        self.vocab = engine.model.vocab
        self.n_slots = n_slots
        self.seq_len = engine.seq_len
        # n-gram prompt-lookup speculation composes with the paged pool:
        # each verify step writes K+1 rows per slot, so the scheduler backs
        # positions pos..pos+K with blocks BEFORE the step and clamps a
        # slot's draft count to what it could back (pool-dry ⇒ fewer or
        # zero drafts, never a stall)
        self.speculate_k = speculate_k
        self._proposers = [None] * n_slots
        self.spec_stats = {"spec_steps": 0, "drafted": 0, "accepted": 0}
        kv_is_int8 = (getattr(engine.args, "kv_cache_dtype", "bf16")
                      == "int8")
        if attn_impl is None:
            # measured on v5e (docs/04-KERNELS.md, round-4 update): with
            # the folded-heads multi-block kernel reading the carried
            # stacked pool directly (layer prefetch, unrolled in-place
            # writes), the Pallas path beats the XLA gather at serving
            # shapes (186 vs 177 total tok/s, 24L x 4 slots x 2K) — it is
            # now the bf16 default; int8 pools have an int8x int8-MXU
            # kernel variant, selectable with attn_impl="pallas" (default
            # stays gather pending a measured win). On CPU the kernel
            # would run in interpret mode — keep the gather there. Under a
            # MESH the gather stays too: GSPMD can partition the gather
            # path but not a pallas_call, and the paged kernel has no
            # shard_map wrapper yet.
            on_tpu = jax.devices()[0].platform not in ("cpu", "gpu")
            attn_impl = ("pallas" if (on_tpu and not kv_is_int8
                                      and getattr(engine, "mesh", None) is None)
                         else "xla")
        self.attn_impl = attn_impl
        self.block_size = block_size
        self.max_blocks = math.ceil(self.seq_len / block_size)
        if n_blocks is None:
            n_blocks = 1 + n_slots * self.max_blocks
        kv_dtype = jnp.int8 if kv_is_int8 else jnp.bfloat16
        self.pool = PagedKVPool.create(self.cfg, n_blocks, block_size,
                                       dtype=kv_dtype)
        if getattr(engine, "mesh", None) is not None:
            from llama_nuts_and_bolts_tpu.parallel import shard_pool

            self.pool = shard_pool(self.pool, engine.mesh)
        self.prefix_cache = prefix_cache
        self.allocator = PrefixBlockAllocator(n_blocks, block_size,
                                              backend=allocator_backend)
        self.tables = np.full((n_slots, self.max_blocks), TRASH_BLOCK, np.int32)
        self._slot_blocks: List[List[int]] = [[] for _ in range(n_slots)]
        self.slots: List[Optional[Request]] = [None] * n_slots
        self._feed = np.zeros(n_slots, dtype=np.int32)
        self._pos = np.zeros(n_slots, dtype=np.int32)
        self._init_sampling_state(n_slots)
        self.pending: "queue.Queue[Request]" = queue.Queue()
        self._stalled: deque[Request] = deque()   # admitted-order, pool-starved
        self._lock = threading.Lock()
        # pipelined quanta in flight, oldest first; each entry is
        # [all_toks, all_lp, fin_tok, fin_poss, force, epos, snapshot]
        self._inflight: list = []
        # rows to feed anew at the next dispatch (just admitted)
        self._splice = np.zeros(n_slots, dtype=bool)
        self._first_dev: list = [None] * n_slots
        # last dispatched quantum's final (token, positions) device carry
        self._last_carry = None

    def submit(self, prompt_tokens, **kwargs):
        """Reject prompts the pool can NEVER hold — otherwise they would
        stall at the FIFO head forever and wedge every request behind them."""
        need = len(list(prompt_tokens)) // self.block_size + 1
        capacity = self.allocator.n_blocks - 1
        if need > capacity:
            raise ValueError(
                f"prompt needs {need} KV blocks but the pool only has "
                f"{capacity}; raise --paged-blocks or shorten the prompt")
        return super().submit(prompt_tokens, **kwargs)

    @property
    def has_work(self) -> bool:
        return super().has_work or bool(self._stalled)

    # ------------------------------------------------------------ internal

    def _next_waiting(self) -> Optional[Request]:
        if self._stalled:
            return self._stalled.popleft()
        try:
            return self.pending.get_nowait()
        except queue.Empty:
            return None

    def _release_slot(self, slot: int) -> None:
        self.allocator.free(self._slot_blocks[slot])
        self._slot_blocks[slot] = []
        self.tables[slot, :] = TRASH_BLOCK
        self._proposers[slot] = None
        super()._release_slot(slot)

    def _admit(self) -> None:
        from llama_nuts_and_bolts_tpu.runtime.engine import prefill_bucket

        bs = self.block_size
        for slot in range(self.n_slots):
            if self.slots[slot] is not None:
                continue
            req = self._next_waiting()
            if req is None:
                return
            if req.cancelled:
                req.out.put((GenerationState.CANCELLED, -1))
                continue
            plen = len(req.prompt)
            total_needed = plen // bs + 1                  # prompt + next write

            # prefix-cache probe: revive the longest run of already-resident
            # full prompt blocks (capped so >= 1 suffix token remains — the
            # admission step must still compute last-row logits)
            shared: List[int] = []
            hashes: List[int] = []
            if self.prefix_cache:
                hashes = chain_block_hashes(req.prompt, bs)
                for h in hashes[:(plen - 1) // bs]:
                    b = self.allocator.lookup(h)
                    if b is None:
                        break
                    shared.append(b)
            owned = self.allocator.alloc(total_needed - len(shared))
            if owned is None:
                # FIFO: wait for frees; nothing behind this request may jump it
                if shared:
                    self.allocator.release(shared)
                self._stalled.appendleft(req)
                return
            blocks = shared + owned
            shared_len = len(shared) * bs
            self._slot_blocks[slot] = blocks
            self.tables[slot, :] = TRASH_BLOCK
            self.tables[slot, :len(blocks)] = blocks
            # prefill length: bucket rounded up to whole blocks
            suffix = req.prompt[shared_len:]
            bucket = prefill_bucket(len(suffix), self.seq_len)
            bucket = min(-(-bucket // bs) * bs, self.max_blocks * bs)
            padded = np.zeros((1, bucket), dtype=np.int32)
            padded[0, :len(suffix)] = suffix
            self._set_sampling(slot, req)
            if shared:
                first, lp, self.pool = _prefill_shared_jit(
                    self.engine.model.params, self.cfg, jnp.asarray(padded),
                    np.int32(shared_len), np.int32(len(suffix) - 1),
                    self.pool, jnp.asarray(self.tables[slot]),
                    np.int32(plen - 1), jnp.asarray(self._key[slot]),
                    self._temp[slot], self._topk[slot], self._topp[slot])
            else:
                first, lp, self.pool = _prefill_jit(
                    self.engine.model.params, self.cfg, jnp.asarray(padded),
                    plen - 1, self.pool, jnp.asarray(self.tables[slot]),
                    jnp.asarray(self._key[slot]), self._temp[slot],
                    self._topk[slot], self._topp[slot])
            if self.prefix_cache:
                # full prompt blocks this request just filled become
                # shareable; decode-grown blocks never do (unhashed)
                for bi in range(len(shared), plen // bs):
                    self.allocator.register(hashes[bi], blocks[bi])
            req.slot = slot
            self.slots[slot] = req
            self._pos[slot] = plen
            self._splice[slot] = True   # next dispatch feeds this row anew
            if self.speculate_k:
                # spec mode steps synchronously; its proposer needs the
                # first token NOW
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
                # ASYNC admission (see ContinuousBatcher._admit): the first
                # token stays a device scalar, delivered via a pseudo-entry
                self._first_dev[slot] = first
                self._inflight.append(("admit", slot, req, first, lp))

    def _back_positions(self, slot: int, upto_pos: int) -> int:
        """Grow slot's blocks until position ``upto_pos`` is backed (or the
        pool/table runs out); returns the highest backed position."""
        bs = self.block_size
        blocks = self._slot_blocks[slot]
        while (len(blocks) * bs <= upto_pos
               and len(blocks) < self.max_blocks):
            grown = self.allocator.alloc(1)
            if grown is None:
                break
            self.tables[slot, len(blocks)] = grown[0]
            blocks.extend(grown)
        return len(blocks) * bs - 1

    def _step_speculative_paged(self) -> None:
        """One speculative iteration over the paged pool: every slot's feed
        token plus up to K n-gram drafts verify in ONE [B, K+1] forward.
        Every emitted token is that forward's own argmax, so exactness holds
        by construction per-forward; as with chunked decode, the K+1-row and
        1-row programs are separately compiled, so argmax NEAR-TIES can in
        principle resolve differently between spec on/off — equivalence with
        the sequential engine is verified by tests on the tested configs.
        Before the step, each speculating slot's positions pos..pos+K are
        backed with blocks (draft count clamped to what the pool could
        back); rejected rows' writes land in backed blocks beyond the
        accepted point and are overwritten before they can become visible.
        Emission mirrors the dense batcher's chain replay, with the paged
        growth/graceful-finish rule applied at the chain's end."""
        K = self.speculate_k
        bs = self.block_size
        with self._lock:
            # the no-drafts fallback below pipelines plain steps; drafting
            # and admission both need current host state, so drain first
            self._flush_inflight()
            self._sweep_cancelled()
            self._admit()
            if not any(r is not None for r in self.slots):
                return
            step_tokens = np.tile(self._feed[:, None], (1, K + 1))
            draft_lists: List[List[int]] = [[] for _ in range(self.n_slots)]
            for slot in range(self.n_slots):
                prop = (self._proposers[slot] if self.slots[slot] is not None
                        else None)
                if prop is None:
                    continue
                p0 = int(self._pos[slot])
                # never allocate blocks for positions past what the seq cap
                # allows writing (a finishing slot must not starve stalled
                # admissions)
                target = min(p0 + K, self.seq_len - 2)
                backed = self._back_positions(slot, target)
                k_eff = min(K, backed - p0, self.seq_len - p0 - 2)
                if k_eff <= 0:
                    continue
                drafts = prop.propose(k_eff)
                draft_lists[slot] = drafts
                step_tokens[slot, 1:1 + len(drafts)] = drafts

            if not any(draft_lists):
                # nobody drafted this step (sampled/logprobs-only traffic,
                # dry proposers, or clamped k): the plain step is strictly
                # cheaper — 1 query row instead of K+1 and the Pallas
                # decode path instead of the spec forward's gather. The
                # proposers must still see the emitted tokens or their
                # n-gram windows never grow into matches.
                self._plain_step_locked()
                # the plain step pipelines (token still in flight): drain it
                # so _feed holds the token the proposers must see
                self._flush_inflight()
                for slot in range(self.n_slots):
                    if (self.slots[slot] is not None
                            and self._proposers[slot] is not None):
                        self._proposers[slot].extend([int(self._feed[slot])])
                return

            preds, sampled0, lp, self.pool = _decode_spec_jit(
                self.engine.model.params, self.cfg,
                jnp.asarray(step_tokens), jnp.asarray(self._pos), self.pool,
                jnp.asarray(self.tables), jnp.asarray(self._key),
                jnp.asarray(self._temp), jnp.asarray(self._topk),
                jnp.asarray(self._topp))
            preds = np.asarray(preds)
            sampled0 = np.asarray(sampled0)

            def end_hook(slot):
                # the NEXT write position must be backed before the chain's
                # last token is emitted — pool-dry becomes a graceful finish
                backed = self._back_positions(slot, int(self._pos[slot]))
                return backed < int(self._pos[slot])

            pos_cap = self.max_blocks * bs - 1
            for slot in range(self.n_slots):
                req = self.slots[slot]
                p0 = int(self._pos[slot])
                if req is None:
                    self._pos[slot] = min(p0 + 1, pos_cap)
                    continue
                chain = self._accepted_chain(slot, draft_lists[slot],
                                             preds, sampled0)
                self._replay_chain(slot, chain, p0, lp, pos_cap,
                                   end_hook=end_hook)

    def step(self) -> None:
        """Advance the paged world by one iteration — PIPELINED like the
        dense scheduler (one decode step in flight; its host fetch overlaps
        the next step's execution). The paged twist: block growth depends
        only on POSITIONS, which the host tracks without fetching tokens, so
        the next step's tables are grown at dispatch time and the pool-dry
        force-finish flag computed there attaches to the in-flight step's
        token at delivery. Any pending/stalled admission or cancellation
        flushes the pipeline first (slot occupancy and block ownership must
        be stable under a live step); a slot that finishes mid-flight may
        have grown one speculative block, returned with the rest of its
        blocks at release."""
        if self.speculate_k:
            self._step_speculative_paged()
            return
        with self._lock:
            # occupancy changes never flush: identity snapshots drop
            # stale rows, admission is async (ContinuousBatcher.step)
            self._sweep_cancelled()
            self._admit()
            if not any(r is not None for r in self.slots):
                self._flush_inflight()
                return
            self._plain_step_locked()

    def _advance_and_grow_quantum(self, k: int):
        """Advance every slot ``k`` positions and back each active slot's
        new write positions with blocks; returns per-step (force flags,
        emit-position snapshot). ``force[j][slot]`` True ⇒ the pool could
        not back position `p+j+1`, so the quantum's token j must be that
        request's LAST (later tokens drop; their writes went to the trash
        block). Growth runs BEFORE the quantum dispatches, so the tables it
        snapshots back every position it will write."""
        pos_cap = self.max_blocks * self.block_size - 1
        force = [[False] * self.n_slots for _ in range(k)]
        epos = np.zeros((k, self.n_slots), np.int32)
        for j in range(k):
            for slot in range(self.n_slots):
                self._pos[slot] = min(int(self._pos[slot]) + 1, pos_cap)
                epos[j, slot] = self._pos[slot]
                if self.slots[slot] is None:
                    continue
                bi = int(self._pos[slot]) // self.block_size
                if bi >= len(self._slot_blocks[slot]) and bi < self.max_blocks:
                    grown = self.allocator.alloc(1)
                    if grown is None:
                        force[j][slot] = True
                    else:
                        self._slot_blocks[slot].extend(grown)
                        self.tables[slot, bi] = grown[0]
        return force, epos

    def _process_paged_quantum(self, all_toks, all_lp, force, epos,
                               snapshot) -> None:
        """Deliver one completed quantum's tokens, step by step. ``epos``
        holds the position snapshots taken when the quantum's positions
        advanced — the live ``self._pos`` may be a full pipeline ahead by
        delivery time, so seq-cap classification must use the snapshot.
        Rows whose slot changed hands since dispatch (``snapshot[slot]`` is
        not the live occupant) are dropped — admission is flush-free, same
        identity rule as the dense scheduler."""
        for j in range(all_toks.shape[0]):
            lp_j = (all_lp[0][j], all_lp[1][j], all_lp[2][j])
            for slot in range(self.n_slots):
                if (snapshot[slot] is None
                        or snapshot[slot] is not self.slots[slot]):
                    continue
                tok = int(all_toks[j, slot])
                self._feed[slot] = tok
                self._record_logprobs(slot, tok, lp_j, row=slot)
                self._emit(slot, tok, force_finish=force[j][slot],
                           pos=int(epos[j, slot]))

    def _process_entry(self, entry) -> None:
        if entry[0] == "admit":
            self._process_admit(*entry[1:])
        else:
            _tag, all_toks, all_lp, force, epos, snap = entry
            self._process_paged_quantum(np.asarray(all_toks), all_lp,
                                        force, epos, snap)

    def _flush_inflight(self) -> None:
        while self._inflight:
            self._process_entry(self._inflight.pop(0))
        self._last_carry = None

    def _dispatch_paged(self, toks, poss, force, epos):
        """Host arrays are snapshotted (``.copy()``) before device_put: on
        the CPU backend ``jnp.asarray`` can ALIAS the numpy buffer
        zero-copy, and the pipelined step() mutates tables/positions/keys
        (growth, release, admission) while the dispatched step may still be
        executing — without the copy that mutation races the compute."""
        k = 1 if self.speculate_k else self.step_quantum
        all_toks, all_lp, fin_tok, fin_poss, self.pool = _decode_scan_jit(
            self.engine.model.params, self.cfg, toks, poss,
            self.pool, k, self.attn_impl, jnp.asarray(self.tables.copy()),
            jnp.asarray(self._key.copy()), jnp.asarray(self._temp.copy()),
            jnp.asarray(self._topk.copy()), jnp.asarray(self._topp.copy()))
        try:
            all_toks.copy_to_host_async()   # bytes land before the fetch
        except AttributeError:
            pass
        self._last_carry = (fin_tok, fin_poss)
        return ("q", all_toks, all_lp, force, epos, list(self.slots))

    def _plain_step_locked(self) -> None:
        """One pipelined plain iteration: a quantum of ``step_quantum``
        chained decode steps per dispatch, up to PIPELINE_DEPTH quanta in
        flight (see ContinuousBatcher.step for why both matter on
        RPC-attached devices); caller holds the lock and has admitted.
        Invariant: every position a quantum writes is backed (or force-
        flagged) BEFORE it dispatches — block growth depends only on
        positions, which the host advances at dispatch time."""
        if self._last_carry is None:
            # .copy(): see _dispatch_paged — these numpy buffers mutate
            # under later bookkeeping while this step is in flight
            toks = jnp.asarray(self._feed[:, None].copy())
            poss = jnp.asarray(self._pos.copy())
        else:
            # previous quantum's final carry; spliced rows overridden below
            toks, poss = self._last_carry
            if self._splice.any():
                poss = jnp.where(jnp.asarray(self._splice.copy()),
                                 jnp.asarray(self._pos.copy()), poss)
        if self._splice.any():
            for slot in np.nonzero(self._splice)[0]:
                fd = self._first_dev[int(slot)]
                if fd is not None:
                    toks = toks.at[int(slot), 0].set(fd)
                    self._first_dev[int(slot)] = None
                else:
                    toks = toks.at[int(slot), 0].set(
                        int(self._feed[int(slot)]))
            self._splice[:] = False
        k = 1 if self.speculate_k else self.step_quantum
        force, epos = self._advance_and_grow_quantum(k)
        self._inflight.append(self._dispatch_paged(toks, poss, force, epos))
        while self._quanta_in_flight() > self.PIPELINE_DEPTH:
            self._process_entry(self._inflight.pop(0))
        # deliver deferred first tokens now (ContinuousBatcher.step: blocks
        # at most the prefill's own tail, keeps TTFT at one prefill)
        if any(e[0] == "admit" for e in self._inflight):
            keep = []
            for e in self._inflight:
                if e[0] == "admit":
                    self._process_entry(e)
                else:
                    keep.append(e)
            self._inflight = keep
