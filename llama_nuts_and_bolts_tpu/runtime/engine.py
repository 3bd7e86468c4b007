"""Inference engine: jitted prefill/decode loops + streaming generators.

Capability parity with the reference's InferenceEngine (reference:
src/inference/inference.go:42-254) rebuilt for TPU:

  * the autoregressive loop (generateTokensInternal, :173-254) becomes a host
    loop around ONE jitted decode step — same compiled executable every
    iteration, cache donated in place;
  * variable-length prompts are padded to power-of-two buckets so prefill
    compiles once per bucket, not once per prompt length (the reference
    re-runs its interpreter per shape; XLA must not re-trace per shape);
  * Go channels/goroutines become Python generators — the consumer pulls
    GeneratedParts one at a time exactly like the channel reader;
  * stop-token and sequence-length termination states are identical
    (GSFinishedByReachingEOS / GSFinishedByReachingSeqLen, :13-17).
"""

from __future__ import annotations

from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from llama_nuts_and_bolts_tpu.models.llama.loader import LoadedModel
from llama_nuts_and_bolts_tpu.models.llama.model import KVCache, forward
from llama_nuts_and_bolts_tpu.ops.sampling import sample_token
from llama_nuts_and_bolts_tpu.runtime.detokenizer import (
    token_batch_to_string,
    token_to_string,
)
from llama_nuts_and_bolts_tpu.runtime.speculative import (
    DraftModelProposer,
    NgramProposer,
    longest_accepted_prefix,
)
from llama_nuts_and_bolts_tpu.runtime.types import (
    DecodingContext,
    GeneratedPart,
    GenerationState,
    InferenceArgs,
)
from llama_nuts_and_bolts_tpu.tokenizer import PromptPart, encode_ordinary, render_chat_tokens
from llama_nuts_and_bolts_tpu.utils.logging import get_logger

MIN_PREFILL_BUCKET = 16


def prefill_bucket(prompt_len: int, cap: int) -> int:
    b = MIN_PREFILL_BUCKET
    while b < prompt_len:
        b *= 2
    return min(b, cap)


class InferenceEngine:
    def __init__(self, model: LoadedModel, args: Optional[InferenceArgs] = None,
                 log_fn=None, draft_model: Optional[LoadedModel] = None,
                 mesh=None) -> None:
        self.model = model
        self.args = args or InferenceArgs()
        # active device mesh (tensor parallelism): the Pallas kernel paths
        # must run through shard_map on it (parallel/kernel_shard.py), so the
        # perf path and the parallel path stay the SAME path
        self.mesh = mesh
        # optional smaller Llama used as the speculation proposer (two-model
        # speculative decoding); None falls back to n-gram prompt lookup
        if (draft_model is not None
                and draft_model.cfg.vocab_size < model.cfg.vocab_size):
            raise ValueError(
                f"draft model vocab ({draft_model.cfg.vocab_size}) is smaller "
                f"than the target's ({model.cfg.vocab_size}): target token ids "
                "would be clipped by the draft embedding lookup")
        self.draft_model = draft_model
        self.seq_len = self.args.sequence_length or model.cfg.max_sequence_length
        self.log = log_fn or (lambda fmt, *a: get_logger().debug(fmt, *a))
        # one executable per (batch, seqlen-bucket); decode step is S=1
        self._fwd = jax.jit(forward, static_argnums=(1,),
                            static_argnames=("attn_impl", "mesh"),
                            donate_argnums=(4,))
        self._rng = jax.random.PRNGKey(self.args.seed)
        # prefix cache: token-tuple -> KVCache snapshot (see cache_prefix)
        self._prefix_cache: Dict[tuple, KVCache] = {}
        # attn_impl="probe": winners of the one-shot decode micro-benchmark,
        # keyed by cache-buffer length — request bucketing (cache_bucket)
        # means requests decode at different buffer lengths, and the
        # xla/flash crossover moves with the buffer size
        self._probed_decode_impl: Dict[int, str] = {}
        # decode-chunk executables keyed by chunk length (see _decode_chunk)
        self._chunk_fns: Dict[tuple, object] = {}

    # ------------------------------------------------------------ tokenize

    def tokenize(self, prompt_parts: Sequence[PromptPart]) -> List[int]:
        ids = render_chat_tokens(prompt_parts, self.model.vocab, self.model.mergeable_ranks)
        self.log("Prompt token ids: %s", ids)
        return ids

    def tokenize_batch(self, prompts) -> List[List[int]]:
        return [self.tokenize(p) for p in prompts]

    def tokenize_string(self, text: str) -> List[int]:
        return encode_ordinary(text, self.model.mergeable_ranks)

    def token_to_string(self, token_id: int, ctx: DecodingContext):
        return token_to_string(self.model.vocab, token_id, ctx)

    def token_batch_to_string(self, token_ids) -> Tuple[list, str]:
        return token_batch_to_string(self.model.vocab, token_ids)

    def token_batch_to_debug_string(self, token_ids) -> str:
        return self.model.vocab.debug_string(token_ids)

    def new_cache(self, batch: int = 1, max_seq: Optional[int] = None) -> KVCache:
        """Fresh KV cache honoring ``args.kv_cache_dtype`` (bf16 | int8);
        kv-head-sharded over the engine's mesh when one is active.
        ``max_seq`` bounds the buffer below the engine context (request
        bucketing — see cache_bucket)."""
        dtype = jnp.int8 if self.args.kv_cache_dtype == "int8" else jnp.bfloat16
        cache = KVCache.create(self.model.cfg, batch, max_seq or self.seq_len,
                               dtype=dtype)
        if self.mesh is not None:
            from llama_nuts_and_bolts_tpu.parallel import shard_cache

            cache = shard_cache(cache, self.mesh)
        return cache

    def cache_bucket(self, prompt_len: int, max_new_tokens: Optional[int]) -> int:
        """Cache-buffer length for a request: the smallest power-of-two-ish
        bucket holding ``prompt + max_new`` (capped at the engine context).

        Measured on v5e: a decode step's cost tracks the cache BUFFER size,
        not the attended length (masked positions are still read by the
        static-shape attention), so an 8K-context server sizing every
        request's cache at 8K decodes a max_tokens=100 request ~30% slower
        than it needs to. One executable per bucket; buckets are powers of
        two from 256, so at most log2(context/256)+1 exist."""
        if max_new_tokens is None:
            return self.seq_len
        need = prompt_len + max_new_tokens + 2
        b = 256
        while b < need:
            b *= 2
        return min(b, self.seq_len)

    def _kernels_viable(self) -> bool:
        aligned = self.model.cfg.head_dim % 128 == 0
        if self.mesh is not None:
            # the shard_map kernel wrappers keep whole GQA groups per shard
            tp = self.mesh.shape.get("tp", 1)
            aligned = aligned and self.model.cfg.kv_heads % tp == 0
        return aligned

    def _attn_impl(self, seq_len: int, cache_len: Optional[int] = None) -> str:
        """Pallas kernels on TPU where they pay: flash prefill for bf16
        caches (decode's S=1 tiles are too small to beat XLA there), and the
        flash-DECODE kernel for int8 caches (XLA cannot fuse the dequantize
        into its einsum — it materializes the bf16 cache every step).
        ``attn_impl="probe"`` replaces these build-time rules for the DECODE
        step with a one-shot measurement at the active config
        (autotune_attn_impl). ``cache_len`` is the request's cache-buffer
        bucket (cache_bucket); probe results are keyed by it, so a
        short-bucket request is not stuck with a choice measured at the full
        engine context."""
        on_tpu = jax.devices()[0].platform not in ("cpu", "gpu")
        aligned = self._kernels_viable()
        if seq_len == 1 and self.args.attn_impl == "probe":
            bucket = cache_len or self.seq_len
            if bucket not in self._probed_decode_impl:
                self.autotune_attn_impl(cache_len=bucket)
            return self._probed_decode_impl[bucket]
        if self.args.attn_impl not in ("auto", "probe"):
            forced = self.args.attn_impl
            if (self.args.kv_cache_dtype == "int8" and forced == "flash"
                    and seq_len > 1):
                # int8 + flash is decode-only (forward rejects S>1); honor
                # the forced impl where it can run, fall back for prefill
                return "xla"
            return forced
        bucket = cache_len or self.seq_len
        if self.args.kv_cache_dtype == "int8":
            # divisibility gate mirrors the bf16 rule below: the flash decode
            # kernel needs SOME block size in (2048..128) to divide the cache
            # buffer; a buffer none divides (e.g. --context 5000) would raise
            # at trace time in model.py, so route it to XLA instead
            return "flash" if (seq_len == 1 and on_tpu and aligned
                               and bucket % 128 == 0) else "xla"
        if seq_len > 1 and on_tpu and aligned:
            return "flash"
        if (seq_len == 1 and on_tpu and aligned
                and bucket >= 4096 and bucket % 2048 == 0):
            # long-context bf16 decode: the stacked-cache flash kernel with
            # 2048-deep tiles now edges XLA (59.1 vs 58.9 tok/s at 8K/24L;
            # 12.22 vs 12.28 ms at 8K/16L — round-4 measurements, docs/07);
            # short buffers stay XLA, where the kernel's fixed cost loses.
            # The divisibility gate keeps the kernel on its measured tile
            # size — a buffer no block size divides would degenerate to
            # one whole-buffer tile (VMEM blow-up past ~8K).
            return "flash"
        return "xla"

    def autotune_attn_impl(self, iters: int = 5,
                           cache_len: Optional[int] = None) -> str:
        """One-shot decode-impl micro-probe: time ``iters`` single-token
        decode steps per viable impl at the ACTIVE config (cache-buffer
        length, cache dtype, mesh) and keep the fastest, so the choice
        tracks the deployment instead of build-time assumptions. Costs one
        extra decode compile per candidate; the result is cached per
        cache-buffer bucket in ``self._probed_decode_impl`` (also
        returned) — bucketed requests (cache_bucket) probe their own
        buffer length."""
        import time

        cache_len = cache_len or self.seq_len
        candidates = ["xla"]
        # same platform gate as the auto rules: the Pallas kernels are TPU
        # programs (CPU would probe them in glacial interpret mode; GPU
        # fails to lower), so off-TPU the probe has one candidate
        on_tpu = jax.devices()[0].platform not in ("cpu", "gpu")
        if on_tpu and self._kernels_viable():
            candidates.append("flash")
        if len(candidates) == 1:
            self._probed_decode_impl[cache_len] = candidates[0]
            self._probe_timings = {candidates[0]: 0.0}
            self.log("attn-impl probe: only %r viable at this config",
                     candidates[0])
            return candidates[0]
        timings: Dict[str, float] = {}
        # probe mid-buffer: attention cost at cache_len/2 is representative
        # of a typical decode step in this bucket; position 0 would flatter
        # short-context impls
        pos = max(1, (cache_len - 2) // 2)
        step = jnp.zeros((1, 1), dtype=jnp.int32)
        for impl in candidates:
            cache = self.new_cache(1, cache_len)
            try:
                logits, cache = self._fwd(self.model.params, self.model.cfg,
                                          step, pos, cache, attn_impl=impl,
                                          mesh=self.mesh)  # compile + warm
                np.asarray(logits[0, 0, :1])
            except Exception as e:
                # a candidate that cannot trace/compile at this config (e.g.
                # flash at a cache length no block size divides) is excluded,
                # not fatal — the probe exists to pick among what RUNS
                self.log("attn-impl probe: %r not viable at cache_len=%d (%s)",
                         impl, cache_len, e)
                continue
            best = float("inf")
            for _ in range(iters):
                t0 = time.perf_counter()
                logits, cache = self._fwd(self.model.params, self.model.cfg,
                                          step, pos, cache, attn_impl=impl,
                                          mesh=self.mesh)
                np.asarray(logits[0, 0, :1])
                best = min(best, time.perf_counter() - t0)
            timings[impl] = best
        if not timings:   # defensive: xla always traces, but never crash here
            timings = {"xla": 0.0}
        choice = min(timings, key=timings.get)
        self._probed_decode_impl[cache_len] = choice
        self._probe_timings = timings
        self.log("attn-impl probe at cache_len=%d kv=%s: %s -> chose %r",
                 cache_len, self.args.kv_cache_dtype,
                 {k: f"{v * 1e3:.2f}ms" for k, v in timings.items()},
                 choice)
        return choice

    # ------------------------------------------------------------- decode

    def _select_token(self, logits_row: jnp.ndarray) -> int:
        if self.args.temperature > 0.0:
            self._rng, key = jax.random.split(self._rng)
            tok = sample_token(logits_row, key, self.args.temperature,
                               self.args.top_k, self.args.top_p)
        else:
            tok = jnp.argmax(logits_row, axis=-1)
        return int(tok)

    # ------------------------------------------------------- prefix caching

    MAX_CACHED_PREFIXES = 4
    # decode-chunk executables kept (LRU, sampled evicted first): greedy
    # needs one per (chunk size, cache bucket) — up to ~log2(context/256)
    # buckets — and sampled adds one per distinct (top_k, top_p)
    MAX_CHUNK_EXECUTABLES = 16

    def cache_prefix(self, prefix_tokens: Sequence[int]) -> None:
        """Prefill ``prefix_tokens`` once and snapshot the KV state: any later
        prompt that starts with these tokens skips recomputing them (system
        prompts, shared few-shot preambles). The snapshot is copied per use —
        the decode loop donates its cache — so the stored state is immutable.
        Keeps at most MAX_CACHED_PREFIXES snapshots (FIFO eviction)."""
        prefix = tuple(prefix_tokens)
        if not prefix or len(prefix) >= self.seq_len:
            raise ValueError("prefix must be non-empty and shorter than context")
        if prefix in self._prefix_cache:
            return
        _logits, cache = self._run_prefill(list(prefix), self.new_cache(1), 0)
        while len(self._prefix_cache) >= self.MAX_CACHED_PREFIXES:
            self._prefix_cache.pop(next(iter(self._prefix_cache)))
        self._prefix_cache[prefix] = cache

    def _match_prefix(self, prompt_tokens: Sequence[int]):
        """Longest cached prefix of the prompt (None when nothing matches)."""
        best = None
        for prefix in self._prefix_cache:
            if len(prompt_tokens) >= len(prefix) and (
                    tuple(prompt_tokens[:len(prefix)]) == prefix):
                if best is None or len(prefix) > len(best):
                    best = prefix
        return best

    def _run_prefill(self, tokens: Sequence[int], cache: KVCache,
                     start_pos: int) -> Tuple[jnp.ndarray, KVCache]:
        """Bucketed-padded prefill of ``tokens`` at ``start_pos``.

        With ``args.prefill_chunk=C`` set and more than C tokens, all but the
        tail run in exact C-token chunks first (one executable shared by every
        chunk; attention/activation memory bounded at O(C·T) instead of
        O(S·T)); only the tail takes the bucketed path below. Each chunk's
        logits are discarded — ``logits_at`` projects a single row through the
        vocab head, so the waste per chunk is one [1,vocab] matvec.
        """
        chunk = self.args.prefill_chunk
        if chunk > 0 and len(tokens) > chunk:
            done = 0
            while len(tokens) - done > chunk:
                piece = np.asarray([tokens[done:done + chunk]], dtype=np.int32)
                _, cache = self._fwd(self.model.params, self.model.cfg,
                                     jnp.asarray(piece), start_pos + done,
                                     cache, attn_impl=self._attn_impl(chunk),
                                     logits_at=chunk - 1, mesh=self.mesh)
                done += chunk
            tokens = tokens[done:]
            start_pos += done
        n = len(tokens)
        # cap by the cache room left past start_pos, not the whole cache —
        # a tail/suffix at start_pos>0 must not let padding spill off the
        # end (the cache buffer may be a request bucket < seq_len)
        cache_room = cache.max_seq
        bucket = prefill_bucket(n, cache_room - start_pos)
        if start_pos + bucket > cache_room or n > bucket:
            raise ValueError("prefill bucket exceeds cache length")
        padded = np.zeros((1, bucket), dtype=np.int32)
        padded[0, :n] = tokens
        return self._fwd(self.model.params, self.model.cfg, jnp.asarray(padded),
                         start_pos, cache, attn_impl=self._attn_impl(bucket),
                         logits_at=n - 1, mesh=self.mesh)

    def _prefill(self, prompt_tokens: Sequence[int],
                 cache_len: Optional[int] = None) -> Tuple[jnp.ndarray, KVCache]:
        """Bucketed-padded prefill; returns logits at the last prompt row.
        Reuses the longest cached prefix snapshot when one matches.
        ``cache_len`` sizes the request's cache buffer (default: the full
        engine context)."""
        prompt_len = len(prompt_tokens)
        if prompt_len >= self.seq_len:
            raise ValueError(
                f"context sequence length {self.seq_len} must be higher than "
                f"prompt tokens length {prompt_len}"
            )
        cache_len = cache_len or self.seq_len
        prefix = self._match_prefix(prompt_tokens)
        if prefix is not None:
            plen = len(prefix)
            if plen == prompt_len:
                # prompt == prefix: re-run its last token for the logits row
                plen -= 1
            suffix = list(prompt_tokens[plen:])
            # always fits: plen + len(suffix) = prompt_len < cache_len, and
            # _run_prefill caps the suffix bucket at the remaining cache room
            cache = self._prefix_cache[prefix].truncated(cache_len)
            self.log("Prefix cache hit: %d of %d prompt tokens reused",
                     plen, prompt_len)
            return self._run_prefill(suffix, cache, plen)
        self.log("Running prefill: prompt_len=%d", prompt_len)
        return self._run_prefill(list(prompt_tokens),
                                 self.new_cache(1, cache_len), 0)

    def _decode_chunk_size(self) -> int:
        """Resolve args.decode_chunk: 0 = auto (amortize dispatches only on
        RPC-attached devices, where each costs a network round-trip —
        runtime/device_loop.py:1-9; host-attached stays per-token)."""
        if self.args.decode_chunk:
            return max(1, self.args.decode_chunk)
        from llama_nuts_and_bolts_tpu.utils.compile_cache import (
            is_rpc_attached,
        )

        return 8 if is_rpc_attached() else 1

    def _decode_chunk(self, k: int, sampled: bool = False,
                      cache_len: Optional[int] = None):
        """Jitted k-step decode: one dispatch yields k tokens via an
        on-device lax.scan (same per-step program as the single-token path).

        The sampled variant carries the RNG key through the scan and splits
        it exactly like the per-token loop (`self._rng, key = split(rng)` per
        step), so the emitted token sequence for a given seed matches
        per-token decoding. Temperature is traced (one executable serves
        any value); top_k/top_p are shape-affecting and stay static.
        ``cache_len`` keys the entry by the request's cache bucket (the
        attn-impl probe may choose differently per bucket)."""
        bucket = cache_len or self.seq_len
        cache_key = ((k, bucket, "s", self.args.top_k, self.args.top_p)
                     if sampled else (k, bucket, "g"))
        if cache_key in self._chunk_fns:
            # LRU: refresh on hit so a client cycling distinct sampled
            # (top_k, top_p) keys evicts stale sampled entries, not the
            # hot steady-state greedy executable
            self._chunk_fns[cache_key] = self._chunk_fns.pop(cache_key)
            return self._chunk_fns[cache_key]
        # sampled keys carry client-controlled top_k/top_p: bound the
        # executable cache so a client cycling values can't grow it (or
        # trigger compile storms that retain every program) without limit.
        # Evict SAMPLED entries first — greedy keys are bounded (one per
        # cache bucket, ~log2(context/256) of them) and are the hot
        # steady-state path; multi-second recompiles of those would be a
        # client-triggerable latency cliff.
        while len(self._chunk_fns) >= self.MAX_CHUNK_EXECUTABLES:
            victim = next((k for k in self._chunk_fns if "s" in k),
                          next(iter(self._chunk_fns)))
            self._chunk_fns.pop(victim)
        if cache_key not in self._chunk_fns:
            from jax import lax

            cfg = self.model.cfg
            impl = self._attn_impl(1, bucket)
            mesh = self.mesh

            if sampled:
                top_k, top_p = self.args.top_k, self.args.top_p

                def chunk_s(params, tok, pos, cache, rng, temperature):
                    def body(carry, _):
                        tok, pos, cache, rng = carry
                        logits, cache = forward(params, cfg, tok, pos, cache,
                                                attn_impl=impl, mesh=mesh)
                        rng, key = jax.random.split(rng)
                        nxt = sample_token(logits[0, -1] / temperature, key,
                                           1.0, top_k, top_p)
                        nxt = nxt.reshape(1, 1).astype(jnp.int32)
                        return (nxt, pos + 1, cache, rng), nxt[0, 0]

                    (tok, pos, cache, rng), toks = lax.scan(
                        body, (tok, pos, cache, rng), None, length=k)
                    return toks, rng, cache

                self._chunk_fns[cache_key] = jax.jit(chunk_s,
                                                     donate_argnums=(3,))
            else:
                def chunk(params, tok, pos, cache):
                    def body(carry, _):
                        tok, pos, cache = carry
                        logits, cache = forward(params, cfg, tok, pos, cache,
                                                attn_impl=impl, mesh=mesh)
                        nxt = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
                        return (nxt, pos + 1, cache), nxt[0, 0]

                    (tok, pos, cache), toks = lax.scan(
                        body, (tok, pos, cache), None, length=k)
                    return toks, cache

                self._chunk_fns[cache_key] = jax.jit(chunk, donate_argnums=(3,))
        return self._chunk_fns[cache_key]

    def generate_tokens(
        self, prompt_tokens: Sequence[int],
        max_new_tokens: Optional[int] = None,
    ) -> Iterator[Tuple[GenerationState, int]]:
        """Greedy/sampled autoregressive generation, one token per yield.

        Streaming decodes in on-device chunks of k steps per dispatch
        (``args.decode_chunk``) and replays each chunk's tokens one at a
        time, so detokenizer waiting-bytes state and console semantics are
        untouched. The scan body IS the single-step program and the sampled
        variant splits the RNG key per step exactly like the per-token
        loop; the chunk scan is still a separately compiled XLA program, so
        bitwise logit identity with per-token decoding is verified by tests
        on the tested configs rather than guaranteed in principle. The
        horizon tail runs per-token.

        ``max_new_tokens`` both caps the stream and — the perf point —
        shrinks the request's cache BUFFER to a bucket (cache_bucket): a
        decode step's cost tracks buffer size, not attended length, so a
        long-context engine serving short-budget requests decodes them at
        short-context speed. Tokens are identical to an uncapped run's
        prefix. (The speculative path keeps the full-context cache.)
        """
        if max_new_tokens is not None and max_new_tokens <= 0:
            return
        if self.args.speculate_k > 0 and self.args.temperature == 0.0:
            it = self._generate_tokens_speculative(prompt_tokens)
            if max_new_tokens is None:
                yield from it
                return
            n = 0
            for state, tok in it:
                n += 1
                yield state, tok
                if n >= max_new_tokens or state != GenerationState.IN_PROGRESS:
                    return
            return
        cache_len = self.cache_bucket(len(prompt_tokens), max_new_tokens)
        # the cap lives INSIDE the plain generator (not a wrapper): a capped
        # sampled run ending mid-chunk must rewind the RNG to the per-token
        # state, which only the chunk replay loop can account for
        yield from self._generate_tokens_plain(prompt_tokens, cache_len,
                                               max_new_tokens)

    def _generate_tokens_plain(
        self, prompt_tokens: Sequence[int], cache_len: int,
        max_new_tokens: Optional[int] = None,
    ) -> Iterator[Tuple[GenerationState, int]]:
        cfg = self.model.cfg
        prompt_len = len(prompt_tokens)
        vocab = self.model.vocab
        horizon = min(self.seq_len, cache_len)
        cap = max_new_tokens if max_new_tokens is not None else float("inf")
        emitted = 0
        logits, cache = self._prefill(prompt_tokens, cache_len)
        next_token = self._select_token(logits[0, 0])

        chunk_k = self._decode_chunk_size()
        sampled = self.args.temperature > 0.0
        temp = jnp.float32(self.args.temperature) if sampled else None
        # pipelining: one chunk kept in flight. The NEXT chunk's input token
        # is this chunk's last token ON DEVICE, so its dispatch needs no host
        # sync — the host fetch/replay of chunk N then overlaps chunk N+1's
        # device execution, hiding the per-chunk round-trip entirely. A stop
        # token ending generation just abandons the in-flight chunk (its
        # extra cache writes are never read).
        pending = None  # (toks_dev, rng_dev|None, fed_pos)
        cur_pos = prompt_len
        while True:
            if vocab.is_stop(next_token):
                yield GenerationState.FINISHED_BY_REACHING_EOS, next_token
                return
            if cur_pos + 1 >= horizon:
                yield GenerationState.FINISHED_BY_REACHING_SEQ_LEN, next_token
                return
            yield GenerationState.IN_PROGRESS, next_token
            emitted += 1
            if emitted >= cap:
                # cap hit at a chunk boundary (or per-token step): any
                # consumed chunk is fully accounted, self._rng is exact
                return

            if chunk_k > 1 and cur_pos + chunk_k < horizon:
                fn = self._decode_chunk(chunk_k, sampled=sampled,
                                        cache_len=cache_len)
                rng_before = self._rng  # pre-chunk state, for mid-chunk exit
                if pending is not None:
                    toks, rng, fed_pos = pending
                    pending = None
                    if fed_pos != cur_pos:
                        # pipelined-chunk invariant broken (should be
                        # impossible): discard the pending chunk and
                        # re-dispatch from the live position rather than
                        # aborting the user's stream
                        get_logger().error(
                            "pipelined chunk at pos %d does not match live "
                            "pos %d; re-dispatching", fed_pos, cur_pos)
                        toks = rng = None
                    if rng is not None:
                        self._rng = rng
                else:
                    toks = None
                if toks is None:
                    step = jnp.asarray([[next_token]], dtype=jnp.int32)
                    if sampled:
                        toks, self._rng, cache = fn(
                            self.model.params, step, cur_pos, cache,
                            self._rng, temp)
                    else:
                        toks, cache = fn(self.model.params, step, cur_pos,
                                         cache)
                # dispatch the next chunk BEFORE fetching this one (its
                # input is this chunk's last token, still on device); only
                # when the next iteration would take the chunked branch
                nxt_pos = cur_pos + chunk_k
                if nxt_pos + chunk_k < horizon:
                    nxt_step = toks[-1:].reshape(1, 1)
                    if sampled:
                        p_toks, p_rng, cache = fn(
                            self.model.params, nxt_step, nxt_pos, cache,
                            self._rng, temp)
                        pending = (p_toks, p_rng, nxt_pos)
                    else:
                        p_toks, cache = fn(self.model.params, nxt_step,
                                           nxt_pos, cache)
                        pending = (p_toks, None, nxt_pos)
                chunk_tokens = np.asarray(toks).tolist()
                cur_pos += 1
                for i, tok in enumerate(chunk_tokens):
                    next_token = int(tok)
                    if i + 1 == len(chunk_tokens):
                        break  # loop head handles the last one
                    terminal = None
                    if vocab.is_stop(next_token):
                        terminal = GenerationState.FINISHED_BY_REACHING_EOS
                    elif cur_pos + 1 >= horizon:
                        terminal = GenerationState.FINISHED_BY_REACHING_SEQ_LEN
                    if terminal is not None or emitted + 1 >= cap:
                        if sampled:
                            # generation ends mid-chunk: the chunk consumed
                            # k RNG splits but per-token decoding would have
                            # consumed i+1 — rewind so a later unseeded
                            # request on this engine sees the exact
                            # per-token RNG state
                            rng = rng_before
                            for _ in range(i + 1):
                                rng, _key = jax.random.split(rng)
                            self._rng = rng
                        yield (terminal if terminal is not None
                               else GenerationState.IN_PROGRESS), next_token
                        return
                    yield GenerationState.IN_PROGRESS, next_token
                    emitted += 1
                    cur_pos += 1
                continue

            step = jnp.asarray([[next_token]], dtype=jnp.int32)
            logits, cache = self._fwd(self.model.params, cfg, step, cur_pos,
                                      cache,
                                      attn_impl=self._attn_impl(1, cache_len),
                                      mesh=self.mesh)
            next_token = self._select_token(logits[0, -1])
            cur_pos += 1

    def _generate_tokens_speculative(
        self, prompt_tokens: Sequence[int]
    ) -> Iterator[Tuple[GenerationState, int]]:
        """Greedy decode with n-gram prompt-lookup speculation.

        Each device step verifies the just-emitted token plus up to ``k``
        drafts in one forward (S=k+1 — same weight bytes as S=1, so accepted
        drafts are nearly free). Emits exactly the vanilla greedy sequence:
        a draft is only emitted when it equals the model's own argmax.
        Cache-staleness note: rejected/padded rows write K/V at positions
        beyond the accepted point; those slots are invisible to later queries
        (col > row position) until the real token at that position is
        consumed and overwrites them.
        """
        cfg = self.model.cfg
        vocab = self.model.vocab
        k = self.args.speculate_k
        logits, cache = self._prefill(prompt_tokens)
        queue = [int(jnp.argmax(logits[0, 0]))]
        if self.draft_model is not None:
            proposer = DraftModelProposer(self.draft_model, list(prompt_tokens),
                                          self.seq_len)
        else:
            proposer = NgramProposer(list(prompt_tokens))
        self.spec_stats = {"steps": 0, "spec_steps": 0, "drafted": 0, "accepted": 0}
        n_ctx = len(prompt_tokens)

        while True:
            tok = queue.pop(0)
            if vocab.is_stop(tok):
                yield GenerationState.FINISHED_BY_REACHING_EOS, tok
                return
            if n_ctx + 1 >= self.seq_len:
                yield GenerationState.FINISHED_BY_REACHING_SEQ_LEN, tok
                return
            yield GenerationState.IN_PROGRESS, tok
            proposer.extend([tok])
            n_ctx += 1
            if queue:
                continue

            start = n_ctx - 1                 # the emitted token's position
            self.spec_stats["steps"] += 1
            drafts = proposer.propose(k) if n_ctx + k <= self.seq_len else []
            if drafts:
                real = len(drafts)
                step = jnp.asarray(
                    [[tok] + drafts + [drafts[-1]] * (k - real)], dtype=jnp.int32)
                # verify runs S=k+1 rows: always the XLA path (the flash
                # kernels are prefill- or S=1-shaped, and a k+1-row step is
                # as weight-bound as a single-token one)
                logits, cache = self._fwd(self.model.params, cfg, step, start,
                                          cache, attn_impl="xla")
                preds = np.asarray(jnp.argmax(logits[0], axis=-1))
                n_acc = longest_accepted_prefix(drafts, preds[:real].tolist())
                self.spec_stats["spec_steps"] += 1
                self.spec_stats["drafted"] += real
                self.spec_stats["accepted"] += n_acc
                queue.extend(drafts[:n_acc])
                queue.append(int(preds[n_acc]))
            else:
                step = jnp.asarray([[tok]], dtype=jnp.int32)
                logits, cache = self._fwd(self.model.params, cfg, step, start,
                                          cache, attn_impl=self._attn_impl(1),
                                          mesh=self.mesh)
                queue.append(int(jnp.argmax(logits[0, -1])))

    # ---------------------------------------------------------- streaming

    def generate_string(self, prompt_tokens: Sequence[int]) -> Iterator[GeneratedPart]:
        return self._generate_string(self.generate_tokens(prompt_tokens))

    def generate_string_from_output_tokens(
        self, output_tokens: Sequence[int]
    ) -> Iterator[GeneratedPart]:
        """Replay a scripted token stream through the decoder (the reference's
        test hook, src/inference/inference.go:62-71)."""

        def scripted():
            for tok in output_tokens:
                yield GenerationState.IN_PROGRESS, tok

        return self._generate_string(scripted())

    def _generate_string(self, token_iter) -> Iterator[GeneratedPart]:
        ctx = DecodingContext()
        last_state = GenerationState.IN_PROGRESS

        for state, token_id in token_iter:
            token, token_str, added_to_waiting = self.token_to_string(token_id, ctx)
            self.log('Generated token string: "%s", addedToWaiting: %s',
                     token_str, added_to_waiting)
            part = GeneratedPart(
                token_id=token_id,
                token=token,
                decoded_string=token_str,
                added_to_waiting=added_to_waiting,
                waiting_runes_extra_str=ctx.waiting_runes_extra_str,
                generation_state=GenerationState.IN_PROGRESS,
            )
            if state != GenerationState.IN_PROGRESS and not ctx.waiting_parts:
                part.generation_state = state
            last_state = state
            if added_to_waiting:
                ctx.waiting_parts.append(part)
            else:
                ctx.waiting_parts.clear()
            yield part

        # flush still-waiting byte-fallback parts as literal <0xNN> text
        # (reference: src/inference/inference.go:134-156)
        ctx.decoding_finished = True
        if ctx.waiting_parts:
            for i, waiting in enumerate(ctx.waiting_parts):
                decoded = waiting.token.byte_fallback_string()
                if ctx.waiting_runes_extra_str:
                    decoded = ctx.waiting_runes_extra_str + decoded
                    ctx.waiting_runes = ""
                    ctx.waiting_runes_extra_str = ""
                yield GeneratedPart(
                    token_id=waiting.token_id,
                    token=waiting.token,
                    decoded_string=decoded,
                    added_to_waiting=False,
                    waiting_runes_extra_str="",
                    is_resend_of_waiting=True,
                    generation_state=(last_state if i + 1 == len(ctx.waiting_parts)
                                      else GenerationState.IN_PROGRESS),
                )
