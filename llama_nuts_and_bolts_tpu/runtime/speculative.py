"""Prompt-lookup (n-gram) speculative decoding.

Batch-1 greedy decode is HBM-bandwidth-bound: every step reads every weight
byte to emit ONE token (docs/07-PERFORMANCE.md). A verify step over k+1
candidate tokens reads the same bytes — so each extra accepted draft is a
nearly-free token, and the tokens/s ceiling rises past the single-token
roofline whenever text repeats (code, quotes, structured output).

Drafts come from the sequence itself (prompt + generated so far): find the
most recent earlier occurrence of the current n-gram suffix and propose its
continuation — no draft model, no extra weights, exact greedy equivalence
(every emitted token is validated by the target model's own argmax).

The reference is strictly one-token-at-a-time (its decode loop,
src/inference/inference.go:173-254); this is a TPU-native extension enabled
with ``InferenceArgs(speculate_k=...)`` / CLI ``--speculate``.
"""

from __future__ import annotations

from typing import List, Sequence


class NgramProposer:
    """Proposes draft continuations by suffix-matching the running context.

    ``propose(k)`` looks for the most recent earlier occurrence of the last
    ``n`` tokens (longest n first) and returns the k tokens that followed it.
    Runs on the host between device steps; O(n_gram · len) per call is
    negligible next to a decode dispatch.
    """

    def __init__(self, context: Sequence[int], max_ngram: int = 3) -> None:
        self.context: List[int] = list(context)
        self.max_ngram = max_ngram

    def extend(self, tokens: Sequence[int]) -> None:
        self.context.extend(tokens)

    def propose(self, k: int) -> List[int]:
        """Up to ``k`` draft tokens (empty list when no n-gram matches)."""
        ctx = self.context
        L = len(ctx)
        for n in range(min(self.max_ngram, L - 1), 0, -1):
            suffix = ctx[L - n:]
            # scan candidate match-ends right-to-left: most recent repeat wins
            for end in range(L - 1, n - 1, -1):
                if ctx[end - n:end] == suffix:
                    cont = ctx[end:end + k]
                    if cont:
                        return cont
        return []


def longest_accepted_prefix(drafts: Sequence[int], preds: Sequence[int]) -> int:
    """#leading drafts matching the verifier's argmax chain.

    ``preds[i]`` is the model's next token after consuming the accepted token
    plus drafts[:i]; draft i is correct iff it equals preds[i].
    """
    n = 0
    for d, p in zip(drafts, preds):
        if d != p:
            break
        n += 1
    return n


class DraftModelProposer:
    """Draft-MODEL speculation: a smaller Llama proposes the k tokens.

    Same ``extend``/``propose`` surface as :class:`NgramProposer`, so the
    engine's verify loop is shared — and exact greedy equivalence holds for
    ANY draft (every emitted token is still validated by the target's own
    argmax); a better draft only raises the acceptance rate. Classic
    two-model speculative decoding (Leviathan et al.), greedy-specialized.

    Device-state discipline (the part the n-gram proposer never needed): the
    draft keeps its OWN KV cache. ``extend`` is host-only; ``propose`` first
    CATCHES UP — one padded forward over the context tokens the cache hasn't
    absorbed (position ``p``'s row is rewritten before any later query can
    see it, so draft rows from rejected speculation are harmlessly
    overwritten) — then drafts autoregressively. Catch-up lengths are padded
    to power-of-two buckets so the step reuses a handful of executables.
    """

    _shared_fwd = None   # one jitted draft forward for ALL proposer instances
                         # (a per-instance jax.jit would re-trace + recompile
                         # the draft model on every request)

    @classmethod
    def _fwd_fn(cls):
        if cls._shared_fwd is None:
            import jax

            from llama_nuts_and_bolts_tpu.models.llama.model import forward

            cls._shared_fwd = jax.jit(
                forward, static_argnums=(1,),
                static_argnames=("attn_impl",), donate_argnums=(4,))
        return cls._shared_fwd

    def __init__(self, draft_model, context: Sequence[int], seq_len: int) -> None:
        import jax.numpy as jnp

        from llama_nuts_and_bolts_tpu.models.llama.model import KVCache

        self.model = draft_model
        self.context: List[int] = list(context)
        self.seq_len = seq_len
        self._valid = 0                      # cache positions [0, _valid) final
        self._cache = KVCache.create(draft_model.cfg, 1, seq_len)
        self._fwd = self._fwd_fn()
        self._jnp = jnp

    def extend(self, tokens: Sequence[int]) -> None:
        self.context.extend(tokens)

    def propose(self, k: int) -> List[int]:
        jnp = self._jnp
        L = len(self.context)
        if k <= 0 or L + k > self.seq_len:
            return []
        # catch-up: feed the tokens the draft cache hasn't absorbed yet
        fresh = self.context[self._valid:]
        S = len(fresh)
        bucket = 16
        while bucket < S:
            bucket *= 2
        bucket = min(bucket, self.seq_len - self._valid)
        padded = fresh + [fresh[-1]] * (bucket - S)
        logits, self._cache = self._fwd(
            self.model.params, self.model.cfg,
            jnp.asarray([padded], jnp.int32), self._valid, self._cache,
            attn_impl="xla", logits_at=S - 1)
        drafts = [int(jnp.argmax(logits[0, 0]))]
        for i in range(1, k):
            step = jnp.asarray([[drafts[-1]]], jnp.int32)
            logits, self._cache = self._fwd(
                self.model.params, self.model.cfg, step, L + i - 1,
                self._cache, attn_impl="xla")
            drafts.append(int(jnp.argmax(logits[0, -1])))
        self._valid = L
        return drafts
