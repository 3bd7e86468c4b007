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
