"""Tracing / profiling: device traces and the narrated forward pass.

Capability parity with the reference's observability story (SURVEY.md §5.1):
the reference stamps elapsed time between debug lines (src/common/logging.go:47-55)
and reports per-layer wall-clock live to the UI
(src/model/llamatransformer.go:157-163). TPU equivalents here:

  * :func:`device_trace` — a context manager around ``jax.profiler`` producing
    a TensorBoard-loadable trace of the real on-device timeline (the honest
    replacement for host-side stamps, which lie under async dispatch);
  * :func:`narrated_forward` — a layer-at-a-time execution of the SAME weights
    with per-layer wall-clock and shape narration through the logger, the
    spiritual port of the reference's debug.log forward-pass narration. Slower
    than the fused scan forward by design; for inspection, not serving.
  * :class:`StepTimer` — per-token latency aggregation (p50/p95/mean) feeding
    the CLI's timing lines and bench reporting.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from llama_nuts_and_bolts_tpu.io.params import ModelArgs
from llama_nuts_and_bolts_tpu.models.llama.model import KVCache, LlamaParams, attention_mask
from llama_nuts_and_bolts_tpu.models.llama.rope import apply_rope
from llama_nuts_and_bolts_tpu.ops import gqa_attention, linear, rms_norm, swiglu
from llama_nuts_and_bolts_tpu.utils.logging import get_logger


def _sync(x) -> None:
    """Force completion; block_until_ready is unreliable on tunnel backends.
    Slice ON DEVICE before np.asarray — converting a whole leaf would ship
    the entire buffer through the tunnel."""
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


@contextlib.contextmanager
def device_trace(log_dir: str):
    """``with device_trace("/tmp/trace"):`` → TensorBoard trace directory."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


@dataclass
class StepTimer:
    samples: List[float] = field(default_factory=list)
    _t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self) -> float:
        dt = time.perf_counter() - (self._t0 or time.perf_counter())
        self.samples.append(dt)
        return dt

    def summary(self) -> dict:
        if not self.samples:
            return {}
        arr = sorted(self.samples)
        n = len(arr)
        return {
            "count": n,
            "mean_s": sum(arr) / n,
            "p50_s": arr[n // 2],
            "p95_s": arr[min(n - 1, int(n * 0.95))],
            "total_s": sum(arr),
        }


@jax.jit
def _one_block(w, x, cos, sin, mask, ck, cv, start_pos, norm_eps):
    B, S, _ = x.shape
    KV, D = ck.shape[1], ck.shape[3]
    fused = "wqkv" in w     # decode-optimized layout (model.fuse_decode_params)
    h = rms_norm(x, w["attn_norm"], norm_eps)
    if fused:
        from llama_nuts_and_bolts_tpu.ops import linear_t

        H = (w["wqkv"].shape[1] - 2 * KV * D) // D
        qkv = linear_t(h, w["wqkv"])
        q = qkv[..., :H * D].reshape(B, S, H, D)
        k = qkv[..., H * D:(H + KV) * D].reshape(B, S, KV, D)
        v = qkv[..., (H + KV) * D:].reshape(B, S, KV, D)
    else:
        H = w["wq"].shape[0] // D
        q = linear(h, w["wq"]).reshape(B, S, H, D)
        k = linear(h, w["wk"]).reshape(B, S, KV, D)
        v = linear(h, w["wv"]).reshape(B, S, KV, D)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin).transpose(0, 2, 1, 3)
    v = v.transpose(0, 2, 1, 3)
    ck = jax.lax.dynamic_update_slice(ck, k.astype(ck.dtype), (0, 0, start_pos, 0))
    cv = jax.lax.dynamic_update_slice(cv, v.astype(cv.dtype), (0, 0, start_pos, 0))
    att = gqa_attention(q, ck, cv, mask)
    if fused:
        from llama_nuts_and_bolts_tpu.ops import linear_t

        x = x + linear_t(att.reshape(B, S, H * D), w["wo"])
        h2 = rms_norm(x, w["ffn_norm"], norm_eps)
        F = w["w_gate_up"].shape[1] // 2
        gu = linear_t(h2, w["w_gate_up"])
        act = jax.nn.silu(gu[..., :F].astype(jnp.float32)).astype(gu.dtype)
        x = x + linear_t(act * gu[..., F:], w["w_down"])
    else:
        x = x + linear(att.reshape(B, S, H * D), w["wo"])
        h2 = rms_norm(x, w["ffn_norm"], norm_eps)
        x = x + swiglu(h2, w["w_gate"], w["w_up"], w["w_down"])
    return x, ck, cv


def narrated_forward(
    params: LlamaParams,
    cfg: ModelArgs,
    tokens: jnp.ndarray,
    start_pos: int,
    cache: KVCache,
    log_fn: Optional[Callable[[str], None]] = None,
) -> Tuple[jnp.ndarray, KVCache]:
    """Forward pass with per-layer wall-clock + shape narration.

    Matches the fused forward's math (same ops, same cache layout) but runs
    one jitted block per layer so each layer's device time is observable —
    the reference's "Transformer block layer %d / %d took %.4f sec(s)" line
    (reference: src/model/llamatransformer.go:163).
    """
    log = log_fn or (lambda msg: get_logger().info("%s", msg))
    B, S = tokens.shape
    T = cache.max_seq

    t0 = time.perf_counter()
    x = jnp.take(params.tok_embeddings, tokens, axis=0)
    cos = jax.lax.dynamic_slice_in_dim(params.rope_cos, start_pos, S, 0)
    sin = jax.lax.dynamic_slice_in_dim(params.rope_sin, start_pos, S, 0)
    mask = attention_mask(S, T, start_pos)[None]
    _sync(x)
    log(f"embeddings: shape{tuple(x.shape)} dtype={x.dtype} "
        f"took {time.perf_counter() - t0:.4f} sec(s)")

    ck_all, cv_all = [], []
    for layer in range(cfg.n_layers):
        w = jax.tree_util.tree_map(lambda a: a[layer], params.layers)
        t0 = time.perf_counter()
        x, ck, cv = _one_block(w, x, cos, sin, mask, cache.k[layer],
                               cache.v[layer], start_pos, cfg.norm_eps)
        _sync(x)
        log(f"Transformer block layer {layer + 1} / {cfg.n_layers} was run, "
            f"took {time.perf_counter() - t0:.4f} sec(s)")
        ck_all.append(ck)
        cv_all.append(cv)

    t0 = time.perf_counter()
    x = rms_norm(x, params.norm, cfg.norm_eps)
    if "wqkv" in params.layers:
        from llama_nuts_and_bolts_tpu.ops import linear_t

        logits = linear_t(x, params.output, out_dtype=jnp.float32)
    else:
        logits = linear(x, params.output, out_dtype=jnp.float32)
    _sync(logits)
    log(f"output norm+projection: logits{tuple(logits.shape)} "
        f"took {time.perf_counter() - t0:.4f} sec(s)")
    return logits, KVCache(k=jnp.stack(ck_all), v=jnp.stack(cv_all))
