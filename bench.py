"""Decode-throughput benchmark on the attached TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where value
is measured greedy-decode tokens/sec/chip on the Llama-3.1 architecture (bf16,
batch 1, on-device lax.scan decode loop) and vs_baseline is the fraction of
the HBM-bandwidth roofline achieved (the reference publishes no speed numbers
— BASELINE.md's success bar is roofline-bound tokens/sec/chip).

The 8B checkpoint (16.06 GB bf16) does not fit a single v5e chip's HBM, so
layer depth is auto-scaled to the largest that fits; the metric name carries
the layer count. All other dims are the real 8B architecture, so per-layer
step cost and roofline fraction transfer directly.
"""

import json
import os
import signal
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from llama_nuts_and_bolts_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

from llama_nuts_and_bolts_tpu.io.params import ModelArgs
from llama_nuts_and_bolts_tpu.models.llama import forward, init_random_params
from llama_nuts_and_bolts_tpu.models.llama.model import KVCache

V5E_HBM_BYTES_PER_S = 819e9  # public v5e HBM bandwidth
SEQ_CAP = 200                # the reference CLI's sequence length
PREFILL_LEN = 16
DECODE_STEPS = 180   # with PREFILL_LEN 16: 16 + 180 + pad < SEQ_CAP 200


def param_bytes(cfg: ModelArgs) -> int:
    d, f, v = cfg.dim, cfg.ffn_hidden_dim, cfg.vocab_size
    per_layer = (2 * d                       # norms
                 + d * d + 2 * cfg.kv_heads * cfg.head_dim * d + d * d  # attn
                 + 3 * f * d)                # ffn
    return 2 * (2 * v * d + d + cfg.n_layers * per_layer)


def pick_layer_count(budget_bytes: int) -> int:
    for n_layers in range(32, 0, -1):
        cfg = ModelArgs(n_kv_heads=8, vocab_size=128256, multiple_of=1024,
                        ffn_dim_multiplier=1.3, n_layers=n_layers)
        if param_bytes(cfg) < budget_bytes:
            return n_layers
    return 1


def device_budget() -> int:
    try:
        stats = jax.devices()[0].memory_stats()
        return int(stats["bytes_limit"] * 0.80)
    except Exception:
        return int(16 * (1024 ** 3) * 0.75)


def sync(x) -> None:
    """Force completion: block_until_ready is a no-op on the axon tunnel
    backend, so fetch ONE element to the host instead. The slice must happen
    ON DEVICE (``.ravel()[:1]`` before ``np.asarray``) — converting the whole
    leaf ships gigabytes through the ~8 MB/s tunnel."""
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf.ravel()[:1])


RESULTS = {}

def _note(section: str, exc: Exception) -> None:
    """Section failures must be visible: JSON stays on stdout, this on stderr."""
    print(f"bench: section {section!r} skipped: {type(exc).__name__}: {exc}",
          file=sys.stderr, flush=True)


def _mark(section: str) -> None:
    print(f"bench: section {section!r} start t={time.perf_counter() - BENCH_T0:.0f}s",
          file=sys.stderr, flush=True)



def emit_results() -> None:
    """Print the one JSON line from whatever has been measured so far."""
    print(json.dumps({
        "metric": RESULTS.get("metric", "decode_tokens_per_sec_per_chip_llama31_bf16_b1"),
        "value": RESULTS.get("value"),
        "unit": "tokens/s",
        "vs_baseline": RESULTS.get("vs_baseline"),
        "detail": RESULTS.get("detail", {}),
    }), flush=True)


def _deadline(_sig, _frm):
    # hard wall-clock guard: always emit the JSON line, even if the device
    # stalls mid-section (tunnel congestion is a known failure mode here)
    print(f"bench: wall-clock deadline hit; sections measured: "
          f"{sorted(RESULTS.get('detail', {}))}", file=sys.stderr, flush=True)
    emit_results()
    os._exit(0)


def main() -> None:
    global BENCH_T0
    BENCH_T0 = time.perf_counter()
    # did enable_persistent_cache find earlier executables on disk? if yes,
    # ttft_cold_s below is a process-cold / compile-cache-warm number
    cache_dir = jax.config.jax_compilation_cache_dir
    try:
        cache_warm = bool(cache_dir) and bool(os.listdir(cache_dir))
    except OSError:
        cache_warm = False
    signal.signal(signal.SIGALRM, _deadline)
    signal.alarm(520)
    n_layers = pick_layer_count(device_budget())
    cfg = ModelArgs(
        dim=4096, n_layers=n_layers, n_heads=32, n_kv_heads=8,
        vocab_size=128256, multiple_of=1024, ffn_dim_multiplier=1.3,
        norm_eps=1e-5, rope_theta=500000.0, use_scaled_rope=True,
        max_sequence_length=2048,
    )
    # decode-optimized fused layout: qkv / gate+up fused, [in,out] weights
    # (models/llama/model.py fuse_decode_params; +~3.5% HBM streaming
    # measured on this chip — docs/07-PERFORMANCE.md)
    params = jax.jit(init_random_params, static_argnums=(0, 2, 3))(
        cfg, jax.random.PRNGKey(0), jnp.bfloat16, True)
    sync(params)

    fwd = jax.jit(forward, static_argnums=(1,), donate_argnums=(4,))

    def decode_n(params, cache, tok, start_pos):
        def body(carry, _):
            tok, pos, cache = carry
            logits, cache = forward(params, cfg, tok, pos, cache)
            nxt = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
            return (nxt, pos + 1, cache), nxt[:, 0]

        (tok, pos, cache), toks = lax.scan(
            body, (tok, start_pos, cache), None, length=DECODE_STEPS)
        return toks, cache

    decode_jit = jax.jit(decode_n, donate_argnums=(1,))

    prompt = jnp.ones((1, PREFILL_LEN), dtype=jnp.int32)
    cache = KVCache.create(cfg, 1, SEQ_CAP)

    _mark("bf16")
    # warm-up: compile prefill + decode loop
    t0 = time.perf_counter()
    logits, cache = fwd(params, cfg, prompt, 0, cache)
    tok = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
    sync(tok)
    ttft_cold = time.perf_counter() - t0
    toks, cache = decode_jit(params, cache, tok, PREFILL_LEN)
    sync(toks)
    del cache

    # measured run: fresh cache, timed prefill (warm) + timed decode scans.
    # TWO independent scan calls per timing: the second dispatch pipelines
    # behind the first scan's execution, so the ~25 ms tunnel dispatch+sync
    # overhead amortizes over 2*DECODE_STEPS tokens instead of one scan's.
    cache = KVCache.create(cfg, 1, SEQ_CAP)
    t0 = time.perf_counter()
    logits, cache = fwd(params, cfg, prompt, 0, cache)
    tok = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
    sync(tok)
    ttft = time.perf_counter() - t0
    N_SCANS = 6
    extra = [(KVCache.create(cfg, 1, SEQ_CAP), jnp.ones((1, 1), jnp.int32))
             for _ in range(N_SCANS - 1)]
    sync(extra[-1][0])

    t0 = time.perf_counter()
    toks, cache = decode_jit(params, cache, tok, PREFILL_LEN)
    for c_i, t_i in extra:
        toks, _ = decode_jit(params, c_i, t_i, PREFILL_LEN)
    sync(toks)   # program order: earlier scans completed before the last
    decode_time = time.perf_counter() - t0

    toks_per_s = N_SCANS * DECODE_STEPS / decode_time
    roofline_main = V5E_HBM_BYTES_PER_S / param_bytes(cfg)
    RESULTS.update({
        "metric": f"decode_tokens_per_sec_per_chip_llama31-{n_layers}L_bf16_b1",
        "value": round(toks_per_s, 2),
        "vs_baseline": round(toks_per_s / roofline_main, 4),
        "detail": {
            "p50_ttft_warm_s": round(ttft, 4),
            "ttft_cold_s": round(ttft_cold, 2),
            "ttft_cold_compile_cache_warm": cache_warm,
            "param_bytes": param_bytes(cfg),
            "roofline_tokens_per_s": round(roofline_main, 2),
            "device": str(jax.devices()[0]),
        },
    })

    # batched decode throughput (BASELINE config #4): same weights read per
    # step amortized over 16 sequences
    BATCH = 16
    batch_toks_per_s = None
    bt = jnp.ones((BATCH, 1), dtype=jnp.int32)
    def decode_batch(params, cache, tok, start_pos):
        def body(carry, _):
            tok, pos, cache = carry
            logits, cache = forward(params, cfg, tok, pos, cache)
            nxt = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
            return (nxt, pos + 1, cache), nxt[:, 0]

        (tok, pos, cache), toks = lax.scan(
            body, (tok, start_pos, cache), None, length=DECODE_STEPS)
        return toks, cache

    if time.perf_counter() - BENCH_T0 < 420:  # stay inside the time budget
        try:
            _mark("batch16")
            decode_batch_jit = jax.jit(decode_batch, donate_argnums=(1,))
            bcache = KVCache.create(cfg, BATCH, SEQ_CAP)
            toks_b, bcache = decode_batch_jit(params, bcache, bt, 1)
            sync(toks_b)  # compile
            bcache = KVCache.create(cfg, BATCH, SEQ_CAP)
            t0 = time.perf_counter()
            toks_b, bcache = decode_batch_jit(params, bcache, bt, 1)
            sync(toks_b)
            batch_toks_per_s = BATCH * DECODE_STEPS / (time.perf_counter() - t0)
            RESULTS["detail"]["batch16_decode_total_tokens_per_s"] = round(batch_toks_per_s, 2)
            del bcache
        except Exception as exc:
            _note('batch16', exc)

    # 8K long-context decode (BASELINE config #3): same weights, scaled-RoPE
    # tables extended to 16K positions, decode steps attending a nearly-full
    # 8192-slot cache — measures the deep-cache read + mask cost
    if time.perf_counter() - BENCH_T0 < 420:
        try:
            _mark("8k_context")
            import dataclasses

            cfg_8k = dataclasses.replace(cfg, max_sequence_length=8192)
            from llama_nuts_and_bolts_tpu.models.llama.rope import precompute_rope_tables

            cos8k, sin8k = precompute_rope_tables(
                cfg.head_dim, 2 * 8192, cfg.rope_theta, cfg.use_scaled_rope)
            params8k = dataclasses.replace(
                params, rope_cos=jnp.asarray(cos8k), rope_sin=jnp.asarray(sin8k))

            def decode_8k(params, cache, tok, start_pos):
                def body(carry, _):
                    tok, pos, cache = carry
                    logits, cache = forward(params, cfg_8k, tok, pos, cache)
                    nxt = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
                    return (nxt, pos + 1, cache), nxt[:, 0]

                (tok, pos, cache), toks = lax.scan(
                    body, (tok, start_pos, cache), None, length=DECODE_STEPS)
                return toks, cache

            def decode_8k_flash(params, cache, tok, start_pos):
                def body(carry, _):
                    tok, pos, cache = carry
                    logits, cache = forward(params, cfg_8k, tok, pos, cache,
                                            attn_impl="flash")
                    nxt = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
                    return (nxt, pos + 1, cache), nxt[:, 0]

                (tok, pos, cache), toks = lax.scan(
                    body, (tok, start_pos, cache), None, length=DECODE_STEPS)
                return toks, cache

            kt = jnp.ones((1, 1), jnp.int32)
            # measure BOTH the XLA einsum path and the fused Pallas
            # flash-decode kernel at a nearly-full 8K cache; report the
            # better one (and both, for the record)
            both = {}
            for name, fn in (("xla", decode_8k), ("flash", decode_8k_flash)):
                djit = jax.jit(fn, donate_argnums=(1,))
                kcache = KVCache.create(cfg_8k, 1, 8192)
                toks_k, kcache = djit(params8k, kcache, kt, 8192 - DECODE_STEPS - 2)
                sync(toks_k)  # compile
                del kcache
                kcache = KVCache.create(cfg_8k, 1, 8192)
                t0 = time.perf_counter()
                toks_k, kcache = djit(params8k, kcache, kt, 8192 - DECODE_STEPS - 2)
                sync(toks_k)
                both[name] = round(DECODE_STEPS / (time.perf_counter() - t0), 2)
                del kcache
            RESULTS["detail"]["decode_8k_context_tokens_per_s"] = max(both.values())
            RESULTS["detail"]["decode_8k_xla_tokens_per_s"] = both["xla"]
            RESULTS["detail"]["decode_8k_flash_tokens_per_s"] = both["flash"]
            del params8k
        except Exception as exc:
            _note('8k_context', exc)

    # free the bf16 24L params (12.6 GB) before the full-8B quantized sections
    del params
    cfg8 = ModelArgs(
        dim=4096, n_layers=32, n_heads=32, n_kv_heads=8, vocab_size=128256,
        multiple_of=1024, ffn_dim_multiplier=1.3, norm_eps=1e-5,
        rope_theta=500000.0, use_scaled_rope=True, max_sequence_length=2048)

    # FULL 32-layer 8B, int4 weight-only (~4.3 GB packed nibbles): the best
    # single-chip full-8B number — runs before int8 so it survives the alarm
    try:
        if time.perf_counter() - BENCH_T0 > 400:
            raise TimeoutError("time budget exhausted; skipping int4 section")
        _mark("int4")
        from llama_nuts_and_bolts_tpu.quant import init_random_params_q4, nativize_q4

        q4params = init_random_params_q4(cfg8, jax.random.PRNGKey(0))
        sync(q4params)

        def decode_q4(params, cache, tok, start_pos):
            # one in-jit unpack to native int4, amortized over DECODE_STEPS
            params = nativize_q4(params)

            def body(carry, _):
                tok, pos, cache = carry
                logits, cache = forward(params, cfg8, tok, pos, cache)
                nxt = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
                return (nxt, pos + 1, cache), nxt[:, 0]

            (tok, pos, cache), toks = lax.scan(
                body, (tok, start_pos, cache), None, length=DECODE_STEPS)
            return toks, cache

        dq4 = jax.jit(decode_q4, donate_argnums=(1,))
        q4cache = KVCache.create(cfg8, 1, SEQ_CAP)
        q4t = jnp.ones((1, 1), jnp.int32)
        toks_q4, q4cache = dq4(q4params, q4cache, q4t, 1)
        sync(toks_q4)
        q4cache = KVCache.create(cfg8, 1, SEQ_CAP)
        t0 = time.perf_counter()
        toks_q4, q4cache = dq4(q4params, q4cache, q4t, 1)
        sync(toks_q4)
        q4_toks_per_s = DECODE_STEPS / (time.perf_counter() - t0)
        RESULTS["detail"]["full_8b_32L_int4_decode_tokens_per_s"] = round(q4_toks_per_s, 2)
        del q4cache

        # production long-context config: full 8B, 8K context, ONE chip —
        # int4 weights + int8 KV cache + the Pallas flash-decode kernel
        if time.perf_counter() - BENCH_T0 < 440:
            import dataclasses

            from llama_nuts_and_bolts_tpu.models.llama.rope import precompute_rope_tables

            cfg8k = dataclasses.replace(cfg8, max_sequence_length=8192)
            cos8, sin8 = precompute_rope_tables(
                cfg8.head_dim, 2 * 8192, cfg8.rope_theta, cfg8.use_scaled_rope)
            q4p8k = dataclasses.replace(
                q4params, rope_cos=jnp.asarray(cos8), rope_sin=jnp.asarray(sin8))

            def decode_q4_8k(params, cache, tok, start_pos):
                params = nativize_q4(params)

                def body(carry, _):
                    tok, pos, cache = carry
                    logits, cache = forward(params, cfg8k, tok, pos, cache,
                                            attn_impl="flash")
                    nxt = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
                    return (nxt, pos + 1, cache), nxt[:, 0]

                (tok, pos, cache), toks = lax.scan(
                    body, (tok, start_pos, cache), None, length=DECODE_STEPS)
                return toks, cache

            d48 = jax.jit(decode_q4_8k, donate_argnums=(1,))
            kc = KVCache.create(cfg8k, 1, 8192, dtype=jnp.int8)
            start = 8192 - DECODE_STEPS - 2
            toks48, kc = d48(q4p8k, kc, jnp.ones((1, 1), jnp.int32), start)
            sync(toks48)
            kc = KVCache.create(cfg8k, 1, 8192, dtype=jnp.int8)
            t0 = time.perf_counter()
            toks48, kc = d48(q4p8k, kc, jnp.ones((1, 1), jnp.int32), start)
            sync(toks48)
            RESULTS["detail"]["full_8b_8k_ctx_int4w_int8kv_tokens_per_s"] = round(
                DECODE_STEPS / (time.perf_counter() - t0), 2)
            del q4p8k, kc
        del q4params
    except Exception as exc:
        _note('int4', exc)

    # FULL 32-layer 8B with int8 weight-only quantization: 8.6 GB of weights
    # fits a single chip, and bandwidth-bound decode gains ~2x per byte saved
    try:
        if time.perf_counter() - BENCH_T0 > 430:
            raise TimeoutError("time budget exhausted; skipping int8 section")
        _mark("int8")
        from llama_nuts_and_bolts_tpu.quant import init_random_params_q8

        qparams = init_random_params_q8(cfg8, jax.random.PRNGKey(0))
        sync(qparams)

        def decode_q8(params, cache, tok, start_pos):
            def body(carry, _):
                tok, pos, cache = carry
                logits, cache = forward(params, cfg8, tok, pos, cache)
                nxt = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
                return (nxt, pos + 1, cache), nxt[:, 0]

            (tok, pos, cache), toks = lax.scan(
                body, (tok, start_pos, cache), None, length=DECODE_STEPS)
            return toks, cache

        dq = jax.jit(decode_q8, donate_argnums=(1,))
        qcache = KVCache.create(cfg8, 1, SEQ_CAP)
        qt = jnp.ones((1, 1), jnp.int32)
        toks_q, qcache = dq(qparams, qcache, qt, 1)
        sync(toks_q)
        qcache = KVCache.create(cfg8, 1, SEQ_CAP)
        t0 = time.perf_counter()
        toks_q, qcache = dq(qparams, qcache, qt, 1)
        sync(toks_q)
        q8_toks_per_s = DECODE_STEPS / (time.perf_counter() - t0)
        RESULTS["detail"]["full_8b_32L_int8_decode_tokens_per_s"] = round(q8_toks_per_s, 2)
        del qparams, qcache
    except Exception as exc:
        _note('int8', exc)

    signal.alarm(0)
    emit_results()


if __name__ == "__main__":
    main()
