"""int8 KV cache: quantized-cache forward parity, generation equivalence,
and scheduler compatibility."""

import numpy as np

import jax
import jax.numpy as jnp

from llama_nuts_and_bolts_tpu.io.params import ModelArgs
from llama_nuts_and_bolts_tpu.models.llama import forward, init_random_params
from llama_nuts_and_bolts_tpu.models.llama.model import KVCache
from llama_nuts_and_bolts_tpu.runtime.types import GenerationState
from tests.test_streaming import make_engine

CFG = ModelArgs(dim=64, n_layers=2, n_heads=4, n_kv_heads=2, vocab_size=128,
                multiple_of=32, max_sequence_length=64)

FWD = jax.jit(forward, static_argnums=(1,))


def test_create_quantized_cache():
    c = KVCache.create(CFG, 1, 16, dtype=jnp.int8)
    assert c.quantized and c.k.dtype == jnp.int8
    assert c.k_scale.shape == (CFG.n_layers, 1, CFG.kv_heads, 16)
    assert not KVCache.create(CFG, 1, 16).quantized


def test_quantized_cache_forward_parity():
    """Prefill + decode with int8 cache stays within the per-row int8
    quantization tolerance of the bf16-cache run."""
    params = jax.jit(init_random_params, static_argnums=(0,))(CFG, jax.random.PRNGKey(0))
    tokens = jnp.asarray([[5, 17, 42, 7]], dtype=jnp.int32)

    ref, rc = FWD(params, CFG, tokens, 0, KVCache.create(CFG, 1, 16))
    got, qc = FWD(params, CFG, tokens, 0, KVCache.create(CFG, 1, 16, dtype=jnp.int8))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=5e-2, atol=8e-2)

    # a few decode steps: argmax chains must agree for this tiny model
    tok_r = jnp.argmax(ref[:, -1:], -1).astype(jnp.int32)
    tok_q = jnp.argmax(got[:, -1:], -1).astype(jnp.int32)
    for pos in (4, 5, 6):
        assert int(tok_r[0, 0]) == int(tok_q[0, 0]), f"divergence at {pos}"
        ref, rc = FWD(params, CFG, tok_r, pos, rc)
        got, qc = FWD(params, CFG, tok_q, pos, qc)
        tok_r = jnp.argmax(ref[:, -1:], -1).astype(jnp.int32)
        tok_q = jnp.argmax(got[:, -1:], -1).astype(jnp.int32)


def test_quantized_cache_per_row_positions():
    """Vector start_pos (continuous batching) works with the int8 cache."""
    params = jax.jit(init_random_params, static_argnums=(0,))(CFG, jax.random.PRNGKey(0))
    cache = KVCache.create(CFG, 2, 16, dtype=jnp.int8)
    toks = jnp.asarray([[3], [9]], dtype=jnp.int32)
    logits, cache = FWD(params, CFG, toks, jnp.asarray([0, 5], jnp.int32), cache)
    assert np.isfinite(np.asarray(logits)).all()
    # row 0 wrote position 0, row 1 wrote position 5
    ks = np.asarray(cache.k_scale)
    assert (ks[:, 0, :, 0] > 0).all() and (ks[:, 1, :, 5] > 0).all()
    assert (ks[:, 0, :, 5] == 0).all() and (ks[:, 1, :, 0] == 0).all()


def test_engine_generation_with_int8_cache():
    """End-to-end generation with the int8 cache: runs, terminates with the
    standard states, and is deterministic. (Token-level agreement with the
    bf16 cache isn't meaningful on the dim-32 random demo model — its logits
    are near-ties, so any quantization perturbation reroutes the argmax
    chain; numeric parity is pinned by test_quantized_cache_forward_parity
    on a model with decisive logits.)"""
    eng = make_engine(sequence_length=24, kv_cache_dtype="int8")
    got = list(eng.generate_tokens([1, 5, 9]))
    again = list(eng.generate_tokens([1, 5, 9]))
    assert got == again and len(got) >= 1
    assert all(s == GenerationState.IN_PROGRESS for s, _ in got[:-1])
    assert got[-1][0] in (GenerationState.FINISHED_BY_REACHING_EOS,
                          GenerationState.FINISHED_BY_REACHING_SEQ_LEN)


def test_continuous_batcher_with_int8_cache():
    from llama_nuts_and_bolts_tpu.runtime.continuous import ContinuousBatcher

    eng = make_engine(sequence_length=24, kv_cache_dtype="int8")
    cb = ContinuousBatcher(eng, n_slots=2)
    reqs = [cb.submit(p) for p in ([1, 5, 9], [7, 8])]
    cb.run_until_idle()
    for r in reqs:
        out = [(s, t) for s, t in r.tokens(timeout=30)]
        assert out and out[-1][0] != GenerationState.IN_PROGRESS


def test_flash_prefill_rejected_with_int8_cache():
    """int8 cache + flash is decode-only; prefill must be refused."""
    import pytest

    params = jax.jit(init_random_params, static_argnums=(0,))(CFG, jax.random.PRNGKey(0))
    cache = KVCache.create(CFG, 1, 16, dtype=jnp.int8)
    with pytest.raises(ValueError):
        forward(params, CFG, jnp.asarray([[1, 2]], jnp.int32), 0, cache,
                attn_impl="flash")


def test_flash_decode_kernel_interpret_matches_xla():
    """The S=1 flash-decode kernel (interpret mode) == the XLA attention
    path, for both bf16 and int8 caches."""
    from llama_nuts_and_bolts_tpu.kernels.decode_attention import (
        flash_decode_attention,
    )
    from llama_nuts_and_bolts_tpu.models.llama.model import attention_mask
    from llama_nuts_and_bolts_tpu.ops import gqa_attention

    B, H, KV, D, T = 1, 4, 2, 128, 32
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (B, 1, H, D), jnp.float32).astype(jnp.bfloat16)
    kf = jax.random.normal(jax.random.PRNGKey(1), (B, KV, T, D), jnp.float32)
    vf = jax.random.normal(jax.random.PRNGKey(2), (B, KV, T, D), jnp.float32)
    pos = 19

    # bf16 cache
    kb, vb = kf.astype(jnp.bfloat16), vf.astype(jnp.bfloat16)
    mask = attention_mask(1, T, pos)[None]
    ref = np.asarray(gqa_attention(q, kb, vb, mask))
    got = np.asarray(flash_decode_attention(q, kb, vb, pos, block_k=16,
                                            interpret=True))
    np.testing.assert_allclose(got, ref, rtol=3e-2, atol=3e-2)

    # int8 cache (+ scales); reference = dequantized XLA path
    s_k = np.abs(kf).max(-1).clip(1e-8) / 127.0
    s_v = np.abs(vf).max(-1).clip(1e-8) / 127.0
    k8 = jnp.asarray(np.clip(np.rint(kf / s_k[..., None]), -127, 127), jnp.int8)
    v8 = jnp.asarray(np.clip(np.rint(vf / s_v[..., None]), -127, 127), jnp.int8)
    ks = jnp.asarray(s_k, jnp.bfloat16)
    vs = jnp.asarray(s_v, jnp.bfloat16)
    kd = k8.astype(jnp.bfloat16) * ks[..., None]
    vd = v8.astype(jnp.bfloat16) * vs[..., None]
    ref_q = np.asarray(gqa_attention(q, kd, vd, mask))
    got_q = np.asarray(flash_decode_attention(q, k8, v8, pos, k_scale=ks,
                                              v_scale=vs, block_k=16,
                                              interpret=True))
    np.testing.assert_allclose(got_q, ref_q, rtol=3e-2, atol=3e-2)


def test_speculative_with_int8_cache():
    """speculate_k + int8 cache: the k+1-row verify must not route to the
    S=1-only flash-decode kernel."""
    eng = make_engine(sequence_length=24, kv_cache_dtype="int8", speculate_k=3)
    out = list(eng.generate_tokens([3, 3, 3, 3]))
    assert out and out[-1][0] != GenerationState.IN_PROGRESS
    ref = list(make_engine(sequence_length=24,
                           kv_cache_dtype="int8").generate_tokens([3, 3, 3, 3]))
    assert out == ref  # same int8-cache numerics → exact equivalence


def test_flash_decode_fold_heads_int8_mxu_matches_dequant():
    """The int8xint8-MXU score path (q quantized per row, per-position
    scales folded into the small score/prob matrices) must agree with the
    dequantizing reference path within the cache's own quantization noise."""
    from llama_nuts_and_bolts_tpu.kernels.decode_attention import (
        flash_decode_attention,
    )
    from llama_nuts_and_bolts_tpu.models.llama.model import (
        attention_mask_per_row,
    )
    from llama_nuts_and_bolts_tpu.ops import gqa_attention

    B, H, KV, D, T = 2, 8, 2, 128, 64
    ks_ = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks_[0], (B, 1, H, D), jnp.float32).astype(jnp.bfloat16)
    kf = np.asarray(jax.random.normal(ks_[1], (B, KV, T, D), jnp.float32))
    vf = np.asarray(jax.random.normal(ks_[2], (B, KV, T, D), jnp.float32))
    s_k = np.abs(kf).max(-1).clip(1e-8) / 127.0
    s_v = np.abs(vf).max(-1).clip(1e-8) / 127.0
    k8 = jnp.asarray(np.clip(np.rint(kf / s_k[..., None]), -127, 127), jnp.int8)
    v8 = jnp.asarray(np.clip(np.rint(vf / s_v[..., None]), -127, 127), jnp.int8)
    ksc = jnp.asarray(s_k, jnp.bfloat16)
    vsc = jnp.asarray(s_v, jnp.bfloat16)
    kd = k8.astype(jnp.bfloat16) * ksc[..., None]
    vd = v8.astype(jnp.bfloat16) * vsc[..., None]
    pos = jnp.asarray([17, 63], jnp.int32)
    mask = attention_mask_per_row(1, T, pos)
    ref = np.asarray(gqa_attention(q, kd, vd, mask), np.float32)
    got = np.asarray(flash_decode_attention(
        q, k8, v8, pos, k_scale=ksc, v_scale=vsc, block_k=16, interpret=True,
        fold_heads=True, int8_mxu=True), np.float32)
    np.testing.assert_allclose(got, ref, rtol=5e-2, atol=5e-2)
