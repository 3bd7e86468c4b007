"""Pallas kernel tests (interpret mode on CPU): the flash GQA attention
kernel must match the jnp reference path across shapes, start positions,
padding, and block-size edge cases."""

import numpy as np

import jax
import jax.numpy as jnp

from llama_nuts_and_bolts_tpu.kernels.attention import flash_gqa_attention
from llama_nuts_and_bolts_tpu.models.llama.model import attention_mask
from llama_nuts_and_bolts_tpu.ops.attention import gqa_attention


def make_qkv(B, S, H, KV, D, T, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(ks[0], (B, S, H, D), jnp.float32).astype(jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, KV, T, D), jnp.float32).astype(jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, KV, T, D), jnp.float32).astype(jnp.bfloat16)
    return q, k, v


FLASH = jax.jit(flash_gqa_attention, static_argnums=(4, 5, 6, 7))
REF = jax.jit(lambda q, k, v, m: gqa_attention(q, k, v, m))


def check(B, S, H, KV, D, T, start_pos, block_q=32, block_k=128, seed=0):
    q, k, v = make_qkv(B, S, H, KV, D, T, seed)
    mask = attention_mask(S, T, start_pos)[None]
    ref = REF(q, k, v, mask)
    got = FLASH(q, k, v, start_pos, None, block_q, block_k, True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=3e-2, atol=3e-2)


def test_prefill_from_zero():
    check(B=2, S=64, H=8, KV=2, D=32, T=128, start_pos=0)


def test_prefill_with_history():
    check(B=1, S=32, H=8, KV=4, D=32, T=128, start_pos=57)


def test_unpadded_seq_len():
    # S=40 not a multiple of block_q=32: kernel pads and slices back
    check(B=1, S=40, H=4, KV=2, D=32, T=128, start_pos=3)


def test_cache_not_multiple_of_128():
    # T=192: block_k falls back cleanly via divisor choice in caller
    check(B=1, S=16, H=4, KV=1, D=32, T=192, start_pos=10, block_k=64)


def test_single_kv_head_mha():
    check(B=1, S=32, H=4, KV=4, D=32, T=128, start_pos=0)  # G=1 (MHA)


def test_forward_flash_impl_matches_xla():
    from llama_nuts_and_bolts_tpu.io.params import ModelArgs
    from llama_nuts_and_bolts_tpu.models.llama import forward, init_random_params
    from llama_nuts_and_bolts_tpu.models.llama.model import KVCache

    cfg = ModelArgs(dim=64, n_layers=2, n_heads=4, n_kv_heads=2, vocab_size=96,
                    multiple_of=32, max_sequence_length=64)
    params = jax.jit(init_random_params, static_argnums=(0,))(cfg, jax.random.PRNGKey(0))
    tokens = jnp.asarray([[5, 17, 42, 7, 9, 2, 6, 1]], dtype=jnp.int32)

    fwd = jax.jit(forward, static_argnums=(1,), static_argnames=("attn_impl",))
    ref, _ = fwd(params, cfg, tokens, 0, KVCache.create(cfg, 1, 128))
    # interpret-mode flash inside the full forward
    import llama_nuts_and_bolts_tpu.kernels.attention as ka
    import functools
    orig = ka.flash_gqa_attention
    ka.flash_gqa_attention = functools.partial(orig, interpret=True)
    try:
        got, _ = fwd(params, cfg, tokens, 0, KVCache.create(cfg, 1, 128),
                     attn_impl="flash")
    finally:
        ka.flash_gqa_attention = orig
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-2, atol=5e-2)
    top2 = np.sort(np.asarray(ref), axis=-1)[..., -2:]
    decisive = (top2[..., 1] - top2[..., 0]) > 0.15
    np.testing.assert_array_equal(
        np.asarray(got).argmax(-1)[decisive], np.asarray(ref).argmax(-1)[decisive])


def test_flash_prefill_on_fused_layout_params():
    """The CLI's default single-chip path: fused decode-layout weights +
    flash prefill kernel — must match the XLA path's argmax."""
    import numpy as np

    from llama_nuts_and_bolts_tpu.io.params import ModelArgs
    from llama_nuts_and_bolts_tpu.models.llama import (
        forward, fuse_decode_params, init_random_params)
    from llama_nuts_and_bolts_tpu.models.llama.model import KVCache

    cfg = ModelArgs(dim=64, n_layers=2, n_heads=4, n_kv_heads=2, vocab_size=96,
                    multiple_of=32, norm_eps=1e-5, max_sequence_length=64)
    params = fuse_decode_params(
        jax.jit(init_random_params, static_argnums=(0,))(cfg, jax.random.PRNGKey(4)))
    toks = jnp.asarray([[5, 3, 8, 2, 7, 1, 9, 6]], jnp.int32)
    a, _ = forward(params, cfg, toks, 0, KVCache.create(cfg, 1, 32))
    b, _ = forward(params, cfg, toks, 0, KVCache.create(cfg, 1, 32),
                   attn_impl="flash")
    np.testing.assert_array_equal(np.asarray(a).argmax(-1),
                                  np.asarray(b).argmax(-1))


def test_flash_decode_vector_positions():
    """Per-row start_pos vector (continuous batching): every batch row
    attends up to its OWN position; matches the per-row-masked XLA path for
    bf16 and int8 caches."""
    from llama_nuts_and_bolts_tpu.kernels.decode_attention import (
        flash_decode_attention,
    )
    from llama_nuts_and_bolts_tpu.models.llama.model import (
        attention_mask_per_row,
    )

    B, H, KV, D, T = 3, 4, 2, 128, 64
    q, k, v = make_qkv(B, 1, H, KV, D, T, seed=7)
    pos = jnp.asarray([5, 63, 17], jnp.int32)

    mask = attention_mask_per_row(1, T, pos)
    ref = np.asarray(gqa_attention(q, k, v, mask), np.float32)
    got = np.asarray(flash_decode_attention(q, k, v, pos, block_k=16,
                                            interpret=True), np.float32)
    np.testing.assert_allclose(got, ref, rtol=3e-2, atol=3e-2)

    # int8 cache with per-row scales
    kf = np.asarray(k, np.float32)
    vf = np.asarray(v, np.float32)
    s_k = np.abs(kf).max(-1).clip(1e-8) / 127.0
    s_v = np.abs(vf).max(-1).clip(1e-8) / 127.0
    k8 = jnp.asarray(np.clip(np.rint(kf / s_k[..., None]), -127, 127), jnp.int8)
    v8 = jnp.asarray(np.clip(np.rint(vf / s_v[..., None]), -127, 127), jnp.int8)
    ks = jnp.asarray(s_k, jnp.bfloat16)
    vs = jnp.asarray(s_v, jnp.bfloat16)
    kd = k8.astype(jnp.bfloat16) * ks[..., None]
    vd = v8.astype(jnp.bfloat16) * vs[..., None]
    ref_q = np.asarray(gqa_attention(q, kd, vd, mask), np.float32)
    got_q = np.asarray(flash_decode_attention(q, k8, v8, pos, k_scale=ks,
                                              v_scale=vs, block_k=16,
                                              interpret=True), np.float32)
    np.testing.assert_allclose(got_q, ref_q, rtol=3e-2, atol=3e-2)


def test_flash_decode_16k_shaped_cache():
    """Long-context shape parity (VERDICT round-5 item 7): the decode kernel
    at a 16K-deep cache buffer — 8 tiles of the production block_k=2048 —
    must match the masked XLA path at positions near the end. Tiny head
    count keeps interpret mode fast; the tile math is what 16K exercises."""
    from llama_nuts_and_bolts_tpu.kernels.decode_attention import (
        flash_decode_attention,
    )

    B, H, KV, D, T = 1, 4, 2, 128, 16384
    q, k, v = make_qkv(B, 1, H, KV, D, T, seed=11)
    for pos in (16380, 8192, 2047):
        mask = attention_mask(1, T, pos)[None]
        ref = np.asarray(gqa_attention(q, k, v, mask), np.float32)
        got = np.asarray(flash_decode_attention(
            q, k, v, pos, block_k=2048, interpret=True), np.float32)
        np.testing.assert_allclose(got, ref, rtol=3e-2, atol=3e-2)


def test_forward_decode_16k_context_flash_matches_xla():
    """Full forward at a 16K cache with scaled RoPE active past the 8K
    original context — the engine-level shape of bench's decode_b1_16k
    sections, pinned on CPU."""
    from llama_nuts_and_bolts_tpu.io.params import ModelArgs
    from llama_nuts_and_bolts_tpu.models.llama import (
        forward, init_random_params,
    )
    from llama_nuts_and_bolts_tpu.models.llama.model import KVCache

    cfg = ModelArgs(dim=256, n_layers=1, n_heads=2, n_kv_heads=1,
                    vocab_size=96, multiple_of=32, use_scaled_rope=True,
                    max_sequence_length=16384)
    params = jax.jit(init_random_params, static_argnums=(0,))(
        cfg, jax.random.PRNGKey(2))
    tok = jnp.asarray([[7]], jnp.int32)
    pos = 16000
    ref, _ = forward(params, cfg, tok, pos, KVCache.create(cfg, 1, 16384))
    got, _ = forward(params, cfg, tok, pos, KVCache.create(cfg, 1, 16384),
                     attn_impl="flash")
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=3e-2, atol=5e-2)


def test_forward_flash_folded_bf16_decode_matches_xla():
    """attn_impl='flash_folded' — the folded-heads decode kernel on a BF16
    cache (one grid program per cache tile serves all KV heads) — must match
    the XLA decode step's logits for scalar AND per-row positions, and
    reject prefill shapes."""
    import pytest

    from llama_nuts_and_bolts_tpu.io.params import ModelArgs
    from llama_nuts_and_bolts_tpu.models.llama import forward, init_random_params
    from llama_nuts_and_bolts_tpu.models.llama.model import KVCache

    cfg = ModelArgs(dim=64, n_layers=2, n_heads=4, n_kv_heads=2, vocab_size=96,
                    multiple_of=32, max_sequence_length=64)
    params = jax.jit(init_random_params, static_argnums=(0,))(
        cfg, jax.random.PRNGKey(5))
    toks = jnp.asarray([[7], [11], [3]], jnp.int32)

    def seeded_cache():
        c = KVCache.create(cfg, 3, 128)
        full = jax.random.normal(jax.random.PRNGKey(9), c.k.shape,
                                 jnp.float32).astype(jnp.bfloat16) * 0.1
        return KVCache(k=full, v=full + 0.05)

    for pos in (9, jnp.asarray([4, 9, 1], jnp.int32)):
        ref, _ = forward(params, cfg, toks, pos, seeded_cache())
        got, _ = forward(params, cfg, toks, pos, seeded_cache(),
                         attn_impl="flash_folded")
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=3e-2, atol=5e-2)
        np.testing.assert_array_equal(np.asarray(got).argmax(-1),
                                      np.asarray(ref).argmax(-1))
    with pytest.raises(ValueError, match="flash_folded"):
        forward(params, cfg, jnp.ones((1, 8), jnp.int32), 0,
                seeded_cache(), attn_impl="flash_folded")


def test_forward_per_row_flash_matches_xla():
    """forward() with a vector start_pos and attn_impl='flash' (S=1): the
    continuous-batching decode step through the Pallas kernel must match the
    per-row XLA path — logits AND the per-row cache writes."""
    from llama_nuts_and_bolts_tpu.io.params import ModelArgs
    from llama_nuts_and_bolts_tpu.models.llama import forward, init_random_params
    from llama_nuts_and_bolts_tpu.models.llama.model import KVCache

    cfg = ModelArgs(dim=64, n_layers=2, n_heads=4, n_kv_heads=2, vocab_size=96,
                    multiple_of=32, max_sequence_length=64)
    params = jax.jit(init_random_params, static_argnums=(0,))(
        cfg, jax.random.PRNGKey(3))
    toks = jnp.asarray([[7], [11], [3]], jnp.int32)
    pos = jnp.asarray([4, 9, 1], jnp.int32)

    def seeded_cache():
        c = KVCache.create(cfg, 3, 128)
        full = jax.random.normal(jax.random.PRNGKey(8), c.k.shape,
                                 jnp.float32).astype(jnp.bfloat16) * 0.1
        return KVCache(k=full, v=full + 0.05)

    ref, cache_ref = forward(params, cfg, toks, pos, seeded_cache())
    got, cache_got = forward(params, cfg, toks, pos, seeded_cache(),
                             attn_impl="flash")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-2, atol=5e-2)
    # layer 0 writes are bit-identical (same projections); layer 1's written
    # values carry the impls' small attention-numerics difference, so compare
    # with tolerance — but the WRITE POSITIONS must match exactly
    base = seeded_cache()
    for f in ("k", "v"):
        cr = np.asarray(getattr(cache_ref, f), np.float32)
        cg = np.asarray(getattr(cache_got, f), np.float32)
        cb = np.asarray(getattr(base, f), np.float32)
        np.testing.assert_array_equal((cr != cb).any(-1), (cg != cb).any(-1))
        np.testing.assert_allclose(cg, cr, rtol=3e-2, atol=5e-2)
