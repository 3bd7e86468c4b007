"""Ring attention (sequence-parallel exact attention) vs the dense oracle."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from llama_nuts_and_bolts_tpu.models.llama.model import attention_mask
from llama_nuts_and_bolts_tpu.ops import gqa_attention
from llama_nuts_and_bolts_tpu.parallel import make_mesh
from llama_nuts_and_bolts_tpu.parallel.ring_attention import ring_gqa_attention


def _dense_oracle(q, k, v):
    # segment self-attention: row i sees cols j <= i; a global start offset
    # shifts rows and columns TOGETHER, so relative visibility is unchanged
    B, S, H, D = q.shape
    mask = attention_mask(S, S, 0)[None]
    return gqa_attention(q, k, v, mask)


def _rand(key, shape):
    return jax.random.normal(key, shape, jnp.float32).astype(jnp.bfloat16)


@pytest.mark.parametrize("sp,tp,start_pos", [(4, 1, 0), (2, 2, 0),
                                             (4, 2, 0), (4, 1, 7)])
def test_ring_matches_dense(sp, tp, start_pos):
    B, S, H, KV, D = 2, 32, 8, 4, 16
    mesh = make_mesh(tp=tp, dp=1, sp=sp)
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    q = _rand(keys[0], (B, S, H, D))
    k = _rand(keys[1], (B, KV, S, D))
    v = _rand(keys[2], (B, KV, S, D))

    ref = _dense_oracle(q, k, v)

    qs = jax.device_put(q, NamedSharding(mesh, P("dp", "sp", "tp", None)))
    ks = jax.device_put(k, NamedSharding(mesh, P("dp", "tp", "sp", None)))
    vs = jax.device_put(v, NamedSharding(mesh, P("dp", "tp", "sp", None)))
    got = jax.jit(ring_gqa_attention, static_argnums=(0,))(mesh, qs, ks, vs,
                                                           start_pos)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_ring_is_causal_in_global_positions():
    """A late query row must ignore later chunks: zero out the last chunk's V
    and check only rows attending it change."""
    B, S, H, KV, D = 1, 16, 4, 2, 8
    sp = 4
    mesh = make_mesh(tp=1, dp=1, sp=sp)
    keys = jax.random.split(jax.random.PRNGKey(1), 3)
    q = _rand(keys[0], (B, S, H, D))
    k = _rand(keys[1], (B, KV, S, D))
    v = _rand(keys[2], (B, KV, S, D))
    v2 = v.at[:, :, 12:, :].set(0)   # last sp chunk

    out1 = ring_gqa_attention(mesh, q, k, v, 0)
    out2 = ring_gqa_attention(mesh, q, k, v2, 0)
    # rows 0..11 never see columns 12..15 under the causal mask
    np.testing.assert_array_equal(np.asarray(out1[:, :12], np.float32),
                                  np.asarray(out2[:, :12], np.float32))
    assert not np.allclose(np.asarray(out1[:, 12:], np.float32),
                           np.asarray(out2[:, 12:], np.float32))


def test_forward_ring_prefill_matches_dense():
    """Full forward with attn_impl='ring' on an sp mesh: same logits and
    same cache contents as the single-device dense prefill."""
    from llama_nuts_and_bolts_tpu.io.params import ModelArgs
    from llama_nuts_and_bolts_tpu.models.llama import forward, init_random_params
    from llama_nuts_and_bolts_tpu.models.llama.model import KVCache
    from llama_nuts_and_bolts_tpu.parallel import (
        shard_cache, shard_params, token_sharding)

    cfg = ModelArgs(dim=64, n_layers=2, n_heads=8, n_kv_heads=4, vocab_size=128,
                    multiple_of=32, norm_eps=1e-5, max_sequence_length=64)
    params = jax.jit(init_random_params, static_argnums=(0,))(cfg, jax.random.PRNGKey(5))
    tokens = jnp.tile(jnp.asarray([[3, 14, 15, 92, 65, 35, 89, 79]], jnp.int32), (1, 1))

    ref_logits, ref_cache = forward(params, cfg, tokens, 0, KVCache.create(cfg, 1, 16))

    mesh = make_mesh(tp=2, dp=1, sp=4)
    sp = shard_params(params, mesh)
    sc = shard_cache(KVCache.create(cfg, 1, 16), mesh)
    st = jax.device_put(tokens, token_sharding(mesh, seq_parallel=True))
    got_logits, got_cache = jax.jit(
        forward, static_argnums=(1,), static_argnames=("attn_impl", "mesh"))(
        sp, cfg, st, 0, sc, attn_impl="ring", mesh=mesh)
    # online-softmax rounding differs from the dense softmax by a few bf16
    # ULPs per layer; argmax equality is the parity bar
    np.testing.assert_allclose(np.asarray(got_logits, np.float32),
                               np.asarray(ref_logits, np.float32),
                               rtol=4e-2, atol=4e-2)
    np.testing.assert_array_equal(np.asarray(got_logits).argmax(-1),
                                  np.asarray(ref_logits).argmax(-1))
    np.testing.assert_allclose(np.asarray(got_cache.k, np.float32),
                               np.asarray(ref_cache.k, np.float32),
                               rtol=2e-2, atol=2e-2)
