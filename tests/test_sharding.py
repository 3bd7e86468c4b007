"""Tensor/data-parallel tests on the virtual 8-device CPU mesh: sharded
execution must reproduce the single-device results (the BASELINE config-5
criterion: sharded run matches the 1-chip run's tokens)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from llama_nuts_and_bolts_tpu.io.params import ModelArgs
from llama_nuts_and_bolts_tpu.models.llama import forward, init_random_params
from llama_nuts_and_bolts_tpu.models.llama.model import KVCache
from llama_nuts_and_bolts_tpu.parallel import (
    make_mesh,
    param_sharding_fn,
    shard_cache,
    shard_params,
    token_sharding,
)

CFG = ModelArgs(
    dim=64, n_layers=2, n_heads=8, n_kv_heads=4, vocab_size=128,
    multiple_of=32, norm_eps=1e-5, max_sequence_length=64,
)

FWD = jax.jit(forward, static_argnums=(1,))


@pytest.fixture(scope="module")
def params():
    return jax.jit(init_random_params, static_argnums=(0,))(CFG, jax.random.PRNGKey(3))


def test_mesh_shapes():
    assert len(jax.devices()) == 8
    mesh = make_mesh()
    assert mesh.shape == {"dp": 1, "sp": 1, "tp": 8}
    mesh2 = make_mesh(tp=4, dp=2)
    assert mesh2.shape == {"dp": 2, "sp": 1, "tp": 4}
    mesh3 = make_mesh(tp=2, dp=2, sp=2)
    assert mesh3.shape == {"dp": 2, "sp": 2, "tp": 2}
    with pytest.raises(ValueError):
        make_mesh(tp=3, dp=2)


def test_param_sharding_fn_specs():
    mesh = make_mesh(tp=4, dp=2)
    fn = param_sharding_fn(mesh)
    assert fn("wq").spec == P(None, "tp", None)
    assert fn("w_down").spec == P(None, None, "tp")
    assert fn("output").spec == P("tp", None)
    assert fn("nonexistent") is None


def test_tp_forward_matches_single_device(params):
    tokens = jnp.asarray([[3, 14, 15, 92]], dtype=jnp.int32)
    ref_logits, ref_cache = FWD(params, CFG, tokens, 0, KVCache.create(CFG, 1, 32))

    mesh = make_mesh(tp=4, dp=1)
    sp = shard_params(params, mesh)
    sc = shard_cache(KVCache.create(CFG, 1, 32), mesh)
    st = jax.device_put(tokens, token_sharding(mesh))
    got_logits, got_cache = FWD(sp, CFG, st, 0, sc)

    np.testing.assert_allclose(np.asarray(got_logits), np.asarray(ref_logits),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_array_equal(
        np.asarray(got_logits).argmax(-1), np.asarray(ref_logits).argmax(-1))


def test_tp_decode_steps_match(params):
    prompt = jnp.asarray([[5, 9]], dtype=jnp.int32)
    mesh = make_mesh(tp=4, dp=1)
    sp = shard_params(params, mesh)

    ref_cache = KVCache.create(CFG, 1, 16)
    ref_logits, ref_cache = FWD(params, CFG, prompt, 0, ref_cache)
    tp_cache = shard_cache(KVCache.create(CFG, 1, 16), mesh)
    tp_logits, tp_cache = FWD(sp, CFG, prompt, 0, tp_cache)

    pos = 2
    for _ in range(5):
        tok = int(np.asarray(ref_logits)[0, -1].argmax())
        tok_tp = int(np.asarray(tp_logits)[0, -1].argmax())
        assert tok == tok_tp, f"token divergence at position {pos}"
        step = jnp.asarray([[tok]], dtype=jnp.int32)
        ref_logits, ref_cache = FWD(params, CFG, step, pos, ref_cache)
        tp_logits, tp_cache = FWD(sp, CFG, step, pos, tp_cache)
        pos += 1


def test_dp_tp_batched(params):
    """2-way data parallel × 4-way tensor parallel, batch 2."""
    mesh = make_mesh(tp=4, dp=2)
    sp = shard_params(params, mesh)
    tokens = jnp.asarray([[3, 14, 15, 92], [9, 2, 6, 53]], dtype=jnp.int32)
    st = jax.device_put(tokens, token_sharding(mesh))
    sc = shard_cache(KVCache.create(CFG, 2, 32), mesh)
    got, _ = FWD(sp, CFG, st, 0, sc)

    ref, _ = FWD(params, CFG, tokens, 0, KVCache.create(CFG, 2, 32))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-2, atol=2e-2)


def test_sharded_loader_path(params):
    """The loader's sharding_fn hook places weight groups directly."""
    from llama_nuts_and_bolts_tpu.models.llama import build_params_from_checkpoint
    from tests.test_model import make_torch_weights, to_host_tensors

    mesh = make_mesh(tp=4, dp=1)
    weights = make_torch_weights(CFG, seed=7)
    sharded = build_params_from_checkpoint(
        to_host_tensors(weights), CFG, sharding_fn=param_sharding_fn(mesh))
    ws = sharded.layers["wq"].sharding
    assert isinstance(ws, NamedSharding) and ws.spec == P(None, "tp", None)
    tokens = jnp.asarray([[1, 2, 3]], dtype=jnp.int32)
    logits, _ = FWD(sharded, CFG, tokens, 0,
                    shard_cache(KVCache.create(CFG, 1, 16), mesh))
    assert np.isfinite(np.asarray(logits)).all()


def test_sequence_parallel_prefill_matches(params):
    """sp-sharded prefill (sequence dim split across chips) must reproduce
    the unsharded logits — XLA inserts the K/V gathers."""
    tokens = jnp.asarray([[3, 14, 15, 92, 9, 2, 6, 53]], dtype=jnp.int32)
    ref, _ = FWD(params, CFG, tokens, 0, KVCache.create(CFG, 1, 32))

    mesh = make_mesh(tp=2, dp=1, sp=4)
    sp_params = shard_params(params, mesh)
    st = jax.device_put(tokens, token_sharding(mesh, seq_parallel=True))
    sc = shard_cache(KVCache.create(CFG, 1, 32), mesh)
    got, _ = FWD(sp_params, CFG, st, 0, sc)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_array_equal(
        np.asarray(got).argmax(-1), np.asarray(ref).argmax(-1))


def test_tp_quantized_forward_matches(params):
    """int8 and int4 weight pytrees shard onto the tp mesh (value tensors by
    out/in dim, scales following) and reproduce their single-device logits."""
    from llama_nuts_and_bolts_tpu.quant import quantize_params, quantize_params_q4

    tokens = jnp.asarray([[3, 14, 15, 92]], dtype=jnp.int32)
    mesh = make_mesh(tp=4, dp=1)
    for qfn in (quantize_params, quantize_params_q4):
        qp = qfn(params)
        ref, _ = FWD(qp, CFG, tokens, 0, KVCache.create(CFG, 1, 32))
        sp = shard_params(qp, mesh)
        sc = shard_cache(KVCache.create(CFG, 1, 32), mesh)
        st = jax.device_put(tokens, token_sharding(mesh))
        got, _ = FWD(sp, CFG, st, 0, sc)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-2, atol=2e-2)


def test_tp_nativized_int4_decode(params):
    """The native-int4 batched-group dot path is pure XLA, so GSPMD must
    partition it under tp like any dense dot (block decode loops use this)."""
    import functools

    from llama_nuts_and_bolts_tpu.quant import nativize_q4, quantize_params_q4

    qp = quantize_params_q4(params)
    mesh = make_mesh(tp=4, dp=1)
    sp = shard_params(qp, mesh)

    @functools.partial(jax.jit, static_argnums=(1,))
    def step(params, cfg, tok, pos, cache):
        params = nativize_q4(params)
        logits, cache = forward(params, cfg, tok, pos, cache)
        return jnp.argmax(logits[:, -1], -1), cache

    ref_cache = KVCache.create(CFG, 1, 16)
    got_cache = shard_cache(KVCache.create(CFG, 1, 16), mesh)
    tok = jnp.asarray([[5]], jnp.int32)
    ref, _ = step(qp, CFG, tok, 0, ref_cache)
    got, _ = step(sp, CFG, tok, 0, got_cache)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_sharded_loader_int4(params):
    """Direct sharded loading of an int4-quantized checkpoint: the grouped
    packed layout gets rank-adapted specs, and the forward runs."""
    from llama_nuts_and_bolts_tpu.models.llama import build_params_from_checkpoint
    from tests.test_model import make_torch_weights, to_host_tensors

    mesh = make_mesh(tp=4, dp=1)
    weights = make_torch_weights(CFG, seed=7)
    sharded = build_params_from_checkpoint(
        to_host_tensors(weights), CFG, sharding_fn=param_sharding_fn(mesh),
        quant="int4")
    ws = sharded.layers["wq"].packed.sharding
    assert isinstance(ws, NamedSharding) and ws.spec == P(None, None, "tp", None)
    tokens = jnp.asarray([[1, 2, 3]], dtype=jnp.int32)
    logits, _ = FWD(sharded, CFG, tokens, 0,
                    shard_cache(KVCache.create(CFG, 1, 16), mesh))
    assert np.isfinite(np.asarray(logits)).all()


def test_tp_int8_cache_decode(params):
    """int8 KV cache shards (values + scales) and decodes under tp."""
    mesh = make_mesh(tp=4, dp=1)
    sp = shard_params(params, mesh)
    cache = shard_cache(KVCache.create(CFG, 1, 16, dtype=jnp.int8), mesh)
    assert cache.k_scale.sharding.spec == P(None, "dp", "tp", None)
    tokens = jnp.asarray([[3, 14]], dtype=jnp.int32)
    logits, cache = FWD(sp, CFG, tokens, 0, cache)
    tok = jnp.argmax(logits[:, -1:], -1).astype(jnp.int32)
    logits, cache = FWD(sp, CFG, tok, 2, cache)
    assert np.isfinite(np.asarray(logits)).all()


def test_tp_paged_decode_matches_single_device(params):
    """Paged decode with a tp-sharded pool reproduces the unsharded paged
    tokens (and therefore the dense greedy tokens, by test_paged parity)."""
    from llama_nuts_and_bolts_tpu.models.llama.paged import (
        PagedKVPool,
        paged_decode_step,
        paged_prefill,
    )
    from llama_nuts_and_bolts_tpu.parallel import shard_pool

    bs, n_blocks = 8, 10
    table = np.arange(1, 5, dtype=np.int32)
    prompt = [1, 5, 9, 2, 7]
    S = -(-len(prompt) // bs) * bs
    padded = np.zeros((1, S), np.int32)
    padded[0, :len(prompt)] = prompt

    def run(shard):
        pool = PagedKVPool.create(CFG, n_blocks, bs)
        p = params
        if shard:
            mesh = make_mesh(tp=4, dp=1)
            pool = shard_pool(pool, mesh)
            p = shard_params(params, mesh)
        logits, pool = jax.jit(paged_prefill, static_argnums=(1,))(
            p, CFG, jnp.asarray(padded), len(prompt) - 1, pool,
            jnp.asarray(table))
        out = [int(jnp.argmax(logits[0]))]
        pos = len(prompt)
        step = jax.jit(paged_decode_step, static_argnums=(1, 6))
        for _ in range(7):
            logits, pool = step(p, CFG, jnp.asarray([[out[-1]]], jnp.int32),
                                jnp.asarray([pos], jnp.int32), pool,
                                jnp.asarray(table[None]), "xla")
            out.append(int(jnp.argmax(logits[0])))
            pos += 1
        return out

    assert run(shard=True) == run(shard=False)


# ------------------------------------------------ Pallas kernels under TP
# GSPMD cannot partition pallas_call; on a tp mesh the flash kernels run
# head-local inside shard_map (parallel/kernel_shard.py). These tests run the
# REAL forward(attn_impl="flash") on tp-sharded inputs (interpret-mode
# kernels on the CPU mesh) and require parity with the single-device run.

def test_tp_flash_prefill_matches_single_device(params):
    tokens = jnp.asarray([[3, 14, 15, 92, 65, 35, 89, 79]], dtype=jnp.int32)
    # single-device run of the SAME kernel: the tp assertion is about the
    # shard_map partitioning, not the (separately-tested) kernel numerics
    ref_logits, _ = forward(params, CFG, tokens, 0, KVCache.create(CFG, 1, 32),
                            attn_impl="flash")
    xla_logits, _ = FWD(params, CFG, tokens, 0, KVCache.create(CFG, 1, 32))

    mesh = make_mesh(tp=4, dp=1)
    sp = shard_params(params, mesh)
    sc = shard_cache(KVCache.create(CFG, 1, 32), mesh)
    st = jax.device_put(tokens, token_sharding(mesh))
    got_logits, _ = jax.jit(forward, static_argnums=(1,),
                            static_argnames=("attn_impl", "mesh"))(
        sp, CFG, st, 0, sc, attn_impl="flash", mesh=mesh)
    np.testing.assert_allclose(np.asarray(got_logits), np.asarray(ref_logits),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_array_equal(
        np.asarray(got_logits).argmax(-1), np.asarray(xla_logits).argmax(-1))


def test_tp_flash_decode_matches_single_device(params):
    prompt = jnp.asarray([[5, 9, 2]], dtype=jnp.int32)
    mesh = make_mesh(tp=4, dp=1)
    sp = shard_params(params, mesh)
    fwd_st = jax.jit(forward, static_argnums=(1,),
                     static_argnames=("attn_impl", "mesh"))

    ref_cache = KVCache.create(CFG, 1, 32)
    ref_logits, ref_cache = FWD(params, CFG, prompt, 0, ref_cache)
    tp_cache = shard_cache(KVCache.create(CFG, 1, 32), mesh)
    _, tp_cache = fwd_st(sp, CFG, jax.device_put(prompt, token_sharding(mesh)),
                         0, tp_cache, attn_impl="xla")

    toks_ref, toks_tp = [], []
    tok = int(np.asarray(ref_logits)[0, -1].argmax())
    tok_tp = tok
    for pos in range(3, 7):
        ref_logits, ref_cache = FWD(params, CFG,
                                    jnp.asarray([[tok]], jnp.int32), pos, ref_cache)
        tok = int(np.asarray(ref_logits)[0, -1].argmax())
        toks_ref.append(tok)
        got_logits, tp_cache = fwd_st(sp, CFG, jnp.asarray([[tok_tp]], jnp.int32),
                                      pos, tp_cache, attn_impl="flash", mesh=mesh)
        tok_tp = int(np.asarray(got_logits)[0, -1].argmax())
        toks_tp.append(tok_tp)
    assert toks_tp == toks_ref


def test_tp_flash_decode_int8_cache(params):
    """int8 KV cache + flash decode kernel under tp (the production fast
    path for quantized caches) must match the unsharded int8 xla path."""
    prompt = jnp.asarray([[7, 3, 11]], dtype=jnp.int32)
    mesh = make_mesh(tp=4, dp=1)
    sp = shard_params(params, mesh)
    fwd_st = jax.jit(forward, static_argnums=(1,),
                     static_argnames=("attn_impl", "mesh"))

    ref_cache = KVCache.create(CFG, 1, 32, dtype=jnp.int8)
    ref_logits, ref_cache = FWD(params, CFG, prompt, 0, ref_cache)
    tp_cache = shard_cache(KVCache.create(CFG, 1, 32, dtype=jnp.int8), mesh)
    _, tp_cache = fwd_st(sp, CFG, jax.device_put(prompt, token_sharding(mesh)),
                         0, tp_cache, attn_impl="xla")

    ref_logits, ref_cache = FWD(params, CFG, jnp.asarray([[4]], jnp.int32),
                                3, ref_cache)
    got_logits, tp_cache = fwd_st(sp, CFG, jnp.asarray([[4]], jnp.int32),
                                  3, tp_cache, attn_impl="flash", mesh=mesh)
    np.testing.assert_allclose(np.asarray(got_logits), np.asarray(ref_logits),
                               rtol=3e-2, atol=3e-2)
    np.testing.assert_array_equal(
        np.asarray(got_logits).argmax(-1), np.asarray(ref_logits).argmax(-1))


def test_tp_paged_flash_decode_matches_dense(params):
    """paged_flash_decode on a tp-sharded pool via shard_map."""
    from llama_nuts_and_bolts_tpu.parallel import shard_pool
    from llama_nuts_and_bolts_tpu.parallel.kernel_shard import tp_paged_flash_decode
    from llama_nuts_and_bolts_tpu.kernels.paged_attention import paged_flash_decode

    mesh = make_mesh(tp=4, dp=1)
    B, KV, H, D, bs, nblocks, M = 2, CFG.kv_heads, CFG.n_heads, CFG.head_dim, 8, 6, 2
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (B, 1, H, D), jnp.bfloat16)
    pool_k = jax.random.normal(key, (nblocks, KV, bs, D), jnp.bfloat16)
    pool_v = jax.random.normal(jax.random.PRNGKey(1), (nblocks, KV, bs, D), jnp.bfloat16)
    tables = jnp.asarray([[1, 3], [2, 4]], jnp.int32)
    positions = jnp.asarray([5, 11], jnp.int32)

    ref = paged_flash_decode(q, pool_k, pool_v, tables, positions)

    from jax.sharding import NamedSharding
    q_s = jax.device_put(q, NamedSharding(mesh, P(None, None, "tp", None)))
    pk_s = jax.device_put(pool_k, NamedSharding(mesh, P(None, "tp", None, None)))
    pv_s = jax.device_put(pool_v, NamedSharding(mesh, P(None, "tp", None, None)))
    got = jax.jit(tp_paged_flash_decode, static_argnums=(0,))(
        mesh, q_s, pk_s, pv_s, tables, positions)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32), rtol=2e-2, atol=2e-2)


# ------------------------------------------------------ engine-level TP e2e

def test_tp_engine_generates_identical_tokens(params):
    """The full InferenceEngine with a mesh (the --tp CLI/serving path):
    sharded params + sharded cache through prefill, decode, and streaming —
    tokens must equal the single-device engine's."""
    from llama_nuts_and_bolts_tpu.models.llama.loader import LoadedModel
    from llama_nuts_and_bolts_tpu.runtime import InferenceArgs, InferenceEngine
    from llama_nuts_and_bolts_tpu.tokenizer import TiktokenModel, Vocabulary
    from llama_nuts_and_bolts_tpu.tokenizer.tiktoken_io import build_special_tokens

    ranks = {bytes([i]): i for i in range(110)}
    special = build_special_tokens(len(ranks))
    tm = TiktokenModel(mergeable_ranks=ranks, special_tokens=special,
                       bos_id=special["<|begin_of_text|>"],
                       eos_id=special["<|end_of_text|>"],
                       stop_token_ids=[special["<|eom_id|>"], special["<|eot_id|>"]])
    vocab = Vocabulary.from_tiktoken(tm)

    def engine_for(mesh):
        p = params if mesh is None else shard_params(params, mesh)
        model = LoadedModel(params=p, cfg=CFG, vocab=vocab,
                            mergeable_ranks=ranks, tensor_meta={})
        return InferenceEngine(model, InferenceArgs(sequence_length=24), mesh=mesh)

    ref = list(engine_for(None).generate_tokens([3, 14, 15]))
    mesh = make_mesh(tp=4, dp=1)
    got = list(engine_for(mesh).generate_tokens([3, 14, 15]))
    assert got == ref


def test_tp_continuous_batcher_matches_sequential(params):
    """Continuous batching over a tensor-parallel engine (sharded batch
    cache, GSPMD decode step) reproduces the sequential engine's tokens."""
    from llama_nuts_and_bolts_tpu.models.llama.loader import LoadedModel
    from llama_nuts_and_bolts_tpu.runtime import InferenceArgs, InferenceEngine
    from llama_nuts_and_bolts_tpu.runtime.continuous import ContinuousBatcher
    from llama_nuts_and_bolts_tpu.tokenizer import TiktokenModel, Vocabulary
    from llama_nuts_and_bolts_tpu.tokenizer.tiktoken_io import build_special_tokens

    ranks = {bytes([i]): i for i in range(110)}
    special = build_special_tokens(len(ranks))
    tm = TiktokenModel(mergeable_ranks=ranks, special_tokens=special,
                       bos_id=special["<|begin_of_text|>"],
                       eos_id=special["<|end_of_text|>"],
                       stop_token_ids=[special["<|eom_id|>"], special["<|eot_id|>"]])
    vocab = Vocabulary.from_tiktoken(tm)

    def engine_for(mesh):
        p = params if mesh is None else shard_params(params, mesh)
        model = LoadedModel(params=p, cfg=CFG, vocab=vocab,
                            mergeable_ranks=ranks, tensor_meta={})
        return InferenceEngine(model, InferenceArgs(sequence_length=24), mesh=mesh)

    prompts = [[3, 14, 15], [7, 8]]
    ref = {tuple(p): list(engine_for(None).generate_tokens(p)) for p in prompts}

    mesh = make_mesh(tp=4, dp=1)
    cb = ContinuousBatcher(engine_for(mesh), n_slots=2)
    reqs = [cb.submit(p) for p in prompts]
    cb.run_until_idle()
    for p, r in zip(prompts, reqs):
        got = [(s, t) for s, t in r.tokens(timeout=30)]
        assert got == ref[tuple(p)], f"divergence for {p}"


def test_tp_flash_decode_per_row_positions(params):
    """Continuous batching on a mesh: vector start_pos (every batch row at
    its own position) through the TP flash decode kernel — the serving
    scheduler's sharded fast path. dp shards the rows, tp the heads; must
    match the unsharded per-row XLA path."""
    mesh = make_mesh(tp=4, dp=2)
    sp = shard_params(params, mesh)
    fwd_st = jax.jit(forward, static_argnums=(1,),
                     static_argnames=("attn_impl", "mesh"))

    B = 2
    toks = jnp.asarray([[9], [13]], jnp.int32)
    poss = jnp.asarray([5, 11], jnp.int32)

    def seeded_cache():
        c = KVCache.create(CFG, B, 32)
        full = (jax.random.normal(jax.random.PRNGKey(12), c.k.shape,
                                  jnp.float32) * 0.1).astype(jnp.bfloat16)
        return KVCache(k=full, v=full + 0.03)

    ref_logits, ref_cache = FWD(params, CFG, toks, poss, seeded_cache())
    tp_cache = shard_cache(seeded_cache(), mesh)
    got_logits, tp_cache = fwd_st(sp, CFG, jax.device_put(
        toks, token_sharding(mesh)), poss, tp_cache,
        attn_impl="flash", mesh=mesh)
    np.testing.assert_allclose(np.asarray(got_logits), np.asarray(ref_logits),
                               rtol=3e-2, atol=3e-2)
    np.testing.assert_array_equal(
        np.asarray(got_logits).argmax(-1), np.asarray(ref_logits).argmax(-1))
    # per-row cache writes landed at each row's own position
    for f in ("k", "v"):
        np.testing.assert_allclose(
            np.asarray(getattr(tp_cache, f), np.float32),
            np.asarray(getattr(ref_cache, f), np.float32),
            rtol=3e-2, atol=3e-2)
