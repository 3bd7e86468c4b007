"""int4 weight-only quantization: pack/unpack exactness, group-wise round-trip
bounds, forward parity within quantization tolerance, and the loader path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from llama_nuts_and_bolts_tpu.io.params import ModelArgs
from llama_nuts_and_bolts_tpu.models.llama import forward, init_random_params
from llama_nuts_and_bolts_tpu.models.llama.model import KVCache
from llama_nuts_and_bolts_tpu.ops import linear
from llama_nuts_and_bolts_tpu.quant import (
    host_quantize_q4,
    init_random_params_q4,
    quantize_params_q4,
    quantize_tensor_q4,
    unpack_q4,
)
from llama_nuts_and_bolts_tpu.quant.int4 import Q4Tensor, fit_group

CFG = ModelArgs(dim=64, n_layers=2, n_heads=4, n_kv_heads=2, vocab_size=128,
                multiple_of=32, max_sequence_length=64)

FWD = jax.jit(forward, static_argnums=(1,))


def test_fit_group():
    assert fit_group(4096) == 256
    assert fit_group(14336) == 256
    assert fit_group(704) == 176     # tiny demo ffn dim: falls back to divisor
    assert fit_group(64) == 64
    with pytest.raises(ValueError):
        fit_group(63)


def test_pack_unpack_exact():
    """Every int4 value survives pack→unpack bit-exactly (grouped layout:
    packed [G, out, K/2]; within a group, low nibbles = first K/2 elements)."""
    vals = jnp.asarray(np.arange(-8, 8, dtype=np.int32)[None, None, :].repeat(4, 1))
    scale = jnp.ones((1, 4), jnp.bfloat16)       # [G=1, out=4]
    q = vals + 8
    packed = (q[..., :8] | (q[..., 8:] << 4)).astype(jnp.uint8)  # [1, 4, 8]
    out = np.asarray(unpack_q4(Q4Tensor(packed=packed, scale=scale), jnp.float32))
    np.testing.assert_array_equal(out, np.asarray(vals[0], np.float32))


def test_quantize_roundtrip_error_groupwise():
    w = jax.random.normal(jax.random.PRNGKey(0), (32, 512), jnp.float32)
    qt = jax.jit(quantize_tensor_q4)(w)
    assert qt.packed.dtype == jnp.uint8 and qt.packed.shape == (2, 32, 128)
    assert qt.scale.shape == (2, 32) and qt.group_size == 256
    assert qt.shape == (32, 512)
    back = np.asarray(unpack_q4(qt, jnp.float32)).reshape(32, 2, 256)
    ref = np.asarray(w).reshape(32, 2, 256)
    # error bounded by half an int4 step per group (+ bf16 scale rounding)
    step = np.abs(ref).max(axis=-1, keepdims=True) / 7.0
    assert (np.abs(back - ref) <= step * 0.51 + 1e-3).all()


def test_host_and_device_quantizers_agree():
    w = np.random.RandomState(3).randn(16, 256).astype(np.float32)
    packed_h, scale_h = host_quantize_q4(w)
    qt = jax.jit(quantize_tensor_q4)(jnp.asarray(w))
    # rounding ties may differ by one quantization unit; scales match exactly
    np.testing.assert_array_equal(np.asarray(qt.scale), scale_h)
    lo_h, lo_d = packed_h & 0xF, np.asarray(qt.packed) & 0xF
    hi_h, hi_d = packed_h >> 4, np.asarray(qt.packed) >> 4
    assert np.abs(lo_h.astype(int) - lo_d.astype(int)).max() <= 1
    assert np.abs(hi_h.astype(int) - hi_d.astype(int)).max() <= 1


def test_linear_accepts_q4tensor():
    """The Q4 matmul path == matmul against explicitly dequantized weights
    (quantization noise itself is covered by the round-trip test)."""
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 256), jnp.float32).astype(jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(2), (16, 256), jnp.float32) / 8
    qt = jax.jit(quantize_tensor_q4)(w)
    deq = unpack_q4(qt, jnp.bfloat16)
    ref = np.asarray(jax.jit(lambda x, w: linear(x, w, out_dtype=jnp.float32))(x, deq))
    got = np.asarray(jax.jit(lambda x, qt: linear(x, qt, out_dtype=jnp.float32))(x, qt))
    np.testing.assert_allclose(got, ref, rtol=1e-2, atol=1e-2)


def test_q4_forward_matches_dequantized_forward():
    """Full forward with Q4Tensor weights == forward with the same weights
    explicitly dequantized to bf16: the packed path adds no numeric drift."""
    import dataclasses

    params = jax.jit(init_random_params, static_argnums=(0,))(CFG, jax.random.PRNGKey(0))
    qparams = quantize_params_q4(params)
    assert qparams.layers["wq"].packed.dtype == jnp.uint8
    deq_layers = {k: (unpack_q4(v, jnp.bfloat16) if hasattr(v, "packed") else v)
                  for k, v in qparams.layers.items()}
    dparams = dataclasses.replace(
        qparams, layers=deq_layers, output=unpack_q4(qparams.output, jnp.bfloat16))
    tokens = jnp.asarray([[5, 17, 42, 7]], dtype=jnp.int32)
    ref, _ = FWD(dparams, CFG, tokens, 0, KVCache.create(CFG, 1, 16))
    got, _ = FWD(qparams, CFG, tokens, 0, KVCache.create(CFG, 1, 16))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-2, atol=2e-2)


def test_init_random_params_q4_shapes_and_runs():
    params = init_random_params_q4(CFG, jax.random.PRNGKey(0))
    assert params.layers["w_down"].packed.dtype == jnp.uint8
    assert params.layers["wq"].shape == (CFG.n_layers, CFG.dim, CFG.dim)
    tokens = jnp.asarray([[1, 2, 3]], dtype=jnp.int32)
    logits, _ = FWD(params, CFG, tokens, 0, KVCache.create(CFG, 1, 16))
    assert np.isfinite(np.asarray(logits)).all()


def test_q4_decode_steps():
    params = quantize_params_q4(
        jax.jit(init_random_params, static_argnums=(0,))(CFG, jax.random.PRNGKey(0)))
    cache = KVCache.create(CFG, 1, 16)
    logits, cache = FWD(params, CFG, jnp.asarray([[1, 2, 3]], dtype=jnp.int32), 0, cache)
    tok = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
    for pos in (3, 4, 5):
        logits, cache = FWD(params, CFG, tok, pos, cache)
        tok = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
    assert 0 <= int(tok[0, 0]) < CFG.vocab_size


def test_loader_int4_quant_path():
    from llama_nuts_and_bolts_tpu.models.llama import build_params_from_checkpoint
    from tests.test_model import make_torch_weights, to_host_tensors

    weights = make_torch_weights(CFG, seed=5)
    qloaded = build_params_from_checkpoint(to_host_tensors(weights), CFG, quant="int4")
    full = build_params_from_checkpoint(to_host_tensors(weights), CFG)
    qafter = quantize_params_q4(full)
    np.testing.assert_array_equal(np.asarray(qloaded.layers["wq"].scale),
                                  np.asarray(qafter.layers["wq"].scale))
    tokens = jnp.asarray([[7, 3, 1]], dtype=jnp.int32)
    a, _ = FWD(qloaded, CFG, tokens, 0, KVCache.create(CFG, 1, 16))
    b, _ = FWD(qafter, CFG, tokens, 0, KVCache.create(CFG, 1, 16))
    # host (numpy) and device (XLA) rint may break ties differently, moving a
    # few weights by one int4 step — allow the corresponding logit drift
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0.3, atol=0.3)


def test_nativize_matches_storage_path():
    """nativize_q4 (native int4 + grouped dots) == packed XLA path."""
    from llama_nuts_and_bolts_tpu.quant import nativize_q4

    w = jax.random.normal(jax.random.PRNGKey(2), (64, 512), jnp.float32) / 8
    qt = jax.jit(quantize_tensor_q4)(w)
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 512), jnp.float32).astype(jnp.bfloat16)

    @jax.jit
    def native(x, qt):
        return linear(x, nativize_q4(qt), out_dtype=jnp.float32)

    @jax.jit
    def storage(x, qt):
        return linear(x, qt, out_dtype=jnp.float32)

    np.testing.assert_allclose(np.asarray(native(x, qt)), np.asarray(storage(x, qt)),
                               rtol=2e-2, atol=2e-2)


def test_q4_kernel_interpret_exact():
    """Pallas grouped kernel (interpret mode) == dense dequant matmul."""
    from llama_nuts_and_bolts_tpu.kernels.q4_matmul import q4_matmul

    w = jax.random.normal(jax.random.PRNGKey(0), (256, 1024), jnp.float32) / 16
    qt = jax.jit(quantize_tensor_q4)(w)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 1024), jnp.float32).astype(jnp.bfloat16)
    ref = np.asarray(x.astype(jnp.float32)
                     @ unpack_q4(qt, jnp.bfloat16).astype(jnp.float32).T)
    got = np.asarray(q4_matmul(x, qt.packed, qt.scale, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-2, atol=1e-2)
