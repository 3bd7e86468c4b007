"""int8 weight-only quantization: round-trip accuracy, forward parity within
quantization tolerance, and the transparent QTensor path through the model."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from llama_nuts_and_bolts_tpu.io.params import ModelArgs
from llama_nuts_and_bolts_tpu.models.llama import forward, init_random_params
from llama_nuts_and_bolts_tpu.models.llama.model import KVCache
from llama_nuts_and_bolts_tpu.ops import linear
from llama_nuts_and_bolts_tpu.quant import (
    dequantize,
    init_random_params_q8,
    quantize_params,
    quantize_tensor,
)

CFG = ModelArgs(dim=64, n_layers=2, n_heads=4, n_kv_heads=2, vocab_size=128,
                multiple_of=32, max_sequence_length=64)

FWD = jax.jit(forward, static_argnums=(1,))


def test_quantize_roundtrip_error():
    w = jax.random.normal(jax.random.PRNGKey(0), (32, 64), jnp.float32)
    qt = jax.jit(quantize_tensor)(w)
    assert qt.q.dtype == jnp.int8 and qt.scale.shape == (32,)
    back = np.asarray(dequantize(qt, jnp.float32))
    err = np.abs(back - np.asarray(w)).max(axis=1)
    amax = np.abs(np.asarray(w)).max(axis=1)
    assert (err <= amax / 127.0 * 1.01).all()  # within half-step per channel


def test_linear_accepts_qtensor():
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 64), jnp.float32).astype(jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(2), (16, 64), jnp.float32) / 8
    qt = jax.jit(quantize_tensor)(w)
    ref = np.asarray(jax.jit(lambda x, w: linear(x, w.astype(jnp.bfloat16),
                                                 out_dtype=jnp.float32))(x, w))
    got = np.asarray(jax.jit(lambda x, qt: linear(x, qt, out_dtype=jnp.float32))(x, qt))
    np.testing.assert_allclose(got, ref, rtol=5e-2, atol=5e-2)


def test_quantized_forward_close_to_bf16():
    params = jax.jit(init_random_params, static_argnums=(0,))(CFG, jax.random.PRNGKey(0))
    qparams = quantize_params(params)
    assert qparams.layers["wq"].q.dtype == jnp.int8
    tokens = jnp.asarray([[5, 17, 42, 7]], dtype=jnp.int32)
    ref, _ = FWD(params, CFG, tokens, 0, KVCache.create(CFG, 1, 16))
    got, _ = FWD(qparams, CFG, tokens, 0, KVCache.create(CFG, 1, 16))
    ref, got = np.asarray(ref), np.asarray(got)
    # int8 weight quantization: logits close, decisive argmax preserved
    np.testing.assert_allclose(got, ref, rtol=0.2, atol=0.35)
    top2 = np.sort(ref, axis=-1)[..., -2:]
    decisive = (top2[..., 1] - top2[..., 0]) > 0.5
    np.testing.assert_array_equal(got.argmax(-1)[decisive], ref.argmax(-1)[decisive])


def test_init_random_params_q8_shapes_and_runs():
    params = jax.jit(init_random_params_q8, static_argnums=(0,))(CFG, jax.random.PRNGKey(0))
    assert params.layers["w_down"].q.dtype == jnp.int8
    tokens = jnp.asarray([[1, 2, 3]], dtype=jnp.int32)
    logits, _ = FWD(params, CFG, tokens, 0, KVCache.create(CFG, 1, 16))
    assert np.isfinite(np.asarray(logits)).all()


def test_quantized_decode_steps():
    params = quantize_params(
        jax.jit(init_random_params, static_argnums=(0,))(CFG, jax.random.PRNGKey(0)))
    cache = KVCache.create(CFG, 1, 16)
    logits, cache = FWD(params, CFG, jnp.asarray([[1, 2, 3]], dtype=jnp.int32), 0, cache)
    tok = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
    for pos in (3, 4, 5):
        logits, cache = FWD(params, CFG, tok, pos, cache)
        tok = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
    assert 0 <= int(tok[0, 0]) < CFG.vocab_size


def test_loader_int8_quant_path():
    """Host-side quantized load: same forward as quantizing after load."""
    from llama_nuts_and_bolts_tpu.models.llama import build_params_from_checkpoint
    from tests.test_model import make_torch_weights, to_host_tensors

    weights = make_torch_weights(CFG, seed=5)
    tensors = to_host_tensors(weights)
    qloaded = build_params_from_checkpoint(tensors, CFG, quant="int8")
    full = build_params_from_checkpoint(to_host_tensors(weights), CFG)
    qafter = quantize_params(full)
    # host (numpy) and device (XLA) quantizers may differ by 1 unit at
    # rounding ties; scales must agree exactly
    dq = np.abs(np.asarray(qloaded.layers["wq"].q, np.int32)
                - np.asarray(qafter.layers["wq"].q, np.int32)).max()
    assert dq <= 1
    np.testing.assert_array_equal(np.asarray(qloaded.layers["wq"].scale),
                                  np.asarray(qafter.layers["wq"].scale))
    tokens = jnp.asarray([[7, 3, 1]], dtype=jnp.int32)
    a, _ = FWD(qloaded, CFG, tokens, 0, KVCache.create(CFG, 1, 16))
    b, _ = FWD(qafter, CFG, tokens, 0, KVCache.create(CFG, 1, 16))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-2, atol=5e-2)


def test_loader_rejects_unknown_quant():
    from llama_nuts_and_bolts_tpu.models.llama import build_params_from_checkpoint
    from tests.test_model import make_torch_weights, to_host_tensors

    with pytest.raises(ValueError):
        build_params_from_checkpoint(
            to_host_tensors(make_torch_weights(CFG)), CFG, quant="fp8")
