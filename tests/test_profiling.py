"""Profiling subsystem: narrated forward must match the fused forward; the
step timer aggregates; device traces produce output files."""

import os

import numpy as np

import jax
import jax.numpy as jnp

from llama_nuts_and_bolts_tpu.io.params import ModelArgs
from llama_nuts_and_bolts_tpu.models.llama import forward, init_random_params
from llama_nuts_and_bolts_tpu.models.llama.model import KVCache
from llama_nuts_and_bolts_tpu.runtime.profiling import (
    StepTimer,
    device_trace,
    narrated_forward,
)

CFG = ModelArgs(dim=32, n_layers=2, n_heads=4, n_kv_heads=2, vocab_size=64,
                multiple_of=16, max_sequence_length=32)


def test_narrated_forward_matches_fused():
    params = jax.jit(init_random_params, static_argnums=(0,))(CFG, jax.random.PRNGKey(0))
    tokens = jnp.asarray([[3, 1, 4, 1]], dtype=jnp.int32)
    ref, ref_cache = jax.jit(forward, static_argnums=(1,))(
        params, CFG, tokens, 0, KVCache.create(CFG, 1, 16))

    lines = []
    got, got_cache = narrated_forward(params, CFG, tokens, 0,
                                      KVCache.create(CFG, 1, 16), lines.append)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(got_cache.k), np.asarray(ref_cache.k))
    # narration formatting: one line per layer plus embeddings and output
    assert len(lines) == CFG.n_layers + 2
    assert "Transformer block layer 1 / 2" in lines[1]
    assert "took" in lines[1]


def test_step_timer_summary():
    t = StepTimer()
    for _ in range(10):
        t.start()
        t.stop()
    s = t.summary()
    assert s["count"] == 10
    assert s["p50_s"] >= 0 and s["p95_s"] >= s["p50_s"] >= 0
    assert StepTimer().summary() == {}


def test_device_trace_writes_files(tmp_path):
    d = str(tmp_path / "trace")
    with device_trace(d):
        jnp.asarray([1.0, 2.0]).sum().block_until_ready()
    found = []
    for root, _dirs, files in os.walk(d):
        found.extend(files)
    assert found, "no trace files written"


def test_narrated_forward_fused_layout_matches():
    """narrated_forward on fused-layout params (the CLI's default load)
    matches the production forward."""
    import numpy as np

    from llama_nuts_and_bolts_tpu.models.llama import (
        forward, fuse_decode_params, init_random_params)
    from llama_nuts_and_bolts_tpu.models.llama.model import KVCache
    from llama_nuts_and_bolts_tpu.runtime.profiling import narrated_forward

    params = fuse_decode_params(
        jax.jit(init_random_params, static_argnums=(0,))(CFG, jax.random.PRNGKey(2)))
    tokens = jnp.asarray([[5, 3, 8]], dtype=jnp.int32)
    lines = []
    logits, cache = narrated_forward(params, CFG, tokens, 0,
                                     KVCache.create(CFG, 1, 16),
                                     log_fn=lines.append)
    ref, ref_cache = forward(params, CFG, tokens, 0, KVCache.create(CFG, 1, 16))
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)
    assert any("Transformer block layer 1 /" in ln for ln in lines)
