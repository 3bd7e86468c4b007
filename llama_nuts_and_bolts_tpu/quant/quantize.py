"""Weight-only int8 quantization (per-output-channel, symmetric).

A production-serving extension the CPU-bound reference could never reach for:
bf16 Llama-3.1-8B is 16.06 GB — larger than a v5e chip's HBM — but int8
weights (8.06 GB) fit with room for an 8K KV cache, and since batch-1 decode
is bandwidth-bound, halving weight bytes raises the decode roofline ~2×.

Scheme: for each weight matrix ``w[out, in]`` (stacked ``[L, out, in]``),
``q = round(w / scale)`` with ``scale[out] = max|w[out, :]| / 127``.
Activations stay bf16; the dequantize-multiply fuses into the matmul read
(ops/linear.py handles :class:`QTensor` transparently, so the same forward
serves both precisions). Norms, embeddings, and RoPE tables stay bf16/fp32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from llama_nuts_and_bolts_tpu.io.params import ModelArgs
from llama_nuts_and_bolts_tpu.models.llama.model import LlamaParams, layer_weight_shapes
from llama_nuts_and_bolts_tpu.models.llama.rope import precompute_rope_tables


@struct.dataclass
class QTensor:
    """int8 values + per-output-channel fp scales; shape = q.shape."""

    q: jnp.ndarray        # int8 [..., out, in]
    scale: jnp.ndarray    # bf16 [..., out]

    @property
    def shape(self):
        return self.q.shape

    @property
    def ndim(self):
        return self.q.ndim


def quantize_tensor(w: jnp.ndarray) -> QTensor:
    """Per-output-channel symmetric int8 over the last (contraction) dim."""
    w32 = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w32), axis=-1, keepdims=True)
    scale = jnp.maximum(amax / 127.0, 1e-8)
    q = jnp.clip(jnp.round(w32 / scale), -127, 127).astype(jnp.int8)
    return QTensor(q=q, scale=scale[..., 0].astype(jnp.bfloat16))


def dequantize(qt: QTensor, dtype=jnp.bfloat16) -> jnp.ndarray:
    return (qt.q.astype(jnp.float32)
            * qt.scale.astype(jnp.float32)[..., None]).astype(dtype)


_QUANT_KEYS = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down")


def quantize_params(params: LlamaParams, quantize_output: bool = True) -> LlamaParams:
    """int8-quantize the matmul weight groups (norms/embeddings/rope stay)."""
    layers = dict(params.layers)
    for key in _QUANT_KEYS:
        layers[key] = jax.jit(quantize_tensor)(layers[key])
    output = jax.jit(quantize_tensor)(params.output) if quantize_output else params.output
    return LlamaParams(
        tok_embeddings=params.tok_embeddings,
        layers=layers,
        norm=params.norm,
        output=output,
        rope_cos=params.rope_cos,
        rope_sin=params.rope_sin,
    )


def init_random_params_q8(cfg: ModelArgs, key: jax.Array) -> LlamaParams:
    """Random int8 params materialized directly (no bf16 intermediate), so the
    full 32-layer 8B architecture can be built inside a single chip's HBM for
    benchmarking.

    Generation is chunked per (group, layer): PRNG bit generation uses 4-byte
    intermediates, so emitting a whole stacked [L, out, in] group in one call
    would transiently need 4× the final int8 bytes and thrash HBM.
    """
    import numpy as np

    import functools

    key_iter = iter(jax.random.split(key, 64 + 16 * cfg.n_layers))

    @functools.partial(jax.jit, static_argnames=("shape",))
    def _rand_chunk(k, shape):
        bits = jax.random.bits(k, shape, dtype=jnp.uint8)
        return (bits.astype(jnp.int16) - 128).clip(-127, 127).astype(jnp.int8)

    def rand_q(shape) -> QTensor:
        if len(shape) == 3:                      # stacked layer group
            step = 8                              # 8 layers/call: ~2GB transient
            chunks = []
            done = 0
            while done < shape[0]:
                n = min(step, shape[0] - done)
                chunks.append(_rand_chunk(next(key_iter), shape=(n,) + shape[1:]))
                done += n
            q = jnp.concatenate(chunks, axis=0)
        else:                                    # 2-D head: chunk rows
            rows = max(1, min(shape[0], (64 << 20) // max(1, shape[1])))
            chunks = []
            done = 0
            while done < shape[0]:
                n = min(rows, shape[0] - done)
                chunks.append(_rand_chunk(next(key_iter), shape=(n,) + shape[1:]))
                done += n
            q = jnp.concatenate(chunks, axis=0)
        scale = jnp.full(shape[:-1], 1.0 / (127 * np.sqrt(shape[-1])), jnp.bfloat16)
        return QTensor(q=q, scale=scale)

    L = cfg.n_layers
    layers = {}
    for name, shape in layer_weight_shapes(cfg).items():
        if name.endswith("norm"):
            layers[name] = jnp.ones((L,) + shape, jnp.bfloat16)
        else:
            layers[name] = rand_q((L,) + shape)
    cos, sin = precompute_rope_tables(
        cfg.head_dim, 2 * cfg.max_sequence_length, cfg.rope_theta, cfg.use_scaled_rope,
        cfg.rope_scale_factor, cfg.rope_high_freq_factor)
    emb = (jax.random.normal(next(key_iter), (cfg.vocab_size, cfg.dim), jnp.bfloat16)
           / jnp.bfloat16(cfg.dim ** 0.5))
    return LlamaParams(
        tok_embeddings=emb,
        layers=layers,
        norm=jnp.ones((cfg.dim,), jnp.bfloat16),
        output=rand_q((cfg.vocab_size, cfg.dim)),
        rope_cos=jnp.asarray(cos),
        rope_sin=jnp.asarray(sin),
    )
