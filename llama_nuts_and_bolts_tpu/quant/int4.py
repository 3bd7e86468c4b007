"""Weight-only int4 quantization (group-wise symmetric, packed nibbles).

Halves int8's weight bytes again: the full Llama-3.1-8B matmul weights fit in
~4.0 GB, and since batch-1 decode is HBM-bandwidth-bound, the decode roofline
roughly doubles over int8 (the reference has no quantization at all — this is
a production-serving extension; capability anchor: its bf16-only pipeline,
src/dtype/bfloat16.go).

Scheme (AWQ/GPTQ-class storage, RTN values): split ``w[out, in]``'s
contraction dim into groups of ``group_size``; per (group, out)
``scale = max|w| / 7``; ``q = round(w / scale) ∈ [-8, 7]``.

Storage layout (chosen from measurement on v5e, docs/07-PERFORMANCE.md):

  packed: uint8 ``[..., G, out, K/2]``   (K = group_size)
  scale:  bf16  ``[..., G, out]``

i.e. GROUP-major, so the decode matmul is G back-to-back CONTIGUOUS dots
``x[:, gK:(g+1)K] @ w4[g].T`` with the group scale applied to the fp32
accumulator — measured as fast as a single ungrouped dot, while lane-sliced
``[out, in]`` layouts ran 2× slower. Within a group, byte ``j`` holds element
``j`` in its low nibble and element ``j + K/2`` in its high nibble
(split-half keeps both unpacked halves contiguous: no lane interleave in any
consumer). ``group_size`` defaults to 256 so half-group slices stay 128-lane
aligned.

Consumption paths (ops/linear.py):
  * jitted decode loops: ``nativize_q4`` converts packed bytes to NATIVE
    ``int4`` arrays once per loop invocation (int4 cannot cross a jit
    boundary on the axon backend, so the conversion lives inside the jit,
    amortized over the loop's steps); the dot then reads int4 directly.
  * single-step decode: fused Pallas kernel (kernels/q4_matmul.py).
  * prefill (compute-bound): XLA dequantize-then-dot.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from llama_nuts_and_bolts_tpu.io.params import ModelArgs
from llama_nuts_and_bolts_tpu.models.llama.model import LlamaParams, layer_weight_shapes
from llama_nuts_and_bolts_tpu.models.llama.rope import precompute_rope_tables

DEFAULT_GROUP = 256


@struct.dataclass
class Q4Tensor:
    """Packed int4 weights + per-(group, out) bf16 scales (storage format)."""

    packed: jnp.ndarray   # uint8 [..., G, out, K/2]
    scale: jnp.ndarray    # bf16  [..., G, out]

    @property
    def shape(self):
        """Logical dense shape [..., out, in]."""
        *lead, G, out, half = self.packed.shape
        return tuple(lead) + (out, G * half * 2)

    @property
    def ndim(self):
        return self.packed.ndim - 1

    @property
    def group_size(self) -> int:
        return self.packed.shape[-1] * 2


@struct.dataclass
class Q4Native:
    """In-jit form: native int4 values (never crosses a jit boundary)."""

    w4: jnp.ndarray       # int4 [..., G, out, K]
    scale: jnp.ndarray    # f32  [..., G, out]

    @property
    def shape(self):
        *lead, G, out, K = self.w4.shape
        return tuple(lead) + (out, G * K)

    @property
    def ndim(self):
        return self.w4.ndim - 1


def fit_group(in_dim: int, group_size: int = DEFAULT_GROUP) -> int:
    """Largest divisor of ``in_dim`` that is ≤ ``group_size`` and has an even
    half (small/odd hidden dims — e.g. the tiny demo model — fall back to
    coarser or finer groups)."""
    if in_dim % 2:
        raise ValueError(f"int4 packing needs an even contraction dim, got {in_dim}")
    g = min(group_size, in_dim)
    while in_dim % g or g % 2:
        g -= 1
    return g


def quantize_tensor_q4(w: jnp.ndarray, group_size: int = DEFAULT_GROUP) -> Q4Tensor:
    """Group-wise symmetric int4 over the last (contraction) dim of
    ``w[..., out, in]`` → grouped storage layout."""
    *lead, out, in_dim = w.shape
    K = fit_group(in_dim, group_size)
    G = in_dim // K
    n = len(lead)
    wg = w.astype(jnp.float32).reshape(*lead, out, G, K)
    wg = jnp.moveaxis(wg, n + 1, n)                      # [..., G, out, K]
    amax = jnp.max(jnp.abs(wg), axis=-1, keepdims=True)
    scale = jnp.maximum(amax / 7.0, 1e-8)
    q = jnp.clip(jnp.round(wg / scale), -8, 7).astype(jnp.int32) + 8
    half = K // 2
    packed = (q[..., :half] | (q[..., half:] << 4)).astype(jnp.uint8)
    return Q4Tensor(packed=packed, scale=scale[..., 0].astype(jnp.bfloat16))


def _unpack_nibbles(packed: jnp.ndarray) -> jnp.ndarray:
    """uint8 [..., K/2] → int32 [..., K] in [-8, 7] (split-half layout)."""
    p = packed.astype(jnp.int32)
    return jnp.concatenate([(p & 0xF) - 8, (p >> 4) - 8], axis=-1)


def unpack_q4(qt: Q4Tensor, dtype=jnp.bfloat16) -> jnp.ndarray:
    """Dequantize to a dense ``[..., out, in]`` array."""
    q = _unpack_nibbles(qt.packed)                       # [..., G, out, K]
    deq = q.astype(dtype) * qt.scale[..., None].astype(dtype)
    n = qt.packed.ndim - 3
    *lead, G, out, K = deq.shape
    return jnp.moveaxis(deq, n, n + 1).reshape(*lead, out, G * K)


def nativize_q4(value):
    """Q4Tensor → Q4Native (int4 values materialized IN-JIT).

    Call at the top of a jitted decode loop, outside the step scan: the
    one-time unpack (~1.5 bytes/weight of HBM traffic) amortizes over the
    loop, after which every step reads only int4 + x. Plain arrays and
    QTensors pass through unchanged; works on whole pytrees via tree_map.
    """
    def conv(v):
        if isinstance(v, Q4Tensor):
            # convert each half to int4 BEFORE concatenating: the int32
            # unpack then fuses into the convert (a streaming loop) instead
            # of materializing two full-weight-size s32 temps — 3.5 GB each
            # for the stacked FFN weights, observed OOMing an otherwise
            # comfortable B=4 8K continuous-batching config
            p = v.packed.astype(jnp.int32)
            lo = ((p & 0xF) - 8).astype(jnp.int4)
            hi = ((p >> 4) - 8).astype(jnp.int4)
            return Q4Native(w4=jnp.concatenate([lo, hi], axis=-1),
                            scale=v.scale.astype(jnp.float32))
        return v

    return jax.tree_util.tree_map(conv, value,
                                  is_leaf=lambda v: isinstance(v, Q4Tensor))


_QUANT_KEYS = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down")


def quantize_params_q4(params: LlamaParams, group_size: int = DEFAULT_GROUP,
                       quantize_output: bool = True) -> LlamaParams:
    """int4-quantize the matmul weight groups (norms/embeddings/rope stay)."""
    import functools

    qt = jax.jit(functools.partial(quantize_tensor_q4, group_size=group_size))
    layers = dict(params.layers)
    for key in _QUANT_KEYS:
        layers[key] = qt(layers[key])
    output = qt(params.output) if quantize_output else params.output
    return LlamaParams(
        tok_embeddings=params.tok_embeddings,
        layers=layers,
        norm=params.norm,
        output=output,
        rope_cos=params.rope_cos,
        rope_sin=params.rope_sin,
    )


def host_quantize_q4(host: np.ndarray, group_size: int = DEFAULT_GROUP):
    """Numpy twin of :func:`quantize_tensor_q4` for memmap-backed loading:
    the 16 GB bf16 checkpoint reaches the chip as ~4 GB of packed nibbles."""
    import ml_dtypes

    *lead, out, in_dim = host.shape
    K = fit_group(in_dim, group_size)
    G = in_dim // K
    n = len(lead)
    wg = np.asarray(host, dtype=np.float32).reshape(*lead, out, G, K)
    wg = np.moveaxis(wg, n + 1, n)
    amax = np.max(np.abs(wg), axis=-1, keepdims=True)
    scale = np.maximum(amax / 7.0, 1e-8)
    q = np.clip(np.rint(wg / scale), -8, 7).astype(np.int32) + 8
    half = K // 2
    packed = (q[..., :half] | (q[..., half:] << 4)).astype(np.uint8)
    return packed, scale[..., 0].astype(ml_dtypes.bfloat16)


def init_random_params_q4(cfg: ModelArgs, key: jax.Array,
                          group_size: int = DEFAULT_GROUP) -> LlamaParams:
    """Random packed-int4 params materialized directly on device (~4 GB for
    the full 32-layer 8B), for benchmarking without the checkpoint."""
    import functools

    key_iter = iter(jax.random.split(key, 64 + 16 * cfg.n_layers))

    @functools.partial(jax.jit, static_argnames=("shape",))
    def _rand_packed(k, shape):
        return jax.random.bits(k, shape, dtype=jnp.uint8)

    def rand_q4(shape) -> Q4Tensor:
        *lead, out, in_dim = shape
        K = fit_group(in_dim, group_size)
        G = in_dim // K
        packed_shape = tuple(lead) + (G, out, K // 2)
        if lead:                                  # stacked layers: chunk L
            step = 8
            chunks, done = [], 0
            while done < lead[0]:
                n = min(step, lead[0] - done)
                chunks.append(_rand_packed(next(key_iter), shape=(n,) + packed_shape[1:]))
                done += n
            packed = jnp.concatenate(chunks, axis=0)
        else:
            packed = _rand_packed(next(key_iter), shape=packed_shape)
        scale = jnp.full(tuple(lead) + (G, out),
                         1.0 / (7 * np.sqrt(in_dim)), jnp.bfloat16)
        return Q4Tensor(packed=packed, scale=scale)

    L = cfg.n_layers
    layers = {}
    for name, shape in layer_weight_shapes(cfg).items():
        if name.endswith("norm"):
            layers[name] = jnp.ones((L,) + shape, jnp.bfloat16)
        else:
            layers[name] = rand_q4((L,) + shape)
    cos, sin = precompute_rope_tables(
        cfg.head_dim, 2 * cfg.max_sequence_length, cfg.rope_theta, cfg.use_scaled_rope,
        cfg.rope_scale_factor, cfg.rope_high_freq_factor)
    emb = (jax.random.normal(next(key_iter), (cfg.vocab_size, cfg.dim), jnp.bfloat16)
           / jnp.bfloat16(cfg.dim ** 0.5))
    return LlamaParams(
        tok_embeddings=emb,
        layers=layers,
        norm=jnp.ones((cfg.dim,), jnp.bfloat16),
        output=rand_q4((cfg.vocab_size, cfg.dim)),
        rope_cos=jnp.asarray(cos),
        rope_sin=jnp.asarray(sin),
    )
