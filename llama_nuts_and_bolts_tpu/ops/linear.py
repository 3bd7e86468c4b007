"""Linear projection with checkpoint-layout ``[out, in]`` weights.

TPU-native replacement for the reference's goroutine-parallel dot-product GEMM
(reference: src/ml/operations_lineartransform.go:37-207): a single
``dot_general`` contracting the shared ``in`` dim lowers straight onto the MXU
with fp32 accumulation — the layout means no transpose is ever materialized.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax


def linear(x: jnp.ndarray, w,
           out_dtype: Optional[jnp.dtype] = None) -> jnp.ndarray:
    """``x @ w.T`` for ``x[..., in]`` and ``w[out, in]``; fp32 accumulate.

    ``out_dtype=None`` casts back to ``x.dtype`` (bf16 activations stay bf16,
    matching the reference's fp32-accumulate-then-store-bf16 kernels); pass
    ``jnp.float32`` to keep full precision (the logits head).

    ``w`` may be a :class:`~llama_nuts_and_bolts_tpu.quant.QTensor` (int8 +
    per-channel scales): the int8 matrix feeds the dot directly — the
    int8→bf16 convert fuses into the matmul's operand read, so only int8
    bytes cross HBM — and the scale multiplies the fp32 accumulator.
    """
    ndim = x.ndim
    scale = None
    if hasattr(w, "w4"):                  # Q4Native (in-jit int4, quant/int4.py)
        return _linear_q4_native(x, w, out_dtype)
    if hasattr(w, "packed"):              # Q4Tensor (packed int4 storage)
        return _linear_q4(x, w, out_dtype)
    if hasattr(w, "q"):                   # QTensor without importing quant/
        scale = w.scale
        w = w.q.astype(x.dtype)
    out = lax.dot_general(
        x, w,
        dimension_numbers=(((ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if scale is not None:
        out = out * scale.astype(jnp.float32)
    return out.astype(out_dtype if out_dtype is not None else x.dtype)


# decode row-count bound under which the fused Pallas dequant-matmul runs
# (one weight out-tile + all of x must fit VMEM; prefill goes through XLA,
# where materializing the bf16 weights once per layer is fine — compute-bound)
_Q4_KERNEL_MAX_ROWS = 32


def _rows(shape) -> int:
    n = 1
    for d in shape:
        n *= d
    return n


def _linear_q4_native(x: jnp.ndarray, w, out_dtype) -> jnp.ndarray:
    """Q4Native path: ONE dot_general with the group axis as a batch dim —
    native int4 weights stream packed from HBM, and the per-(group, out)
    scale applies to the fp32 partials before the group reduction. Measured
    as fast as an ungrouped dot on v5e at every real (G, K); unrolled
    per-group dots were ~4× slower in-model from per-dot overhead.
    Only valid inside a jit (int4 cannot cross the axon jit boundary)."""
    G, out_dim, K = w.w4.shape
    lead = x.shape[:-1]
    rows = _rows(lead)
    xg = jnp.moveaxis(x.reshape(rows, G, K), 1, 0)        # [G, rows, K]
    part = lax.dot_general(
        xg, w.w4.astype(x.dtype),
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                                     # [G, rows, out]
    out = jnp.sum(part * w.scale[:, None, :], axis=0)     # [rows, out]
    out = out.reshape(*lead, out_dim)
    return out.astype(out_dtype if out_dtype is not None else x.dtype)


def _linear_q4(x: jnp.ndarray, w, out_dtype) -> jnp.ndarray:
    """Q4Tensor path: Pallas fused dequant-matmul for decode-shaped calls on
    TPU, XLA dequantize-then-dot otherwise (CPU tests, prefill)."""
    from llama_nuts_and_bolts_tpu.quant.int4 import unpack_q4

    lead = x.shape[:-1]
    in_dim = x.shape[-1]
    rows = _rows(lead)
    G, out_dim, half = w.packed.shape[-3:]
    on_tpu = jax.devices()[0].platform not in ("cpu", "gpu")
    use_kernel = (w.packed.ndim == 3 and on_tpu and rows <= _Q4_KERNEL_MAX_ROWS
                  and half % 128 == 0 and out_dim % 128 == 0)
    if use_kernel:
        from llama_nuts_and_bolts_tpu.kernels.q4_matmul import q4_matmul

        out = q4_matmul(x.reshape(rows, in_dim), w.packed, w.scale)
        out = out.reshape(*lead, out_dim)
    else:
        dense = unpack_q4(w, x.dtype)
        ndim = x.ndim
        out = lax.dot_general(
            x, dense,
            dimension_numbers=(((ndim - 1,), (w.ndim - 1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    return out.astype(out_dtype if out_dtype is not None else x.dtype)


def linear_t(x: jnp.ndarray, w: jnp.ndarray,
             out_dtype: Optional[jnp.dtype] = None) -> jnp.ndarray:
    """``x @ w`` for ``x[..., in]`` and TRANSPOSED-layout ``w[in, out]``.

    The decode-optimized fused weight layout (models/llama/model.py
    ``fuse_decode_params``) stores matmul weights as ``[in, out]``: measured
    on v5e, b=1 decode matvecs stream ~1% more HBM bandwidth in this
    orientation, and fusing qkv / gate+up into single matmuls adds ~1.5%
    more (docs/07-PERFORMANCE.md). Same fp32 accumulation as :func:`linear`.
    """
    out = lax.dot_general(
        x, w,
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return out.astype(out_dtype if out_dtype is not None else x.dtype)
