"""Linear projection with checkpoint-layout ``[out, in]`` weights.

TPU-native replacement for the reference's goroutine-parallel dot-product GEMM
(reference: src/ml/operations_lineartransform.go:37-207): a single
``dot_general`` contracting the shared ``in`` dim lowers straight onto the MXU
with fp32 accumulation — the layout means no transpose is ever materialized.
"""

from __future__ import annotations

from typing import Optional

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
