"""SwiGLU feed-forward: ``down(silu(gate(x)) * up(x))``.

Capability parity with the reference's FFN (reference:
src/model/llamatransformer.go:593-624). The reference's 2¹⁶-entry SiLU lookup
table (src/ml/activations.go:10-50) is a CPU trick; on TPU the VPU computes
silu directly and XLA fuses it into the surrounding matmuls.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from llama_nuts_and_bolts_tpu.ops.linear import linear


def swiglu(x: jnp.ndarray, w_gate: jnp.ndarray, w_up: jnp.ndarray,
           w_down: jnp.ndarray) -> jnp.ndarray:
    gate = jax.nn.silu(linear(x, w_gate, out_dtype=jnp.float32))
    up = linear(x, w_up, out_dtype=jnp.float32)
    return linear((gate * up).astype(x.dtype), w_down)
