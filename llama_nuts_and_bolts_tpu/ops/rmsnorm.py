"""RMSNorm: ``x * rsqrt(mean(x², axis=-1) + eps) * weight``.

Capability parity with the reference's RMSNorm (reference:
src/model/llamatransformer.go:633-660): statistics in fp32 (the reference
promotes bf16→f32 for Pow/Mean), output cast back to the input dtype. XLA
fuses the whole thing into one VPU pass; a fused Pallas variant lives in
kernels/rmsnorm.py.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float) -> jnp.ndarray:
    x32 = x.astype(jnp.float32)
    inv = lax.rsqrt(jnp.mean(x32 * x32, axis=-1, keepdims=True) + eps)
    return ((x32 * inv) * weight.astype(jnp.float32)).astype(x.dtype)
