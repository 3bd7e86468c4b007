"""Fused int4-dequantizing matmul Pallas kernel (TPU) for single-step decode.

Batch-1 decode is HBM-bandwidth-bound, so the whole point of int4 weights is
that only ~0.5 bytes/weight cross HBM. XLA's unpack-then-dot lowering
materializes the dequantized bf16 matrix in HBM (write 2B + read 2B + read
0.5B per weight — measured SLOWER than plain bf16), so the per-step decode
path needs a real kernel: packed nibbles stream HBM→VMEM, unpack + scale run
on the VPU against VMEM tiles, and the MXU consumes bf16 — packed bytes are
the only HBM weight traffic. (Jitted BLOCK decode loops instead use
quant/int4.py::nativize_q4 + native int4 dots, amortizing one unpack across
the loop; this kernel serves the one-step-per-dispatch engine path.)

Layout contract (quant/int4.py): packed ``[G, out, K/2]`` group-major; within
a group, byte ``j`` holds element ``j`` (low nibble) and ``j + K/2`` (high).
Everything is contiguous per group — the kernel does G unrolled
(dot, dot, scale-accumulate) rounds with zero relayouts: no transposes, no
sub-32-bit reshapes, only 128-lane-aligned slices (K/2 is a multiple of 128
for all real model dims with the default group size 256).

The reference has no quantization; capability anchor is its bf16 GEMM
(reference: src/ml/operations_lineartransform.go:37-207) rebuilt as the
bandwidth-optimal TPU program for 4-bit weights.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _q4_matmul_kernel(x_ref, p_ref, s_ref, o_ref, *, K: int):
    """One out-tile: o[R, T] = Σ_g s[g] · (x[:, gK:(g+1)K] @ deq(p[g]).T)"""
    G = p_ref.shape[0]
    acc = jnp.zeros(o_ref.shape, jnp.float32)
    half = K // 2
    for g in range(G):                               # static unroll
        p32 = p_ref[g].astype(jnp.int32)             # [T, K/2]
        lo = ((p32 & 0xF) - 8).astype(jnp.bfloat16)  # group elements [0, K/2)
        hi = ((p32 >> 4) - 8).astype(jnp.bfloat16)   # group elements [K/2, K)
        part = lax.dot_general(
            x_ref[:, g * K:g * K + half], lo,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        part += lax.dot_general(
            x_ref[:, g * K + half:(g + 1) * K], hi,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                            # [R, T]
        acc += part * s_ref[g:g + 1, :].astype(jnp.float32)
    o_ref[:] = acc


def q4_matmul(x: jnp.ndarray, packed: jnp.ndarray, scale: jnp.ndarray,
              interpret: bool = False) -> jnp.ndarray:
    """``x[R, in] @ w[out, in].T`` with w stored as grouped packed int4.

    ``packed``: uint8 [G, out, K/2]; ``scale``: bf16 [G, out]. Returns fp32
    ``[R, out]``. Designed for decode/verify row counts (R small); all of x
    plus one weight out-tile must fit VMEM.
    """
    R, in_dim = x.shape
    G, out_dim, half = packed.shape
    K = 2 * half
    if in_dim != G * K:
        raise ValueError(f"x in dim {in_dim} != G*K = {G * K}")

    tile = 256 if in_dim <= 8192 else 128
    while out_dim % tile:
        tile //= 2
    grid = (out_dim // tile,)

    kernel = functools.partial(_q4_matmul_kernel, K=K)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((R, in_dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, tile, half), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, out_dim), jnp.float32),
        interpret=interpret,
    )(x.astype(jnp.bfloat16), packed, scale)
