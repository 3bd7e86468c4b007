"""Rotary position embeddings with Llama-3.1 frequency scaling.

Capability parity with the reference's RoPE pipeline (reference:
src/model/llamatransformer.go:662-790): base frequencies
``1/theta^(2i/dim)``, the Llama-3.1 wavelength-banded rescale (scale factor 8,
low/high band factors 1/4, original context 8192), and rotation of the head
dim viewed as interleaved (real, imag) pairs — the layout Meta's checkpoint
weights assume. The reference builds a complex64 cis table and multiplies
complex views; here cos/sin tables stay fp32 in device memory and the rotation
is a fused VPU elementwise pass.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import jax.numpy as jnp


# Llama-3.1 scaling constants (reference: src/model/llamatransformer.go:664-668).
# Llama-3.2 1B/3B checkpoints override scale_factor to 32 via params.json
# ("rope_scaling_factor"); the bands and original context stay the same.
SCALE_FACTOR = 8.0
LOW_FREQ_FACTOR = 1.0
HIGH_FREQ_FACTOR = 4.0
OLD_CONTEXT_LEN = 8192.0


def _scale_freqs(freqs: np.ndarray, scale_factor: float = SCALE_FACTOR,
                 high_freq_factor: float = HIGH_FREQ_FACTOR) -> np.ndarray:
    """Wavelength-banded frequency rescale for long-context Llama-3.1/3.2."""
    low_freq_wavelen = OLD_CONTEXT_LEN / LOW_FREQ_FACTOR
    high_freq_wavelen = OLD_CONTEXT_LEN / high_freq_factor
    wavelen = 2.0 * np.pi / freqs
    # high-frequency band (short wavelengths): untouched
    # low-frequency band (long wavelengths): fully scaled down by scale_factor
    # middle band: smooth interpolation between the two
    smooth = (OLD_CONTEXT_LEN / wavelen - LOW_FREQ_FACTOR) / (
        high_freq_factor - LOW_FREQ_FACTOR
    )
    scaled = np.where(
        wavelen < high_freq_wavelen,
        freqs,
        np.where(
            wavelen > low_freq_wavelen,
            freqs / scale_factor,
            (1.0 - smooth) * freqs / scale_factor + smooth * freqs,
        ),
    )
    return scaled


def precompute_rope_tables(
    head_dim: int,
    end: int,
    theta: float = 500000.0,
    use_scaled: bool = False,
    scale_factor: float = SCALE_FACTOR,
    high_freq_factor: float = HIGH_FREQ_FACTOR,
) -> Tuple[np.ndarray, np.ndarray]:
    """(cos, sin) tables of shape [end, head_dim//2], fp32, host-side.

    ``end`` follows the reference's convention of 2×max-sequence-length
    (reference: src/model/llamatransformer.go:109).
    """
    exponents = np.arange(0, head_dim, 2, dtype=np.float64)[: head_dim // 2] / head_dim
    freqs = 1.0 / (theta ** exponents)
    if use_scaled:
        freqs = _scale_freqs(freqs, scale_factor, high_freq_factor)
    t = np.arange(end, dtype=np.float64)
    angles = np.outer(t, freqs)
    return np.cos(angles).astype(np.float32), np.sin(angles).astype(np.float32)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Rotate ``x[B, S, H, D]`` by per-position tables ``cos/sin[S, D//2]``
    (or per-row tables ``[B, S, D//2]`` — continuous batching gives every
    batch row its own positions).

    The head dim is interpreted as interleaved complex pairs
    ``(x[2i], x[2i+1]) = (re, im)``; rotation happens in fp32 and the result
    is cast back to ``x.dtype`` (the same bf16 round-trip the reference takes
    at src/model/llamatransformer.go:776-786).
    """
    B, S, H, D = x.shape
    x32 = x.astype(jnp.float32).reshape(B, S, H, D // 2, 2)
    re, im = x32[..., 0], x32[..., 1]
    if cos.ndim == 3:                      # [B, S, D//2] per-row positions
        c = cos[:, :, None, :]
        s = sin[:, :, None, :]
    else:                                  # [S, D//2] shared positions
        c = cos[None, :, None, :]
        s = sin[None, :, None, :]
    out = jnp.stack([re * c - im * s, re * s + im * c], axis=-1)
    return out.reshape(B, S, H, D).astype(x.dtype)
