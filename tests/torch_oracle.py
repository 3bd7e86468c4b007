"""Independent PyTorch implementation of the Llama-3.1 forward pass, used as
the correctness oracle for the JAX model (tests only — torch never appears in
the framework itself).

Deliberately written the way Meta's reference implementation works — complex
RoPE, materialized repeat-KV, per-op bf16 round-trips — i.e. the SAME
semantics the Go reference mirrors (reference: src/model/llamatransformer.go),
via a DIFFERENT code path than the framework (which uses cos/sin rotation and
broadcast GQA). Agreement between the two is therefore meaningful.
"""

import math

import torch

from llama_nuts_and_bolts_tpu.io.params import ModelArgs


def apply_scaling_torch(freqs: torch.Tensor, scale_factor: float = 8.0,
                        high_freq_factor: float = 4.0) -> torch.Tensor:
    low_freq_factor = 1.0
    old_context_len = 8192.0
    low_freq_wavelen = old_context_len / low_freq_factor
    high_freq_wavelen = old_context_len / high_freq_factor
    out = []
    for freq in freqs.tolist():
        wavelen = 2.0 * math.pi / freq
        if wavelen < high_freq_wavelen:
            out.append(freq)
        elif wavelen > low_freq_wavelen:
            out.append(freq / scale_factor)
        else:
            smooth = (old_context_len / wavelen - low_freq_factor) / (
                high_freq_factor - low_freq_factor
            )
            out.append((1 - smooth) * freq / scale_factor + smooth * freq)
    return torch.tensor(out, dtype=freqs.dtype)


def precompute_freqs_cis(dim: int, end: int, theta: float, use_scaled: bool,
                         scale_factor: float = 8.0,
                         high_freq_factor: float = 4.0):
    freqs = 1.0 / (theta ** (torch.arange(0, dim, 2)[: dim // 2].double() / dim))
    if use_scaled:
        freqs = apply_scaling_torch(freqs, scale_factor, high_freq_factor)
    t = torch.arange(end).double()
    freqs = torch.outer(t, freqs)
    return torch.polar(torch.ones_like(freqs), freqs)  # complex128


def apply_rotary_emb(x: torch.Tensor, freqs_cis: torch.Tensor) -> torch.Tensor:
    # x: [B, S, H, D] -> complex pairs
    xc = torch.view_as_complex(x.float().reshape(*x.shape[:-1], -1, 2))
    fc = freqs_cis.to(torch.complex64).view(1, x.shape[1], 1, xc.shape[-1])
    out = torch.view_as_real(xc * fc).flatten(3)
    return out.type_as(x)


def rms_norm(x: torch.Tensor, w: torch.Tensor, eps: float) -> torch.Tensor:
    x32 = x.float()
    normed = x32 * torch.rsqrt(x32.pow(2).mean(-1, keepdim=True) + eps)
    return (normed * w.float()).type_as(x)


def repeat_kv(x: torch.Tensor, n_rep: int) -> torch.Tensor:
    b, s, kv, d = x.shape
    if n_rep == 1:
        return x
    return (
        x[:, :, :, None, :].expand(b, s, kv, n_rep, d).reshape(b, s, kv * n_rep, d)
    )


@torch.no_grad()
def oracle_forward(weights: dict, cfg: ModelArgs, tokens: torch.Tensor,
                   start_pos: int, cache_k: list, cache_v: list) -> torch.Tensor:
    """weights: name->bf16 tensor with checkpoint names; caches: per-layer
    [B, max_seq, kv, d] bf16 tensors mutated in place. Returns fp32 logits."""
    B, S = tokens.shape
    H, KV, D = cfg.n_heads, cfg.kv_heads, cfg.head_dim

    x = weights["tok_embeddings.weight"][tokens]
    freqs_cis = precompute_freqs_cis(
        D, 2 * cfg.max_sequence_length, cfg.rope_theta, cfg.use_scaled_rope
    )[start_pos : start_pos + S]

    mask = None
    if S > 1:
        mask = torch.full((S, S), float("-inf"))
        mask = torch.triu(mask, diagonal=1)
        mask = torch.hstack([torch.zeros((S, start_pos)), mask])

    for layer in range(cfg.n_layers):
        w = lambda name: weights[f"layers.{layer}.{name}.weight"]
        h = rms_norm(x, w("attention_norm"), cfg.norm_eps)
        q = (h @ w("attention.wq").t()).view(B, S, H, D)
        k = (h @ w("attention.wk").t()).view(B, S, KV, D)
        v = (h @ w("attention.wv").t()).view(B, S, KV, D)
        q = apply_rotary_emb(q, freqs_cis)
        k = apply_rotary_emb(k, freqs_cis)
        cache_k[layer][:, start_pos : start_pos + S] = k
        cache_v[layer][:, start_pos : start_pos + S] = v
        keys = repeat_kv(cache_k[layer][:, : start_pos + S], cfg.n_rep)
        vals = repeat_kv(cache_v[layer][:, : start_pos + S], cfg.n_rep)
        qh = q.transpose(1, 2)                      # [B,H,S,D]
        kh = keys.transpose(1, 2)
        vh = vals.transpose(1, 2)
        scores = qh @ kh.transpose(2, 3) / math.sqrt(D)
        if mask is not None:
            scores = scores + mask
        scores = torch.softmax(scores.float(), dim=-1).type_as(qh)
        att = (scores @ vh).transpose(1, 2).reshape(B, S, H * D)
        x = x + att @ w("attention.wo").t()
        h2 = rms_norm(x, w("ffn_norm"), cfg.norm_eps)
        gate = torch.nn.functional.silu(h2 @ w("feed_forward.w1").t())
        up = h2 @ w("feed_forward.w3").t()
        x = x + (gate * up) @ w("feed_forward.w2").t()

    x = rms_norm(x, weights["norm.weight"], cfg.norm_eps)
    return (x @ weights["output.weight"].t()).float()
