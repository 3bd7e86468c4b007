"""Model forward-pass tests against the independent torch oracle, plus
prefill/decode-consistency and cache invariants.

This is the tiny-config stand-in for the reference's golden "simulated" test
(reference: src/model/llamatransformer_simulated_test.go) which needs the real
16 GB weights; same idea — frozen external ground truth at bf16 tolerances —
but runnable in CI.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from llama_nuts_and_bolts_tpu.io.params import ModelArgs
from llama_nuts_and_bolts_tpu.models.llama import (
    build_params_from_checkpoint,
    forward,
    init_random_params,
    precompute_rope_tables,
)
from llama_nuts_and_bolts_tpu.models.llama.model import KVCache
from llama_nuts_and_bolts_tpu.models.llama.loader import (
    CheckpointShapeError,
    expected_tensor_shapes,
    validate_checkpoint,
)
from llama_nuts_and_bolts_tpu.io.torch_ckpt import HostTensor, bfloat16

from tests import torch_oracle

# single jitted entry point reused by every test: same shapes hit the
# executable cache instead of re-tracing the scan eagerly each call
FWD = jax.jit(forward, static_argnums=(1,))

TINY = ModelArgs(
    dim=64, n_layers=3, n_heads=4, n_kv_heads=2, vocab_size=96,
    multiple_of=32, ffn_dim_multiplier=1.3, norm_eps=1e-5,
    rope_theta=500000.0, use_scaled_rope=True, max_sequence_length=64,
)


def make_torch_weights(cfg: ModelArgs, seed=0):
    torch.manual_seed(seed)
    weights = {}
    for name, shape in expected_tensor_shapes(cfg).items():
        if name.endswith("norm.weight") and len(shape) == 1:
            base = 1.0 + 0.1 * torch.randn(shape)
            weights[name] = base.to(torch.bfloat16)
        else:
            weights[name] = (torch.randn(shape) / (cfg.dim ** 0.5)).to(torch.bfloat16)
    return weights


def to_host_tensors(weights):
    out = {}
    for name, t in weights.items():
        arr = t.view(torch.uint16).numpy().view(bfloat16)
        out[name] = HostTensor(name=name, shape=tuple(t.shape),
                               stride=tuple(t.stride()), dtype=bfloat16, array=arr)
    return out


@pytest.fixture(scope="module")
def tiny_model():
    weights = make_torch_weights(TINY)
    params = build_params_from_checkpoint(to_host_tensors(weights), TINY)
    return weights, params


# ---------------------------------------------------------------- RoPE


def test_rope_tables_match_meta_formula():
    cos, sin = precompute_rope_tables(64, 128, 500000.0, use_scaled=True)
    cis = torch_oracle.precompute_freqs_cis(64, 128, 500000.0, True)
    np.testing.assert_allclose(cos, cis.real.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(sin, cis.imag.numpy(), rtol=1e-5, atol=1e-6)


def test_rope_scaling_bands():
    # unscaled vs scaled: highest-frequency components untouched, lowest
    # divided by 8 (reference: src/model/llamatransformer.go:662-692)
    from llama_nuts_and_bolts_tpu.models.llama.rope import _scale_freqs

    dim = 128
    freqs = 1.0 / (500000.0 ** (np.arange(0, dim, 2, dtype=np.float64) / dim))
    scaled = _scale_freqs(freqs)
    wavelen = 2 * np.pi / freqs
    hi_band = wavelen < 8192 / 4
    lo_band = wavelen > 8192 / 1
    assert hi_band.any() and lo_band.any()
    np.testing.assert_allclose(scaled[hi_band], freqs[hi_band], rtol=1e-12)
    np.testing.assert_allclose(scaled[lo_band], freqs[lo_band] / 8.0, rtol=1e-12)
    mid = ~hi_band & ~lo_band
    assert ((scaled[mid] > freqs[mid] / 8.0) & (scaled[mid] < freqs[mid])).all()


def test_apply_rope_matches_complex_multiply():
    from llama_nuts_and_bolts_tpu.models.llama.rope import apply_rope

    torch.manual_seed(1)
    x = torch.randn(2, 5, 4, 16).to(torch.bfloat16)
    cis = torch_oracle.precompute_freqs_cis(16, 16, 500000.0, False)[2:7]
    ref = torch_oracle.apply_rotary_emb(x, cis).float().numpy()

    cos, sin = precompute_rope_tables(16, 16, 500000.0, False)
    xj = jnp.asarray(x.view(torch.uint16).numpy().view(bfloat16))
    # jit: eager bf16 op dispatch interleaved with torch ops stalls for
    # minutes on this host (thread-pool interaction); one compiled call avoids it
    got = jax.jit(apply_rope)(xj, jnp.asarray(cos[2:7]), jnp.asarray(sin[2:7]))
    np.testing.assert_allclose(
        np.asarray(got, dtype=np.float32), ref, rtol=2e-2, atol=2e-2
    )


# ------------------------------------------------------- forward parity


def test_prefill_logits_match_oracle(tiny_model):
    weights, params = tiny_model
    tokens = np.array([[5, 17, 42, 7, 77, 3, 9, 24]], dtype=np.int32)
    B, S = tokens.shape
    T = 32

    cache_k = [torch.zeros(B, T, TINY.kv_heads, TINY.head_dim, dtype=torch.bfloat16)
               for _ in range(TINY.n_layers)]
    cache_v = [torch.zeros_like(cache_k[0]) for _ in range(TINY.n_layers)]
    ref = torch_oracle.oracle_forward(
        weights, TINY, torch.from_numpy(tokens).long(), 0, cache_k, cache_v
    ).numpy()

    cache = KVCache.create(TINY, B, T)
    logits, cache = FWD(params, TINY, jnp.asarray(tokens), 0, cache)
    got = np.asarray(logits)

    assert got.shape == (B, S, TINY.vocab_size)
    assert got.dtype == np.float32
    np.testing.assert_allclose(got, ref, rtol=5e-2, atol=8e-2)
    # greedy-token parity where the argmax is decisive (random weights make
    # near-ties common; a trained model's margins are far larger)
    top2 = np.sort(ref, axis=-1)[..., -2:]
    decisive = (top2[..., 1] - top2[..., 0]) > 0.15
    np.testing.assert_array_equal(
        got.argmax(-1)[decisive], ref.argmax(-1)[decisive])
    # cache contents match too; atol covers cancellation in the RoPE rotation
    # (re·cos − im·sin with near-equal terms) amplifying 1-ulp bf16 input
    # differences from matmul accumulation order
    for l in range(TINY.n_layers):
        np.testing.assert_allclose(
            np.asarray(cache.k[l], dtype=np.float32)[:, :, :S],  # [B,KV,T,D]
            cache_k[l].float().numpy()[:, :S].transpose(0, 2, 1, 3),
            rtol=3e-2, atol=6e-2,
        )


def test_decode_steps_match_oracle(tiny_model):
    weights, params = tiny_model
    prompt = np.array([[5, 17, 42, 7]], dtype=np.int32)
    B, S = prompt.shape
    T = 32
    n_steps = 6

    cache_k = [torch.zeros(B, T, TINY.kv_heads, TINY.head_dim, dtype=torch.bfloat16)
               for _ in range(TINY.n_layers)]
    cache_v = [torch.zeros_like(cache_k[0]) for _ in range(TINY.n_layers)]
    cache = KVCache.create(TINY, B, T)

    ref_logits = torch_oracle.oracle_forward(
        weights, TINY, torch.from_numpy(prompt).long(), 0, cache_k, cache_v)
    logits, cache = FWD(params, TINY, jnp.asarray(prompt), 0, cache)

    def check_step(ref_l, got_l, pos):
        ref_v = ref_l[0, -1].numpy()
        got_v = np.asarray(got_l)[0, -1]
        np.testing.assert_allclose(got_v, ref_v, rtol=5e-2, atol=8e-2,
                                   err_msg=f"logits at position {pos}")
        top2 = np.sort(ref_v)[-2:]
        if top2[1] - top2[0] > 0.15:  # decisive argmax must agree
            assert int(got_v.argmax()) == int(ref_v.argmax()), f"pos {pos}"
        return int(ref_v.argmax())  # teacher-force the oracle's choice

    next_tok = check_step(ref_logits, logits, S - 1)
    pos = S
    for _ in range(n_steps):
        step = np.array([[next_tok]], dtype=np.int32)
        ref_logits = torch_oracle.oracle_forward(
            weights, TINY, torch.from_numpy(step).long(), pos, cache_k, cache_v)
        logits, cache = FWD(params, TINY, jnp.asarray(step), pos, cache)
        next_tok = check_step(ref_logits, logits, pos)
        pos += 1


def test_prefill_then_decode_equals_full_prefill(tiny_model):
    """KV-cache correctness: token-by-token decode after a short prefill must
    produce the same last-position logits as prefilling the whole sequence."""
    _, params = tiny_model
    full = np.array([[5, 17, 42, 7, 77, 3]], dtype=np.int32)
    T = 32

    cache_a = KVCache.create(TINY, 1, T)
    logits_full, _ = FWD(params, TINY, jnp.asarray(full), 0, cache_a)

    cache_b = KVCache.create(TINY, 1, T)
    _, cache_b = FWD(params, TINY, jnp.asarray(full[:, :3]), 0, cache_b)
    logits_inc = None
    for pos in range(3, full.shape[1]):
        logits_inc, cache_b = FWD(
            params, TINY, jnp.asarray(full[:, pos : pos + 1]), pos, cache_b)

    np.testing.assert_allclose(
        np.asarray(logits_inc)[0, -1], np.asarray(logits_full)[0, -1],
        rtol=2e-2, atol=5e-2,
    )


def test_forward_is_jittable_and_deterministic(tiny_model):
    _, params = tiny_model
    import functools

    jitted = jax.jit(functools.partial(forward, cfg=TINY),
                     static_argnames=())
    tokens = jnp.asarray([[1, 2, 3]], dtype=jnp.int32)
    cache = KVCache.create(TINY, 1, 16)
    a, _ = jitted(params, tokens=tokens, start_pos=0, cache=cache)
    b, _ = jitted(params, tokens=tokens, start_pos=0, cache=KVCache.create(TINY, 1, 16))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_batched_forward_matches_single(tiny_model):
    _, params = tiny_model
    t1 = np.array([[5, 17, 42]], dtype=np.int32)
    t2 = np.array([[9, 11, 13]], dtype=np.int32)
    batch = np.concatenate([t1, t2])

    la, _ = FWD(params, TINY, jnp.asarray(t1), 0, KVCache.create(TINY, 1, 32))
    lb, _ = FWD(params, TINY, jnp.asarray(t2), 0, KVCache.create(TINY, 1, 32))
    lab, _ = FWD(params, TINY, jnp.asarray(batch), 0, KVCache.create(TINY, 2, 32))
    np.testing.assert_allclose(np.asarray(lab)[0], np.asarray(la)[0], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(lab)[1], np.asarray(lb)[0], rtol=1e-5, atol=1e-5)


# ------------------------------------------------------------ validation


def test_validate_checkpoint_catches_bad_shape(tiny_model):
    weights, _ = tiny_model
    tensors = to_host_tensors(weights)
    bad = tensors["layers.0.attention.wq.weight"]
    tensors["layers.0.attention.wq.weight"] = HostTensor(
        name=bad.name, shape=(1, 2), stride=(2, 1), dtype=bad.dtype,
        array=bad.array.reshape(-1)[:2].reshape(1, 2))
    with pytest.raises(CheckpointShapeError):
        validate_checkpoint(tensors, TINY)


def test_validate_checkpoint_catches_missing(tiny_model):
    weights, _ = tiny_model
    tensors = to_host_tensors(weights)
    del tensors["norm.weight"]
    with pytest.raises(CheckpointShapeError):
        validate_checkpoint(tensors, TINY)


def test_expected_shapes_8b_inventory():
    cfg = ModelArgs(n_kv_heads=8, vocab_size=128256, ffn_dim_multiplier=1.3,
                    multiple_of=1024, use_scaled_rope=True)
    shapes = expected_tensor_shapes(cfg)
    assert len(shapes) == 291
    assert shapes["layers.31.feed_forward.w1.weight"] == (14336, 4096)
    assert shapes["layers.0.attention.wk.weight"] == (1024, 4096)


def test_init_random_params_shapes():
    params = init_random_params(TINY, jax.random.PRNGKey(0))
    assert params.tok_embeddings.shape == (TINY.vocab_size, TINY.dim)
    assert params.layers["wq"].shape == (TINY.n_layers, TINY.dim, TINY.dim)
    assert params.rope_cos.shape == (2 * TINY.max_sequence_length, TINY.head_dim // 2)


def test_tied_embeddings_checkpoint_loads(tiny_model):
    """Llama-3.2-style checkpoints ship no output.weight: the head ties to
    the token embedding. Logits must equal an explicit-tied checkpoint's."""
    weights, _ = tiny_model
    import torch

    tied = {k: v for k, v in weights.items() if k != "output.weight"}
    tensors = to_host_tensors(tied)
    validate_checkpoint(tensors, TINY)           # no error without the head
    params = build_params_from_checkpoint(tensors, TINY)

    explicit = dict(weights)
    explicit["output.weight"] = weights["tok_embeddings.weight"]
    params_ref = build_params_from_checkpoint(to_host_tensors(explicit), TINY)

    toks = jnp.asarray([[1, 5, 9]], jnp.int32)
    cache = KVCache.create(TINY, 1, 16)
    logits, _ = jax.jit(forward, static_argnums=(1,))(params, TINY, toks, 0, cache)
    cache2 = KVCache.create(TINY, 1, 16)
    ref, _ = jax.jit(forward, static_argnums=(1,))(params_ref, TINY, toks, 0, cache2)
    np.testing.assert_array_equal(np.asarray(logits), np.asarray(ref))


def test_model_type_covers_llama32():
    assert ModelArgs(n_layers=16).model_type == "Llama-3.2-1B"
    assert ModelArgs(n_layers=28).model_type == "Llama-3.2-3B"


def test_fused_decode_layout_matches_canonical():
    """The decode-optimized fused layout (wqkv + w_gate_up, [in,out] weights,
    transposed head) must reproduce the canonical forward exactly up to
    matmul-order ULPs: same argmax tokens, logits within bf16 tolerance."""
    from llama_nuts_and_bolts_tpu.models.llama import fuse_decode_params

    params = jax.jit(init_random_params, static_argnums=(0,))(TINY, jax.random.PRNGKey(11))
    fparams = fuse_decode_params(params)
    assert "wqkv" in fparams.layers and "wq" not in fparams.layers

    # exact-math check: with fp32 weights the two layouts are the same
    # computation and must agree to float noise
    p32 = init_random_params(TINY, jax.random.PRNGKey(11), dtype=jnp.float32)
    f32p = fuse_decode_params(p32)
    tokens = jnp.asarray([[3, 1, 4, 1, 5]], dtype=jnp.int32)
    a32, c32a = forward(p32, TINY, tokens, 0, KVCache.create(TINY, 1, 16, dtype=jnp.float32))
    b32, c32b = forward(f32p, TINY, tokens, 0, KVCache.create(TINY, 1, 16, dtype=jnp.float32))
    np.testing.assert_allclose(np.asarray(a32), np.asarray(b32), atol=1e-4)
    np.testing.assert_allclose(np.asarray(c32a.k), np.asarray(c32b.k), atol=1e-5)

    # bf16 path: matmul-order rounding drifts a few ULPs per layer; the
    # parity bar is the greedy tokens plus loose logit tolerance
    ref_logits, ref_cache = forward(params, TINY, tokens, 0, KVCache.create(TINY, 1, 16))
    got_logits, got_cache = forward(fparams, TINY, tokens, 0, KVCache.create(TINY, 1, 16))
    np.testing.assert_allclose(np.asarray(got_logits), np.asarray(ref_logits),
                               atol=5e-2, rtol=5e-2)
    np.testing.assert_array_equal(np.asarray(got_logits).argmax(-1),
                                  np.asarray(ref_logits).argmax(-1))


    # decode step parity on the produced caches
    step = jnp.asarray([[7]], dtype=jnp.int32)
    ref2, _ = forward(params, TINY, step, 5, ref_cache)
    got2, _ = forward(fparams, TINY, step, 5, got_cache)
    np.testing.assert_array_equal(np.asarray(got2).argmax(-1),
                                  np.asarray(ref2).argmax(-1))

    # random init can generate the fused layout directly
    direct = init_random_params(TINY, jax.random.PRNGKey(11), fused=True)
    assert direct.layers["wqkv"].shape == fparams.layers["wqkv"].shape
    assert direct.output.shape == (TINY.dim, TINY.vocab_size)


def test_loader_fused_matches_device_fused(tiny_model):
    """Host-side fused assembly (loader fused=True) must equal the
    device-side fuse_decode_params transform of the canonical load."""
    from llama_nuts_and_bolts_tpu.models.llama import fuse_decode_params

    weights, params = tiny_model
    loaded = build_params_from_checkpoint(to_host_tensors(weights), TINY, fused=True)
    fused = fuse_decode_params(params)
    for k in fused.layers:
        np.testing.assert_array_equal(
            np.asarray(loaded.layers[k], np.float32),
            np.asarray(fused.layers[k], np.float32), err_msg=k)
    np.testing.assert_array_equal(np.asarray(loaded.output, np.float32),
                                  np.asarray(fused.output, np.float32))

    with pytest.raises(ValueError):
        build_params_from_checkpoint(to_host_tensors(weights), TINY,
                                     fused=True, quant="int8")


def test_rope_scale_factor_from_params_json(tmp_path):
    """Llama-3.2 checkpoints ship rope_scaling_factor=32 in params.json;
    absent keys keep the 3.1 constants (factor 8, high-freq 4)."""
    import json

    from llama_nuts_and_bolts_tpu.io.params import load_model_args

    base = {"dim": 2048, "n_layers": 16, "n_heads": 32, "n_kv_heads": 8,
            "vocab_size": 128256, "norm_eps": 1e-5, "rope_theta": 500000.0,
            "use_scaled_rope": True}
    p31 = tmp_path / "p31.json"
    p31.write_text(json.dumps(base))
    cfg31 = load_model_args(str(p31))
    assert cfg31.rope_scale_factor == 8.0 and cfg31.rope_high_freq_factor == 4.0

    p32 = tmp_path / "p32.json"
    p32.write_text(json.dumps({**base, "rope_scaling_factor": 32,
                               "high_freq_factor": 4}))
    cfg32 = load_model_args(str(p32))
    assert cfg32.rope_scale_factor == 32.0

    # the factor actually changes the low-frequency table entries
    c8, _ = precompute_rope_tables(64, 32, 500000.0, True, 8.0, 4.0)
    c32, _ = precompute_rope_tables(64, 32, 500000.0, True, 32.0, 4.0)
    assert not np.allclose(c8, c32)
    # the high-frequency (short wavelength) entries are untouched by design
    np.testing.assert_allclose(c8[:, 0], c32[:, 0])

    # and matches the Meta formula evaluated with scale 32
    cis = torch_oracle.precompute_freqs_cis(64, 32, 500000.0, True,
                                            scale_factor=32.0)
    np.testing.assert_allclose(c32, cis.real.numpy(), rtol=1e-5, atol=1e-6)
