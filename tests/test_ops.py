"""Op-level golden tests (the reference's §4.1 tier): each op checked against
an independent numpy computation, plus sampling-filter semantics."""

import numpy as np

import jax
import jax.numpy as jnp

from llama_nuts_and_bolts_tpu.models.llama.model import attention_mask
from llama_nuts_and_bolts_tpu.ops import gqa_attention, greedy, linear, rms_norm, swiglu
from llama_nuts_and_bolts_tpu.ops.sampling import sample_token


def test_linear_matches_numpy():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 5, 16), dtype=np.float32)
    w = rng.standard_normal((8, 16), dtype=np.float32)
    got = np.asarray(jax.jit(lambda x, w: linear(x, w, out_dtype=jnp.float32))(x, w))
    np.testing.assert_allclose(got, x @ w.T, rtol=1e-5, atol=1e-5)


def test_rms_norm_matches_formula():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((3, 8), dtype=np.float32)
    w = rng.standard_normal(8, dtype=np.float32)
    eps = 1e-5
    got = np.asarray(jax.jit(lambda x, w: rms_norm(x, w, eps))(x, w))
    ref = x / np.sqrt((x ** 2).mean(-1, keepdims=True) + eps) * w
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_swiglu_matches_formula():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 16), dtype=np.float32)
    wg = rng.standard_normal((24, 16), dtype=np.float32)
    wu = rng.standard_normal((24, 16), dtype=np.float32)
    wd = rng.standard_normal((16, 24), dtype=np.float32)
    got = np.asarray(jax.jit(swiglu)(x, wg, wu, wd))
    g = x @ wg.T
    silu = g / (1 + np.exp(-g))
    ref = (silu * (x @ wu.T)) @ wd.T
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_gqa_attention_matches_numpy():
    rng = np.random.default_rng(3)
    B, S, H, KV, D, T = 1, 4, 4, 2, 8, 6
    q = rng.standard_normal((B, S, H, D), dtype=np.float32)
    k = rng.standard_normal((B, KV, T, D), dtype=np.float32)
    v = rng.standard_normal((B, KV, T, D), dtype=np.float32)
    mask = np.asarray(attention_mask(S, T, 1))[None]

    got = np.asarray(jax.jit(gqa_attention)(q, k, v, jnp.asarray(mask)))

    # independent numpy attention WITH materialized repeat-KV
    G = H // KV
    kr = np.repeat(k, G, axis=1)         # [B, H, T, D]
    vr = np.repeat(v, G, axis=1)
    qh = q.transpose(0, 2, 1, 3)         # [B, H, S, D]
    scores = qh @ kr.transpose(0, 1, 3, 2) / np.sqrt(D) + mask[:, None]
    scores = np.exp(scores - scores.max(-1, keepdims=True))
    probs = scores / scores.sum(-1, keepdims=True)
    ref = (probs @ vr).transpose(0, 2, 1, 3)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_attention_mask_semantics():
    m = np.asarray(attention_mask(3, 5, 1))
    visible = m == 0
    # row s sees cols <= start_pos + s
    expected = np.array([[1, 1, 0, 0, 0],
                         [1, 1, 1, 0, 0],
                         [1, 1, 1, 1, 0]], dtype=bool)
    np.testing.assert_array_equal(visible, expected)
    assert np.isneginf(m[~expected]).all()


def test_greedy_ties_take_lowest_index():
    logits = jnp.asarray([[1.0, 3.0, 3.0, 2.0]])
    assert int(greedy(logits)[0]) == 1


def test_top_k_filter():
    logits = jnp.asarray([0.1, 5.0, 4.0, 3.0, 0.2])
    counts = np.zeros(5)
    for i in range(50):
        t = int(sample_token(logits, jax.random.PRNGKey(i), temperature=1.0, top_k=2))
        counts[t] += 1
    assert counts[[0, 3, 4]].sum() == 0          # only the top-2 survive
    assert counts[1] > 0


def test_top_p_filter():
    # p(1)≈0.88 alone exceeds top_p=0.5: nucleus = {1}
    logits = jnp.asarray([0.0, 4.0, 2.0, 1.0])
    for i in range(30):
        t = int(sample_token(logits, jax.random.PRNGKey(i), temperature=1.0, top_p=0.5))
        assert t == 1


def test_temperature_zero_is_greedy():
    logits = jnp.asarray([[0.3, 0.9, 0.1]])
    assert int(sample_token(logits, jax.random.PRNGKey(0), temperature=0.0)[0]) == 1
