"""Golden-parity tests against the real Meta-Llama-3.1-8B-Instruct files —
skipped when the 16 GB model directory is absent (reference: the "simulated"
test suite, src/model/llamatransformer_simulated_test.go).

The layer-0-only continuation is the reference's published ground truth
(BASELINE.md): greedy decode of the golden chat prompt through a model built
from ONLY layer 0 + final norm + output head must produce the exact token
sequence [114545, 80657, 20508, 21053, 71434].
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from llama_nuts_and_bolts_tpu.io.params import load_model_args
from llama_nuts_and_bolts_tpu.io.torch_ckpt import load_torch_checkpoint
from llama_nuts_and_bolts_tpu.models.llama import build_params_from_checkpoint, forward
from llama_nuts_and_bolts_tpu.models.llama.model import KVCache

GOLDEN_PROMPT_IDS = [128000, 128006, 882, 128007, 271, 3923, 374, 701, 836, 30,
                     128009, 128006, 78191, 128007, 271]
GOLDEN_LAYER0_CONTINUATION = [114545, 80657, 20508, 21053, 71434]


@pytest.fixture(scope="module")
def layer0_model(model_dir):
    cfg = load_model_args(os.path.join(model_dir, "params.json"))
    cfg = cfg.with_(n_layers=1, vocab_size=128256)
    tensors = load_torch_checkpoint(os.path.join(model_dir, "consolidated.00.pth"))
    params = build_params_from_checkpoint(tensors, cfg)
    return params, cfg


def test_layer0_golden_continuation(layer0_model):
    params, cfg = layer0_model
    fwd = jax.jit(forward, static_argnums=(1,), donate_argnums=(4,))
    cache = KVCache.create(cfg, 1, 32)
    tokens = jnp.asarray([GOLDEN_PROMPT_IDS], dtype=jnp.int32)
    logits, cache = fwd(params, cfg, tokens, 0, cache)
    tok = int(np.asarray(logits)[0, -1].argmax())
    out = [tok]
    pos = len(GOLDEN_PROMPT_IDS)
    for _ in range(len(GOLDEN_LAYER0_CONTINUATION) - 1):
        logits, cache = fwd(params, cfg, jnp.asarray([[tok]], dtype=jnp.int32),
                            pos, cache)
        tok = int(np.asarray(logits)[0, -1].argmax())
        out.append(tok)
        pos += 1
    assert out == GOLDEN_LAYER0_CONTINUATION


# ---------------------------------------------------------------------------
# Per-stage layer-0 golden tensors (reference:
# src/model/llamatransformer_simulated_test.go:20-1310): every intermediate
# of layer 0 on the golden chat prompt is asserted against values frozen from
# Meta's PyTorch implementation, at the reference's tolerance bands
# (src/common/utils.go:13-17 with the simulated test's per-stage multipliers).
# A divergence is thereby localized to one stage, not just "logits differ".

from llama_nuts_and_bolts_tpu.models.llama.model import attention_mask
from llama_nuts_and_bolts_tpu.models.llama.rope import apply_rope
from llama_nuts_and_bolts_tpu.ops import linear, rms_norm, swiglu
from llama_nuts_and_bolts_tpu.utils.testing import compare_tensor

from tests.golden_layer0 import GOLDEN, NEG_INF, NEXT_TOKEN, THRESHOLDS


def _check(stage: str, actual) -> None:
    spec = GOLDEN[stage]
    actual = np.asarray(actual, dtype=np.float64)
    assert list(actual.shape) == spec["size"], (
        f"{stage}: shape {actual.shape} != {spec['size']}")
    expected = np.asarray(spec["values"], dtype=np.float64)
    # the Go goldens encode -Inf as the NEG_INF sentinel
    actual = np.where(np.isneginf(actual), NEG_INF, actual)
    try:
        compare_tensor(actual, expected, dtype="float32",
                       tolerance_multiplier=(
                           THRESHOLDS[spec["base"]] / 1e-3) * spec["mult"],
                       shortened=spec["shortened"])
    except AssertionError as exc:
        raise AssertionError(f"layer-0 stage {stage!r} diverges: {exc}") from exc


def test_layer0_per_stage_golden_tensors(layer0_model):
    params, cfg = layer0_model
    eps = cfg.norm_eps
    S, H, KV, D = len(GOLDEN_PROMPT_IDS), cfg.n_heads, cfg.kv_heads, cfg.head_dim
    w = {k: v[0] for k, v in params.layers.items()}    # layer 0 slices

    tokens = jnp.asarray(GOLDEN_PROMPT_IDS, dtype=jnp.int32)
    x = jnp.take(params.tok_embeddings, tokens, axis=0)          # [S,dim] bf16
    _check("input_tensor", x)

    mask = attention_mask(S, S, 0)
    _check("mask", mask)

    xf = x.astype(jnp.float32)
    part = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    _check("attn_norm_part", part.astype(jnp.bfloat16))

    normed = rms_norm(x, w["attn_norm"], eps)
    _check("attn_normalized_x", normed)

    xq = linear(normed, w["wq"])
    xk = linear(normed, w["wk"])
    xv = linear(normed, w["wv"])
    _check("xq", xq), _check("xk", xk), _check("xv", xv)

    xq = xq.reshape(S, H, D)
    xk = xk.reshape(S, KV, D)
    xv = xv.reshape(S, KV, D)
    _check("xq_rs", xq), _check("xk_rs", xk), _check("xv_rs", xv)

    cos = params.rope_cos[:S]
    sin = params.rope_sin[:S]
    xq = apply_rope(xq[None], cos, sin)[0]
    xk = apply_rope(xk[None], cos, sin)[0]
    _check("xq_rotary", xq), _check("xk_rotary", xk)

    # the reference materializes repeat-KV (llamatransformer.go:529-559); we
    # never do in the model — the expansion here is only to compare values
    keys = jnp.repeat(xk, H // KV, axis=1)                        # [S,H,D]
    values = jnp.repeat(xv, H // KV, axis=1)
    _check("keys_rep", keys), _check("values_rep", values)

    qt = xq.transpose(1, 0, 2)                                    # [H,S,D]
    kt = keys.transpose(1, 0, 2)
    vt = values.transpose(1, 0, 2)
    kt2 = kt.transpose(0, 2, 1)                                   # [H,D,S]
    _check("xq_transpose", qt)
    _check("keys_transpose_dims0_1", kt)
    _check("values_transpose", vt)
    _check("keys_transpose_dims1_2", kt2)

    scores = jnp.einsum("hsd,hdt->hst", qt, kt2,
                        preferred_element_type=jnp.float32)
    scores = (scores / jnp.sqrt(float(D))).astype(jnp.bfloat16)
    _check("scores", scores)

    scores = (scores.astype(jnp.float32) + mask).astype(jnp.bfloat16)
    _check("scores_plus_mask", scores)

    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    probs = probs.astype(jnp.bfloat16)
    _check("scores_softmax", probs)

    att = jnp.einsum("hst,htd->hsd", probs, vt,
                     preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    att = att.transpose(1, 0, 2).reshape(S, H * D)
    _check("output_before_weights", att)

    att_out = linear(att, w["wo"])
    _check("output_after_weights", att_out)

    h = x + att_out
    _check("h_before_feedforward", h)

    out = h + swiglu(rms_norm(h, w["ffn_norm"], eps),
                     w["w_gate"], w["w_up"], w["w_down"])
    _check("block_output", out)

    # full layer-0 forward through the production path: logits parity
    cache = KVCache.create(cfg, 1, 32)
    logits, _ = forward(params, cfg, tokens[None], 0, cache)
    _check("logits", logits[0])
    _check("logits_last_row", logits[:, -1])
    assert int(np.asarray(logits)[0, -1].argmax()) == NEXT_TOKEN


def test_predefined_prompt_goldens(model_dir):
    """BASELINE criterion #1 as one command: scripts/capture_parity.py writes
    tests/goldens/predefined_prompts.json; this replays the six predefined
    prompts greedily and requires exact-token equality with the stored
    goldens (which the harness README explains how to cross-generate from
    the Go reference)."""
    import json

    goldens_path = os.path.join(os.path.dirname(__file__), "goldens",
                                "predefined_prompts.json")
    if not os.path.exists(goldens_path):
        pytest.skip("run scripts/capture_parity.py first to record goldens")
    with open(goldens_path) as f:
        goldens = json.load(f)

    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from capture_parity import capture

    got = capture(model_dir, seq_len=goldens["seq_len"])
    for exp, act in zip(goldens["prompts"], got["prompts"]):
        assert act["prompt_tokens"] == exp["prompt_tokens"], exp["index"]
        assert act["generated"] == exp["generated"], (
            f"prompt {exp['index']} diverged: {act['text']!r} vs {exp['text']!r}")


def _validate_against_schema(data, schema, path="$"):
    """Minimal JSON-Schema (draft-07 subset) validator — the jsonschema
    package isn't in this environment; covers type/required/items/enum/
    min-max bounds, which is everything predefined_prompts.schema.json uses."""
    t = schema.get("type")
    type_map = {"object": dict, "array": list, "string": str,
                "integer": int, "boolean": bool}
    if t is not None:
        assert isinstance(data, type_map[t]), f"{path}: expected {t}"
        if t == "integer":
            assert not isinstance(data, bool), f"{path}: bool is not integer"
    if "enum" in schema:
        assert data in schema["enum"], f"{path}: {data!r} not in enum"
    if t == "integer":
        if "minimum" in schema:
            assert data >= schema["minimum"], f"{path}: below minimum"
        if "maximum" in schema:
            assert data <= schema["maximum"], f"{path}: above maximum"
    if t == "object":
        for key in schema.get("required", []):
            assert key in data, f"{path}: missing required {key!r}"
        for key, sub in schema.get("properties", {}).items():
            if key in data:
                _validate_against_schema(data[key], sub, f"{path}.{key}")
    if t == "array":
        if "minItems" in schema:
            assert len(data) >= schema["minItems"], f"{path}: too few items"
        if "maxItems" in schema:
            assert len(data) <= schema["maxItems"], f"{path}: too many items"
        for i, item in enumerate(data):
            _validate_against_schema(item, schema.get("items", {}),
                                     f"{path}[{i}]")


def test_goldens_schema():
    """The golden-sequence machinery is always validated, weights or not:
    the checked-in schema parses, and capture_parity's OUTPUT SHAPE (driven
    on the tiny synthetic model) conforms to it, so a recorded goldens file
    is guaranteed consumable by test_predefined_prompt_goldens."""
    import json
    import sys

    schema_path = os.path.join(os.path.dirname(__file__), "goldens",
                               "predefined_prompts.schema.json")
    with open(schema_path) as f:
        schema = json.load(f)
    assert schema["required"] == ["model_dir", "seq_len", "prompts"]

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from capture_parity import capture_with_engine, prompt_tokens

    from llama_nuts_and_bolts_tpu.cli.main import PREDEFINED_PROMPTS
    from llama_nuts_and_bolts_tpu.models.llama import init_random_params
    from llama_nuts_and_bolts_tpu.models.llama.loader import LoadedModel
    from llama_nuts_and_bolts_tpu.runtime import InferenceArgs, InferenceEngine
    from tests.test_streaming import RANKS, TINY, VOCAB

    # size the tiny context to the longest predefined prompt (+ a short tail
    # so each capture ends quickly by hitting the sequence cap)
    sizing = InferenceEngine(
        LoadedModel(params=None, cfg=TINY, vocab=VOCAB,
                    mergeable_ranks=RANKS, tensor_meta={}),
        InferenceArgs(sequence_length=16))
    need = max(len(prompt_tokens(sizing, p)) for p in PREDEFINED_PROMPTS) + 6
    cfg = TINY.with_(max_sequence_length=need)
    params = jax.jit(init_random_params, static_argnums=(0,))(
        cfg, jax.random.PRNGKey(0))
    engine = InferenceEngine(
        LoadedModel(params=params, cfg=cfg, vocab=VOCAB,
                    mergeable_ranks=RANKS, tensor_meta={}),
        InferenceArgs(sequence_length=need))
    out = capture_with_engine(engine, label="tiny")
    _validate_against_schema(out, schema)

    goldens_path = os.path.join(os.path.dirname(__file__), "goldens",
                                "predefined_prompts.json")
    if os.path.exists(goldens_path):   # a recorded file must conform too
        with open(goldens_path) as f:
            _validate_against_schema(json.load(f), schema)
