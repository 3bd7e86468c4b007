"""CLI menu + argument parsing unit tests with scripted stdin."""

import builtins
import io


from llama_nuts_and_bolts_tpu.cli.main import (
    PREDEFINED_PROMPTS,
    ask_user_prompt_choice,
    parse_args,
)
from llama_nuts_and_bolts_tpu.models.llama.loader import LoadedModel
from llama_nuts_and_bolts_tpu.io.params import ModelArgs


def fake_model():
    return LoadedModel(params=None, cfg=ModelArgs(n_layers=2, vocab_size=64),
                       vocab=None, mergeable_ranks={}, tensor_meta={})


def drive_menu(monkeypatch, inputs):
    it = iter(inputs)
    monkeypatch.setattr(builtins, "input", lambda *a: next(it))
    out = io.StringIO()
    return ask_user_prompt_choice(fake_model(), out=out), out.getvalue()


def test_menu_predefined_choice(monkeypatch):
    choice, screen = drive_menu(monkeypatch, ["3"])
    assert choice is PREDEFINED_PROMPTS[2]
    assert "Select from our predefined prompts" in screen


def test_menu_invalid_then_valid(monkeypatch):
    choice, screen = drive_menu(monkeypatch, ["abc", "99", "1"])
    assert choice is PREDEFINED_PROMPTS[0]
    assert "Not a valid number" in screen
    assert "Choice must be between" in screen


def test_menu_metadata_then_choice(monkeypatch):
    choice, screen = drive_menu(monkeypatch, ["0", "2"])
    assert "Model Metadata" in screen
    assert choice is PREDEFINED_PROMPTS[1]


def test_menu_manual_chat(monkeypatch):
    choice, _ = drive_menu(monkeypatch, ["8", "be brief", "what is 2+2?"])
    assert choice.is_chat_mode and choice.system_prompt == "be brief"
    assert choice.prompt == "what is 2+2?"


def test_menu_manual_completion_rejects_empty(monkeypatch):
    choice, screen = drive_menu(monkeypatch, ["7", "", "7", "hello"])
    assert not choice.is_chat_mode and choice.prompt == "hello"
    assert "prompt you entered is empty" in screen


def test_parse_args_defaults():
    args = parse_args([])
    assert args.seq_len == 200 and args.quant == "none" and not args.tiny
    args = parse_args(["--tiny", "--quant", "int8", "--prompt", "3"])
    assert args.tiny and args.quant == "int8" and args.prompt == 3
    assert args.speculate == 0
    args = parse_args(["--quant", "int4", "--speculate", "4"])
    assert args.quant == "int4" and args.speculate == 4


def test_capture_parity_harness_on_tiny_model():
    """The parity-capture harness end-to-end on the synthetic tiny model:
    tokenizes all six predefined prompts (byte-fallback vocab), generates
    greedily, and returns well-formed golden records."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from capture_parity import capture_with_engine

    import jax

    from llama_nuts_and_bolts_tpu.io.params import ModelArgs
    from llama_nuts_and_bolts_tpu.models.llama import init_random_params
    from llama_nuts_and_bolts_tpu.models.llama.loader import LoadedModel
    from llama_nuts_and_bolts_tpu.runtime import InferenceArgs, InferenceEngine
    from tests.test_streaming import RANKS, VOCAB

    # the synthetic byte-level vocab inflates the chat prompts (~140 tokens),
    # so this engine needs a longer context than the other tiny fixtures
    cfg = ModelArgs(dim=32, n_layers=2, n_heads=4, n_kv_heads=2,
                    vocab_size=VOCAB.size, multiple_of=16, norm_eps=1e-5,
                    max_sequence_length=256)
    params = jax.jit(init_random_params, static_argnums=(0,))(cfg, jax.random.PRNGKey(0))
    engine = InferenceEngine(
        LoadedModel(params=params, cfg=cfg, vocab=VOCAB,
                    mergeable_ranks=RANKS, tensor_meta={}),
        InferenceArgs(sequence_length=200))
    out = capture_with_engine(engine, label="tiny")
    assert len(out["prompts"]) == 6
    for rec in out["prompts"]:
        assert rec["prompt_tokens"] and isinstance(rec["generated"], list)
        assert rec["finish_state"] in ("FINISHED_BY_REACHING_EOS",
                                       "FINISHED_BY_REACHING_SEQ_LEN")
