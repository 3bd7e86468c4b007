"""Checkpoint-reader tests: real ``torch.save`` zips read by the from-scratch
reader, validated bit-exactly against ``torch.load``.

This gives the ingest pipeline (zip offsets → pickle VM → memmap aliasing →
tensor rebuild) coverage the reference only gets with the 16 GB model present
(reference: src/torch/torchmodelreader.go, src/torch/types.go).
"""

import json
import os

import numpy as np
import pytest
import torch

from llama_nuts_and_bolts_tpu.io.params import ModelArgs, load_model_args
from llama_nuts_and_bolts_tpu.io.torch_ckpt import bfloat16, load_torch_checkpoint


def _save_state_dict(tmp_path, state):
    path = os.path.join(tmp_path, "consolidated.00.pth")
    torch.save(state, path)
    return path


def _np(t: torch.Tensor) -> np.ndarray:
    if t.dtype == torch.bfloat16:
        return t.view(torch.uint16).numpy().view(bfloat16)
    return t.numpy()


def test_bf16_state_dict_roundtrip(tmp_path):
    torch.manual_seed(0)
    state = {
        "tok_embeddings.weight": torch.randn(32, 16, dtype=torch.bfloat16),
        "layers.0.attention.wq.weight": torch.randn(16, 16, dtype=torch.bfloat16),
        "layers.0.attention_norm.weight": torch.randn(16, dtype=torch.bfloat16),
        "norm.weight": torch.randn(16, dtype=torch.bfloat16),
    }
    path = _save_state_dict(tmp_path, state)
    tensors = load_torch_checkpoint(path)

    assert list(tensors.keys()) == list(state.keys())
    for name, ref in state.items():
        got = tensors[name]
        assert got.name == name
        assert got.shape == tuple(ref.shape)
        assert got.dtype == bfloat16
        np.testing.assert_array_equal(
            got.array.view(np.uint16), _np(ref).view(np.uint16)
        )


def test_mixed_dtypes(tmp_path):
    state = {
        "a_f32": torch.arange(24, dtype=torch.float32).reshape(2, 3, 4),
        "b_i64": torch.arange(10, dtype=torch.int64),
        "c_bf16": torch.linspace(-2, 2, 8, dtype=torch.bfloat16),
    }
    path = _save_state_dict(tmp_path, state)
    tensors = load_torch_checkpoint(path)
    np.testing.assert_array_equal(tensors["a_f32"].array, state["a_f32"].numpy())
    np.testing.assert_array_equal(tensors["b_i64"].array, state["b_i64"].numpy())
    np.testing.assert_array_equal(
        tensors["c_bf16"].array.view(np.uint16), _np(state["c_bf16"]).view(np.uint16)
    )


def test_shared_storage_views(tmp_path):
    base = torch.arange(12, dtype=torch.float32)
    state = {"full": base, "view": base[4:10]}
    path = _save_state_dict(tmp_path, state)
    tensors = load_torch_checkpoint(path)
    np.testing.assert_array_equal(tensors["view"].array, base[4:10].numpy())


def test_memmap_is_zero_copy(tmp_path):
    state = {"w": torch.ones(256, 256, dtype=torch.bfloat16)}
    path = _save_state_dict(tmp_path, state)
    tensors = load_torch_checkpoint(path)
    arr = tensors["w"].array
    # a true memmap alias has no own memory: its base chain ends in the mmap
    base = arr
    while getattr(base, "base", None) is not None:
        base = base.base
    assert isinstance(base, (np.memmap,)) or type(base).__name__ == "mmap"


def test_model_args_defaults_and_derived(tmp_path):
    # Meta's actual 8B params.json content (reference: src/model/modelargs.go:12-27)
    params = {
        "dim": 4096,
        "n_layers": 32,
        "n_heads": 32,
        "n_kv_heads": 8,
        "vocab_size": 128256,
        "ffn_dim_multiplier": 1.3,
        "multiple_of": 1024,
        "norm_eps": 1e-05,
        "rope_theta": 500000.0,
        "use_scaled_rope": True,
    }
    p = os.path.join(tmp_path, "params.json")
    with open(p, "w") as f:
        json.dump(params, f)
    args = load_model_args(p)
    assert args.dim == 4096
    assert args.n_rep == 4
    assert args.head_dim == 128
    assert args.ffn_hidden_dim == 14336
    assert args.max_sequence_length == 2048  # reference default, not in json
    assert args.use_scaled_rope


def test_model_args_defaults_without_json_keys(tmp_path):
    p = os.path.join(tmp_path, "params.json")
    with open(p, "w") as f:
        json.dump({"dim": 64, "n_layers": 2, "n_heads": 4}, f)
    args = load_model_args(p)
    assert args.kv_heads == 4  # -1 ⇒ MHA
    assert args.n_rep == 1
    assert args.rope_theta == 500000.0
    assert args.multiple_of == 256


def test_real_checkpoint_headers(model_dir):
    """With the real model present: 291 tensors, known names/shapes."""
    tensors = load_torch_checkpoint(os.path.join(model_dir, "consolidated.00.pth"))
    assert len(tensors) == 291
    assert tensors["tok_embeddings.weight"].shape == (128256, 4096)
    assert tensors["layers.0.attention.wq.weight"].shape == (4096, 4096)
    assert tensors["layers.0.attention.wk.weight"].shape == (1024, 4096)
    assert tensors["norm.weight"].shape == (4096,)
    assert tensors["output.weight"].shape == (128256, 4096)


def test_load_llama_model_end_to_end_synthetic_dir(tmp_path):
    """Full model-dir orchestration (the CLI's load path) on a synthetic
    Meta-format directory: tokenizer.model (tiktoken base64 ranks),
    params.json, consolidated.00.pth — load, vocab cross-check, generate.
    This is the only weights-free coverage of load_llama_model itself
    (reference orchestration: src/model/loader.go:22-115)."""
    import base64
    import json

    import torch

    from llama_nuts_and_bolts_tpu.io.params import ModelArgs
    from llama_nuts_and_bolts_tpu.models.llama.loader import (
        CheckpointShapeError, expected_tensor_shapes, load_llama_model)
    from llama_nuts_and_bolts_tpu.runtime import InferenceArgs, InferenceEngine

    # tokenizer.model: 260 base ranks + 256 specials = vocab 516
    ranks = {bytes([i]): i for i in range(256)}
    for j, tok in enumerate([b"he", b"ll", b"hell", b"hello"]):
        ranks[tok] = 256 + j
    lines = [base64.b64encode(t).decode() + " " + str(r) for t, r in ranks.items()]
    (tmp_path / "tokenizer.model").write_text("\n".join(lines) + "\n")

    cfg = ModelArgs(dim=32, n_layers=2, n_heads=4, n_kv_heads=2,
                    vocab_size=len(ranks) + 256, multiple_of=16,
                    norm_eps=1e-5, max_sequence_length=64)
    (tmp_path / "params.json").write_text(json.dumps({
        "dim": cfg.dim, "n_layers": cfg.n_layers, "n_heads": cfg.n_heads,
        "n_kv_heads": cfg.n_kv_heads, "vocab_size": cfg.vocab_size,
        "multiple_of": cfg.multiple_of, "norm_eps": cfg.norm_eps,
    }))

    torch.manual_seed(0)
    sd = {name: (torch.randn(shape) / 8).to(torch.bfloat16)
          for name, shape in expected_tensor_shapes(cfg).items()}
    torch.save(sd, str(tmp_path / "consolidated.00.pth"),
               _use_new_zipfile_serialization=True)

    model = load_llama_model(str(tmp_path), max_sequence_length=48)
    assert model.cfg.vocab_size == cfg.vocab_size
    assert len(model.tensor_meta) == len(sd)

    engine = InferenceEngine(model, InferenceArgs(sequence_length=24))
    ids = engine.tokenize_string("hello hello")
    out = list(engine.generate_tokens(ids))
    assert out and all(0 <= t < cfg.vocab_size for _, t in out)

    # the fused load produces the same generation
    model_f = load_llama_model(str(tmp_path), max_sequence_length=48, fused=True)
    engine_f = InferenceEngine(model_f, InferenceArgs(sequence_length=24))
    assert list(engine_f.generate_tokens(ids)) == out

    # vocab-size cross-check fires on mismatch
    (tmp_path / "params.json").write_text(json.dumps({
        "dim": cfg.dim, "n_layers": cfg.n_layers, "n_heads": cfg.n_heads,
        "n_kv_heads": cfg.n_kv_heads, "vocab_size": 999,
        "multiple_of": cfg.multiple_of, "norm_eps": cfg.norm_eps,
    }))
    with pytest.raises(CheckpointShapeError):
        load_llama_model(str(tmp_path))
