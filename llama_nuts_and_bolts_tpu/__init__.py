"""llama_nuts_and_bolts_tpu — a TPU-native Llama-3.1 inference framework.

A brand-new JAX/XLA/Pallas implementation with the full capability surface of the
Go reference `adalkiran/llama-nuts-and-bolts` (see SURVEY.md): from-scratch
checkpoint ingest (zip + pickle VM + memmap), tiktoken BPE tokenizer + Llama-3
chat template, bf16 GQA transformer with scaled RoPE and KV cache, greedy
streaming decode with UTF-8/emoji-safe detokenization, an interactive CLI — plus
the TPU-first parts the reference lacks: fused Pallas kernels, batched decode,
and tensor-parallel sharding over a `jax.sharding.Mesh`.

Layer map (mirrors SURVEY.md §1, rebuilt idiomatically):
  cli/        L7  interactive console app, repaint engine
  runtime/    L6  inference engine, streaming, detokenizer, emoji
  models/     L5  model configs + functional forward passes
  io/         L4  checkpoint ingest (pickle VM, zip/memmap, params.json)
  tokenizer/  L4' tiktoken ranks file, BPE, chat template
  ops/        L3  jnp reference ops (norms, attention, swiglu, sampling)
  kernels/    L3  Pallas TPU kernels for the hot paths
  parallel/   L2  mesh, shardings, multi-host init
  utils/      L1  logging, timing, misc
"""

__version__ = "0.1.0"


# primary public API (lazy to keep bare-import cheap)
def __getattr__(name):
    _api = {
        "load_llama_model": "llama_nuts_and_bolts_tpu.models.llama.loader",
        "LoadedModel": "llama_nuts_and_bolts_tpu.models.llama.loader",
        "InferenceEngine": "llama_nuts_and_bolts_tpu.runtime",
        "InferenceArgs": "llama_nuts_and_bolts_tpu.runtime",
        "ModelArgs": "llama_nuts_and_bolts_tpu.io.params",
        "forward": "llama_nuts_and_bolts_tpu.models.llama.model",
        "KVCache": "llama_nuts_and_bolts_tpu.models.llama.model",
        "PromptPart": "llama_nuts_and_bolts_tpu.tokenizer",
    }
    if name in _api:
        import importlib

        return getattr(importlib.import_module(_api[name]), name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
