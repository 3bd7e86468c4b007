"""Checkpoint → device params: name/shape validation, stacking, device_put.

Capability parity with the reference's model loader (reference:
src/model/loader.go:18-197 and the shape-asserting constructors in
src/model/llamatransformer.go:64-113,256-287,561-591): every expected tensor
name is validated against the architecture-derived shape table before any
bytes move, then per-layer host memmap views are stacked and shipped to device
(optionally with a NamedSharding per weight group for tensor parallelism).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from llama_nuts_and_bolts_tpu.io.params import ModelArgs, load_model_args
from llama_nuts_and_bolts_tpu.io.torch_ckpt import (
    HostTensor,
    find_checkpoint_shards,
    load_sharded_checkpoint,
    load_torch_checkpoint,
)
from llama_nuts_and_bolts_tpu.models.llama.model import (
    LlamaParams,
    layer_weight_shapes,
)
from llama_nuts_and_bolts_tpu.models.llama.rope import precompute_rope_tables
from llama_nuts_and_bolts_tpu.tokenizer import Vocabulary, load_tiktoken_model
from llama_nuts_and_bolts_tpu.utils.logging import get_logger

# checkpoint tensor name ↔ our layer-weight key (reference tensor names are
# listed at src/model/llamatransformer.go:17-57)
CKPT_LAYER_NAMES: Dict[str, str] = {
    "attn_norm": "layers.{i}.attention_norm.weight",
    "ffn_norm": "layers.{i}.ffn_norm.weight",
    "wq": "layers.{i}.attention.wq.weight",
    "wk": "layers.{i}.attention.wk.weight",
    "wv": "layers.{i}.attention.wv.weight",
    "wo": "layers.{i}.attention.wo.weight",
    "w_gate": "layers.{i}.feed_forward.w1.weight",
    "w_down": "layers.{i}.feed_forward.w2.weight",
    "w_up": "layers.{i}.feed_forward.w3.weight",
}


class CheckpointShapeError(Exception):
    pass


def expected_tensor_shapes(cfg: ModelArgs) -> Dict[str, Tuple[int, ...]]:
    """Full name→shape table (291 entries for the 8B config)."""
    shapes: Dict[str, Tuple[int, ...]] = {
        "tok_embeddings.weight": (cfg.vocab_size, cfg.dim),
        "norm.weight": (cfg.dim,),
        "output.weight": (cfg.vocab_size, cfg.dim),
    }
    per_layer = layer_weight_shapes(cfg)
    for i in range(cfg.n_layers):
        for key, tmpl in CKPT_LAYER_NAMES.items():
            shapes[tmpl.format(i=i)] = per_layer[key]
    return shapes


def validate_checkpoint(tensors: Dict[str, HostTensor], cfg: ModelArgs) -> None:
    expected = expected_tensor_shapes(cfg)
    if "output.weight" not in tensors:
        # Llama-3.2 (1B/3B) checkpoints tie the output head to the token
        # embedding and ship no separate output.weight
        expected.pop("output.weight")
    missing = sorted(set(expected) - set(tensors))
    if missing:
        raise CheckpointShapeError(
            f"checkpoint is missing {len(missing)} tensors, e.g. {missing[:3]}"
        )
    for name, shape in expected.items():
        got = tensors[name].shape
        if got != shape:
            raise CheckpointShapeError(
                f"tensor {name}: checkpoint shape {got} != expected {shape}"
            )


ShardingFn = Callable[[str], Optional[jax.sharding.Sharding]]


def _host_quantize_int8(host: np.ndarray):
    """Per-output-channel symmetric int8 on the host (last dim = contraction).

    Runs on the memmap-backed group BEFORE device_put, so a 16 GB bf16 model
    reaches the chip as 8 GB of int8 without ever being resident in HBM."""
    w32 = np.asarray(host, dtype=np.float32)
    amax = np.max(np.abs(w32), axis=-1, keepdims=True)
    scale = np.maximum(amax / 127.0, 1e-8)
    q = np.clip(np.rint(w32 / scale), -127, 127).astype(np.int8)
    import ml_dtypes

    return q, scale[..., 0].astype(ml_dtypes.bfloat16)


def build_params_from_checkpoint(
    tensors: Dict[str, HostTensor],
    cfg: ModelArgs,
    sharding_fn: Optional[ShardingFn] = None,
    dtype=jnp.bfloat16,
    quant: Optional[str] = None,
    fused: bool = False,
) -> LlamaParams:
    """Stack per-layer host views to [L, ...] and ship to device.

    ``sharding_fn(weight_key)`` may return a Sharding per weight group (keys:
    layer weight names plus 'tok_embeddings', 'norm', 'output', 'rope') so
    tensor-parallel loads place shards directly without a full replica.
    ``quant="int8"`` quantizes the matmul groups per-output-channel on the
    host; ``quant="int4"`` packs group-wise nibbles (quant/int4.py);
    norms/embeddings stay bf16.
    """
    if quant not in (None, "int8", "int4"):
        raise ValueError(f"unsupported quant mode {quant!r}")
    if fused and (quant is not None or sharding_fn is not None):
        raise ValueError(
            "fused decode layout is for plain single-replica bf16 weights "
            "(quantized layouts keep their own packing; tensor-parallel "
            "keeps split weights for the Megatron column/row specs)")
    validate_checkpoint(tensors, cfg)
    log = get_logger()

    def put(key: str, host: np.ndarray) -> jnp.ndarray:
        sharding = sharding_fn(key) if sharding_fn is not None else None
        arr = jax.device_put(host, sharding) if sharding is not None else jnp.asarray(host)
        return arr.astype(dtype) if arr.dtype != dtype and host.dtype.itemsize == 2 else arr

    def put_weight(key: str, host: np.ndarray):
        if quant == "int8" and not key.endswith("norm"):
            from llama_nuts_and_bolts_tpu.quant import QTensor

            q, scale = _host_quantize_int8(host)
            return QTensor(q=put(key, q), scale=jnp.asarray(scale))
        if quant == "int4" and not key.endswith("norm"):
            from llama_nuts_and_bolts_tpu.quant import Q4Tensor, host_quantize_q4

            packed, scale = host_quantize_q4(host)
            sharding = sharding_fn(key) if sharding_fn is not None else None
            if sharding is not None:
                # the grouped int4 layout has a different rank than the dense
                # weight; adapt the dense spec (parallel/sharding.py)
                from llama_nuts_and_bolts_tpu.parallel.sharding import q4_shardings

                p_sh, s_sh = q4_shardings(sharding, packed.shape, scale.shape)
                return Q4Tensor(packed=jax.device_put(packed, p_sh),
                                scale=jax.device_put(scale, s_sh))
            return Q4Tensor(packed=jnp.asarray(packed), scale=jnp.asarray(scale))
        return put(key, host)

    layers: Dict[str, jnp.ndarray] = {}
    if fused:
        # decode-optimized layout assembled HOST-side straight from the
        # memmap views — no device-side transient duplicate (model.py
        # fuse_decode_params documents the layout and the measured win)
        def layer_view(key, i):
            return tensors[CKPT_LAYER_NAMES[key].format(i=i)].array

        def fused_group(out_key, part_keys):
            parts0 = [layer_view(k, 0) for k in part_keys]
            d_in = parts0[0].shape[1]
            d_out = sum(p.shape[0] for p in parts0)
            host = np.empty((cfg.n_layers, d_in, d_out), dtype=parts0[0].dtype)
            for i in range(cfg.n_layers):
                off = 0
                for k in part_keys:
                    v = layer_view(k, i)
                    host[i, :, off:off + v.shape[0]] = v.T
                    off += v.shape[0]
            layers[out_key] = put(out_key, host)
            del host
            log.debug("loaded fused weight group %s", out_key)

        for key in ("attn_norm", "ffn_norm"):
            layers[key] = put(key, np.stack(
                [layer_view(key, i) for i in range(cfg.n_layers)]))
        fused_group("wqkv", ("wq", "wk", "wv"))
        fused_group("wo", ("wo",))
        fused_group("w_gate_up", ("w_gate", "w_up"))
        fused_group("w_down", ("w_down",))
    else:
        for key, tmpl in CKPT_LAYER_NAMES.items():
            views = [tensors[tmpl.format(i=i)].array for i in range(cfg.n_layers)]
            host = np.stack(views)  # one host copy of this weight group only
            layers[key] = put_weight(key, host)
            del host
            log.debug("loaded weight group %s", key)

    cos, sin = precompute_rope_tables(
        cfg.head_dim, 2 * cfg.max_sequence_length, cfg.rope_theta, cfg.use_scaled_rope,
        cfg.rope_scale_factor, cfg.rope_high_freq_factor
    )
    rope_sharding = sharding_fn("rope") if sharding_fn is not None else None
    # tied output head (Llama-3.2 1B/3B): reuse the embedding matrix — same
    # host bytes, quantized/sharded through the regular output path
    out_host = tensors.get("output.weight", tensors["tok_embeddings.weight"]).array
    if fused:
        out_host = np.ascontiguousarray(out_host.T)   # head stored [dim, vocab]
    return LlamaParams(
        tok_embeddings=put("tok_embeddings", tensors["tok_embeddings.weight"].array),
        layers=layers,
        norm=put("norm", tensors["norm.weight"].array),
        output=put_weight("output", out_host),
        rope_cos=jax.device_put(cos, rope_sharding) if rope_sharding else jnp.asarray(cos),
        rope_sin=jax.device_put(sin, rope_sharding) if rope_sharding else jnp.asarray(sin),
    )


@dataclass
class LoadedModel:
    """Everything the engine needs, analogous to the reference's Model struct
    (reference: src/model/model.go:43-54)."""

    params: LlamaParams
    cfg: ModelArgs
    vocab: Vocabulary
    mergeable_ranks: Dict[bytes, int]
    tensor_meta: Dict[str, Tuple[Tuple[int, ...], str]]  # name -> (shape, dtype)


def load_llama_model(
    model_dir: str,
    max_sequence_length: Optional[int] = None,
    sharding_fn: Optional[ShardingFn] = None,
    include_tensors: bool = True,
    quant: Optional[str] = None,
    fused: bool = False,
) -> LoadedModel:
    """Load Meta-format model dir: consolidated.00.pth + params.json + tokenizer.model.

    Mirrors LoadModelEx's orchestration incl. the vocab-size cross-check
    (reference: src/model/loader.go:22-115).
    """
    log = get_logger()
    tk_model = load_tiktoken_model(os.path.join(model_dir, "tokenizer.model"))
    vocab = Vocabulary.from_tiktoken(tk_model)

    cfg = load_model_args(os.path.join(model_dir, "params.json"), max_sequence_length)
    if cfg.vocab_size in (-1, 0):
        cfg = cfg.with_(vocab_size=vocab.size)
    elif cfg.vocab_size != vocab.size:
        raise CheckpointShapeError(
            f"params.json vocab_size {cfg.vocab_size} != tokenizer vocab {vocab.size}"
        )

    params = None
    tensor_meta: Dict[str, Tuple[Tuple[int, ...], str]] = {}
    if include_tensors:
        log.info("Loading checkpoint %s ...", model_dir)
        shards = find_checkpoint_shards(model_dir)
        if len(shards) > 1:
            # Meta's model-parallel multi-file format (70B ships 8 shards)
            log.info("Found %d checkpoint shards.", len(shards))
            tensors = load_sharded_checkpoint(shards)
        else:
            tensors = load_torch_checkpoint(os.path.join(model_dir, "consolidated.00.pth"))
        tensor_meta = {n: (t.shape, str(t.dtype)) for n, t in tensors.items()}
        params = build_params_from_checkpoint(tensors, cfg, sharding_fn, quant=quant,
                                              fused=fused)
        log.info("Loaded %d tensors.", len(tensors))
    return LoadedModel(params=params, cfg=cfg, vocab=vocab,
                       mergeable_ranks=tk_model.mergeable_ranks,
                       tensor_meta=tensor_meta)
