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
