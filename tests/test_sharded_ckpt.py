"""Multi-shard checkpoint loading: a tiny model saved Meta-style across two
consolidated.XX.pth files must load identically to the single-file version."""

import os

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from llama_nuts_and_bolts_tpu.io.torch_ckpt import (
    find_checkpoint_shards,
    load_sharded_checkpoint,
    shard_concat_axis,
)
from llama_nuts_and_bolts_tpu.models.llama import build_params_from_checkpoint, forward
from llama_nuts_and_bolts_tpu.models.llama.model import KVCache

from tests.test_model import TINY, make_torch_weights, to_host_tensors


def split_meta_style(weights, n_shards=2):
    """Split a state dict the way Meta's model-parallel checkpoints do."""
    shards = [dict() for _ in range(n_shards)]
    for name, t in weights.items():
        axis = shard_concat_axis(name)
        if axis is None:
            for s in shards:
                s[name] = t
        else:
            for i, piece in enumerate(torch.chunk(t, n_shards, dim=axis)):
                shards[i][name] = piece.contiguous()
    return shards


@pytest.fixture(scope="module")
def shard_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("shards")
    weights = make_torch_weights(TINY, seed=11)
    for i, shard in enumerate(split_meta_style(weights)):
        torch.save(shard, os.path.join(d, f"consolidated.{i:02d}.pth"))
    return str(d), weights


def test_axis_rules():
    assert shard_concat_axis("layers.0.attention.wq.weight") == 0
    assert shard_concat_axis("layers.31.attention.wo.weight") == 1
    assert shard_concat_axis("layers.2.feed_forward.w2.weight") == 1
    assert shard_concat_axis("tok_embeddings.weight") == 1
    assert shard_concat_axis("output.weight") == 0
    assert shard_concat_axis("layers.0.attention_norm.weight") is None
    assert shard_concat_axis("norm.weight") is None


def test_find_shards(shard_dir):
    d, _ = shard_dir
    shards = find_checkpoint_shards(d)
    assert [os.path.basename(p) for p in shards] == [
        "consolidated.00.pth", "consolidated.01.pth"]


def test_sharded_equals_full(shard_dir):
    d, weights = shard_dir
    tensors = load_sharded_checkpoint(find_checkpoint_shards(d))
    full = to_host_tensors(weights)
    assert set(tensors) == set(full)
    for name in full:
        assert tensors[name].shape == full[name].shape, name
        np.testing.assert_array_equal(
            np.asarray(tensors[name].array).view(np.uint16),
            np.asarray(full[name].array).view(np.uint16), err_msg=name)


def test_sharded_model_forward_matches(shard_dir):
    d, weights = shard_dir
    tensors = load_sharded_checkpoint(find_checkpoint_shards(d))
    params = build_params_from_checkpoint(tensors, TINY)
    params_full = build_params_from_checkpoint(to_host_tensors(weights), TINY)
    tokens = jnp.asarray([[5, 9, 2]], dtype=jnp.int32)
    fwd = jax.jit(forward, static_argnums=(1,))
    a, _ = fwd(params, TINY, tokens, 0, KVCache.create(TINY, 1, 16))
    b, _ = fwd(params_full, TINY, tokens, 0, KVCache.create(TINY, 1, 16))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
