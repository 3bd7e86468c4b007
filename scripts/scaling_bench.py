"""Tensor-parallel scaling-efficiency harness (BASELINE metric #3).

Runs the same decode workload at tp = 1, 2, 4, ... over the available devices
and reports tokens/s plus scaling efficiency vs tp=1. On a real TPU slice
this measures ICI-psum-limited scaling; on this dev box it runs on the
virtual CPU mesh (mechanics + numbers-shape only — CPU "devices" share cores,
so efficiency there is NOT meaningful hardware data).

Correctness evidence for the multi-process path this harness would scale
over lives in ``tests/test_multiprocess.py`` (two OS processes, one global
mesh via jax.distributed/gloo, exact token parity). On a real multi-host
slice, launch ONE copy of this script per host with::

    COORD=host0:9876 NPROC=2 PROC=0 python scripts/scaling_bench.py
    COORD=host0:9876 NPROC=2 PROC=1 python scripts/scaling_bench.py

and the mesh spans all hosts' chips (initialize_multihost); the tp sweep
then exercises DCN+ICI collectives for real.

Usage:  python scripts/scaling_bench.py [--layers N] [--dim D] [--steps N]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--layers", type=int, default=4)
    p.add_argument("--dim", type=int, default=1024)
    p.add_argument("--steps", type=int, default=32)
    p.add_argument("--cpu-mesh", action="store_true",
                   help="force the 8-device virtual CPU mesh")
    args = p.parse_args()

    if args.cpu_mesh:
        jax.config.update("jax_platforms", "cpu")

    import os

    if os.environ.get("COORD"):
        from llama_nuts_and_bolts_tpu.parallel import initialize_multihost

        initialize_multihost(coordinator_address=os.environ["COORD"],
                             num_processes=int(os.environ["NPROC"]),
                             process_id=int(os.environ["PROC"]))

    from llama_nuts_and_bolts_tpu.io.params import ModelArgs
    from llama_nuts_and_bolts_tpu.models.llama import forward, init_random_params
    from llama_nuts_and_bolts_tpu.models.llama.model import KVCache
    from llama_nuts_and_bolts_tpu.parallel import (
        make_mesh, shard_cache, shard_params, token_sharding)

    n_dev = len(jax.devices())
    cfg = ModelArgs(
        dim=args.dim, n_layers=args.layers, n_heads=16, n_kv_heads=8,
        vocab_size=32000, multiple_of=256, use_scaled_rope=True,
        max_sequence_length=512,
    )
    params0 = jax.jit(init_random_params, static_argnums=(0,))(cfg, jax.random.PRNGKey(0))
    sync(params0)

    def decode_loop(params, cache, tok):
        def body(carry, _):
            tok, pos, cache = carry
            logits, cache = forward(params, cfg, tok, pos, cache)
            nxt = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
            return (nxt, pos + 1, cache), nxt[:, 0]

        (tok, _, cache), toks = lax.scan(body, (tok, 1, cache), None,
                                         length=args.steps)
        return toks

    results = {}
    tp = 1
    while tp <= n_dev and tp <= cfg.kv_heads:
        mesh = make_mesh(tp=tp, dp=1)
        sp = shard_params(params0, mesh)
        cache = shard_cache(KVCache.create(cfg, 1, 256), mesh)
        tok = jax.device_put(jnp.ones((1, 1), jnp.int32), token_sharding(mesh))
        run = jax.jit(decode_loop)
        toks = run(sp, cache, tok)
        sync(toks)  # compile
        t0 = time.perf_counter()
        toks = run(sp, cache, tok)
        sync(toks)
        dt = time.perf_counter() - t0
        results[tp] = args.steps / dt
        tp *= 2

    base = results[1]
    report = {
        "devices": n_dev,
        "platform": jax.devices()[0].platform,
        "tokens_per_s": {str(k): round(v, 2) for k, v in results.items()},
        "scaling_efficiency": {
            str(k): round(v / (base * k), 4) for k, v in results.items()},
    }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
