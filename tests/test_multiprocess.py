"""Multi-process (multi-host style) execution evidence.

The reference is single-process (SURVEY.md §2.4); the BASELINE north star
still demands multi-host scaling, whose prerequisite is a working
``jax.distributed`` process group + DCN-visible sharding path. This test
launches TWO OS processes that each run ``initialize_multihost`` against a
shared coordinator, build ONE global mesh spanning both processes' CPU
devices, shard the params across it, and verify the globally-sharded forward
produces exactly the tokens of a single-process run.
"""

import os
import socket
import subprocess
import sys
import textwrap


REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent("""
    import os, sys
    sys.path.insert(0, os.environ["LNB_REPO"])

    import jax
    jax.config.update("jax_platforms", "cpu")

    from llama_nuts_and_bolts_tpu.parallel import (
        initialize_multihost, make_mesh, shard_cache, shard_params)

    initialize_multihost(
        coordinator_address=os.environ["LNB_COORD"],
        num_processes=2,
        process_id=int(os.environ["LNB_PROC"]),
    )
    assert jax.process_count() == 2, jax.process_count()

    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import multihost_utils

    from llama_nuts_and_bolts_tpu.io.params import ModelArgs
    from llama_nuts_and_bolts_tpu.models.llama import forward, init_random_params
    from llama_nuts_and_bolts_tpu.models.llama.model import KVCache

    n_local = jax.local_device_count()
    n_global = jax.device_count()
    assert n_global == 2 * n_local, (n_global, n_local)

    tp = n_global
    cfg = ModelArgs(dim=16 * tp, n_layers=2, n_heads=tp, n_kv_heads=tp,
                    vocab_size=64, multiple_of=16, norm_eps=1e-5,
                    max_sequence_length=32)

    # every process computes the SAME full params (same seed); sharding then
    # distributes ownership of shards across the two processes
    params_host = jax.jit(init_random_params, static_argnums=(0,),
                          backend="cpu")(cfg, jax.random.PRNGKey(7))
    params_host = jax.device_get(params_host)

    mesh = make_mesh(tp=tp)   # spans BOTH processes' devices
    params = shard_params(jax.tree_util.tree_map(jnp.asarray, params_host), mesh)
    cache = shard_cache(KVCache.create(cfg, 1, 16), mesh)

    prompt = jnp.asarray([[1, 2, 3, 4]], dtype=jnp.int32)
    fwd = jax.jit(forward, static_argnums=(1,))
    logits, cache = fwd(params, cfg, prompt, 0, cache)
    tok = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
    logits2, cache = fwd(params, cfg, tok, 4, cache)
    tok2 = jnp.argmax(logits2[:, -1:], axis=-1).astype(jnp.int32)

    # gather the (replicated-output) tokens to every process and compare with
    # a purely local single-device run
    tok_g = multihost_utils.process_allgather(tok, tiled=True)
    tok2_g = multihost_utils.process_allgather(tok2, tiled=True)

    ref_logits, ref_cache = forward(params_host, cfg, np.asarray(prompt), 0,
                                    KVCache.create(cfg, 1, 16))
    ref_tok = int(np.asarray(ref_logits)[0, -1].argmax())
    ref_logits2, _ = forward(params_host, cfg,
                             np.asarray([[ref_tok]], dtype=np.int32), 4, ref_cache)
    ref_tok2 = int(np.asarray(ref_logits2)[0, -1].argmax())

    assert int(np.asarray(tok_g).ravel()[0]) == ref_tok, (tok_g, ref_tok)
    assert int(np.asarray(tok2_g).ravel()[0]) == ref_tok2, (tok2_g, ref_tok2)
    print(f"proc {os.environ['LNB_PROC']}: multiprocess parity OK "
          f"(tokens {ref_tok}, {ref_tok2})", flush=True)
""")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_global_mesh_token_parity(tmp_path):
    port = _free_port()
    worker_py = tmp_path / "worker.py"
    worker_py.write_text(WORKER)
    env_base = {
        **os.environ,
        "LNB_REPO": REPO_ROOT,
        "LNB_COORD": f"127.0.0.1:{port}",
        "JAX_PLATFORMS": "cpu",
        # 2 local devices per process -> 4-device global mesh
        "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
    }
    procs = []
    for pid in (0, 1):
        env = dict(env_base, LNB_PROC=str(pid))
        procs.append(subprocess.Popen(
            [sys.executable, str(worker_py)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outputs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outputs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outputs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
        assert "multiprocess parity OK" in out, out
