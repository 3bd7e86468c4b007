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

Self-launching 2-process mode (the CI job; same command IS the BASELINE
measurement on real multi-chip hardware)::

    python scripts/scaling_bench.py --multihost 2 --out scaling.json

spawns both worker processes against a local coordinator, runs the tp sweep
over the global mesh, and writes process 0's JSON report as the artifact.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def sync(x):
    import jax
    import numpy as np

    leaf = jax.tree_util.tree_leaves(x)[0]
    if getattr(leaf, "is_fully_addressable", True):
        np.asarray(leaf.ravel()[:1])
    else:
        # spans processes: every process gathers (and thereby waits)
        from jax.experimental import multihost_utils

        multihost_utils.process_allgather(leaf, tiled=True)


def _free_port() -> int:
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def launch_multihost(argv, n_proc: int, out_path: str, local_devices: int) -> int:
    """Spawn n_proc copies of this script as a jax.distributed process group
    on the CPU mesh; the report comes from process 0 (identical on all)."""
    import subprocess

    coord = f"127.0.0.1:{_free_port()}"
    env_base = {
        **os.environ,
        "COORD": coord,
        "NPROC": str(n_proc),
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": f"--xla_force_host_platform_device_count={local_devices}",
    }
    cmd = [sys.executable, os.path.abspath(__file__), "--cpu-mesh"] + argv
    # workers run a LOCKSTEP distributed group: draining their pipes
    # sequentially can deadlock (a later worker blocking on a full 64KB pipe
    # stalls its collectives, stalling the one being waited on) — give each
    # worker a FILE instead, read after exit
    import tempfile

    procs, files = [], []
    for pid in range(n_proc):
        f = tempfile.TemporaryFile(mode="w+", encoding="utf-8")
        files.append(f)
        procs.append(subprocess.Popen(
            cmd, env=dict(env_base, PROC=str(pid)),
            stdout=f, stderr=subprocess.STDOUT, text=True))
    outs, rc = [], 0
    try:
        for p in procs:
            p.wait(timeout=600)
            rc |= p.returncode
    except subprocess.TimeoutExpired:
        rc = rc or 1
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for f in files:
        f.seek(0)
        outs.append(f.read())
        f.close()
    report = None
    for line in outs[0].splitlines():
        try:
            cand = json.loads(line)
        except ValueError:
            continue
        if isinstance(cand, dict) and "scaling_efficiency" in cand:
            report = cand
    if rc or report is None:
        for i, out in enumerate(outs):
            sys.stderr.write(f"--- proc {i} ---\n{out}\n")
        return rc or 1
    report["processes"] = n_proc
    print(json.dumps(report))
    if out_path:
        with open(out_path, "w") as f:
            json.dump(report, f, indent=1)
        print(f"wrote {out_path}", file=sys.stderr)
    return 0


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--layers", type=int, default=4)
    p.add_argument("--dim", type=int, default=1024)
    p.add_argument("--steps", type=int, default=32)
    p.add_argument("--cpu-mesh", action="store_true",
                   help="force the 8-device virtual CPU mesh")
    p.add_argument("--multihost", type=int, default=0, metavar="N",
                   help="self-launch N OS processes as one jax.distributed "
                        "group (CPU mesh) and run the tp sweep over the "
                        "GLOBAL mesh; report written by process 0")
    p.add_argument("--local-devices", type=int, default=4,
                   help="virtual devices per process in --multihost mode")
    p.add_argument("--out", default="",
                   help="also write the JSON report to this file")
    args = p.parse_args()

    if args.multihost:
        passthrough = ["--layers", str(args.layers), "--dim", str(args.dim),
                       "--steps", str(args.steps)]
        sys.exit(launch_multihost(passthrough, args.multihost, args.out,
                                  args.local_devices))

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    if args.cpu_mesh:
        jax.config.update("jax_platforms", "cpu")

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

    n_local = jax.local_device_count()
    n_proc = jax.process_count()
    results, global_tps = {}, []
    tp = 1
    while tp <= n_dev and tp <= cfg.kv_heads:
        if n_proc > 1 and tp <= n_local:
            # a mesh smaller than one process: every process runs its OWN
            # replica on its local devices (keeps the group in lockstep and
            # gives the per-host baseline); cross-process meshes below
            mesh = make_mesh(tp=tp, dp=1, devices=jax.local_devices()[:tp])
        else:
            mesh = make_mesh(tp=tp, dp=1)
            if n_proc > 1:
                global_tps.append(tp)
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
    if n_proc > 1:
        report["cross_process_tp"] = global_tps
    print(json.dumps(report))


if __name__ == "__main__":
    main()
