"""Decode-throughput benchmark on the attached TPU chip — deadline-proof.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "detail"}
where value is measured greedy-decode tokens/sec/chip on the Llama-3.1
architecture (bf16, batch 1, on-device lax.scan decode loop) and vs_baseline
is the fraction of the HBM-bandwidth roofline achieved (the reference
publishes no speed numbers — BASELINE.md's success bar is roofline-bound
tokens/sec/chip; the hot loops measured here replace the reference's
goroutine GEMM fan-out, src/ml/operations_lineartransform.go:37-207).

Architecture (round-3 rework after r02's null capture): a parent process
that never imports JAX orchestrates measurement *stages* as subprocesses:

  - each stage writes a full RESULTS snapshot as one JSON line to its out
    file after EVERY section it measures, so a stage killed mid-flight still
    contributes everything it finished;
  - each stage has its own wall-clock budget; a stage that hangs (tunnel
    congestion, pathological compile) is killed and the rest proceed;
  - if the headline stage dies without a number, a smaller fallback config
    is tried in a fresh process;
  - the parent's own hard deadline always emits the JSON line.

The 8B checkpoint (16.06 GB bf16) does not fit a single v5e chip's HBM, so
layer depth is auto-scaled to the largest that fits; the metric name carries
the layer count. All other dims are the real 8B architecture, so per-layer
step cost and roofline fraction transfer directly.
"""

import json
import os
import signal
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
V5E_HBM_BYTES_PER_S = 819e9  # public v5e HBM bandwidth
SEQ_CAP = 200                # the reference CLI's sequence length
PREFILL_LEN = 16
TOTAL_BUDGET_S = int(os.environ.get("LNB_BENCH_BUDGET_S", "520"))
# tiny CPU config for exercising the parent/stage/snapshot mechanics in tests
TINY_MODE = bool(os.environ.get("LNB_BENCH_TINY"))

# ------------------------------------------------------------------- parent

# the stage subprocess currently in flight (so the deadline handler can kill
# it instead of orphaning it against the shared device)
_CURRENT_STAGE: dict = {}


def _emit(results: dict) -> None:
    print(json.dumps({
        "metric": results.get(
            "metric", "decode_tokens_per_sec_per_chip_llama31_bf16_b1"),
        "value": results.get("value"),
        "unit": "tokens/s",
        "vs_baseline": results.get("vs_baseline"),
        "detail": results.get("detail", {}),
    }), flush=True)


def _read_snapshot(path: str) -> dict:
    """Last parseable JSON line of a stage's out file (may be mid-write)."""
    best = {}
    try:
        with open(path) as f:
            for line in f:
                try:
                    best = json.loads(line)
                except ValueError:
                    pass
    except OSError:
        pass
    return best


def _merge(results: dict, snap: dict) -> None:
    if not snap:
        return
    detail = results.setdefault("detail", {})
    snap_detail = snap.get("detail", {})
    if "first_rpc_s" in snap_detail:
        # this stage reached the device: stale outage markers from an
        # earlier killed stage no longer describe the run
        detail.pop("outage", None)
        detail.pop("first_rpc_wait_s", None)
    detail.update(snap_detail)
    for k in ("metric", "value", "vs_baseline"):
        if snap.get(k) is not None:
            results[k] = snap[k]


def _run_stage(stage: str, budget_s: float, results: dict,
               hard_cap_s: float | None = None) -> None:
    """Run one measurement stage as a subprocess under its own deadline.

    The first device RPC of a fresh process can stall for MINUTES while the
    tunnel's queue drains — and that cost is per-process, so killing a stage
    that has not yet reached the device only re-pays the stall in the next
    one. Hence two deadlines: at ``budget_s``, a stage that has measured
    nothing but IS past device init is killed (a retry starts warm); a stage
    still waiting on its first RPC is granted until ``hard_cap_s``.
    """
    if budget_s < 20:
        print(f"bench: skipping stage {stage!r} ({budget_s:.0f}s left)",
              file=sys.stderr, flush=True)
        return
    hard_cap_s = max(budget_s, hard_cap_s or budget_s)
    out = tempfile.NamedTemporaryFile(
        mode="w", suffix=f".{stage}.jsonl", delete=False)
    out.close()
    print(f"bench: stage {stage!r} start (budget {budget_s:.0f}s, "
          f"cap {hard_cap_s:.0f}s)", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    try:
        proc = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__),
             "--stage", stage, "--out", out.name,
             "--budget", str(int(budget_s))],
            stdout=sys.stderr, stderr=sys.stderr, cwd=REPO)
        _CURRENT_STAGE["proc"] = proc
        extended = False
        while True:
            elapsed = time.perf_counter() - t0
            deadline = hard_cap_s if extended else budget_s
            try:
                proc.wait(timeout=min(5.0, max(0.1, deadline - elapsed)))
                break
            except subprocess.TimeoutExpired:
                pass
            if time.perf_counter() - t0 < deadline:
                continue
            if (not extended and hard_cap_s > budget_s
                    and "device" not in _read_snapshot(out.name).get(
                        "detail", {})):
                extended = True
                print(f"bench: stage {stage!r} still pre-device at "
                      f"{budget_s:.0f}s — extending to {hard_cap_s:.0f}s "
                      "(restart would re-pay the stall)",
                      file=sys.stderr, flush=True)
                continue
            print(f"bench: stage {stage!r} exceeded {deadline:.0f}s — killed",
                  file=sys.stderr, flush=True)
            proc.kill()
            proc.wait(timeout=10)
            break
    except Exception as exc:  # noqa: BLE001 - any stage failure is survivable
        print(f"bench: stage {stage!r} failed: {exc}",
              file=sys.stderr, flush=True)
    _merge(results, _read_snapshot(out.name))
    print(f"bench: stage {stage!r} done in {time.perf_counter() - t0:.0f}s; "
          f"sections so far: {sorted(results.get('detail', {}))}",
          file=sys.stderr, flush=True)
    try:
        os.unlink(out.name)
    except OSError:
        pass


def parent_main() -> None:
    t0 = time.perf_counter()
    results: dict = {}

    def deadline(_sig, _frm):
        print("bench: parent wall-clock deadline hit; emitting "
              f"{sorted(results.get('detail', {}))}", file=sys.stderr,
              flush=True)
        # kill the in-flight stage first: an orphaned child keeps queuing
        # device work, worsening the tunnel stall for the NEXT bench run
        proc = _CURRENT_STAGE.get("proc")
        if proc is not None and proc.poll() is None:
            proc.kill()
        _emit(results)
        os._exit(0)

    signal.signal(signal.SIGALRM, deadline)
    signal.alarm(TOTAL_BUDGET_S + 20)  # backstop behind per-stage budgets

    def left() -> float:
        return TOTAL_BUDGET_S - (time.perf_counter() - t0)

    # Headline first — it alone decides value/vs_baseline. Nominal budget
    # keeps room for a retry + the quant stage, but a pre-device stall
    # extends to nearly the whole budget: one process surviving the stall
    # beats two processes each dying inside it, and fallback stages are
    # provably doomed during an outage (each would re-pay the same stall),
    # so the main stage gets their budget up front (cap = total - 5 s).
    _run_stage("main", min(400.0, left() - 40), results,
               hard_cap_s=left() - 5)
    detail = results.setdefault("detail", {})
    if (results.get("value") is None and not detail.get("outage")
            and "device" in detail and left() > 360):
        # reached the device but died without a headline (observed cause:
        # transient RESOURCE_EXHAUSTED while another client's buffers are
        # still being reclaimed). With real budget left, a cooled-down
        # retry of the FULL config beats settling for the small fallback.
        cooldown = min(150.0, left() - 300)
        print(f"bench: main died post-device — cooling {cooldown:.0f}s and "
              "retrying full config", file=sys.stderr, flush=True)
        time.sleep(cooldown)
        _run_stage("main", min(400.0, left() - 40), results,
                   hard_cap_s=left() - 5)
    # outage classification keys on the WATCHER's marker from the most
    # recent stage (an earlier stage's 'device' key must not mask a retry
    # that died pre-RPC; _merge clears stale markers on device success)
    if results.get("value") is None and detail.get("outage"):
        # killed while still waiting on its first device RPC: that is a
        # TUNNEL OUTAGE, not a framework regression — record it as such and
        # skip the fallback stages (a fresh process would re-enter the same
        # stall; see first_rpc_wait_s for how long this one waited)
        detail["outage"] = True
        detail["outage_note"] = (
            "main stage killed pre-first-device-RPC; fallback stages "
            "skipped (each restarts the per-process tunnel stall)")
        print("bench: outage — main stage never reached the device; "
              "skipping doomed fallback stages", file=sys.stderr, flush=True)
    else:
        if results.get("value") is None:
            _run_stage("main_small", left() - 15, results)
        if ("full_8b_32L_int8_decode_tokens_per_s"
                not in results.get("detail", {})):
            _run_stage("quant", left() - 10, results)
        # round-5 evidence stages: the real schedulers (continuous/paged/
        # speculative, measured end-to-end) and the kernel A/Bs (folded-heads
        # bf16, int8-vs-bf16 KV at b16, 16K context)
        if ("continuous_sched_b4_delivered_tokens_per_s"
                not in results.get("detail", {})
                and "continuous_sched_b2_delivered_tokens_per_s"
                not in results.get("detail", {})):
            _run_stage("sched", left() - 10, results)
        if not any(k.startswith("decode_b") for k in results.get("detail", {})):
            _run_stage("kern", left() - 5, results)
    signal.alarm(0)
    _emit(results)


# ------------------------------------------------------------------- stages
# Everything below runs inside a stage subprocess (imports JAX).


class StageWriter:
    """Accumulates RESULTS and rewrites a full snapshot line per update.

    Thread-safe: the pre-RPC outage watcher (see _stage_setup) writes
    progress markers from a daemon thread while the main thread is blocked
    inside the first device RPC."""

    def __init__(self, path: str):
        import threading

        self.path = path
        self.results: dict = {"detail": {}}
        self.t0 = time.perf_counter()
        self._lock = threading.Lock()

    def mark(self, what: str) -> None:
        print(f"bench: [{time.perf_counter() - self.t0:5.0f}s] {what}",
              file=sys.stderr, flush=True)

    def update(self, **top) -> None:
        with self._lock:
            self.results.update(top)
            with open(self.path, "a") as f:
                f.write(json.dumps(self.results) + "\n")

    def section(self, name: str, value) -> None:
        with self._lock:
            self.results["detail"][name] = value
        self.update()

    def drop_section(self, name: str) -> None:
        with self._lock:
            self.results["detail"].pop(name, None)
        self.update()


def param_bytes(cfg) -> int:
    d, f, v = cfg.dim, cfg.ffn_hidden_dim, cfg.vocab_size
    per_layer = (2 * d                       # norms
                 + d * d + 2 * cfg.kv_heads * cfg.head_dim * d + d * d  # attn
                 + 3 * f * d)                # ffn
    return 2 * (2 * v * d + d + cfg.n_layers * per_layer)


def _stage_setup(w: StageWriter):
    """Shared stage bootstrap: imports, cache, device probe. Returns jax."""
    w.mark("importing jax")
    w.update()  # alive-marker: parent can tell "hung" from "never started"
    sys.path.insert(0, REPO)
    from llama_nuts_and_bolts_tpu.utils.compile_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()
    import jax

    # the axon sitecustomize pins the platform at interpreter startup, so
    # JAX_PLATFORMS in the environment alone does NOT stick — apply it
    # explicitly (the CPU mechanics tests depend on this)
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax.numpy as jnp
    import numpy as np

    # is ttft_cold_s below a process-cold / compile-cache-warm number?
    cache_dir = jax.config.jax_compilation_cache_dir
    try:
        w.section("compile_cache_warm",
                  bool(cache_dir) and bool(os.listdir(cache_dir)))
    except OSError:
        w.section("compile_cache_warm", False)
    w.mark("probing device (first RPC may stall on a cold tunnel)")
    t0 = time.perf_counter()
    dev = jax.devices()[0]
    # While the main thread is blocked inside the first RPC, a watcher
    # thread stamps the elapsed wait into the snapshot every ~15 s — so a
    # stage killed mid-stall leaves first_rpc_wait_s + outage:true in the
    # record, making a null result attributable to the tunnel rather than
    # indistinguishable from a perf regression.
    import threading

    probe_done = threading.Event()

    def outage_watch():
        while not probe_done.wait(15.0):
            waited = time.perf_counter() - t0
            w.section("first_rpc_wait_s", round(waited, 1))
            w.section("outage", True)
            w.mark(f"still waiting on first device RPC ({waited:.0f}s)")

    watcher = threading.Thread(target=outage_watch, daemon=True)
    watcher.start()
    try:
        # a real round-trip, not just backend init: 1-element compute + fetch
        np.asarray((jnp.zeros((), jnp.int32) + 1))
    finally:
        probe_done.set()
    # join BEFORE dropping: a watcher mid-body could otherwise re-write the
    # outage keys after the drop, branding a healthy run as an outage
    watcher.join(timeout=20.0)
    w.drop_section("first_rpc_wait_s")
    w.drop_section("outage")
    w.section("first_rpc_s", round(time.perf_counter() - t0, 1))
    w.section("device", str(dev))
    w.mark(f"device ready: {dev}")
    return jax


def sync(x) -> None:
    """Force completion: block_until_ready is a no-op on the axon tunnel
    backend, so fetch ONE element to the host instead. The slice must happen
    ON DEVICE (``.ravel()[:1]`` before ``np.asarray``) — converting the whole
    leaf ships gigabytes through the ~8 MB/s tunnel."""
    import jax
    import numpy as np

    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf.ravel()[:1])


def pick_layer_count(budget_bytes: int, reserve_per_layer: int = 0,
                     reserve_flat: int = 0):
    """Largest 8B-architecture layer depth whose weights (+ per-layer
    reserved bytes, e.g. a KV cache that scales with depth, + flat reserve)
    fit ``budget_bytes``."""
    from llama_nuts_and_bolts_tpu.io.params import ModelArgs

    for n_layers in range(32, 0, -1):
        cfg = ModelArgs(n_kv_heads=8, vocab_size=128256, multiple_of=1024,
                        ffn_dim_multiplier=1.3, n_layers=n_layers)
        if (param_bytes(cfg) + n_layers * reserve_per_layer
                + reserve_flat) < budget_bytes:
            return n_layers
    return 1


def device_budget() -> int:
    import jax

    try:
        stats = jax.devices()[0].memory_stats()
        return int(stats["bytes_limit"] * 0.80)
    except Exception:
        return int(16 * (1024 ** 3) * 0.75)


def stage_main(w: StageWriter, small: bool = False) -> None:
    jax = _stage_setup(w)
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from llama_nuts_and_bolts_tpu.io.params import ModelArgs
    from llama_nuts_and_bolts_tpu.models.llama import (
        forward, init_random_params,
    )
    from llama_nuts_and_bolts_tpu.models.llama.model import KVCache

    if TINY_MODE:
        # mechanics-test config (tests/test_bench_mechanics.py): the full
        # parent/stage/snapshot pipeline on the CPU backend in seconds
        decode_steps, n_layers = 8, 2
        cfg = ModelArgs(dim=256, n_layers=n_layers, n_heads=8, n_kv_heads=4,
                        vocab_size=2048, multiple_of=64, norm_eps=1e-5,
                        rope_theta=500000.0, use_scaled_rope=True,
                        max_sequence_length=2048)
        metric = "decode_tokens_per_sec_tiny_mechanics"
    else:
        decode_steps = 64 if small else 180
        n_layers = 8 if small else pick_layer_count(device_budget())
        cfg = ModelArgs(
            dim=4096, n_layers=n_layers, n_heads=32, n_kv_heads=8,
            vocab_size=128256, multiple_of=1024, ffn_dim_multiplier=1.3,
            norm_eps=1e-5, rope_theta=500000.0, use_scaled_rope=True,
            max_sequence_length=2048,
        )
        metric = (f"decode_tokens_per_sec_per_chip_llama31-{n_layers}L_bf16_b1"
                  + ("-smallcfg" if small else ""))
    roofline = V5E_HBM_BYTES_PER_S / param_bytes(cfg)

    # decode-optimized fused layout: qkv / gate+up fused, [in,out] weights
    # (models/llama/model.py fuse_decode_params; +~3.5% HBM streaming
    # measured on this chip — docs/07-PERFORMANCE.md)
    w.mark(f"init params ({n_layers}L fused, compile may be cold)")
    params = jax.jit(init_random_params, static_argnums=(0, 2, 3))(
        cfg, jax.random.PRNGKey(0), jnp.bfloat16, True)
    sync(params)
    w.mark("params materialized")
    w.section("param_bytes", param_bytes(cfg))
    w.section("roofline_tokens_per_s", round(roofline, 2))
    w.section("device", str(jax.devices()[0]))

    fwd = jax.jit(forward, static_argnums=(1,), donate_argnums=(4,))

    def make_decode_n(steps):
        def decode_n(params, cache, tok, start_pos):
            def body(carry, _):
                tok, pos, cache = carry
                logits, cache = forward(params, cfg, tok, pos, cache)
                nxt = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
                return (nxt, pos + 1, cache), nxt[:, 0]

            (tok, pos, cache), toks = lax.scan(
                body, (tok, start_pos, cache), None, length=steps)
            return toks, cache

        return decode_n

    decode_jit = jax.jit(make_decode_n(decode_steps), donate_argnums=(1,))
    prompt = jnp.ones((1, PREFILL_LEN), dtype=jnp.int32)

    # -- warm-up: compile prefill + decode-scan programs -------------------
    w.mark("compile prefill")
    cache = KVCache.create(cfg, 1, SEQ_CAP)
    t0 = time.perf_counter()
    logits, cache = fwd(params, cfg, prompt, 0, cache)
    tok = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
    sync(tok)
    ttft_cold = time.perf_counter() - t0
    w.section("ttft_cold_s", round(ttft_cold, 2))

    # -- earliest possible headline: a SHORT scan lands a number minutes
    # before the full warm-up completes in a marginal tunnel window; the
    # 180-step sections below then refine it
    short_steps = max(4, decode_steps // 6)
    w.mark(f"compile short decode scan ({short_steps} steps)")
    short_jit = jax.jit(make_decode_n(short_steps), donate_argnums=(1,))
    toks, cache = short_jit(params, cache, tok, PREFILL_LEN)
    sync(toks)  # compile
    t0 = time.perf_counter()
    toks, cache = short_jit(params, cache, tok, PREFILL_LEN + short_steps)
    sync(toks)
    early = short_steps / (time.perf_counter() - t0)
    w.update(metric=metric, value=round(early, 2),
             vs_baseline=round(early / roofline, 4))
    w.section("decode_tokens_per_s_shortscan", round(early, 2))
    w.mark(f"early provisional headline {early:.2f} tok/s")
    del cache

    w.mark("compile decode scan")
    cache = KVCache.create(cfg, 1, SEQ_CAP)
    logits, cache = fwd(params, cfg, prompt, 0, cache)
    tok = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
    toks, cache = decode_jit(params, cache, tok, PREFILL_LEN)
    sync(toks)
    del cache
    w.mark("warm-up done")

    # -- headline, provisional first: ONE timed scan lands a number --------
    cache = KVCache.create(cfg, 1, SEQ_CAP)
    logits, cache = fwd(params, cfg, prompt, 0, cache)
    tok = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
    sync(tok)
    t0 = time.perf_counter()
    toks, cache = decode_jit(params, cache, tok, PREFILL_LEN)
    sync(toks)
    one_scan = decode_steps / (time.perf_counter() - t0)
    w.update(metric=metric, value=round(one_scan, 2),
             vs_baseline=round(one_scan / roofline, 4))
    w.section("decode_tokens_per_s_1scan", round(one_scan, 2))
    w.mark(f"provisional headline {one_scan:.2f} tok/s")

    # -- refine: amortize the ~25 ms tunnel dispatch over N_SCANS scans ----
    # (dispatch of scan k+1 pipelines behind scan k's execution)
    N_SCANS = 6
    extra = [(KVCache.create(cfg, 1, SEQ_CAP), jnp.ones((1, 1), jnp.int32))
             for _ in range(N_SCANS - 1)]
    sync(extra[-1][0])
    t0 = time.perf_counter()
    toks, cache = decode_jit(params, cache, tok, PREFILL_LEN)
    for c_i, t_i in extra:
        toks, _ = decode_jit(params, c_i, t_i, PREFILL_LEN)
    sync(toks)   # program order: earlier scans completed before the last
    del extra
    toks_per_s = (N_SCANS * decode_steps) / (time.perf_counter() - t0)
    w.update(metric=metric, value=round(toks_per_s, 2),
             vs_baseline=round(toks_per_s / roofline, 4))
    # cache-INCLUSIVE roofline: the XLA decode step reads the whole static
    # cache buffer (masked positions included) plus writes one row, so the
    # honest per-step HBM floor is params + cache traffic, not params alone
    cache_step_bytes = 2 * cfg.n_layers * cfg.kv_heads * cfg.head_dim * 2 * (
        SEQ_CAP + 1)
    adj_roofline = V5E_HBM_BYTES_PER_S / (param_bytes(cfg) + cache_step_bytes)
    w.section("roofline_cache_adjusted_tokens_per_s", round(adj_roofline, 2))
    w.section("vs_adjusted_baseline", round(toks_per_s / adj_roofline, 4))
    w.mark(f"refined headline {toks_per_s:.2f} tok/s "
           f"({toks_per_s / roofline:.4f} of roofline, "
           f"{toks_per_s / adj_roofline:.4f} of cache-adjusted roofline)")

    # -- p50 TTFT at a realistic 512-token prefill bucket ------------------
    # (BASELINE metric "p50 TTFT"; reference prefill path
    # src/inference/inference.go:195-202)
    try:
        w.mark("compile prefill-512 (flash = the engine's TPU default, + xla)")
        prompt512 = jnp.ones((1, 512), dtype=jnp.int32)
        fwd512 = jax.jit(forward, static_argnums=(1,),
                         static_argnames=("attn_impl",))
        c512 = KVCache.create(cfg, 1, 1024)
        impls = ["xla"] if TINY_MODE else ["flash", "xla"]
        p50s = {}
        for impl in impls:
            logits, _ = fwd512(params, cfg, prompt512, 0, c512,
                               attn_impl=impl)
            sync(logits)
            times = []
            for _ in range(5):
                t0 = time.perf_counter()
                logits, _ = fwd512(params, cfg, prompt512, 0, c512,
                                   attn_impl=impl)
                tok512 = jnp.argmax(logits[:, -1:], axis=-1)
                sync(tok512)
                times.append(time.perf_counter() - t0)
            times.sort()
            p50s[impl] = times[len(times) // 2]
            w.section(f"p50_ttft_512_{impl}_s", round(p50s[impl], 4))
        p50 = min(p50s.values())
        w.section("p50_ttft_512_s", round(p50, 4))
        w.section("prefill_512_tokens_per_s", round(512 / p50, 1))
        w.mark(f"p50 TTFT@512 {p50 * 1e3:.1f} ms "
               f"({ {k: round(v * 1e3, 1) for k, v in p50s.items()} })")
    except Exception as exc:  # noqa: BLE001
        w.mark(f"ttft512 skipped: {exc}")

    # -- flash vs XLA prefill at 2K ctx ------------------------------------
    try:
        w.mark("compile prefill-2048 (xla + flash)")
        prompt2k = jnp.ones((1, 2048), dtype=jnp.int32)
        c2k = KVCache.create(cfg, 1, 2048)
        rates = {}
        for impl in ("xla", "flash"):
            f2k = jax.jit(forward, static_argnums=(1, 5))
            logits, _ = f2k(params, cfg, prompt2k, 0, c2k, impl)
            sync(logits)
            t0 = time.perf_counter()
            for _ in range(3):
                logits, _ = f2k(params, cfg, prompt2k, 0, c2k, impl)
                sync(logits)
            rates[impl] = 3 * 2048 / (time.perf_counter() - t0)
        w.section("prefill_2k_xla_tokens_per_s", round(rates["xla"], 1))
        w.section("prefill_2k_flash_tokens_per_s", round(rates["flash"], 1))
        w.section("prefill_flash_vs_xla",
                  round(rates["flash"] / rates["xla"], 3))
        w.mark(f"prefill 2K flash/xla = {rates['flash'] / rates['xla']:.2f}x")
    except Exception as exc:  # noqa: BLE001
        w.mark(f"prefill-2k skipped: {exc}")

    # -- streamed interactive path: k-token chunked dispatches -------------
    # the CLI/SSE generator's actual pattern (runtime/engine.py
    # _decode_chunk, default k=8 on RPC-attached devices): a HOST loop of
    # k-step scans with a 1-element fetch per chunk — unlike the headline's
    # pipelined back-to-back scans, this pays one round-trip per k tokens
    try:
        w.mark("streamed-path section (k=8 chunks)")
        K = 8
        n_chunks = max(1, decode_steps // K)

        def chunk8(params, cache, tok, start_pos):
            def body(carry, _):
                tok, pos, cache = carry
                logits, cache = forward(params, cfg, tok, pos, cache)
                nxt = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
                return (nxt, pos + 1, cache), nxt[:, 0]

            (tok, pos, cache), toks = lax.scan(
                body, (tok, start_pos, cache), None, length=K)
            return toks, cache

        cjit = jax.jit(chunk8, donate_argnums=(1,))
        scache = KVCache.create(cfg, 1, SEQ_CAP)
        st = jnp.ones((1, 1), jnp.int32)
        toks_s, scache = cjit(params, scache, st, 1)
        sync(toks_s)  # compile
        del scache
        # the engine's pipelined pattern (runtime/engine.py): dispatch chunk
        # N+1 with chunk N's last token ON DEVICE, then fetch chunk N — the
        # host round-trip overlaps the next chunk's execution
        scache = KVCache.create(cfg, 1, SEQ_CAP)
        pos = 1
        t0 = time.perf_counter()
        toks_s, scache = cjit(params, scache, st, pos)
        for _ in range(n_chunks - 1):
            nxt = toks_s[-1:].reshape(1, 1)
            toks_next, scache = cjit(params, scache, nxt, pos + K)
            np.asarray(toks_s)   # host consumes chunk N, like the SSE path
            toks_s, pos = toks_next, pos + K
        np.asarray(toks_s)
        rate = n_chunks * K / (time.perf_counter() - t0)
        w.section("streamed_chunk8_tokens_per_s", round(rate, 2))
        del scache
        w.mark(f"streamed path (pipelined) {rate:.2f} tok/s")
    except Exception as exc:  # noqa: BLE001
        w.mark(f"streamed section skipped: {exc}")

    if small:
        return

    # -- batched decode throughput (BASELINE config #4) --------------------
    try:
        w.mark("batch16 section")
        BATCH = 16
        bt = jnp.ones((BATCH, 1), dtype=jnp.int32)
        bcache = KVCache.create(cfg, BATCH, SEQ_CAP)
        toks_b, bcache = decode_jit(params, bcache, bt, 1)
        sync(toks_b)  # compile (same program: batch dim is in the avals)
        bcache = KVCache.create(cfg, BATCH, SEQ_CAP)
        t0 = time.perf_counter()
        toks_b, bcache = decode_jit(params, bcache, bt, 1)
        sync(toks_b)
        rate = BATCH * decode_steps / (time.perf_counter() - t0)
        w.section("batch16_decode_total_tokens_per_s", round(rate, 2))
        del bcache
        w.mark(f"batch16 {rate:.0f} tok/s total")
    except Exception as exc:  # noqa: BLE001
        w.mark(f"batch16 skipped: {exc}")

    # -- 8K long-context decode (BASELINE config #3) -----------------------
    try:
        w.mark("8k-context section")
        import dataclasses

        from llama_nuts_and_bolts_tpu.models.llama.rope import (
            precompute_rope_tables,
        )

        cfg_8k = dataclasses.replace(cfg, max_sequence_length=8192)
        cos8k, sin8k = precompute_rope_tables(
            cfg.head_dim, 2 * 8192, cfg.rope_theta, cfg.use_scaled_rope)
        params8k = dataclasses.replace(
            params, rope_cos=jnp.asarray(cos8k), rope_sin=jnp.asarray(sin8k))

        def make_decode_8k(impl):
            def decode_8k(params, cache, tok, start_pos):
                def body(carry, _):
                    tok, pos, cache = carry
                    logits, cache = forward(params, cfg_8k, tok, pos, cache,
                                            attn_impl=impl)
                    nxt = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
                    return (nxt, pos + 1, cache), nxt[:, 0]

                (tok, pos, cache), toks = lax.scan(
                    body, (tok, start_pos, cache), None, length=decode_steps)
                return toks, cache

            return decode_8k

        kt = jnp.ones((1, 1), jnp.int32)
        both = {}
        for name in ("xla", "flash"):
            djit = jax.jit(make_decode_8k(name), donate_argnums=(1,))
            kcache = KVCache.create(cfg_8k, 1, 8192)
            toks_k, kcache = djit(params8k, kcache, kt,
                                  8192 - decode_steps - 2)
            sync(toks_k)  # compile
            del kcache
            kcache = KVCache.create(cfg_8k, 1, 8192)
            t0 = time.perf_counter()
            toks_k, kcache = djit(params8k, kcache, kt,
                                  8192 - decode_steps - 2)
            sync(toks_k)
            both[name] = round(decode_steps / (time.perf_counter() - t0), 2)
            del kcache
            w.mark(f"8k {name} {both[name]} tok/s")
        w.section("decode_8k_context_tokens_per_s", max(both.values()))
        w.section("decode_8k_xla_tokens_per_s", both["xla"])
        w.section("decode_8k_flash_tokens_per_s", both["flash"])
        del params8k
    except Exception as exc:  # noqa: BLE001
        w.mark(f"8k-context skipped: {exc}")

    # quant sections in the SAME process: the first-RPC stall is per-process,
    # so a healthy run pays it once; a crash here still leaves every main
    # section in the snapshot, and the parent falls back to stage_quant
    # (observed: residual buffers can RESOURCE_EXHAUST the 8K int4 section —
    # free everything the main sections left behind first)
    del params, cache, logits, tok, toks, prompt
    try:
        del c512, prompt512
    except NameError:
        pass
    try:
        del c2k, prompt2k
    except NameError:
        pass
    _quant_sections(w, jax)


def stage_quant(w: StageWriter) -> None:
    """Fallback stage: quant sections in their own process (used only when
    the main stage died before reaching them)."""
    jax = _stage_setup(w)
    _quant_sections(w, jax)


def _quant_sections(w: StageWriter, jax) -> None:
    """Full 32-layer 8B with int4/int8 weight-only quantization."""
    import jax.numpy as jnp
    from jax import lax

    from llama_nuts_and_bolts_tpu.io.params import ModelArgs
    from llama_nuts_and_bolts_tpu.models.llama import forward
    from llama_nuts_and_bolts_tpu.models.llama.model import KVCache

    if TINY_MODE:
        decode_steps = 8
        cfg8 = ModelArgs(dim=256, n_layers=2, n_heads=8, n_kv_heads=4,
                         vocab_size=2048, multiple_of=64, norm_eps=1e-5,
                         rope_theta=500000.0, use_scaled_rope=True,
                         max_sequence_length=2048)
    else:
        decode_steps = 180
        cfg8 = ModelArgs(
            dim=4096, n_layers=32, n_heads=32, n_kv_heads=8, vocab_size=128256,
            multiple_of=1024, ffn_dim_multiplier=1.3, norm_eps=1e-5,
            rope_theta=500000.0, use_scaled_rope=True, max_sequence_length=2048)

    def run_decode(name, params, cfg_run, cache, tok, start, transform=None,
                   impl=None):
        batch = cache.k.shape[1]

        def decode(params, cache, tok, start_pos):
            if transform is not None:
                params = transform(params)

            def body(carry, _):
                tok, pos, cache = carry
                kw = {} if impl is None else {"attn_impl": impl}
                logits, cache = forward(params, cfg_run, tok, pos, cache, **kw)
                nxt = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
                return (nxt, pos + 1, cache), nxt[:, 0]

            (tok, pos, cache), toks = lax.scan(
                body, (tok, start_pos, cache), None, length=decode_steps)
            return toks, cache

        djit = jax.jit(decode, donate_argnums=(1,))
        toks, cache2 = djit(params, cache, tok, start)
        sync(toks)  # compile
        del cache2
        cache = KVCache.create(cfg_run, batch, cache.k.shape[3],
                               dtype=cache.k.dtype)
        t0 = time.perf_counter()
        toks, cache2 = djit(params, cache, tok, start)
        sync(toks)
        rate = batch * decode_steps / (time.perf_counter() - t0)
        w.section(name, round(rate, 2))
        w.mark(f"{name} {rate:.2f} tok/s")
        del cache2

    # int4 first: the best single-chip full-8B number must survive deadlines
    try:
        w.mark("int4 init (full 32L)")
        from llama_nuts_and_bolts_tpu.quant import (
            init_random_params_q4, nativize_q4,
        )

        q4params = init_random_params_q4(cfg8, jax.random.PRNGKey(0))
        sync(q4params)
        w.mark("int4 params materialized")
        run_decode("full_8b_32L_int4_decode_tokens_per_s", q4params, cfg8,
                   KVCache.create(cfg8, 1, SEQ_CAP),
                   jnp.ones((1, 1), jnp.int32), 1, transform=nativize_q4)

        # production long-context config: full 8B, 8K ctx, ONE chip —
        # int4 weights + int8 KV cache + the Pallas flash-decode kernel
        import dataclasses

        from llama_nuts_and_bolts_tpu.models.llama.rope import (
            precompute_rope_tables,
        )

        cfg8k = dataclasses.replace(cfg8, max_sequence_length=8192)
        cos8, sin8 = precompute_rope_tables(
            cfg8.head_dim, 2 * 8192, cfg8.rope_theta, cfg8.use_scaled_rope)
        q4p8k = dataclasses.replace(
            q4params, rope_cos=jnp.asarray(cos8), rope_sin=jnp.asarray(sin8))
        # fastest-when-it-fits long-context config: int4 weights + bf16 KV
        # through the flash kernel (int8 KV below trades ~8% speed for 2x
        # the cache capacity — measured table in docs/07)
        run_decode("full_8b_8k_ctx_int4w_bf16kv_flash_tokens_per_s",
                   q4p8k, cfg8k, KVCache.create(cfg8k, 1, 8192),
                   jnp.ones((1, 1), jnp.int32), 8192 - decode_steps - 2,
                   transform=nativize_q4, impl="flash")
        run_decode("full_8b_8k_ctx_int4w_int8kv_tokens_per_s", q4p8k, cfg8k,
                   KVCache.create(cfg8k, 1, 8192, dtype=jnp.int8),
                   jnp.ones((1, 1), jnp.int32), 8192 - decode_steps - 2,
                   transform=nativize_q4, impl="flash")

        # continuous-batching serving shape: 4 slots at PER-ROW positions
        # (the vector-start_pos path runtime/continuous.py steps), full 8B
        # int4 weights, 8K context — int8 KV via the flash decode kernel
        # vs bf16 KV via XLA, total tokens/s across the slots
        B_CONT = 4
        poss = jnp.full((B_CONT,), 8192 - decode_steps - 2, jnp.int32)
        run_decode("continuous_8k_b4_int4w_bf16kv_xla_tokens_per_s",
                   q4p8k, cfg8k, KVCache.create(cfg8k, B_CONT, 8192),
                   jnp.ones((B_CONT, 1), jnp.int32), poss,
                   transform=nativize_q4, impl="xla")
        run_decode("continuous_8k_b4_int4w_int8kv_flash_tokens_per_s",
                   q4p8k, cfg8k,
                   KVCache.create(cfg8k, B_CONT, 8192, dtype=jnp.int8),
                   jnp.ones((B_CONT, 1), jnp.int32), poss,
                   transform=nativize_q4, impl="flash")
        del q4p8k, q4params
    except Exception as exc:  # noqa: BLE001
        w.mark(f"int4 skipped: {exc}")

    # int8 weight-only: 8.6 GB of weights on one chip
    try:
        w.mark("int8 init (full 32L)")
        from llama_nuts_and_bolts_tpu.quant import init_random_params_q8

        qparams = init_random_params_q8(cfg8, jax.random.PRNGKey(0))
        sync(qparams)
        w.mark("int8 params materialized")
        run_decode("full_8b_32L_int8_decode_tokens_per_s", qparams, cfg8,
                   KVCache.create(cfg8, 1, SEQ_CAP),
                   jnp.ones((1, 1), jnp.int32), 1)
        del qparams
    except Exception as exc:  # noqa: BLE001
        w.mark(f"int8 skipped: {exc}")


def _synthetic_vocab(n_normal: int):
    """Full-size synthetic tokenizer (distinct byte strings + the 256 Llama
    specials) so the ENGINE/SCHEDULER paths — which classify stop tokens and
    detokenize — run at the real vocab size without weight files."""
    from llama_nuts_and_bolts_tpu.tokenizer import TiktokenModel, Vocabulary
    from llama_nuts_and_bolts_tpu.tokenizer.tiktoken_io import (
        build_special_tokens,
    )

    ranks = {i.to_bytes(4, "big"): i for i in range(n_normal)}
    special = build_special_tokens(len(ranks))
    tk = TiktokenModel(
        mergeable_ranks=ranks, special_tokens=special,
        bos_id=special["<|begin_of_text|>"],
        eos_id=special["<|end_of_text|>"],
        stop_token_ids=[special["<|eom_id|>"], special["<|eot_id|>"]])
    return Vocabulary.from_tiktoken(tk), ranks


def stage_sched(w: StageWriter, budget_s: float = float("inf")) -> None:
    """THE SCHEDULERS THEMSELVES, measured end-to-end on the chip: the
    continuous and paged batchers driven through submit()/step()/
    req.tokens() — admission, host bookkeeping, per-token queue delivery
    included — plus the sequential engine's speculative decoding. These are
    the numbers the raw forward-scan proxies (stage_quant's continuous_*
    sections) stand in for; scheduler overhead = delivered / raw-scan.
    Replaces the decode loop at reference src/inference/inference.go:173-254
    with production scheduling the reference never had.

    The kernel A/B sections (_kern_sections) run in this stage's TAIL: a
    fresh process pays a tunnel stall that can eat a whole stage budget
    (measured 47-74 s per process), so one process runs both. ``budget_s``
    lets the tail skip configs it cannot finish rather than get killed
    mid-measurement."""
    t_stage0 = time.perf_counter()

    def time_left() -> float:
        return budget_s - (time.perf_counter() - t_stage0)

    jax = _stage_setup(w)
    import jax.numpy as jnp
    import numpy as np
    import threading
    from jax import lax

    from llama_nuts_and_bolts_tpu.io.params import ModelArgs
    from llama_nuts_and_bolts_tpu.models.llama import (
        forward, init_random_params,
    )
    from llama_nuts_and_bolts_tpu.models.llama.loader import LoadedModel
    from llama_nuts_and_bolts_tpu.models.llama.model import KVCache
    from llama_nuts_and_bolts_tpu.runtime import InferenceArgs, InferenceEngine
    from llama_nuts_and_bolts_tpu.runtime.continuous import ContinuousBatcher
    from llama_nuts_and_bolts_tpu.runtime.paged import PagedBatcher

    if TINY_MODE:
        SLOTS, NREQ, MAXNEW, CTX = 2, 4, 6, 256
        cfg = ModelArgs(dim=256, n_layers=2, n_heads=8, n_kv_heads=4,
                        vocab_size=2048, multiple_of=64, norm_eps=1e-5,
                        rope_theta=500000.0, use_scaled_rope=True,
                        max_sequence_length=CTX)
        vocab, ranks = _synthetic_vocab(2048 - 256)
    else:
        SLOTS, NREQ, MAXNEW, CTX = 4, 12, 48, 2048
        # leave room for the shared cache (both batchers, created in turn)
        cache_per_layer = 2 * SLOTS * CTX * 8 * 128 * 2
        n_layers = pick_layer_count(device_budget(), cache_per_layer,
                                    reserve_flat=1 << 30)
        cfg = ModelArgs(
            dim=4096, n_layers=n_layers, n_heads=32, n_kv_heads=8,
            vocab_size=128256, multiple_of=1024, ffn_dim_multiplier=1.3,
            norm_eps=1e-5, rope_theta=500000.0, use_scaled_rope=True,
            max_sequence_length=CTX)
        vocab, ranks = _synthetic_vocab(128256 - 256)
        w.section("sched_model_layers", n_layers)
    w.mark(f"sched: init params ({cfg.n_layers}L, split layout)")
    # SPLIT weight layout: the paged model functions keep it by design
    # (serving/__main__.py:88-106 gates fused off under --paged-blocks), and
    # one param set must serve both batchers AND the raw-scan comparison so
    # the scheduler-overhead ratio is apples-to-apples
    params = jax.jit(init_random_params, static_argnums=(0, 2, 3))(
        cfg, jax.random.PRNGKey(0), jnp.bfloat16, False)
    sync(params)
    model = LoadedModel(params=params, cfg=cfg, vocab=vocab,
                        mergeable_ranks=ranks, tensor_meta={})
    engine = InferenceEngine(model, InferenceArgs(sequence_length=CTX))
    prompts = [[3 + 7 * i + j for j in range(10 + (i % 3))]
               for i in range(NREQ)]

    def drive(cb, tag, n_req=None, max_new=None, use_prompts=None):
        """Submit requests, step the scheduler to completion, and time
        every delivered token through req.tokens() from consumer threads."""
        pool = use_prompts if use_prompts is not None else prompts
        subset = pool[:n_req] if n_req else pool
        reqs = [cb.submit(p, max_new_tokens=max_new or MAXNEW)
                for p in subset]
        arrivals = [[] for _ in reqs]

        def consume(i, r):
            for _state, _tok in r.tokens(timeout=1200):
                arrivals[i].append(time.perf_counter())

        threads = [threading.Thread(target=consume, args=(i, r))
                   for i, r in enumerate(reqs)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        while cb.has_work:
            cb.step()
        for t in threads:
            t.join(timeout=1200)
        t_end = max(ts[-1] for ts in arrivals if ts)
        total = sum(len(ts) for ts in arrivals)
        rate = total / (t_end - t0)
        gaps = sorted(g for ts in arrivals
                      for g in np.diff(ts)) or [0.0]
        p50 = gaps[len(gaps) // 2]
        p95 = gaps[min(len(gaps) - 1, int(len(gaps) * 0.95))]
        w.section(f"{tag}_delivered_tokens_per_s", round(rate, 2))
        w.section(f"{tag}_intertoken_p50_ms", round(p50 * 1e3, 2))
        w.section(f"{tag}_intertoken_p95_ms", round(p95 * 1e3, 2))
        w.mark(f"{tag}: {total} toks delivered at {rate:.2f} tok/s "
               f"(p50 {p50 * 1e3:.1f} ms, p95 {p95 * 1e3:.1f} ms)")
        return rate

    def warm(cb, prompt=None):
        """One short request end-to-end: compiles the batcher's prefill and
        decode executables outside the measured window. ``prompt`` must
        share the drive's prefill BUCKET — warming bucket 16 then driving a
        bucket-32 prompt leaves a 15-25 s compile inside the timed window
        (measured: it halved a spec drive's apparent delivered rate 8x)."""
        r = cb.submit(prompt if prompt is not None else prompts[0],
                      max_new_tokens=3)
        while cb.has_work:
            cb.step()
        list(r.tokens(timeout=1200))

    # -- continuous batcher, end to end --------------------------------------
    try:
        w.mark("continuous scheduler (compiles prefill-16 + decode step)")
        cb = ContinuousBatcher(engine, n_slots=SLOTS)
        w.section("sched_step_quantum", cb.step_quantum)
        warm(cb)
        rate_cont = drive(cb, f"continuous_sched_b{SLOTS}")
        if not TINY_MODE:
            # the churn-amortization claim, measured: longer generations
            # spread each admission's pipeline drain over more tokens, so
            # delivered rate should close on the raw-scan ceiling
            drive(cb, f"continuous_sched_b{SLOTS}_long",
                  n_req=2 * SLOTS, max_new=4 * MAXNEW)
        del cb
    except Exception as exc:  # noqa: BLE001
        rate_cont = None
        w.mark(f"continuous sched skipped: {exc}")

    # -- raw per-row forward scan at the same shape (the proxy) --------------
    try:
        w.mark("raw per-row scan at the scheduler's shape")
        steps = MAXNEW

        def decode_n(params, cache, tok, poss):
            def body(carry, _):
                tok, poss, cache = carry
                logits, cache = forward(params, cfg, tok, poss, cache)
                nxt = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
                return (nxt, poss + 1, cache), nxt[:, 0]

            (tok, poss, cache), toks = lax.scan(
                body, (tok, poss, cache), None, length=steps)
            return toks, cache

        djit = jax.jit(decode_n, donate_argnums=(1,))
        poss = jnp.asarray(np.full((SLOTS,), CTX // 2, np.int32))
        bt = jnp.ones((SLOTS, 1), jnp.int32)
        toks, _ = djit(params, KVCache.create(cfg, SLOTS, CTX), bt, poss)
        sync(toks)  # compile
        c2 = KVCache.create(cfg, SLOTS, CTX)
        t0 = time.perf_counter()
        toks, _ = djit(params, c2, bt, poss)
        sync(toks)
        rate_raw = SLOTS * steps / (time.perf_counter() - t0)
        w.section(f"rawscan_b{SLOTS}_tokens_per_s", round(rate_raw, 2))
        if rate_cont:
            w.section("continuous_sched_overhead_vs_rawscan",
                      round(rate_cont / rate_raw, 4))
        w.mark(f"raw scan {rate_raw:.2f} tok/s "
               f"(sched/raw = {rate_cont / rate_raw if rate_cont else 0:.3f})")
    except Exception as exc:  # noqa: BLE001
        w.mark(f"raw-scan section skipped: {exc}")

    # -- paged batcher, end to end -------------------------------------------
    try:
        w.mark("paged scheduler (compiles paged prefill + decode)")
        pb = PagedBatcher(engine, n_slots=SLOTS,
                          n_blocks=1 + SLOTS * (CTX // 64), block_size=64)
        warm(pb)
        drive(pb, f"paged_sched_b{SLOTS}")
        del pb
    except Exception as exc:  # noqa: BLE001
        w.mark(f"paged sched skipped: {exc}")

    # -- speculative decoding (sequential engine, n-gram proposer) -----------
    # A RANDOM-weights model still exercises the real path: greedy decode on
    # random inits falls into near-cyclic token runs, which the n-gram
    # prompt-lookup proposer latches onto — acceptance is whatever the model
    # actually exhibits and is RECORDED, not assumed.
    try:
        import dataclasses

        spec_prompt = [17, 23, 31, 47] * 6
        spec_new = MAXNEW * 2

        def timed_generate(model_, prompt, runs=2, **args):
            e = InferenceEngine(model_, InferenceArgs(sequence_length=CTX,
                                                      **args))
            # warm on the SAME engine (its jit wrappers hold the compiled
            # prefill + decode executables)
            list(e.generate_tokens(prompt, max_new_tokens=4))
            if args.get("speculate_k"):
                # the S=k+1 verify program only compiles when a draft fires,
                # which depends on the model's output — force the compile
                # here so it can never land inside the timed window
                kk = args["speculate_k"]
                warm_c = e.new_cache(1, e.seq_len)
                logits, _ = e._fwd(e.model.params, cfg,
                                   jnp.ones((1, kk + 1), jnp.int32), 10,
                                   warm_c, attn_impl="xla")
                np.asarray(logits[0, 0, :1])
                del warm_c
            best = None
            for _ in range(runs):  # best-of-n: shed transient tunnel stalls
                t0 = time.perf_counter()
                toks = list(e.generate_tokens(prompt,
                                              max_new_tokens=spec_new))
                dt = time.perf_counter() - t0
                rate = len(toks) / dt
                if best is None or rate > best[0]:
                    best = (rate, getattr(e, "spec_stats", None))
            return best

        def spec_sections(tag, model_, prompt, k, plain_rate, runs=1):
            rate, stats = timed_generate(model_, prompt, runs=runs,
                                         speculate_k=k)
            acc = (stats["accepted"] / stats["drafted"]
                   if stats and stats["drafted"] else 0.0)
            w.section(f"speculative_{tag}_k{k}_tokens_per_s", round(rate, 2))
            w.section(f"speculative_{tag}_k{k}_acceptance", round(acc, 4))
            w.section(f"speculative_{tag}_k{k}_vs_plain",
                      round(rate / plain_rate, 4))
            w.mark(f"spec {tag} k={k}: {rate:.2f} tok/s, acceptance "
                   f"{acc:.2%}, {rate / plain_rate:.2f}x plain ({stats})")

        w.mark("speculative: plain per-token baseline")
        plain_rate, _ = timed_generate(model, spec_prompt, runs=2,
                                       decode_chunk=1)
        w.section("speculative_plain_sync_tokens_per_s", round(plain_rate, 2))
        # Acceptance floor: a random-weights model's greedy output is NOT
        # self-repetitive, so the n-gram proposer almost never fires —
        # measured acceptance ~0. This records speculation's OVERHEAD when
        # drafts never land (the honest worst case).
        w.mark("speculative k=4 on the random model (acceptance floor)")
        spec_sections("ngram", model, spec_prompt, 4, plain_rate, runs=2)

        # Acceptance ceiling: a CONSTRUCTED-CYCLIC model. Zeroing wo and
        # w_down makes the residual stream exactly the token embedding
        # (every matmul still runs at full shape — identical HBM/FLOP cost
        # per step, verified by plain-rate parity below), and the LM head's
        # first C rows are set to the embeddings of the previous cycle
        # element, so greedy output cycles over C tokens. The n-gram
        # proposer latches onto the cycle; acceptance is measured, not
        # assumed — this is the systems ceiling of the speculation path on
        # self-repetitive text (code, quotes, structured output).
        CYC = 8
        layers_cyc = dict(params.layers)
        emb = params.tok_embeddings
        out_cyc = jnp.zeros_like(params.output)
        out_cyc = out_cyc.at[:CYC].set(
            emb[(jnp.arange(CYC) - 1) % CYC].astype(out_cyc.dtype))
        layers_cyc["wo"] = jnp.zeros_like(layers_cyc["wo"])
        layers_cyc["w_down"] = jnp.zeros_like(layers_cyc["w_down"])
        params_cyc = dataclasses.replace(params, layers=layers_cyc,
                                         output=out_cyc)
        model_cyc = LoadedModel(params=params_cyc, cfg=cfg, vocab=vocab,
                                mergeable_ranks=ranks, tensor_meta={})
        cyc_prompt = list(range(CYC)) * 3
        cyc_plain, _ = timed_generate(model_cyc, cyc_prompt, runs=1,
                                      decode_chunk=1)
        w.section("speculative_cyclic_plain_tokens_per_s",
                  round(cyc_plain, 2))
        w.mark(f"cyclic model plain: {cyc_plain:.2f} tok/s (step-cost "
               f"parity vs random plain {plain_rate:.2f})")
        for k in (2, 4, 8):
            # k=8 completes the dial's curve: at full acceptance each
            # verify round-trip delivers k+1 tokens, so the sequential
            # ceiling scales ~(k+1)/RTT until the verify step's own cost
            # (S=k+1 rows) starts to show
            w.mark(f"speculative k={k} on the cyclic model")
            spec_sections("cyclic", model_cyc, cyc_prompt, k, cyc_plain)

        # The remaining shipped speculation variants at the same measured
        # acceptance ceiling — in-batch (continuous), paged, and two-model
        # draft — so every variant has an official device record.
        if not TINY_MODE and time_left() > 100:
            eng_cyc = InferenceEngine(model_cyc,
                                      InferenceArgs(sequence_length=CTX))
            cyc_prompts = [list(range(CYC)) * 3 for _ in range(2 * SLOTS)]
            try:
                w.mark("in-batch speculation (continuous batcher, cyclic)")
                scb = ContinuousBatcher(eng_cyc, n_slots=SLOTS,
                                        speculate_k=4)
                warm(scb, prompt=cyc_prompts[0])
                drive(scb, "spec_batch_cyclic_k4", use_prompts=cyc_prompts,
                      max_new=MAXNEW)
                del scb
            except Exception as exc:  # noqa: BLE001
                w.mark(f"in-batch spec skipped: {exc}")
            try:
                w.mark("paged speculation (paged batcher, cyclic)")
                spb = PagedBatcher(eng_cyc, n_slots=SLOTS,
                                   n_blocks=1 + SLOTS * (CTX // 64),
                                   block_size=64, speculate_k=4)
                warm(spb, prompt=cyc_prompts[0])
                drive(spb, "spec_paged_cyclic_k4", use_prompts=cyc_prompts,
                      max_new=MAXNEW)
                del spb
            except Exception as exc:  # noqa: BLE001
                w.mark(f"paged spec skipped: {exc}")
            try:
                w.mark("two-model draft speculation (2L cyclic draft)")
                cfg_d = dataclasses.replace(cfg, n_layers=2)
                params_d = dataclasses.replace(
                    params_cyc,
                    layers={kk: v[:2] for kk, v in
                            params_cyc.layers.items()})
                draft = LoadedModel(params=params_d, cfg=cfg_d, vocab=vocab,
                                    mergeable_ranks=ranks, tensor_meta={})
                e = InferenceEngine(model_cyc,
                                    InferenceArgs(sequence_length=CTX,
                                                  speculate_k=4),
                                    draft_model=draft)
                list(e.generate_tokens(cyc_prompt, max_new_tokens=4))
                t0 = time.perf_counter()
                toks = list(e.generate_tokens(cyc_prompt,
                                              max_new_tokens=spec_new))
                rate = len(toks) / (time.perf_counter() - t0)
                st = getattr(e, "spec_stats", None)
                acc = (st["accepted"] / st["drafted"]
                       if st and st["drafted"] else 0.0)
                w.section("speculative_draft2L_k4_tokens_per_s",
                          round(rate, 2))
                w.section("speculative_draft2L_k4_acceptance", round(acc, 4))
                w.section("speculative_draft2L_k4_vs_plain",
                          round(rate / cyc_plain, 4))
                w.mark(f"draft spec: {rate:.2f} tok/s, acceptance {acc:.2%} "
                       f"({st})")
                del e, draft, params_d
            except Exception as exc:  # noqa: BLE001
                w.mark(f"draft spec skipped: {exc}")
            del eng_cyc
        del params_cyc, model_cyc, layers_cyc, out_cyc
    except Exception as exc:  # noqa: BLE001
        w.mark(f"speculative section skipped: {exc}")

    # -- speculative device mechanics: verify-step cost vs plain step --------
    # the acceptance-independent half of the story: an S=K+1 verify forward
    # costs nearly the same HBM traffic as S=1, so accepted drafts are
    # nearly free. Measured as an on-device scan (no host round-trips).
    try:
        def steps_cost(S, iters=32):
            tok = jnp.ones((1, S), jnp.int32)

            def run(params, cache):
                # params MUST be a jit argument: closing over them embeds
                # 10+ GB of weights as constants in the remote compile
                # request (HTTP 413 through the tunnel)
                def body(cache, _):
                    logits, cache = forward(params, cfg, tok, CTX // 2,
                                            cache, attn_impl="xla")
                    return cache, logits[0, -1, 0]

                return lax.scan(body, cache, None, length=iters)

            rjit = jax.jit(run, donate_argnums=(1,))
            _, out = rjit(params, KVCache.create(cfg, 1, CTX))
            sync(out)  # compile
            c = KVCache.create(cfg, 1, CTX)
            t0 = time.perf_counter()
            _, out = rjit(params, c)
            sync(out)
            return (time.perf_counter() - t0) / iters

        c1 = steps_cost(1)
        c5 = steps_cost(5)
        w.section("spec_verify_s5_vs_s1_step_cost", round(c5 / c1, 4))
        w.mark(f"verify-step cost: S=5 {c5 * 1e3:.2f} ms vs S=1 "
               f"{c1 * 1e3:.2f} ms ({c5 / c1:.3f}x)")
    except Exception as exc:  # noqa: BLE001
        w.mark(f"spec step-cost section skipped: {exc}")

    # -- kernel A/Bs, same process (a fresh process would re-pay the tunnel
    # stall — measured 47-74 s — out of its own budget) -----------------------
    del engine, model, params
    _kern_sections(w, jax, time_left)


def stage_kern(w: StageWriter) -> None:
    """Standalone fallback for the kernel A/B sections (normally they run in
    stage_sched's tail; the parent only schedules this stage when no
    ``decode_b*`` section landed)."""
    jax = _stage_setup(w)
    _kern_sections(w, jax, lambda: float("inf"))


def _kern_sections(w: StageWriter, jax, time_left) -> None:
    """Kernel A/Bs the round-4 verdict asked to measure, in priority order:
    (1) int8 KV vs bf16 KV where cache bytes rival weight bytes (b=16, 8K)
        — the config where halved cache traffic must show up if it ever does
        (it does: the crossover recorded in docs/08);
    (2) folded-heads flash decode for BF16 batched decode (b=4, 8K) vs the
        per-head kernel vs XLA — the 8x per-program amortization argument,
        previously gated to quantized caches only;
    (3) long context past 8K: 16K-context b=1 decode, XLA vs flash.
    ``time_left()`` gates each config: skipping a config cleanly beats the
    parent killing the stage mid-measurement."""
    import dataclasses

    import jax.numpy as jnp
    from jax import lax

    from llama_nuts_and_bolts_tpu.io.params import ModelArgs
    from llama_nuts_and_bolts_tpu.models.llama import (
        forward, init_random_params,
    )
    from llama_nuts_and_bolts_tpu.models.llama.model import KVCache
    from llama_nuts_and_bolts_tpu.models.llama.rope import (
        precompute_rope_tables,
    )

    if TINY_MODE:
        decode_steps = 8
        configs = [("b2_256", 2, 256, ["xla", "flash_folded"], "bf16", 2, 0),
                   ("b4_256_kvab", 4, 256, ["xla"], "both", 2, 0)]
    else:
        decode_steps = 64

        def kv_layer(b, t):   # bf16 cache bytes per layer at batch b, ctx t
            return 2 * b * t * 8 * 128 * 2
        l_b4 = pick_layer_count(device_budget(), kv_layer(4, 8192),
                                reserve_flat=1 << 30)
        l_b16 = pick_layer_count(device_budget(), kv_layer(16, 8192),
                                 reserve_flat=1 << 30)
        # the 16K ratio (flash vs xla at long context) transfers across
        # depth; capping layers keeps init+compile inside the stage tail
        l_16k = min(16, pick_layer_count(device_budget(), kv_layer(1, 16384),
                                         reserve_flat=1 << 30))
        configs = [
            (f"b16_8k_{l_b16}L", 16, 8192, ["xla"], "both", l_b16, 50),
            (f"b4_8k_{l_b4}L", 4, 8192, ["xla", "flash", "flash_folded"],
             "bf16", l_b4, 75),
            (f"b1_16k_{l_16k}L", 1, 16384, ["xla", "flash"], "bf16",
             l_16k, 50),
        ]

    for tag, B, T, impls, kv_mode, n_layers, est_s in configs:
        if time_left() < est_s:
            w.mark(f"kern {tag} skipped: {time_left():.0f}s left < "
                   f"~{est_s}s needed")
            continue
        try:
            cfg = (ModelArgs(dim=256, n_layers=n_layers, n_heads=8,
                             n_kv_heads=4, vocab_size=2048, multiple_of=64,
                             norm_eps=1e-5, rope_theta=500000.0,
                             use_scaled_rope=True, max_sequence_length=T)
                   if TINY_MODE else
                   ModelArgs(dim=4096, n_layers=n_layers, n_heads=32,
                             n_kv_heads=8, vocab_size=128256,
                             multiple_of=1024, ffn_dim_multiplier=1.3,
                             norm_eps=1e-5, rope_theta=500000.0,
                             use_scaled_rope=True, max_sequence_length=T))
            w.mark(f"kern {tag}: init params ({n_layers}L, ctx {T}, b{B})")
            params = jax.jit(init_random_params, static_argnums=(0, 2, 3))(
                cfg, jax.random.PRNGKey(0), jnp.bfloat16, True)
            if T > cfg.max_sequence_length:
                cos, sin = precompute_rope_tables(
                    cfg.head_dim, 2 * T, cfg.rope_theta, cfg.use_scaled_rope)
                params = dataclasses.replace(
                    params, rope_cos=jnp.asarray(cos),
                    rope_sin=jnp.asarray(sin))
            sync(params)

            def make_decode(impl, cfg=cfg):
                def decode(params, cache, tok, start_pos):
                    def body(carry, _):
                        tok, pos, cache = carry
                        logits, cache = forward(params, cfg, tok, pos, cache,
                                                attn_impl=impl)
                        nxt = jnp.argmax(logits[:, -1:],
                                         axis=-1).astype(jnp.int32)
                        return (nxt, pos + 1, cache), nxt[:, 0]

                    (tok, pos, cache), toks = lax.scan(
                        body, (tok, start_pos, cache), None,
                        length=decode_steps)
                    return toks, cache

                return decode

            start = T - decode_steps - 2
            tok = jnp.ones((B, 1), jnp.int32)
            variants = []
            if kv_mode in ("bf16", "both"):
                variants += [(f"bf16kv_{i}", i, jnp.bfloat16) for i in impls]
            if kv_mode == "both":
                variants += [("int8kv_flash", "flash", jnp.int8)]
            for name, impl, kv_dtype in variants:
                djit = jax.jit(make_decode(impl), donate_argnums=(1,))
                cache = KVCache.create(cfg, B, T, dtype=kv_dtype)
                toks, cache2 = djit(params, cache, tok, start)
                sync(toks)  # compile
                del cache2
                cache = KVCache.create(cfg, B, T, dtype=kv_dtype)
                t0 = time.perf_counter()
                toks, cache2 = djit(params, cache, tok, start)
                sync(toks)
                rate = B * decode_steps / (time.perf_counter() - t0)
                del cache2
                w.section(f"decode_{tag}_{name}_tokens_per_s", round(rate, 2))
                w.mark(f"kern {tag} {name}: {rate:.2f} tok/s")
            del params
        except Exception as exc:  # noqa: BLE001
            w.mark(f"kern {tag} skipped: {exc}")

    # -- paged decode kernel A/B: block-table Pallas vs the XLA gather -------
    # "the Pallas paged kernel beats the gather path" previously lived only
    # in commit messages (round-4 verdict finding) — record it officially.
    try:
        from llama_nuts_and_bolts_tpu.models.llama.paged import (
            PagedKVPool, paged_decode_step,
        )

        if TINY_MODE:
            B, T, bs, pg_layers, pg_steps = 2, 128, 16, 1, 4
            pg_cfg = ModelArgs(dim=256, n_layers=1, n_heads=8, n_kv_heads=4,
                               vocab_size=2048, multiple_of=64, norm_eps=1e-5,
                               rope_theta=500000.0, use_scaled_rope=True,
                               max_sequence_length=T)
        else:
            if time_left() < 60:
                raise RuntimeError(f"{time_left():.0f}s left < ~60s needed")
            B, T, bs, pg_steps = 4, 2048, 64, 48
            n_blocks = 1 + B * (T // bs)
            pool_per_layer = 2 * n_blocks * 8 * bs * 128 * 2
            pg_layers = pick_layer_count(device_budget(), pool_per_layer,
                                         reserve_flat=1 << 30)
            pg_cfg = ModelArgs(dim=4096, n_layers=pg_layers, n_heads=32,
                               n_kv_heads=8, vocab_size=128256,
                               multiple_of=1024, ffn_dim_multiplier=1.3,
                               norm_eps=1e-5, rope_theta=500000.0,
                               use_scaled_rope=True, max_sequence_length=T)
        w.mark(f"kern paged A/B: init params ({pg_layers}L, split layout)")
        params = jax.jit(init_random_params, static_argnums=(0, 2, 3))(
            pg_cfg, jax.random.PRNGKey(0), jnp.bfloat16, False)
        sync(params)
        n_blocks = 1 + B * (T // bs)
        per_row = T // bs
        tables = jnp.asarray(
            [[1 + i * per_row + j for j in range(per_row)]
             for i in range(B)], jnp.int32)
        poss = jnp.full((B,), T - pg_steps - 2, jnp.int32)
        tok = jnp.ones((B, 1), jnp.int32)

        def make_paged_decode(impl):
            def decode(params, pool, tok, poss):
                def body(carry, _):
                    tok, poss, pool = carry
                    logits, pool = paged_decode_step(
                        params, pg_cfg, tok, poss, pool, tables,
                        attn_impl=impl)
                    nxt = jnp.argmax(logits, axis=-1)[:, None].astype(
                        jnp.int32)
                    return (nxt, poss + 1, pool), nxt[:, 0]

                (tok, poss, pool), toks = lax.scan(
                    body, (tok, poss, pool), None, length=pg_steps)
                return toks, pool

            return decode

        for impl in ("xla", "pallas"):
            djit = jax.jit(make_paged_decode(impl), donate_argnums=(1,))
            toks, pool2 = djit(params, PagedKVPool.create(pg_cfg, n_blocks, bs),
                               tok, poss)
            sync(toks)  # compile
            del pool2
            pool = PagedKVPool.create(pg_cfg, n_blocks, bs)
            t0 = time.perf_counter()
            toks, pool2 = djit(params, pool, tok, poss)
            sync(toks)
            rate = B * pg_steps / (time.perf_counter() - t0)
            del pool2
            w.section(f"decode_paged_b{B}_t{T}_{impl}_tokens_per_s",
                      round(rate, 2))
            w.mark(f"kern paged {impl}: {rate:.2f} tok/s")
        del params
    except Exception as exc:  # noqa: BLE001
        w.mark(f"kern paged A/B skipped: {exc}")


def stage_entry(stage: str, out_path: str,
                budget_s: float = float("inf")) -> None:
    w = StageWriter(out_path)
    try:
        if stage == "main":
            stage_main(w)
        elif stage == "main_small":
            stage_main(w, small=True)
        elif stage == "quant":
            stage_quant(w)
        elif stage == "sched":
            stage_sched(w, budget_s=budget_s)
        elif stage == "kern":
            stage_kern(w)
        else:
            raise ValueError(f"unknown stage {stage!r}")
    except Exception as exc:  # noqa: BLE001 - snapshot already on disk
        w.mark(f"stage {stage!r} aborted: {type(exc).__name__}: {exc}")
        raise


if __name__ == "__main__":
    if "--stage" in sys.argv:
        i = sys.argv.index("--stage")
        budget = (float(sys.argv[sys.argv.index("--budget") + 1])
                  if "--budget" in sys.argv else float("inf"))
        stage_entry(sys.argv[i + 1], sys.argv[sys.argv.index("--out") + 1],
                    budget)
    else:
        parent_main()
