"""bench.py orchestration mechanics on the CPU backend.

Round 2's official benchmark record was lost to a wall-clock stall before a
single section was measured; bench.py now runs stages as subprocesses with
snapshot files and fallbacks. This test proves the WHOLE pipeline — parent
scheduling, stage subprocess, snapshot writes, merge, final JSON emission —
end to end with a tiny model, so a regression in the capture machinery is
caught in CI rather than in the one driver run that counts.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_bench_pipeline_tiny():
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        LNB_BENCH_TINY="1",
        LNB_BENCH_BUDGET_S="420",
        XLA_FLAGS="",   # single CPU device; no virtual mesh needed
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, cwd=REPO, timeout=560, env=env)
    json_lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    assert json_lines, f"no JSON emitted:\n{out.stdout}\n{out.stderr[-2000:]}"
    rec = json.loads(json_lines[-1])
    assert set(rec) == {"metric", "value", "unit", "vs_baseline", "detail"}
    assert rec["value"] and rec["value"] > 0, rec
    assert rec["metric"] == "decode_tokens_per_sec_tiny_mechanics"
    detail = rec["detail"]
    # headline + the VERDICT-required TTFT/prefill sections made it through
    for key in ("device", "first_rpc_s", "ttft_cold_s",
                "decode_tokens_per_s_1scan", "p50_ttft_512_s",
                "prefill_512_tokens_per_s", "streamed_chunk8_tokens_per_s",
                # round-5 evidence sections: cache-adjusted roofline, real
                # schedulers end-to-end, speculative, kernel A/Bs
                "roofline_cache_adjusted_tokens_per_s",
                "vs_adjusted_baseline",
                "continuous_sched_b2_delivered_tokens_per_s",
                "continuous_sched_b2_intertoken_p50_ms",
                "continuous_sched_overhead_vs_rawscan",
                "paged_sched_b2_delivered_tokens_per_s",
                "speculative_plain_sync_tokens_per_s",
                "speculative_ngram_k4_tokens_per_s",
                "speculative_ngram_k4_acceptance",
                "speculative_cyclic_k4_tokens_per_s",
                "speculative_cyclic_k4_acceptance",
                "spec_verify_s5_vs_s1_step_cost",
                "decode_b2_256_bf16kv_flash_folded_tokens_per_s",
                "decode_b4_256_kvab_int8kv_flash_tokens_per_s",
                "decode_paged_b2_t128_xla_tokens_per_s",
                "decode_paged_b2_t128_pallas_tokens_per_s"):
        assert key in detail, (key, sorted(detail))


def test_bench_parent_emits_json_even_when_stages_skipped():
    """A budget too small for any stage still yields the one JSON line."""
    env = dict(os.environ, LNB_BENCH_BUDGET_S="1", LNB_BENCH_TINY="1")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, cwd=REPO, timeout=120, env=env)
    json_lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    assert json_lines, out.stdout
    rec = json.loads(json_lines[-1])
    assert rec["value"] is None and rec["unit"] == "tokens/s"


def test_bench_snapshot_merge_prefers_latest():
    sys.path.insert(0, REPO)
    import bench

    results = {}
    bench._merge(results, {"detail": {"a": 1}})
    bench._merge(results, {"detail": {"b": 2}, "metric": "m", "value": 3,
                           "vs_baseline": 0.5})
    assert results == {"detail": {"a": 1, "b": 2}, "metric": "m",
                       "value": 3, "vs_baseline": 0.5}


def test_bench_snapshot_reader_takes_last_parseable(tmp_path):
    sys.path.insert(0, REPO)
    import bench

    p = tmp_path / "s.jsonl"
    p.write_text('{"detail": {"x": 1}}\n{"detail": {"x": 2}}\n{"truncated...')
    assert bench._read_snapshot(str(p)) == {"detail": {"x": 2}}


def test_bench_merge_clears_stale_outage_on_device_success():
    """A killed pre-RPC stage leaves outage markers; a later stage that
    reaches the device must clear them (a final record carrying a valid
    value PLUS outage:true would be contradictory)."""
    sys.path.insert(0, REPO)
    import bench

    results = {}
    # stage 1: killed mid-stall — watcher markers only
    bench._merge(results, {"detail": {"outage": True,
                                      "first_rpc_wait_s": 310.0}})
    assert results["detail"]["outage"] is True
    # stage 2 (retry): reached the device and landed a number
    bench._merge(results, {"detail": {"first_rpc_s": 12.0, "device": "TPU"},
                           "metric": "m", "value": 60.0, "vs_baseline": 0.95})
    assert "outage" not in results["detail"]
    assert "first_rpc_wait_s" not in results["detail"]
    assert results["value"] == 60.0


def test_bench_merge_keeps_outage_when_retry_also_stalls():
    """Two stages both killed pre-RPC: the final record must still carry
    the outage attribution."""
    sys.path.insert(0, REPO)
    import bench

    results = {}
    bench._merge(results, {"detail": {"outage": True,
                                      "first_rpc_wait_s": 300.0}})
    bench._merge(results, {"detail": {"outage": True,
                                      "first_rpc_wait_s": 450.0}})
    assert results["detail"]["outage"] is True
    assert results["detail"]["first_rpc_wait_s"] == 450.0
    assert results.get("value") is None
