"""Sustained concurrent-load soak of the full serving stack.

Drives the HTTP server with 16 concurrent STREAMING clients for >= 60 s
through the continuous scheduler + paged KV pool + native block allocator
together — the production-serving composition that the per-feature tests
(tests/test_serving.py, tests/test_paged.py) only exercise at short-run
scale. Asserts: zero 5xx, zero malformed SSE streams, no token interleaving
across streams (every response byte-equal to that prompt's serialized
greedy answer), and /metrics that stay consistent throughout.

This is the reference's fail-fast posture (SURVEY §5.3) held at production
scale: any scheduler/pool/allocator race surfaces as a corrupted stream or
a 5xx here.
"""

import json
import threading
import time
import urllib.request

import pytest

from llama_nuts_and_bolts_tpu.serving.server import LlamaHTTPServer

from tests.test_streaming import make_engine

SOAK_SECONDS = 60
N_CLIENTS = 16
MAX_TOKENS = 6


def _post(url, obj, timeout=180):
    req = urllib.request.Request(
        url, data=json.dumps(obj).encode(), method="POST",
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return resp.status, json.loads(resp.read())


def _stream(url, obj, timeout=180, max_429_retries=10):
    """POST with stream=True; returns (status, joined_text, well_formed).

    Honors 429 + Retry-After like a well-behaved client: with N_CLIENTS at
    exactly the server's admission bound, a client can legitimately race
    its own previous handler's admission release by a few milliseconds."""
    req = urllib.request.Request(
        url, data=json.dumps({**obj, "stream": True}).encode(), method="POST",
        headers={"Content-Type": "application/json"})
    for _ in range(max_429_retries):
        try:
            resp_cm = urllib.request.urlopen(req, timeout=timeout)
            break
        except urllib.error.HTTPError as exc:
            if exc.code != 429:
                raise
            exc.read()
            time.sleep(float(exc.headers.get("Retry-After", 1)) * 0.1)
    else:
        return 429, "", False
    with resp_cm as resp:
        raw = resp.read().decode()
        status = resp.status
    events = [line[6:] for line in raw.split("\n") if line.startswith("data: ")]
    if not events or events[-1] != "[DONE]":
        return status, "", False
    text = []
    for e in events[:-1]:
        chunk = json.loads(e)
        if chunk.get("object") != "chat.completion.chunk":
            return status, "", False
        delta = chunk["choices"][0]["delta"]
        text.append(delta.get("content", ""))
    return status, "".join(text), True


def _metrics(base):
    with urllib.request.urlopen(base + "/metrics", timeout=30) as r:
        out = {}
        for line in r.read().decode().splitlines():
            if line and not line.startswith("#"):
                k, _, v = line.partition(" ")
                try:
                    out[k] = float(v)
                except ValueError:
                    pass
        return out


@pytest.mark.slow
def test_serving_soak_concurrent_streams():
    engine = make_engine(sequence_length=64)
    srv = LlamaHTTPServer(engine, model_name="tiny-soak",
                          continuous_slots=4, paged_blocks=64)
    port = srv.start_background()
    base = f"http://127.0.0.1:{port}"
    try:
        # distinct prompt per client; expected text = the server's own
        # greedy answer before load (greedy => deterministic per prompt)
        prompts = {i: f"client {i} says hello number {i}"
                   for i in range(N_CLIENTS)}
        expected = {}
        for i, p in prompts.items():
            status, body = _post(base + "/v1/chat/completions",
                                 {"messages": [{"role": "user", "content": p}],
                                  "max_tokens": MAX_TOKENS})
            assert status == 200
            expected[i] = body["choices"][0]["message"]["content"]

        m0 = _metrics(base)
        stats = {"requests": 0, "errors": [], "lock": threading.Lock()}
        deadline = time.monotonic() + SOAK_SECONDS

        def client(i):
            while time.monotonic() < deadline:
                try:
                    status, text, ok = _stream(
                        base + "/v1/chat/completions",
                        {"messages": [{"role": "user",
                                       "content": prompts[i]}],
                         "max_tokens": MAX_TOKENS})
                    with stats["lock"]:
                        stats["requests"] += 1
                        if status != 200:
                            stats["errors"].append((i, f"status {status}"))
                        elif not ok:
                            stats["errors"].append((i, "malformed SSE"))
                        elif text != expected[i]:
                            stats["errors"].append(
                                (i, f"stream corrupted: {text!r} != "
                                    f"{expected[i]!r}"))
                except Exception as exc:  # noqa: BLE001 - recorded, not raised
                    with stats["lock"]:
                        stats["errors"].append((i, repr(exc)))
                    return

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(N_CLIENTS)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=SOAK_SECONDS + 240)
        assert not any(t.is_alive() for t in threads), "soak client hung"
        assert not stats["errors"], stats["errors"][:10]
        # a real soak, not an idle minute
        assert stats["requests"] >= N_CLIENTS * 2, stats["requests"]

        m1 = _metrics(base)
        assert m1["llama_requests_total"] >= (
            m0.get("llama_requests_total", 0) + stats["requests"])
        # the paged pool must end fully drained: no leaked blocks
        if "llama_kv_blocks_in_use" in m1:
            assert m1["llama_kv_blocks_in_use"] == 0, m1
        with urllib.request.urlopen(base + "/health", timeout=30) as r:
            assert json.loads(r.read())["status"] == "ok"
    finally:
        srv.shutdown()


@pytest.mark.slow
def test_serving_overload_bounded_admission():
    """Overload phase: far more concurrent requests than admission slots.
    Asserts the fail-fast posture at production scale (SURVEY §5.3): excess
    load gets an immediate, well-formed 429 (+Retry-After) instead of an
    unbounded handler-thread pileup; every ADMITTED request completes
    correctly; the server drains clean and keeps serving."""
    engine = make_engine(sequence_length=64)
    srv = LlamaHTTPServer(engine, model_name="tiny-overload",
                          continuous_slots=2, paged_blocks=48, max_pending=3)
    port = srv.start_background()
    base = f"http://127.0.0.1:{port}"
    N_FLOOD = 16
    try:
        msg = {"messages": [{"role": "user", "content": "overload probe"}],
               "max_tokens": MAX_TOKENS}
        status, body = _post(base + "/v1/chat/completions", msg)
        assert status == 200
        expected = body["choices"][0]["message"]["content"]

        results = []
        lock = threading.Lock()
        barrier = threading.Barrier(N_FLOOD)

        def client(i):
            barrier.wait()
            try:
                status, body = _post(base + "/v1/chat/completions", msg)
                with lock:
                    results.append((status, body, None))
            except urllib.request.HTTPError as exc:
                payload = json.loads(exc.read() or b"{}")
                with lock:
                    results.append((exc.code, payload,
                                    exc.headers.get("Retry-After")))
            except Exception as exc:  # noqa: BLE001 - recorded, not raised
                with lock:
                    results.append((None, repr(exc), None))

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(N_FLOOD)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=240)
        assert not any(t.is_alive() for t in threads), "flood client hung"
        assert len(results) == N_FLOOD

        ok = [r for r in results if r[0] == 200]
        rejected = [r for r in results if r[0] == 429]
        other = [r for r in results if r[0] not in (200, 429)]
        # a simultaneous 16-connect burst can still exceed the (deepened)
        # TCP backlog on a loaded CI box: a kernel-level connection reset is
        # not a server bug, but it must stay rare and nothing else may fail
        resets = [r for r in other if "ConnectionReset" in str(r[1])]
        assert len(resets) <= 2, resets
        assert len(other) == len(resets), [r for r in other
                                           if r not in resets][:5]
        # the bound actually bit: with 16 near-simultaneous requests and 3
        # admission slots, rejections must occur — and every admitted
        # request produced the correct greedy answer
        assert rejected, "overload never produced a 429"
        assert ok, "no request was admitted under overload"
        for _, body, _ in ok:
            assert body["choices"][0]["message"]["content"] == expected
        for code, payload, retry_after in rejected:
            assert payload["error"]["type"] == "overloaded_error"
            assert retry_after is not None
        # rejections are visible in metrics, and the server drains clean
        m = _metrics(base)
        assert m["llama_requests_rejected_total"] >= len(rejected)
        deadline = time.monotonic() + 30
        while time.monotonic() < deadline and _metrics(base)[
                "llama_inflight_requests"] > 0:
            time.sleep(0.2)
        assert _metrics(base)["llama_inflight_requests"] == 0
        if "llama_kv_blocks_in_use" in m:
            assert _metrics(base)["llama_kv_blocks_in_use"] == 0
        # and it still serves after the flood
        status, body = _post(base + "/v1/chat/completions", msg)
        assert status == 200
        assert body["choices"][0]["message"]["content"] == expected
    finally:
        srv.shutdown()
