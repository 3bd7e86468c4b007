"""HTTP serving layer: OpenAI-style endpoints against the tiny engine."""

import json
import urllib.error
import urllib.request

import pytest

from llama_nuts_and_bolts_tpu.serving.server import LlamaHTTPServer

from tests.test_streaming import make_engine


@pytest.fixture(scope="module")
def server():
    srv = LlamaHTTPServer(make_engine(sequence_length=32), model_name="tiny-test")
    port = srv.start_background()
    yield f"http://127.0.0.1:{port}"
    srv.shutdown()


def post(url, obj):
    req = urllib.request.Request(
        url, data=json.dumps(obj).encode(), method="POST",
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=120) as resp:
        return resp.status, json.loads(resp.read())


def test_health_and_models(server):
    with urllib.request.urlopen(server + "/health", timeout=30) as r:
        health = json.loads(r.read())
    assert health["status"] == "ok" and health["model"] == "tiny-test"
    with urllib.request.urlopen(server + "/v1/models", timeout=30) as r:
        models = json.loads(r.read())
    assert models["data"][0]["id"] == "tiny-test"


def test_completions(server):
    status, body = post(server + "/v1/completions",
                        {"prompt": "hello", "max_tokens": 8})
    assert status == 200
    choice = body["choices"][0]
    assert choice["finish_reason"] in ("stop", "length")
    assert isinstance(choice["text"], str)
    assert body["usage"]["prompt_tokens"] > 0


def test_chat_completions(server):
    status, body = post(server + "/v1/chat/completions",
                        {"messages": [{"role": "user", "content": "hi"}],
                         "max_tokens": 8})
    assert status == 200
    msg = body["choices"][0]["message"]
    assert msg["role"] == "assistant"
    assert isinstance(msg["content"], str)


def test_streaming_sse(server):
    req = urllib.request.Request(
        server + "/v1/chat/completions",
        data=json.dumps({"messages": [{"role": "user", "content": "hi"}],
                         "max_tokens": 6, "stream": True}).encode(),
        method="POST", headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=120) as resp:
        assert resp.headers["Content-Type"].startswith("text/event-stream")
        raw = resp.read().decode()
    events = [line[6:] for line in raw.split("\n") if line.startswith("data: ")]
    assert events[-1] == "[DONE]"
    chunks = [json.loads(e) for e in events[:-1]]
    assert chunks, "no streamed chunks"
    assert chunks[0]["object"] == "chat.completion.chunk"
    assert all("delta" in c["choices"][0] for c in chunks)


def test_bad_requests(server):
    with pytest.raises(urllib.error.HTTPError) as e:
        post(server + "/v1/completions", {"prompt": ""})
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        post(server + "/v1/chat/completions", {"messages": []})
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        post(server + "/v1/nonexistent", {})
    assert e.value.code == 404


def test_max_tokens_respected(server):
    status, body = post(server + "/v1/completions",
                        {"prompt": "abc", "max_tokens": 3})
    assert status == 200
    assert body["usage"]["completion_tokens"] <= 4  # +1 possible resend flush


def test_continuous_mode_concurrent_requests_match_serialized():
    """--continuous mode: concurrent greedy requests share decode steps and
    return exactly what the serialized server returns."""
    import threading

    eng = make_engine(sequence_length=32)
    srv_serial = LlamaHTTPServer(make_engine(sequence_length=32), model_name="t")
    port_serial = srv_serial.start_background()
    srv_cont = LlamaHTTPServer(eng, model_name="t", continuous_slots=4)
    port_cont = srv_cont.start_background()
    try:
        prompts = ["hello world", "Hi", "hello hello hello"]
        expected = {}
        for p in prompts:
            _, body = post(f"http://127.0.0.1:{port_serial}/v1/completions",
                           {"prompt": p, "max_tokens": 8})
            expected[p] = body["choices"][0]["text"]

        results, errors = {}, []
        def fetch(p):
            try:
                _, body = post(f"http://127.0.0.1:{port_cont}/v1/completions",
                               {"prompt": p, "max_tokens": 8})
                results[p] = body["choices"][0]["text"]
            except Exception as exc:  # surface in the main thread
                errors.append((p, repr(exc)))
        threads = [threading.Thread(target=fetch, args=(p,)) for p in prompts]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert not errors, f"concurrent request errors: {errors}"
        assert not any(t.is_alive() for t in threads), "request timed out"
        assert results == expected
    finally:
        srv_serial.shutdown()
        srv_cont.shutdown()


def test_cached_system_prompt_matches_uncached():
    """A server-side cached system prompt changes nothing about responses —
    requests carrying that system prompt just skip recomputing its KV block."""
    from llama_nuts_and_bolts_tpu.tokenizer import PromptPart, render_prefix_tokens

    messages = [{"role": "system", "content": "Be brief."},
                {"role": "user", "content": "hello"}]

    srv_cold = LlamaHTTPServer(make_engine(sequence_length=48), model_name="t")
    port_cold = srv_cold.start_background()
    eng = make_engine(sequence_length=48)
    eng.cache_prefix(render_prefix_tokens(
        [PromptPart("system", "Be brief.")],
        eng.model.vocab, eng.model.mergeable_ranks))
    srv_warm = LlamaHTTPServer(eng, model_name="t")
    port_warm = srv_warm.start_background()
    try:
        _, cold = post(f"http://127.0.0.1:{port_cold}/v1/chat/completions",
                       {"messages": messages, "max_tokens": 8})
        # the request's rendered prompt must actually hit the snapshot
        rendered = eng.tokenize([PromptPart(m["role"], m["content"])
                                 for m in messages])
        assert eng._match_prefix(rendered) is not None
        _, warm = post(f"http://127.0.0.1:{port_warm}/v1/chat/completions",
                       {"messages": messages, "max_tokens": 8})
        assert warm["choices"][0]["message"] == cold["choices"][0]["message"]
    finally:
        srv_cold.shutdown()
        srv_warm.shutdown()


def test_stream_failure_emits_error_chunk_and_counts_failed():
    """A generation failure mid-stream must terminate the chunked body with
    an SSE error chunk + [DONE] and count as a failed request (round-4
    advisor finding: previously the exception propagated out of the
    handler, leaving the response unterminated and the failure uncounted
    in /metrics)."""
    srv = LlamaHTTPServer(make_engine(sequence_length=32), model_name="t")

    def boom(*a, **k):
        yield ("ok", None)
        raise RuntimeError("device fell over")

    srv.generate = boom
    port = srv.start_background()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/completions",
            data=json.dumps({"prompt": "hi", "max_tokens": 4,
                             "stream": True}).encode(),
            method="POST", headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=60) as resp:
            assert resp.status == 200          # headers were already sent
            raw = resp.read().decode()         # must NOT hang / reset
        events = [ln[6:] for ln in raw.split("\n") if ln.startswith("data: ")]
        assert events[-1] == "[DONE]"
        errs = [json.loads(e) for e in events[:-1] if "error" in e]
        assert any("generation failed" in j["error"]["message"] for j in errs)
        # the handler counts the failure AFTER terminating the body the
        # client just finished reading — give its thread a moment
        import time as _time

        deadline = _time.time() + 5
        while (srv.metrics["requests_failed"] != 1
               and _time.time() < deadline):
            _time.sleep(0.02)
        assert srv.metrics["requests_failed"] == 1
        assert srv.metrics["requests_total"] == 1
    finally:
        srv.shutdown()


def test_prewarm_then_immediate_concurrent_cold_start():
    """prewarm() compiles the batcher's prefill + decode executables before
    the socket opens; a burst of concurrent FIRST requests right after
    startup must all succeed and match the serialized server (the cold-start
    phase of the soak, in miniature)."""
    import threading

    srv_serial = LlamaHTTPServer(make_engine(sequence_length=32), model_name="t")
    port_serial = srv_serial.start_background()
    srv = LlamaHTTPServer(make_engine(sequence_length=32), model_name="t",
                          continuous_slots=3)
    dt = srv.prewarm()
    assert dt >= 0.0
    port = srv.start_background()
    try:
        prompts = ["hello world", "Hi", "hello hello"]
        expected = {p: post(f"http://127.0.0.1:{port_serial}/v1/completions",
                            {"prompt": p, "max_tokens": 8})[1]
                    ["choices"][0]["text"] for p in prompts}
        results, errors = {}, []

        def fetch(p):
            try:
                _, body = post(f"http://127.0.0.1:{port}/v1/completions",
                               {"prompt": p, "max_tokens": 8})
                results[p] = body["choices"][0]["text"]
            except Exception as exc:
                errors.append((p, repr(exc)))

        threads = [threading.Thread(target=fetch, args=(p,)) for p in prompts]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert not errors, errors
        assert results == expected
    finally:
        srv_serial.shutdown()
        srv.shutdown()


def test_token_timeout_stall_fails_cleanly():
    """A batcher that stops delivering (stalled device / pathological
    compile) must fail the request CLEANLY once token_timeout_s elapses:
    non-stream -> 500 'generation failed'; stream -> SSE error chunk +
    [DONE]; both counted as failed in /metrics (round-4 verdict item 6)."""
    import time as _time

    srv = LlamaHTTPServer(make_engine(sequence_length=32), model_name="t",
                          continuous_slots=2, token_timeout_s=0.5)
    srv.batcher.step = lambda: _time.sleep(0.05)   # wedge the scheduler
    port = srv.start_background()
    try:
        with pytest.raises(urllib.error.HTTPError) as e:
            post(f"http://127.0.0.1:{port}/v1/completions",
                 {"prompt": "hi", "max_tokens": 4})
        assert e.value.code == 500
        assert "generation failed" in json.loads(
            e.value.read())["error"]["message"]

        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/completions",
            data=json.dumps({"prompt": "hi", "max_tokens": 4,
                             "stream": True}).encode(),
            method="POST", headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=60) as resp:
            raw = resp.read().decode()
        events = [ln[6:] for ln in raw.split("\n") if ln.startswith("data: ")]
        assert events[-1] == "[DONE]"
        assert any("generation failed" in e for e in events)
        assert srv.metrics["requests_failed"] == 2
    finally:
        srv.shutdown()


# ----------------------------------------------------------- stop sequences

def test_stop_sequence_truncates(server):
    """`stop` cuts at the first occurrence, never emits the stop text, and
    reports finish_reason \"stop\" — for streaming and non-streaming alike."""
    _, base = post(server + "/v1/completions",
                   {"prompt": "hello", "max_tokens": 10})
    full = base["choices"][0]["text"]
    assert len(full) >= 4, "need some generated text to pick a stop from"
    stop = full[2:4]
    _, body = post(server + "/v1/completions",
                   {"prompt": "hello", "max_tokens": 10, "stop": stop})
    choice = body["choices"][0]
    assert choice["text"] == full[:full.find(stop)]
    assert stop not in choice["text"]
    assert choice["finish_reason"] == "stop"

    # streaming path (pieces may straddle the stop string)
    req = urllib.request.Request(
        server + "/v1/completions",
        data=json.dumps({"prompt": "hello", "max_tokens": 10,
                         "stream": True, "stop": [stop]}).encode(),
        method="POST", headers={"Content-Type": "application/json"})
    text, finish = "", None
    with urllib.request.urlopen(req, timeout=120) as resp:
        for line in resp:
            line = line.decode().strip()
            if not line.startswith("data: ") or line == "data: [DONE]":
                continue
            obj = json.loads(line[6:])
            ch = obj["choices"][0]
            text += ch.get("text", "")
            finish = ch["finish_reason"] or finish
    assert text == full[:full.find(stop)]
    assert finish == "stop"


def test_stop_sequence_rejects_bad_values(server):
    status = post.__defaults__  # noqa: F841 (lint quiet)
    try:
        post(server + "/v1/completions",
             {"prompt": "hello", "max_tokens": 4, "stop": ["a", "b", "c", "d", "e"]})
        raised = False
    except urllib.error.HTTPError as e:
        raised = e.code == 400
    assert raised


def test_metrics_endpoint(server):
    post(server + "/v1/completions", {"prompt": "hello", "max_tokens": 4})
    with urllib.request.urlopen(server + "/metrics", timeout=30) as r:
        assert r.headers["Content-Type"].startswith("text/plain")
        text = r.read().decode()
    metrics = {l.split()[0]: float(l.split()[1])
               for l in text.splitlines() if l and not l.startswith("#")}
    assert metrics["llama_requests_total"] >= 1
    assert metrics["llama_tokens_generated_total"] >= 1
    assert metrics["llama_requests_failed_total"] >= 0
    assert metrics["llama_generation_seconds_total"] > 0


# ---------------------------------------------------------------- logprobs

@pytest.fixture(scope="module")
def cont_server():
    srv = LlamaHTTPServer(make_engine(sequence_length=32),
                          model_name="tiny-cont", continuous_slots=2)
    port = srv.start_background()
    yield f"http://127.0.0.1:{port}"
    srv.shutdown()


def test_completions_logprobs(cont_server):
    _, body = post(cont_server + "/v1/completions",
                   {"prompt": "hello", "max_tokens": 5, "logprobs": 3})
    ch = body["choices"][0]
    lp = ch["logprobs"]
    n = len(lp["tokens"])
    assert n == len(lp["token_logprobs"]) == len(lp["top_logprobs"]) > 0
    assert all(v <= 0.0 for v in lp["token_logprobs"])
    # greedy: the chosen token must be the top-1 entry of its distribution
    for tok_lp, tops in zip(lp["token_logprobs"], lp["top_logprobs"]):
        assert len(tops) == 3
        assert tok_lp >= max(tops.values()) - 1e-5


def test_chat_logprobs(cont_server):
    _, body = post(cont_server + "/v1/chat/completions",
                   {"messages": [{"role": "user", "content": "hi"}],
                    "max_tokens": 4, "logprobs": True, "top_logprobs": 2})
    content = body["choices"][0]["logprobs"]["content"]
    assert len(content) > 0
    for e in content:
        assert e["logprob"] <= 0.0
        assert len(e["top_logprobs"]) == 2


def test_logprobs_rejected_without_batcher(server):
    try:
        post(server + "/v1/completions",
             {"prompt": "hello", "max_tokens": 4, "logprobs": 2})
        assert False, "expected 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_completions_streamed_logprobs(cont_server):
    """Completions streaming carries the legacy logprobs wire format; the
    union across chunks must match the non-streamed response."""
    msg = {"prompt": "hello", "max_tokens": 4, "logprobs": 2}
    _, block = post(cont_server + "/v1/completions", msg)
    blp = block["choices"][0]["logprobs"]

    req = urllib.request.Request(
        cont_server + "/v1/completions",
        data=json.dumps({**msg, "stream": True}).encode(), method="POST",
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=120) as resp:
        raw = resp.read().decode()
    events = [line[6:] for line in raw.split("\n") if line.startswith("data: ")]
    assert events[-1] == "[DONE]"
    toks, lps = [], []
    for e in events[:-1]:
        choice = json.loads(e)["choices"][0]
        lp = choice.get("logprobs")
        if lp:
            toks.extend(lp["tokens"])
            lps.extend(lp["token_logprobs"])
    assert toks == blp["tokens"]
    for a, b in zip(lps, blp["token_logprobs"]):
        assert abs(a - b) < 1e-5


# ------------------------------------------------------- review regressions

def test_serial_path_honors_seed_and_top_k(server):
    """Without --continuous, sampling params must still be honored: same
    seed reproduces, top_k=1 equals greedy."""
    def go(extra):
        _, b = post(server + "/v1/completions",
                    dict({"prompt": "hello", "max_tokens": 6}, **extra))
        return b["choices"][0]["text"]

    greedy = go({})
    s1 = go({"temperature": 1.5, "seed": 5})
    s2 = go({"temperature": 1.5, "seed": 5})
    s3 = go({"temperature": 1.5, "seed": 6})
    k1 = go({"temperature": 0.9, "top_k": 1, "seed": 7})
    assert s1 == s2
    assert s1 != s3 or s1 != greedy     # extremely likely both; allow either
    assert k1 == greedy


def test_logprobs_align_with_stop_cut(cont_server):
    _, base = post(cont_server + "/v1/completions",
                   {"prompt": "hello", "max_tokens": 8, "logprobs": 2})
    full = base["choices"][0]["text"]
    lp_full = base["choices"][0]["logprobs"]
    assert len(full) >= 4
    stop = full[2:4]
    _, body = post(cont_server + "/v1/completions",
                   {"prompt": "hello", "max_tokens": 8, "logprobs": 2,
                    "stop": stop})
    ch = body["choices"][0]
    lp = ch["logprobs"]
    assert ch["finish_reason"] == "stop"
    assert len(lp["tokens"]) <= len(lp_full["tokens"])
    assert len(lp["tokens"]) == len(lp["token_logprobs"])
    assert body["usage"]["completion_tokens"] == len(lp["tokens"])


def test_chat_streamed_logprobs_match_block(cont_server):
    """stream=true with logprobs (chat, no stop): the union of per-chunk
    logprob entries must equal the non-streamed response's content entries,
    and the concatenated deltas must equal the block content."""
    msg = {"messages": [{"role": "user", "content": "hi"}],
           "max_tokens": 5, "logprobs": True, "top_logprobs": 2}
    _, block = post(cont_server + "/v1/chat/completions", msg)
    block_entries = block["choices"][0]["logprobs"]["content"]
    block_text = block["choices"][0]["message"]["content"]

    req = urllib.request.Request(
        cont_server + "/v1/chat/completions",
        data=json.dumps({**msg, "stream": True}).encode(), method="POST",
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=120) as resp:
        raw = resp.read().decode()
    events = [line[6:] for line in raw.split("\n") if line.startswith("data: ")]
    assert events[-1] == "[DONE]"
    text, entries = [], []
    for e in events[:-1]:
        choice = json.loads(e)["choices"][0]
        text.append(choice["delta"].get("content", ""))
        entries.extend(choice.get("logprobs", {}).get("content", []))
    assert "".join(text) == block_text
    assert [en["token"] for en in entries] == [
        en["token"] for en in block_entries]
    for a, b in zip(entries, block_entries):
        assert abs(a["logprob"] - b["logprob"]) < 1e-5
        assert [t["token"] for t in a["top_logprobs"]] == [
            t["token"] for t in b["top_logprobs"]]


def test_chat_streamed_logprobs_rejected_with_stop(cont_server):
    try:
        post(cont_server + "/v1/chat/completions",
             {"messages": [{"role": "user", "content": "hi"}],
              "max_tokens": 4, "logprobs": True, "stream": True,
              "stop": ["xyz"]})
        assert False, "expected 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_midstream_client_disconnect_frees_slot(cont_server):
    """A client that opens a stream, reads a couple of SSE chunks, and
    slams the socket shut must not wedge the scheduler: the write error
    cancels the batcher request (slot freed — /health active returns to 0)
    and subsequent requests serve normally."""
    import socket
    import time as _time
    from urllib.parse import urlparse

    u = urlparse(cont_server)
    body = json.dumps({"messages": [{"role": "user", "content": "hi"}],
                       "max_tokens": 24, "stream": True}).encode()
    s = socket.create_connection((u.hostname, u.port), timeout=30)
    s.sendall(b"POST /v1/chat/completions HTTP/1.1\r\n"
              b"Host: x\r\nContent-Type: application/json\r\n"
              b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n"
              + body)
    s.recv(512)              # headers + first chunk(s) arrive
    s.setsockopt(socket.SOL_SOCKET, socket.SO_LINGER,
                 b"\x01\x00\x00\x00\x00\x00\x00\x00")  # RST on close
    s.close()

    # the generator unwinds on the next failed write; slot drains to 0
    deadline = _time.time() + 30
    while _time.time() < deadline:
        with urllib.request.urlopen(cont_server + "/health", timeout=30) as r:
            h = json.loads(r.read())
        if h["continuous"]["active"] == 0:
            break
        _time.sleep(0.2)
    assert h["continuous"]["active"] == 0, h

    status, resp = post(cont_server + "/v1/chat/completions",
                        {"messages": [{"role": "user", "content": "again"}],
                         "max_tokens": 6})
    assert status == 200
    assert resp["choices"][0]["finish_reason"] in ("stop", "length")


def test_speculation_acceptance_exposed_in_metrics_and_health():
    """--continuous + --speculate must export acceptance telemetry: the
    number that decides whether speculation pays for a workload (docs/21)
    has to be readable in production, not only on the sequential engine."""
    eng = make_engine(sequence_length=32, speculate_k=2)
    srv = LlamaHTTPServer(eng, model_name="tiny-spec", continuous_slots=2)
    port = srv.start_background()
    base = f"http://127.0.0.1:{port}"
    try:
        post(base + "/v1/completions", {"prompt": "aaaa aaaa aaaa",
                                        "max_tokens": 10})
        with urllib.request.urlopen(base + "/metrics", timeout=30) as r:
            text = r.read().decode()
        assert "llama_spec_drafted_total" in text
        assert "llama_spec_verify_steps_total" in text
        with urllib.request.urlopen(base + "/health", timeout=30) as r:
            h = json.loads(r.read())
        spec = h["continuous"]["speculation"]
        assert spec["k"] == 2
        assert {"drafted", "accepted", "acceptance"} <= set(spec)
    finally:
        srv.shutdown()
