"""Serving walkthrough: start the OpenAI-compatible server in-process and
exercise the production features — continuous batching, paged KV cache,
per-request sampling with seeds, stop sequences, logprobs, speculation, and
the Prometheus metrics endpoint.

Smoke-test without weights:
    python examples/serving_client.py --tiny
or against real model files:
    python examples/serving_client.py --model-dir models-original/Meta-Llama-3.1-8B-Instruct
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import threading
import urllib.request

from llama_nuts_and_bolts_tpu import InferenceArgs, InferenceEngine
from llama_nuts_and_bolts_tpu.serving.server import LlamaHTTPServer


def post(base, path, obj):
    req = urllib.request.Request(base + path, json.dumps(obj).encode(),
                                 {"Content-Type": "application/json"})
    return json.load(urllib.request.urlopen(req, timeout=300))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model-dir")
    p.add_argument("--tiny", action="store_true")
    args = p.parse_args()

    if args.tiny:
        from llama_nuts_and_bolts_tpu.cli.main import load_tiny_model

        model = load_tiny_model()
    else:
        from llama_nuts_and_bolts_tpu import load_llama_model

        model = load_llama_model(args.model_dir, max_sequence_length=512)

    engine = InferenceEngine(
        model, InferenceArgs(sequence_length=256, speculate_k=4))
    # continuous batching over a PAGED block pool; speculation rides the
    # shared decode step (engine args carry speculate_k)
    server = LlamaHTTPServer(engine, "demo", continuous_slots=4,
                             paged_blocks=64)
    port = server.start_background()
    base = f"http://127.0.0.1:{port}"
    print(f"server on {base}")

    # 1) three concurrent requests share decode steps (continuous batching)
    results = {}

    def hit(i, temperature, seed):
        try:
            r = post(base, "/v1/completions",
                     {"prompt": "The answer is", "max_tokens": 12,
                      "temperature": temperature, "seed": seed})
            results[i] = r["choices"][0]["text"]
        except Exception as exc:   # surface thread failures in the output
            results[i] = f"<request failed: {exc!r}>"

    threads = [threading.Thread(target=hit, args=(0, 0.0, None)),
               threading.Thread(target=hit, args=(1, 0.8, 7)),
               threading.Thread(target=hit, args=(2, 0.8, 7))]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    print("greedy :", repr(results[0][:60]))
    print("seeded sampling reproducible:", results[1] == results[2])

    # 2) stop sequences + logprobs
    r = post(base, "/v1/completions",
             {"prompt": "The answer is", "max_tokens": 12, "logprobs": 3,
              "stop": results[0][4:6] or None})
    ch = r["choices"][0]
    print(f"stop cut after {len(ch['logprobs']['tokens'])} tokens "
          f"(finish={ch['finish_reason']})")

    # 3) chat endpoint with SSE streaming
    req = urllib.request.Request(
        base + "/v1/chat/completions",
        json.dumps({"messages": [{"role": "user", "content": "Hi"}],
                    "max_tokens": 8, "stream": True}).encode(),
        {"Content-Type": "application/json"})
    print("streamed chat: ", end="")
    with urllib.request.urlopen(req, timeout=300) as resp:
        for line in resp:
            line = line.decode().strip()
            if line.startswith("data: ") and line != "data: [DONE]":
                delta = json.loads(line[6:])["choices"][0].get("delta") or {}
                print(delta.get("content", ""), end="", flush=True)
    print()

    # 4) observability
    metrics = urllib.request.urlopen(base + "/metrics").read().decode()
    for line in metrics.splitlines():
        if not line.startswith("#"):
            print("metric:", line)
    server.shutdown()


if __name__ == "__main__":
    main()
