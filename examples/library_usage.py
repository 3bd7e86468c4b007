"""Library usage example: load, generate, stream — no CLI.

Run with real model files:
    python examples/library_usage.py --model-dir models-original/Meta-Llama-3.1-8B-Instruct
or smoke-test without weights:
    python examples/library_usage.py --tiny
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


from llama_nuts_and_bolts_tpu import InferenceArgs, InferenceEngine, PromptPart


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model-dir")
    p.add_argument("--tiny", action="store_true")
    args = p.parse_args()

    if args.tiny:
        from llama_nuts_and_bolts_tpu.cli.main import load_tiny_model

        model = load_tiny_model()
    else:
        if not args.model_dir:
            p.error("--model-dir DIR is required (or pass --tiny for a "
                    "weights-free smoke test)")
        from llama_nuts_and_bolts_tpu import load_llama_model

        model = load_llama_model(args.model_dir, max_sequence_length=200)

    engine = InferenceEngine(model, InferenceArgs(sequence_length=128))

    # 1. chat-template tokenization
    tokens = engine.tokenize([
        PromptPart("system", "You are terse."),
        PromptPart("user", "Name a planet."),
    ])
    print(f"prompt: {len(tokens)} tokens")

    # 2. streaming generation (emoji-safe decode)
    print("streaming: ", end="", flush=True)
    for part in engine.generate_string(tokens):
        if not part.added_to_waiting:
            print(part.decoded_string, end="", flush=True)
    print()

    # 3. fast non-streaming: entire decode loop on device
    from llama_nuts_and_bolts_tpu.runtime.device_loop import generate_block

    ids, finish = generate_block(engine, tokens, max_new_tokens=32)
    _, text = engine.token_batch_to_string(ids)
    print(f"block ({finish}): {text!r}")

    extras(engine)





def extras(engine):
    """Optional demos: speculative decoding + continuous batching."""
    # 4. speculative greedy decode (exact same tokens, fewer device steps)
    import dataclasses

    spec_engine = InferenceEngine(engine.model,
                                  dataclasses.replace(engine.args, speculate_k=4))
    toks = spec_engine.tokenize_string("one two three one two three one two")
    out = [t for _, t in spec_engine.generate_tokens([1] + toks)]
    print(f"speculative: {len(out)} tokens in {spec_engine.spec_stats['steps']} steps "
          f"({spec_engine.spec_stats['accepted']} drafts accepted)")

    # 5. continuous batching: concurrent requests share decode steps
    from llama_nuts_and_bolts_tpu.runtime.continuous import ContinuousBatcher

    cb = ContinuousBatcher(engine, n_slots=4)
    reqs = [cb.submit([1] + engine.tokenize_string(p), max_new_tokens=16)
            for p in ("hello", "Hi there", "hello hello")]
    cb.run_until_idle()
    for r in reqs:
        ids = [t for _, t in r.tokens()]
        print(f"continuous: slotted request produced {len(ids)} tokens")

if __name__ == "__main__":
    main()
