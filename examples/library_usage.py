"""Library usage example: load, generate, stream — no CLI.

Run with real model files:
    python examples/library_usage.py --model-dir models-original/Meta-Llama-3.1-8B-Instruct
or smoke-test without weights:
    python examples/library_usage.py --tiny
"""

import argparse

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


if __name__ == "__main__":
    main()
