"""Capture golden greedy outputs for the six predefined prompts.

BASELINE success criterion #1 is exact-token parity with the Go reference's
greedy outputs on its predefined prompts (reference: cmd/main.go:29-36).
This harness makes that check ONE command once the real model files exist:

    python scripts/capture_parity.py --model-dir /path/to/Meta-Llama-3.1-8B-Instruct

It runs each predefined prompt greedily at the reference CLI's sequence cap
(200) and writes ``tests/goldens/predefined_prompts.json`` with the prompt
token ids, generated token ids, finish state, and decoded text. The
weights-gated test ``tests/test_real_model.py::test_predefined_prompt_goldens``
then replays the prompts and requires exact-token equality with the stored
goldens.

Generating the SAME goldens from the Go reference (to cross-check ours):

    cd /path/to/llama-nuts-and-bolts
    go run ./cmd 1   # …6; with debugMode=true (cmd/main.go:25) the token ids
                     # appear in debug.log ("Generated token for curPos …")

or instrument ``generateTokensInternal`` (src/inference/inference.go:236) to
print each emitted token id. The two JSON files must list identical
``generated`` sequences — greedy argmax is deterministic on both sides.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from llama_nuts_and_bolts_tpu.cli.main import PREDEFINED_PROMPTS
from llama_nuts_and_bolts_tpu.models.llama.loader import load_llama_model
from llama_nuts_and_bolts_tpu.runtime import InferenceArgs, InferenceEngine
from llama_nuts_and_bolts_tpu.tokenizer import PromptPart

GOLDENS_PATH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                            "tests", "goldens", "predefined_prompts.json")


def prompt_tokens(engine: InferenceEngine, prompt_input) -> list:
    """Exactly the CLI's tokenization (cli/main.py:run_generation)."""
    if prompt_input.is_chat_mode:
        parts = [PromptPart("system", prompt_input.system_prompt),
                 PromptPart("user", prompt_input.prompt)]
        return engine.tokenize(parts)
    text = prompt_input.prompt
    if not text.endswith(" "):
        text += " "
    return [engine.model.vocab.bos_id] + engine.tokenize_string(text)


def capture_with_engine(engine: InferenceEngine, label: str = "") -> dict:
    out = {"model_dir": label, "seq_len": engine.seq_len, "prompts": []}
    for i, p in enumerate(PREDEFINED_PROMPTS, start=1):
        tokens = prompt_tokens(engine, p)
        generated, state = [], None
        for st, tok in engine.generate_tokens(tokens):
            generated.append(int(tok))
            state = st.name
        _pieces, text = engine.token_batch_to_string(generated)
        out["prompts"].append({
            "index": i,
            "is_chat_mode": p.is_chat_mode,
            "system_prompt": p.system_prompt,
            "prompt": p.prompt,
            "prompt_tokens": [int(t) for t in tokens],
            "generated": generated,
            "finish_state": state,
            "text": text,
        })
        print(f"[{i}/6] {len(generated)} tokens, {state}", flush=True)
    return out


def capture(model_dir: str, seq_len: int = 200) -> dict:
    model = load_llama_model(model_dir, fused=True)
    engine = InferenceEngine(model, InferenceArgs(sequence_length=seq_len))
    return capture_with_engine(
        engine, label=os.path.basename(os.path.normpath(model_dir)))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--model-dir", required=True)
    ap.add_argument("--seq-len", type=int, default=200)
    ap.add_argument("--out", default=GOLDENS_PATH)
    args = ap.parse_args()
    goldens = capture(args.model_dir, args.seq_len)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(goldens, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
