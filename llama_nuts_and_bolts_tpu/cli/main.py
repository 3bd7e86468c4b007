"""Interactive CLI: prompt menu, streaming generation, live console repaint.

Capability parity with the reference's cmd/main.go: banner, model-path
discovery, the six predefined prompts (cmd/main.go:29-36), metadata option,
manual chat/completion input, streaming consumption with per-token timing, and
the finish-reason line. Idiomatic improvements the reference lacks
(SURVEY.md §5.6): a real flag layer (--model-dir, --seq-len, --prompt,
--temperature, --debug, --tiny for a weights-free demo model).

Run: ``python -m llama_nuts_and_bolts_tpu.cli [flags]``
"""

from __future__ import annotations

import argparse
import os
import sys
from dataclasses import dataclass
from typing import List, Optional

from llama_nuts_and_bolts_tpu.io.params import ModelArgs, find_model_dir
from llama_nuts_and_bolts_tpu.runtime import InferenceArgs, InferenceEngine
from llama_nuts_and_bolts_tpu.runtime.types import GenerationState
from llama_nuts_and_bolts_tpu.tokenizer import PromptPart
from llama_nuts_and_bolts_tpu.utils.logging import Logger, set_logger
from llama_nuts_and_bolts_tpu.cli.console import AppState

MODELS_DIR_NAME = "models-original"
MODEL_NAME = "Meta-Llama-3.1-8B-Instruct"


@dataclass
class PromptInput:
    prompt: str
    system_prompt: str = ""
    is_chat_mode: bool = False


PREDEFINED_PROMPTS = [
    PromptInput(is_chat_mode=False, prompt="Hello, my name is"),
    PromptInput(is_chat_mode=True, system_prompt="You are Einstein",
                prompt="Describe your theory."),
    PromptInput(is_chat_mode=True,
                system_prompt="Answer in 20 words, directly, and without an introduction",
                prompt="Can you explain what is Theory of relativity?"),
    PromptInput(is_chat_mode=True, system_prompt="You are a pirate",
                prompt="Explain what is quantum computer in 20 words."),
    PromptInput(is_chat_mode=True, system_prompt="Always answer with emojis",
                prompt="How to go from Beijing to NY?"),
    PromptInput(is_chat_mode=True, system_prompt="Answer with only one emoji",
                prompt="What is the flag of Turkey?"),
]


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        prog="llama_nuts_and_bolts_tpu",
        description="TPU-native Llama 3.1 inference engine")
    p.add_argument("--model-dir", default=None,
                   help="directory with consolidated.00.pth, params.json, tokenizer.model")
    p.add_argument("--seq-len", type=int, default=200,
                   help="total sequence length cap (the reference CLI uses 200)")
    p.add_argument("--prompt", type=int, default=None, metavar="N",
                   help="run predefined prompt N (1-6) non-interactively")
    p.add_argument("--prompt-text", default=None,
                   help="run this prompt text non-interactively")
    p.add_argument("--chat", action="store_true",
                   help="with --prompt-text: use chat template")
    p.add_argument("--system-prompt", default="",
                   help="with --chat: the system prompt")
    p.add_argument("--temperature", type=float, default=0.0)
    p.add_argument("--top-k", type=int, default=0)
    p.add_argument("--top-p", type=float, default=1.0)
    p.add_argument("--quant", choices=["none", "int8", "int4"], default="none",
                   help="weight-only quantization (int8/int4 fit full 8B on one v5e chip; "
                        "int4 roughly doubles int8's decode roofline)")
    p.add_argument("--kv-cache", choices=["bf16", "int8"], default="bf16",
                   help="KV cache dtype. int8 halves cache BYTES = 2x the "
                        "context that fits; measured ~3-7%% slower than "
                        "bf16 at small batch — pick it to fit, not to "
                        "speed up")
    p.add_argument("--draft-model", default=None, metavar="DIR",
                   help="with --speculate: directory of a smaller Llama "
                        "checkpoint used as the speculation draft model "
                        "(default: n-gram prompt lookup, no second model)")
    p.add_argument("--speculate", type=int, default=0, metavar="K",
                   help="n-gram prompt-lookup speculative decoding: verify up "
                        "to K drafts per step (greedy only; 0 disables)")
    p.add_argument("--prefill-chunk", type=int, default=0, metavar="C",
                   help="process prompts longer than C tokens in C-token "
                        "chunks (bounds prefill memory at long context and "
                        "compiles one chunk executable; 0 disables)")
    p.add_argument("--attn-impl", choices=["auto", "xla", "flash", "probe"],
                   default="auto",
                   help="attention implementation: auto (build-time rules), "
                        "xla, flash (Pallas kernels), or probe (one-shot "
                        "micro-benchmark of each viable impl at the active "
                        "config; keeps the measured winner for decode)")
    p.add_argument("--decode-chunk", type=int, default=0, metavar="K",
                   help="streaming (greedy or sampled) decodes K tokens per "
                        "device dispatch (on-device scan, identical "
                        "transcript; sampled runs keep their seeded RNG "
                        "sequence); 0 = auto: 8 on RPC-attached TPUs, "
                        "per-token on host-attached devices")
    p.add_argument("--tp", type=int, default=0, metavar="N",
                   help="tensor parallelism: shard the model over N devices "
                        "(Megatron column/row sharding, one psum per "
                        "sub-block; 0 = single device)")
    p.add_argument("--debug", action="store_true", help="write debug.log trace")
    p.add_argument("--narrate", action="store_true",
                   help="before generating, run one layer-at-a-time narrated "
                        "prefill showing per-layer device time (the "
                        "reference's 'Transformer block layer x/y took ...' "
                        "lines; slower than the fused prefill)")
    p.add_argument("--tiny", action="store_true",
                   help="use a tiny random-weights model + synthetic tokenizer "
                        "(no model files needed; for smoke-testing the stack)")
    p.add_argument("--meta", action="store_true",
                   help="print model metadata and exit")
    return p.parse_args(argv)


def discover_model_dir(flag_value: Optional[str]) -> str:
    candidates = []
    if flag_value:
        candidates.append(flag_value)
    for root in (".", "..", "../..", os.path.expanduser("~")):
        candidates.append(os.path.join(root, MODELS_DIR_NAME, MODEL_NAME))
        candidates.append(os.path.join(root, MODELS_DIR_NAME))
    found = find_model_dir(candidates)
    if found is None:
        sys.exit(
            f"error: model files not found. Searched: {candidates}\n"
            "Expected consolidated.00.pth, params.json, tokenizer.model "
            "(pass --model-dir, or --tiny for a weights-free demo)")
    return found


def load_tiny_model():
    """Random tiny model + byte-level tokenizer: exercises the whole stack
    (load → tokenize → generate → stream → repaint) without the 16 GB files."""
    import jax

    from llama_nuts_and_bolts_tpu.models.llama import init_random_params
    from llama_nuts_and_bolts_tpu.models.llama.loader import LoadedModel
    from llama_nuts_and_bolts_tpu.tokenizer import TiktokenModel, Vocabulary
    from llama_nuts_and_bolts_tpu.tokenizer.tiktoken_io import build_special_tokens

    ranks = {bytes([i]): i for i in range(256)}
    special = build_special_tokens(len(ranks))
    tk = TiktokenModel(
        mergeable_ranks=ranks, special_tokens=special,
        bos_id=special["<|begin_of_text|>"], eos_id=special["<|end_of_text|>"],
        stop_token_ids=[special["<|eom_id|>"], special["<|eot_id|>"]])
    vocab = Vocabulary.from_tiktoken(tk)
    cfg = ModelArgs(dim=256, n_layers=4, n_heads=8, n_kv_heads=4,
                    vocab_size=vocab.size, multiple_of=64,
                    max_sequence_length=512)
    params = jax.jit(init_random_params, static_argnums=(0,))(cfg, jax.random.PRNGKey(0))
    return LoadedModel(params=params, cfg=cfg, vocab=vocab,
                       mergeable_ranks=ranks, tensor_meta={})


def ask_user_prompt_choice(model, out=sys.stdout) -> PromptInput:
    from llama_nuts_and_bolts_tpu.cli.meta import format_meta

    n = len(PREDEFINED_PROMPTS)
    while True:
        out.write("\x1b[1mSelect from our predefined prompts (latest two are for manual input):\x1b[0m\n")
        out.write(f"{0:2d}. {'':<17} Print model metadata (tensor list, hyperparameters, etc...)\n")
        for i, pp in enumerate(PREDEFINED_PROMPTS):
            if pp.is_chat_mode:
                system = pp.system_prompt or "(empty)"
                out.write(f"{i+1:2d}. {'[Chat mode]':<17} \x1b[1mSystem Prompt:\x1b[0m {system}\n"
                          f"{'':22}\x1b[1mPrompt:\x1b[0m {pp.prompt}\n")
            else:
                out.write(f"{i+1:2d}. {'[Text completion]':<17} \x1b[1mPrompt:\x1b[0m {pp.prompt}\n")
        out.write(f"{n+1:2d}. {'[Text completion]':<17} Other, manual input\n")
        out.write(f"{n+2:2d}. {'[Chat mode]':<17} Other, manual input\n")
        out.write(f"\n\x1b[1mYour choice (choose 0 to {n+2} and press Enter):\x1b[0m ")
        out.flush()
        try:
            choice = input().strip()
        except EOFError:
            sys.exit("\nno input; exiting")
        try:
            num = int(choice)
        except ValueError:
            out.write("\nNot a valid number.\n\n")
            continue
        if num < 0 or num > n + 2:
            out.write(f"\nChoice must be between 0 and {n+2}.\n\n")
            continue
        if num == 0:
            out.write(format_meta(model))
            out.write("\nModel metadata was printed.\n\n")
            continue
        if num <= n:
            return PREDEFINED_PROMPTS[num - 1]
        is_chat = num == n + 2
        system_prompt = ""
        if is_chat:
            out.write("\x1b[1mWrite down your \"system prompt\" (optional) and press Enter:\x1b[0m ")
            out.flush()
            system_prompt = input().rstrip("\r\n")
            out.write("\x1b[1mWrite down your prompt (chat) and press Enter:\x1b[0m ")
        else:
            out.write("\x1b[1mWrite down your prompt and press Enter:\x1b[0m ")
        out.flush()
        prompt = input().rstrip("\r\n")
        if not prompt:
            out.write("\nThe prompt you entered is empty.\n")
            continue
        return PromptInput(prompt=prompt, system_prompt=system_prompt, is_chat_mode=is_chat)


def run_generation(engine: InferenceEngine, prompt_input: PromptInput,
                   app: AppState, narrate: bool = False) -> GenerationState:
    if prompt_input.is_chat_mode:
        parts: List[PromptPart] = [
            PromptPart("system", prompt_input.system_prompt),
            PromptPart("user", prompt_input.prompt),
        ]
        tokens = engine.tokenize(parts)
    else:
        text = prompt_input.prompt
        if not text.endswith(" "):
            text += " "
        tokens = [engine.model.vocab.bos_id] + engine.tokenize_string(text)

    prompt_pieces, prompt_text = engine.token_batch_to_string(tokens)
    app.begin_generation(prompt_pieces, prompt_text, engine.seq_len)

    if narrate:
        # one layer-at-a-time prefill with per-layer wall-clock surfaced in
        # the "Running for next token" line (reference:
        # src/model/llamatransformer.go:163 -> infContext.Logf -> TUI)
        import jax.numpy as jnp

        from llama_nuts_and_bolts_tpu.runtime.profiling import narrated_forward

        def narrate_log(msg):
            engine.log("%s", msg)
            app.latest_log_text = msg
            app.update_output()

        narrated_forward(engine.model.params, engine.model.cfg,
                         jnp.asarray([list(tokens)], dtype=jnp.int32),
                         0, engine.new_cache(1), log_fn=narrate_log)

    for part in engine.generate_string(tokens):
        app.consume(part)
    app.finish_generation()
    return app.generation_state


def main(argv=None) -> int:
    args = parse_args(argv)
    from llama_nuts_and_bolts_tpu.utils.compile_cache import (
        apply_env_platform,
        enable_persistent_cache,
    )
    enable_persistent_cache()
    apply_env_platform()
    print("Welcome to Llama 3.1 Nuts and Bolts (TPU edition)!")
    print("=================================\n\n")

    set_logger(Logger(debug_path="debug.log" if args.debug else None))

    mesh = None
    if args.tp and args.tp > 1:
        from llama_nuts_and_bolts_tpu.parallel import make_mesh

        mesh = make_mesh(tp=args.tp)
        print(f"Tensor parallelism: tp={args.tp} over {args.tp} devices.")

    if args.tiny:
        model = load_tiny_model()
        if args.quant != "none":
            from llama_nuts_and_bolts_tpu.quant import quantize_params, quantize_params_q4

            qfn = quantize_params_q4 if args.quant == "int4" else quantize_params
            model.params = qfn(model.params)
            print(f"Tiny demo model loaded ({args.quant}-quantized).\n")
        else:
            print("Tiny random-weights demo model loaded.\n")
        if mesh is not None:
            from llama_nuts_and_bolts_tpu.parallel import shard_params

            model.params = shard_params(model.params, mesh)
        elif args.quant == "none":
            from llama_nuts_and_bolts_tpu.models.llama import fuse_decode_params

            model.params = fuse_decode_params(model.params)
    else:
        model_dir = discover_model_dir(args.model_dir)
        print(f'Found model files in "{model_dir}"...')
        from llama_nuts_and_bolts_tpu.models.llama.loader import load_llama_model

        sharding_fn = None
        if mesh is not None:
            from llama_nuts_and_bolts_tpu.parallel import param_sharding_fn

            sharding_fn = param_sharding_fn(mesh)
        # single-chip plain-bf16 loads take the fused decode layout (measured
        # ~3.5% more HBM bandwidth at b=1; docs/07-PERFORMANCE.md)
        fused = args.quant == "none" and mesh is None
        model = load_llama_model(model_dir, max_sequence_length=args.seq_len,
                                 quant=None if args.quant == "none" else args.quant,
                                 sharding_fn=sharding_fn, fused=fused)
        print(f'Model "{model_dir}" was loaded.\n')

    if args.meta:
        from llama_nuts_and_bolts_tpu.cli.meta import format_meta

        print(format_meta(model))
        return 0

    app = AppState()

    def live_log(fmt, *a):
        # surfaces engine progress in the "Running for next token" line
        # (reference: cmd/main.go:349-352 logFn -> AppState repaint)
        app.latest_log_text = (fmt % a) if a else fmt
        if app.prompt_text:
            app.update_output()

    draft = None
    if args.draft_model:
        from llama_nuts_and_bolts_tpu.models.llama.loader import load_llama_model

        draft = load_llama_model(args.draft_model,
                                 max_sequence_length=args.seq_len)
        print(f'Draft model "{args.draft_model}" was loaded.\n')

    engine = InferenceEngine(
        model,
        InferenceArgs(sequence_length=args.seq_len, temperature=args.temperature,
                      top_k=args.top_k, top_p=args.top_p,
                      speculate_k=args.speculate, kv_cache_dtype=args.kv_cache,
                      prefill_chunk=args.prefill_chunk,
                      attn_impl=args.attn_impl,
                      decode_chunk=args.decode_chunk),
        log_fn=live_log,
        draft_model=draft,
        mesh=mesh,
    )

    if args.prompt is not None:
        prompt_input = PREDEFINED_PROMPTS[args.prompt - 1]
    elif args.prompt_text is not None:
        prompt_input = PromptInput(prompt=args.prompt_text,
                                   system_prompt=args.system_prompt,
                                   is_chat_mode=args.chat)
    else:
        prompt_input = ask_user_prompt_choice(model)

    state = run_generation(engine, prompt_input, app, narrate=args.narrate)
    reason = {
        GenerationState.FINISHED_BY_REACHING_EOS: "reaching EOS token",
        GenerationState.FINISHED_BY_REACHING_SEQ_LEN: "reaching sequence length",
    }.get(state, "unknown")
    print(f"\n\nFinished \x1b[1mby {reason}\x1b[0m.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
