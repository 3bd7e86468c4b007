"""``python -m llama_nuts_and_bolts_tpu.serving [--tiny] [--port N] ...``"""

import argparse
import sys

from llama_nuts_and_bolts_tpu.runtime import InferenceArgs, InferenceEngine
from llama_nuts_and_bolts_tpu.serving.server import serve


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="llama_nuts_and_bolts_tpu.serving")
    p.add_argument("--model-dir", default=None)
    p.add_argument("--seq-len", type=int, default=2048)
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--tiny", action="store_true",
                   help="serve the tiny random demo model (no weights needed)")
    p.add_argument("--quant", choices=["none", "int8", "int4"], default="none",
                   help="weight-only quantization (fits full 8B on one chip)")
    p.add_argument("--draft-model", default=None, metavar="DIR",
                   help="with --speculate: smaller Llama checkpoint dir used "
                        "as the draft model (default: n-gram prompt lookup)")
    p.add_argument("--speculate", type=int, default=0, metavar="K",
                   help="n-gram prompt-lookup speculative decoding (greedy only)")
    p.add_argument("--continuous", type=int, default=0, metavar="SLOTS",
                   help="continuous batching: greedy requests share decode "
                        "steps across SLOTS cache slots (0 disables)")
    p.add_argument("--paged-blocks", type=int, default=0, metavar="N",
                   help="with --continuous: use a paged KV cache of N shared "
                        "blocks instead of dense per-slot rows")
    p.add_argument("--no-prefix-cache", action="store_true",
                   help="with --paged-blocks: disable automatic prefix "
                        "caching (hash-shared prompt blocks)")
    p.add_argument("--tp", type=int, default=0, metavar="N",
                   help="tensor parallelism: shard the model over N devices "
                        "(0 = single device)")
    p.add_argument("--kv-cache", choices=["bf16", "int8"], default="bf16",
                   help="KV cache dtype. int8 halves cache BYTES = 2x the "
                        "context x batch per chip; measured ~3-7%% slower "
                        "than bf16 at small batch — pick it to fit, not "
                        "to speed up")
    p.add_argument("--prefill-chunk", type=int, default=0, metavar="C",
                   help="chunked prefill: prompts longer than C tokens run in "
                        "C-token chunks (bounds memory; 0 disables)")
    p.add_argument("--attn-impl", choices=["auto", "xla", "flash", "probe"],
                   default="auto",
                   help="attention impl: build-time rules (auto), forced, or "
                        "a one-shot measured probe at the active config")
    p.add_argument("--decode-chunk", type=int, default=0, metavar="K",
                   help="streaming (greedy or sampled) decodes K tokens per "
                        "dispatch; sampled keeps seeded RNG parity "
                        "(0 = auto: 8 on RPC-attached TPUs, else per-token)")
    p.add_argument("--max-pending", type=int, default=0, metavar="N",
                   help="admit at most N concurrent generation requests; "
                        "excess get an immediate 429 + Retry-After "
                        "(0 = auto: 4x --continuous slots, else 8)")
    p.add_argument("--step-quantum", type=int, default=0, metavar="K",
                   help="decode steps per scheduler dispatch (0 = auto: 4 "
                        "on RPC-attached devices, 1 host-attached); larger "
                        "amortizes dispatch overhead, smaller tightens "
                        "admission/stop granularity and burst latency")
    p.add_argument("--no-prewarm", action="store_true",
                   help="skip compiling the hot prefill/decode executables "
                        "before the socket opens (prewarming costs one short "
                        "request up front; without it the FIRST client pays "
                        "the cold compile and may hit --token-timeout)")
    p.add_argument("--token-timeout", type=float, default=120.0, metavar="S",
                   help="max seconds to wait for one token from the batcher "
                        "before failing the request cleanly (SSE error "
                        "chunk / 500, counted in /metrics)")
    p.add_argument("--cache-system-prompt", default=None, metavar="TEXT",
                   help="prefill TEXT's system-prompt block once at startup "
                        "and snapshot its KV state; chat requests whose first "
                        "message is this system prompt prefill only their "
                        "suffix (no effect in --continuous mode)")
    args = p.parse_args(argv)

    from llama_nuts_and_bolts_tpu.utils.compile_cache import (
        apply_env_platform,
        enable_persistent_cache,
    )
    enable_persistent_cache()
    apply_env_platform()

    mesh = None
    if args.tp and args.tp > 1:
        from llama_nuts_and_bolts_tpu.parallel import make_mesh

        mesh = make_mesh(tp=args.tp)

    if args.tiny:
        from llama_nuts_and_bolts_tpu.cli.main import load_tiny_model

        model = load_tiny_model()
        if args.quant != "none":
            from llama_nuts_and_bolts_tpu.quant import quantize_params, quantize_params_q4

            qfn = quantize_params_q4 if args.quant == "int4" else quantize_params
            model.params = qfn(model.params)
        if mesh is not None:
            from llama_nuts_and_bolts_tpu.parallel import shard_params

            model.params = shard_params(model.params, mesh)
        elif args.quant == "none" and not args.paged_blocks:
            # fused decode layout (paged batching keeps the split layout:
            # models/llama/paged.py has its own forward)
            from llama_nuts_and_bolts_tpu.models.llama import fuse_decode_params

            model.params = fuse_decode_params(model.params)
        name = "tiny-random"
    else:
        from llama_nuts_and_bolts_tpu.cli.main import discover_model_dir
        from llama_nuts_and_bolts_tpu.models.llama.loader import load_llama_model

        model_dir = discover_model_dir(args.model_dir)
        sharding_fn = None
        if mesh is not None:
            from llama_nuts_and_bolts_tpu.parallel import param_sharding_fn

            sharding_fn = param_sharding_fn(mesh)
        fused = (args.quant == "none" and mesh is None
                 and not args.paged_blocks)
        model = load_llama_model(model_dir, max_sequence_length=args.seq_len,
                                 quant=None if args.quant == "none" else args.quant,
                                 sharding_fn=sharding_fn, fused=fused)
        name = "llama-3.1-8b-instruct"

    draft = None
    if args.draft_model:
        from llama_nuts_and_bolts_tpu.models.llama.loader import load_llama_model

        draft = load_llama_model(args.draft_model,
                                 max_sequence_length=args.seq_len)
    engine = InferenceEngine(model, InferenceArgs(sequence_length=args.seq_len,
                                                  speculate_k=args.speculate,
                                                  kv_cache_dtype=args.kv_cache,
                                                  prefill_chunk=args.prefill_chunk,
                                                  attn_impl=args.attn_impl,
                                                  decode_chunk=args.decode_chunk),
                             draft_model=draft, mesh=mesh)
    if args.cache_system_prompt and not args.continuous:
        from llama_nuts_and_bolts_tpu.tokenizer import PromptPart, render_prefix_tokens

        engine.cache_prefix(render_prefix_tokens(
            [PromptPart("system", args.cache_system_prompt)],
            model.vocab, model.mergeable_ranks))
    serve(engine, args.host, args.port, name, continuous_slots=args.continuous,
          paged_blocks=args.paged_blocks,
          prefix_cache=not args.no_prefix_cache,
          max_pending=args.max_pending, prewarm=not args.no_prewarm,
          token_timeout_s=args.token_timeout,
          step_quantum=args.step_quantum or None)
    return 0


if __name__ == "__main__":
    sys.exit(main())
