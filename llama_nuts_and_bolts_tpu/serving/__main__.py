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
    args = p.parse_args(argv)

    from llama_nuts_and_bolts_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()

    if args.tiny:
        from llama_nuts_and_bolts_tpu.cli.main import load_tiny_model

        model = load_tiny_model()
        name = "tiny-random"
    else:
        from llama_nuts_and_bolts_tpu.cli.main import discover_model_dir
        from llama_nuts_and_bolts_tpu.models.llama.loader import load_llama_model

        model_dir = discover_model_dir(args.model_dir)
        model = load_llama_model(model_dir, max_sequence_length=args.seq_len)
        name = "llama-3.1-8b-instruct"

    engine = InferenceEngine(model, InferenceArgs(sequence_length=args.seq_len))
    serve(engine, args.host, args.port, name)
    return 0


if __name__ == "__main__":
    sys.exit(main())
