from llama_nuts_and_bolts_tpu.cli.console import AppState
