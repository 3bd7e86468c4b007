from llama_nuts_and_bolts_tpu.serving.server import LlamaHTTPServer, serve
