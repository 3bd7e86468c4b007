from llama_nuts_and_bolts_tpu.utils.logging import Logger, get_logger, set_logger
