from llama_nuts_and_bolts_tpu.runtime.types import (
    GeneratedPart,
    GenerationState,
    InferenceArgs,
    TokenPiece,
)
from llama_nuts_and_bolts_tpu.runtime.engine import InferenceEngine
