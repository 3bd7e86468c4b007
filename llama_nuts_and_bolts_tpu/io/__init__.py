from llama_nuts_and_bolts_tpu.io.params import ModelArgs, load_model_args
from llama_nuts_and_bolts_tpu.io.pickle_vm import PickleVM, UnpickleError
from llama_nuts_and_bolts_tpu.io.torch_ckpt import (
    HostTensor,
    TorchCheckpointReader,
    load_torch_checkpoint,
)
