"""utils helpers: hex expansion and golden comparators."""

import numpy as np
import pytest

from llama_nuts_and_bolts_tpu.utils.hexcodes import replace_hex_with_bytes
from llama_nuts_and_bolts_tpu.utils.testing import compare_tensor, threshold_for
from llama_nuts_and_bolts_tpu.io.params import ModelArgs


def test_replace_hex():
    assert replace_hex_with_bytes("<0xF0><0x9F>ab") == b"\xf0\x9fab"
    assert replace_hex_with_bytes("plain") == b"plain"
    assert replace_hex_with_bytes("<0xZZ>") == "<0xZZ>".encode()
    assert replace_hex_with_bytes("é<0x00>") == b"\xc3\xa9\x00"


def test_thresholds():
    import ml_dtypes
    assert threshold_for(np.int32) == 0.0
    assert threshold_for(np.float32) == 1e-3
    assert threshold_for(ml_dtypes.bfloat16) == 1e-2


def test_compare_tensor_modes():
    a = np.linspace(0, 1, 20).reshape(4, 5)
    compare_tensor(a, a + 5e-4, dtype=np.float32)
    with pytest.raises(AssertionError):
        compare_tensor(a, a + 5e-2, dtype=np.float32)
    # shortened: only 6 corner elements per dim are compared
    big = np.arange(100.0).reshape(10, 10)
    corners_only = big.copy()
    corners_only[4, 4] = 999.0  # interior garbage must be ignored
    compare_tensor(big, corners_only, dtype=np.float32, shortened=True)


def test_model_type_detection():
    assert ModelArgs(n_layers=32).model_type == "Llama-3.1-8B"
    assert ModelArgs(n_layers=80).model_type == "Llama-3.1-70B"
    assert ModelArgs(n_layers=126).model_type == "Llama-3.1-405B"
    assert ModelArgs(n_layers=3).model_type == "Llama-custom-3L"
