"""On-device block generation must reproduce the host-loop token stream."""


from llama_nuts_and_bolts_tpu.runtime.device_loop import generate_block

from tests.test_streaming import ENGINE, make_engine


def test_block_matches_host_loop():
    prompt = [1, 5, 9]
    host = [t for _s, t in ENGINE.generate_tokens(prompt)]
    block, finish = generate_block(ENGINE, prompt, max_new_tokens=32)
    assert block == host
    assert finish in ("stop", "length")


def test_block_respects_max_new():
    ids, finish = generate_block(ENGINE, [2, 4], max_new_tokens=3)
    assert len(ids) <= 3


def test_block_stops_on_eos():
    # engine with tiny seq: host loop determines ground truth for finish kind
    eng = make_engine(sequence_length=20)
    host = list(eng.generate_tokens([1, 2, 3]))
    ids, finish = generate_block(eng, [1, 2, 3], max_new_tokens=64)
    assert ids == [t for _s, t in host]
