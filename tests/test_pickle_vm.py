"""Pickle VM unit tests: round-trip stdlib pickles through the from-scratch VM.

Covers the opcode subset the reference implements (reference:
src/pickle/pickledispatch.go:53-78) plus the protocol-4 opcodes real torch
writers emit, across protocols 2..5.
"""

import pickle

import pytest

from llama_nuts_and_bolts_tpu.io.pickle_vm import UnpickleError, loads


CASES = [
    None,
    True,
    False,
    0,
    1,
    255,
    256,
    65535,
    65536,
    -1,
    -12345678,
    2**40,
    3.14159,
    "hello",
    "héllo wörld ✓",
    "",
    (),
    (1,),
    (1, 2),
    (1, 2, 3),
    (1, 2, 3, 4, 5),
    [],
    [1, "two", 3.0],
    {},
    {"a": 1, "b": [2, 3], "c": {"d": (4, 5)}},
    {"nested": {"tuple3": ("a", "b", "c")}},
    b"raw\x00bytes",
]


@pytest.mark.parametrize("proto", [2, 3, 4, 5])
@pytest.mark.parametrize("obj", CASES, ids=[repr(c)[:40] for c in CASES])
def test_roundtrip(obj, proto):
    data = pickle.dumps(obj, protocol=proto)
    assert loads(data) == obj


def test_memo_sharing():
    shared = [1, 2, 3]
    obj = {"x": shared, "y": shared}
    out = loads(pickle.dumps(obj, protocol=2))
    assert out["x"] is out["y"]


def test_insertion_order_preserved():
    obj = {f"k{i}": i for i in range(100)}
    out = loads(pickle.dumps(obj, protocol=2))
    assert list(out.keys()) == list(obj.keys())


def test_tuple3_not_duplicated():
    # the reference's load_tuple3 duplicates element 2 (a known bug we must
    # NOT replicate; reference: src/pickle/pickledispatch.go:247)
    assert loads(pickle.dumps(("a", "b", "c"), protocol=2)) == ("a", "b", "c")


def test_global_requires_hook():
    class Cls:
        pass

    data = pickle.dumps(CASES[0])
    with pytest.raises(UnpickleError):
        loads(b"\x80\x02cfoo\nbar\n\x85R.")  # GLOBAL foo.bar with no hook


def test_find_class_hook_and_reduce():
    data = b"\x80\x02cmymod\nmyfactory\nK\x05K\x07\x86R."  # myfactory(5, 7)

    def find_class(module, name):
        assert (module, name) == ("mymod", "myfactory")
        return lambda a, b: a * b

    assert loads(data, find_class=find_class) == 35


def test_persistent_load_hook():
    import io as _io

    class P:
        def __init__(self, pid):
            self.pid = pid

        def __reduce__(self):  # pragma: no cover - not used
            raise NotImplementedError

    class Pickler(pickle.Pickler):
        def persistent_id(self, obj):
            if isinstance(obj, P):
                return ("pid", obj.pid)
            return None

    buf = _io.BytesIO()
    Pickler(buf, protocol=2).dump({"s": P(42)})
    out = loads(buf.getvalue(), persistent_load=lambda pid: pid[1] * 2)
    assert out == {"s": 84}


def test_truncated_stream_raises():
    data = pickle.dumps([1, 2, 3], protocol=2)
    with pytest.raises(UnpickleError):
        loads(data[:-2])


def test_unknown_opcode_raises():
    with pytest.raises(UnpickleError):
        loads(b"\x80\x02\xff.")
