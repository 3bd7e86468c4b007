"""A from-scratch pickle virtual machine for reading PyTorch checkpoints.

Capability parity with the reference's stack-machine unpickler (reference:
src/pickle/picklereader.go:9-98, src/pickle/pickledispatch.go:15-358), rebuilt
for Python. Like the reference it is a deliberately small, auditable subset of
the pickle protocol — only the opcodes that `torch.save` actually emits — with
two pluggable hooks:

  * ``find_class(module, name)``  — resolve a GLOBAL/STACK_GLOBAL to a factory
  * ``persistent_load(pid)``      — resolve a BINPERSID persistent id (torch
                                    storages) to a host-side storage object

We intentionally do NOT use Python's ``pickle`` module: loading untrusted
checkpoint bytes through the stdlib unpickler executes arbitrary reduces. This
VM only ever calls factories returned by ``find_class``, so the attack surface
is the torch-class table alone (same posture as the reference).

The reference's `load_tuple3` has a known bug (duplicates element 2,
pickledispatch.go:247); we implement TUPLE3 correctly.
"""

from __future__ import annotations

import io
import struct
from typing import Any, BinaryIO, Callable, Dict, List, Optional


class UnpickleError(Exception):
    pass


_MARK = object()  # sentinel pushed by the MARK opcode


class PickleVM:
    """Stack-machine unpickler over a binary stream."""

    def __init__(
        self,
        stream: BinaryIO,
        find_class: Optional[Callable[[str, str], Any]] = None,
        persistent_load: Optional[Callable[[Any], Any]] = None,
    ) -> None:
        self._f = stream
        self._stack: List[Any] = []
        self._memo: Dict[int, Any] = {}
        self.find_class = find_class
        self.persistent_load = persistent_load
        self._stopped = False
        self._result: Any = None

    # ------------------------------------------------------------------ io

    def _read(self, n: int) -> bytes:
        data = self._f.read(n)
        if len(data) != n:
            raise UnpickleError(f"truncated pickle stream: wanted {n} bytes, got {len(data)}")
        return data

    def _read_line(self) -> bytes:
        out = bytearray()
        while True:
            ch = self._read(1)
            if ch == b"\n":
                return bytes(out)
            out += ch

    def _u1(self) -> int:
        return self._read(1)[0]

    def _u2(self) -> int:
        return struct.unpack("<H", self._read(2))[0]

    def _i4(self) -> int:
        return struct.unpack("<i", self._read(4))[0]

    def _u4(self) -> int:
        return struct.unpack("<I", self._read(4))[0]

    def _u8(self) -> int:
        return struct.unpack("<Q", self._read(8))[0]

    # --------------------------------------------------------------- stack

    def _pop_to_mark(self) -> List[Any]:
        items: List[Any] = []
        while True:
            if not self._stack:
                raise UnpickleError("MARK not found on stack")
            top = self._stack.pop()
            if top is _MARK:
                items.reverse()
                return items
            items.append(top)

    def _memo_put(self, idx: int) -> None:
        if not self._stack:
            raise UnpickleError("PUT on empty stack")
        self._memo[idx] = self._stack[-1]

    # ---------------------------------------------------------------- run

    def load(self) -> Any:
        """Run the dispatch loop until STOP; returns the top-of-stack value."""
        while not self._stopped:
            op = self._read(1)
            handler = _DISPATCH.get(op)
            if handler is None:
                raise UnpickleError(f"unsupported pickle opcode {op!r} at offset {self._f.tell() - 1}")
            handler(self)
        return self._result

    # ------------------------------------------------------------ opcodes

    def _op_proto(self) -> None:
        proto = self._u1()
        if proto > 5:
            raise UnpickleError(f"unsupported pickle protocol {proto}")

    def _op_frame(self) -> None:
        self._u8()  # frame length — advisory only; we read linearly anyway

    def _op_stop(self) -> None:
        if not self._stack:
            raise UnpickleError("STOP on empty stack")
        self._result = self._stack.pop()
        self._stopped = True

    def _op_none(self) -> None:
        self._stack.append(None)

    def _op_newtrue(self) -> None:
        self._stack.append(True)

    def _op_newfalse(self) -> None:
        self._stack.append(False)

    def _op_binint(self) -> None:
        self._stack.append(self._i4())

    def _op_binint1(self) -> None:
        self._stack.append(self._u1())

    def _op_binint2(self) -> None:
        self._stack.append(self._u2())

    def _op_long1(self) -> None:
        n = self._u1()
        data = self._read(n)
        self._stack.append(int.from_bytes(data, "little", signed=True))

    def _op_binfloat(self) -> None:
        self._stack.append(struct.unpack(">d", self._read(8))[0])

    def _op_binunicode(self) -> None:
        n = self._u4()
        self._stack.append(self._read(n).decode("utf-8", errors="surrogatepass"))

    def _op_short_binunicode(self) -> None:
        n = self._u1()
        self._stack.append(self._read(n).decode("utf-8", errors="surrogatepass"))

    def _op_binstring(self) -> None:
        n = self._i4()
        # protocol-1 strings: latin-1 like stdlib's default
        self._stack.append(self._read(n).decode("latin-1"))

    def _op_short_binstring(self) -> None:
        n = self._u1()
        self._stack.append(self._read(n).decode("latin-1"))

    def _op_binbytes(self) -> None:
        n = self._u4()
        self._stack.append(self._read(n))

    def _op_short_binbytes(self) -> None:
        n = self._u1()
        self._stack.append(self._read(n))

    def _op_empty_dict(self) -> None:
        self._stack.append({})

    def _op_empty_list(self) -> None:
        self._stack.append([])

    def _op_empty_tuple(self) -> None:
        self._stack.append(())

    def _op_tuple(self) -> None:
        self._stack.append(tuple(self._pop_to_mark()))

    def _op_tuple1(self) -> None:
        a = self._stack.pop()
        self._stack.append((a,))

    def _op_tuple2(self) -> None:
        b = self._stack.pop()
        a = self._stack.pop()
        self._stack.append((a, b))

    def _op_tuple3(self) -> None:
        c = self._stack.pop()
        b = self._stack.pop()
        a = self._stack.pop()
        self._stack.append((a, b, c))

    def _op_mark(self) -> None:
        self._stack.append(_MARK)

    def _op_append(self) -> None:
        v = self._stack.pop()
        self._stack[-1].append(v)

    def _op_appends(self) -> None:
        items = self._pop_to_mark()
        self._stack[-1].extend(items)

    def _op_setitem(self) -> None:
        v = self._stack.pop()
        k = self._stack.pop()
        self._stack[-1][k] = v

    def _op_setitems(self) -> None:
        items = self._pop_to_mark()
        if len(items) % 2 != 0:
            raise UnpickleError("SETITEMS with odd number of stack items")
        d = self._stack[-1]
        for i in range(0, len(items), 2):
            d[items[i]] = items[i + 1]

    def _op_binput(self) -> None:
        self._memo_put(self._u1())

    def _op_long_binput(self) -> None:
        self._memo_put(self._u4())

    def _op_memoize(self) -> None:
        self._memo_put(len(self._memo))

    def _op_binget(self) -> None:
        self._stack.append(self._memo[self._u1()])

    def _op_long_binget(self) -> None:
        self._stack.append(self._memo[self._u4()])

    def _op_global(self) -> None:
        module = self._read_line().decode("utf-8")
        name = self._read_line().decode("utf-8")
        self._stack.append(self._resolve_class(module, name))

    def _op_stack_global(self) -> None:
        name = self._stack.pop()
        module = self._stack.pop()
        self._stack.append(self._resolve_class(module, name))

    def _resolve_class(self, module: str, name: str) -> Any:
        builtin = _SAFE_BUILTINS.get((module, name))
        if builtin is not None:
            return builtin
        if self.find_class is None:
            raise UnpickleError(f"GLOBAL {module}.{name} with no find_class hook")
        return self.find_class(module, name)

    def _op_reduce(self) -> None:
        args = self._stack.pop()
        factory = self._stack.pop()
        if not isinstance(args, tuple):
            raise UnpickleError("REDUCE args must be a tuple")
        self._stack.append(factory(*args))

    def _op_binpersid(self) -> None:
        pid = self._stack.pop()
        if self.persistent_load is None:
            raise UnpickleError("BINPERSID with no persistent_load hook")
        self._stack.append(self.persistent_load(pid))

    def _op_build(self) -> None:
        # state-dict checkpoints don't need __setstate__; accept-and-attach
        state = self._stack.pop()
        obj = self._stack[-1]
        setstate = getattr(obj, "__setstate__", None)
        if setstate is not None:
            setstate(state)
        elif isinstance(state, dict) and hasattr(obj, "__dict__"):
            obj.__dict__.update(state)

    def _op_empty_set(self) -> None:
        self._stack.append(set())

    def _op_dict(self) -> None:
        items = self._pop_to_mark()
        d = {}
        for i in range(0, len(items), 2):
            d[items[i]] = items[i + 1]
        self._stack.append(d)


# The only globals resolvable without a find_class hook: data-only factories
# that protocol-2 pickles of plain data structures rely on.
_SAFE_BUILTINS: Dict[tuple, Any] = {
    ("_codecs", "encode"): lambda s, enc: s.encode(enc),
    ("collections", "OrderedDict"): dict,
    ("builtins", "bytearray"): bytearray,
}

_DISPATCH: Dict[bytes, Callable[[PickleVM], None]] = {
    b"\x80": PickleVM._op_proto,            # PROTO
    b"\x95": PickleVM._op_frame,            # FRAME
    b".": PickleVM._op_stop,                # STOP
    b"N": PickleVM._op_none,                # NONE
    b"\x88": PickleVM._op_newtrue,          # NEWTRUE
    b"\x89": PickleVM._op_newfalse,         # NEWFALSE
    b"J": PickleVM._op_binint,              # BININT
    b"K": PickleVM._op_binint1,             # BININT1
    b"M": PickleVM._op_binint2,             # BININT2
    b"\x8a": PickleVM._op_long1,            # LONG1
    b"G": PickleVM._op_binfloat,            # BINFLOAT
    b"X": PickleVM._op_binunicode,          # BINUNICODE
    b"\x8c": PickleVM._op_short_binunicode, # SHORT_BINUNICODE
    b"T": PickleVM._op_binstring,           # BINSTRING
    b"U": PickleVM._op_short_binstring,     # SHORT_BINSTRING
    b"B": PickleVM._op_binbytes,            # BINBYTES
    b"C": PickleVM._op_short_binbytes,      # SHORT_BINBYTES
    b"}": PickleVM._op_empty_dict,          # EMPTY_DICT
    b"]": PickleVM._op_empty_list,          # EMPTY_LIST
    b")": PickleVM._op_empty_tuple,         # EMPTY_TUPLE
    b"t": PickleVM._op_tuple,               # TUPLE
    b"\x85": PickleVM._op_tuple1,           # TUPLE1
    b"\x86": PickleVM._op_tuple2,           # TUPLE2
    b"\x87": PickleVM._op_tuple3,           # TUPLE3
    b"(": PickleVM._op_mark,                # MARK
    b"a": PickleVM._op_append,              # APPEND
    b"e": PickleVM._op_appends,             # APPENDS
    b"s": PickleVM._op_setitem,             # SETITEM
    b"u": PickleVM._op_setitems,            # SETITEMS
    b"q": PickleVM._op_binput,              # BINPUT
    b"r": PickleVM._op_long_binput,         # LONG_BINPUT
    b"\x94": PickleVM._op_memoize,          # MEMOIZE
    b"h": PickleVM._op_binget,              # BINGET
    b"j": PickleVM._op_long_binget,         # LONG_BINGET
    b"c": PickleVM._op_global,              # GLOBAL
    b"\x93": PickleVM._op_stack_global,     # STACK_GLOBAL
    b"R": PickleVM._op_reduce,              # REDUCE
    b"Q": PickleVM._op_binpersid,           # BINPERSID
    b"b": PickleVM._op_build,               # BUILD
    b"\x8f": PickleVM._op_empty_set,        # EMPTY_SET
    b"d": PickleVM._op_dict,                # DICT
}


def loads(data: bytes, **kwargs: Any) -> Any:
    return PickleVM(io.BytesIO(data), **kwargs).load()
