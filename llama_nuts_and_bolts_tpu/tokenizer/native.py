"""ctypes binding to the C++ BPE merge (native/bpe_merge.cpp) with lazy
build-on-first-use and silent fallback to the pure-Python merge.

The reference's runtime is compiled Go end to end; this keeps the tokenizer's
hot loop native here too without adding a build step — the .so is compiled
once with g++ next to the source and cached.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Dict, List, Optional

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SRC = os.path.join(_NATIVE_DIR, "bpe_merge.cpp")
_SO = os.path.join(_NATIVE_DIR, "libbpe_merge.so")

_lib = None
_lib_lock = threading.Lock()
_build_failed = False


def _load_library() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    with _lib_lock:
        if _lib is not None:
            return _lib
        try:
            if not os.path.exists(_SO) or (
                os.path.exists(_SRC)
                and os.path.getmtime(_SRC) > os.path.getmtime(_SO)
            ):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                     _SRC, "-o", _SO],
                    check=True, capture_output=True, timeout=120,
                )
            lib = ctypes.CDLL(_SO)
            lib.bpe_ctx_new.restype = ctypes.c_void_p
            lib.bpe_ctx_new.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int32]
            lib.bpe_ctx_free.argtypes = [ctypes.c_void_p]
            lib.bpe_encode.restype = ctypes.c_int32
            lib.bpe_encode.argtypes = [
                ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int32,
                ctypes.POINTER(ctypes.c_int32)]
            _lib = lib
        except Exception:
            _build_failed = True
            return None
    return _lib


class NativeBpe:
    """Holds a native rank table; ``encode_piece`` runs the C++ merge."""

    def __init__(self, ranks: Dict[bytes, int]) -> None:
        lib = _load_library()
        if lib is None:
            raise RuntimeError("native BPE library unavailable")
        self._lib = lib
        tokens = b"".join(ranks.keys())
        n = len(ranks)
        lens = (ctypes.c_int32 * n)(*(len(t) for t in ranks.keys()))
        rank_vals = (ctypes.c_int32 * n)(*ranks.values())
        self._ctx = ctypes.c_void_p(lib.bpe_ctx_new(tokens, lens, rank_vals, n))
        if not self._ctx:
            raise RuntimeError("bpe_ctx_new failed")
    def encode_piece(self, piece: bytes) -> Optional[List[int]]:
        """Token ids for one pre-split piece, or None if not encodable.

        Thread-safe: the output buffer is allocated per call — an engine (and
        its tokenizer) is shared by concurrent server handler threads, and a
        shared buffer here once corrupted concurrent requests' prompt ids
        (caught by test_serving's concurrent-parity test as a rare flake).
        The C++ side only reads the rank table, so no lock is needed."""
        out = (ctypes.c_int32 * max(len(piece), 1))()
        n = self._lib.bpe_encode(self._ctx, piece, len(piece), out)
        if n < 0:
            return None
        return list(out[:n])

    def __del__(self):
        ctx = getattr(self, "_ctx", None)
        if ctx:
            self._lib.bpe_ctx_free(ctx)
            self._ctx = None


def native_available() -> bool:
    return _load_library() is not None
