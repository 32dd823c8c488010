"""ctypes bindings for the native host library (native/host_ops.cc), with
pure-Python fallbacks. The library is optional: build with `make native`."""

from __future__ import annotations

import ctypes
import os
from typing import Optional

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for cand in (
        os.path.join(here, "native", "libnvhost.so"),
        os.path.join(here, "libnvhost.so"),
    ):
        if os.path.exists(cand):
            try:
                lib = ctypes.CDLL(cand)
                lib.nv_hash64.restype = ctypes.c_uint64
                lib.nv_hash64.argtypes = [
                    ctypes.POINTER(ctypes.c_int32), ctypes.c_int32, ctypes.c_uint64,
                ]
                lib.nv_bpe_new.restype = ctypes.c_void_p
                lib.nv_bpe_new.argtypes = [
                    ctypes.c_int32,
                    ctypes.POINTER(ctypes.c_int32),
                    ctypes.POINTER(ctypes.c_int32),
                    ctypes.POINTER(ctypes.c_int32),
                ]
                lib.nv_bpe_apply.restype = ctypes.c_int32
                lib.nv_bpe_apply.argtypes = [
                    ctypes.c_void_p,
                    ctypes.POINTER(ctypes.c_int32),
                    ctypes.c_int32,
                    ctypes.POINTER(ctypes.c_int32),
                ]
                lib.nv_bpe_free.argtypes = [ctypes.c_void_p]
                _LIB = lib
            except OSError:
                _LIB = None
            break
    return _LIB


def available() -> bool:
    return _lib() is not None


def hash64(token_ids: list[int], prefix: int) -> Optional[int]:
    """Native chained block hash; None if the library isn't built."""
    lib = _lib()
    if lib is None:
        return None
    n = len(token_ids)
    arr = (ctypes.c_int32 * n)(*token_ids)
    return int(lib.nv_hash64(arr, n, ctypes.c_uint64(prefix & 0xFFFFFFFFFFFFFFFF)))


class NativeBpe:
    """Greedy lowest-rank merge over token ids."""

    def __init__(self, merges_ids: list[tuple[int, int, int]]):
        lib = _lib()
        if lib is None:
            raise RuntimeError("native library not built (make native)")
        n = len(merges_ids)
        left = (ctypes.c_int32 * n)(*(m[0] for m in merges_ids))
        right = (ctypes.c_int32 * n)(*(m[1] for m in merges_ids))
        merged = (ctypes.c_int32 * n)(*(m[2] for m in merges_ids))
        self._lib = lib
        self._h = lib.nv_bpe_new(n, left, right, merged)

    def apply(self, ids: list[int]) -> list[int]:
        n = len(ids)
        if n <= 1:
            return list(ids)
        arr = (ctypes.c_int32 * n)(*ids)
        out = (ctypes.c_int32 * n)()
        m = self._lib.nv_bpe_apply(self._h, arr, n, out)
        return list(out[:m])

    def __del__(self):
        try:
            if getattr(self, "_h", None):
                self._lib.nv_bpe_free(self._h)
        except Exception:
            pass
