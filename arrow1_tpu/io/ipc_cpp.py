"""C++-side Arrow IPC reader binding (native/src/ipc_file.cpp).

This is the cross-language consumption path for the wire format: a
C/C++ program (or any FFI-capable runtime) links libarrow1_tpu_native
and walks IPC files without Python on the path — the read-side
counterpart of the C-ABI consumer (native/src/cabi.cpp). Reference
surface: the multi-language readers the reference ships (e.g.
go/arrow/ipc, js/src/ipc) over the same framing
(cpp/src/arrow/ipc/message.h:238).

`read_ipc_cpp(path)` drives it from Python via ctypes for testing and
as a zero-copy fallback reader for flat primitive schemas; other
schemas raise so callers use the full Python reader (io/ipc_native.py).
"""

from __future__ import annotations

import ctypes
import mmap
from typing import List, Tuple

import numpy as np

from ..native import load_library

__all__ = ["read_ipc_cpp", "ipc_cpp_available"]

_TYPES = {
    1: np.int8, 2: np.int16, 3: np.int32, 4: np.int64,
    5: np.uint8, 6: np.uint16, 7: np.uint32, 8: np.uint64,
    9: np.float32, 10: np.float64, 11: np.bool_,
}

_configured = False


def _lib():
    global _configured
    lib = load_library()
    if lib is None:
        return None
    if not _configured:
        lib.a1t_ipc_open.restype = ctypes.c_void_p
        lib.a1t_ipc_open.argtypes = [ctypes.c_char_p, ctypes.c_uint64]
        lib.a1t_ipc_err.restype = ctypes.c_int32
        lib.a1t_ipc_err.argtypes = [ctypes.c_void_p]
        lib.a1t_ipc_close.argtypes = [ctypes.c_void_p]
        lib.a1t_ipc_ncols.restype = ctypes.c_int32
        lib.a1t_ipc_ncols.argtypes = [ctypes.c_void_p]
        lib.a1t_ipc_nbatches.restype = ctypes.c_int32
        lib.a1t_ipc_nbatches.argtypes = [ctypes.c_void_p]
        lib.a1t_ipc_col_name.restype = ctypes.c_char_p
        lib.a1t_ipc_col_name.argtypes = [ctypes.c_void_p, ctypes.c_int32]
        lib.a1t_ipc_col_type.restype = ctypes.c_int32
        lib.a1t_ipc_col_type.argtypes = [ctypes.c_void_p, ctypes.c_int32]
        lib.a1t_ipc_batch_rows.restype = ctypes.c_int64
        lib.a1t_ipc_batch_rows.argtypes = [ctypes.c_void_p,
                                           ctypes.c_int32]
        lib.a1t_ipc_col_data.restype = ctypes.POINTER(ctypes.c_uint8)
        lib.a1t_ipc_col_data.argtypes = [
            ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint64)]
        lib.a1t_ipc_col_validity.restype = ctypes.POINTER(ctypes.c_uint8)
        lib.a1t_ipc_col_validity.argtypes = lib.a1t_ipc_col_data.argtypes
        lib.a1t_ipc_col_nulls.restype = ctypes.c_int64
        lib.a1t_ipc_col_nulls.argtypes = [
            ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32]
        _configured = True
    return lib


def ipc_cpp_available() -> bool:
    return _lib() is not None


def read_ipc_cpp(path: str):
    """Read an IPC file/stream through the C++ reader.

    Returns (names, batches) where each batch is a list of
    (values ndarray, validity bool ndarray or None) per column.
    Raises ValueError for schemas outside the C++ reader's scope
    (nested/dictionary/string columns, compressed bodies).
    """
    lib = _lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    with open(path, "rb") as fh:
        buf = fh.read()
    h = lib.a1t_ipc_open(buf, len(buf))
    if not h:
        raise ValueError("ipc_cpp: open failed")
    try:
        err = lib.a1t_ipc_err(h)
        if err == 2:
            raise ValueError("ipc_cpp: compressed body unsupported")
        if err:
            raise ValueError(f"ipc_cpp: parse error {err}")
        ncols = lib.a1t_ipc_ncols(h)
        names: List[str] = []
        dtypes = []
        for c in range(ncols):
            t = lib.a1t_ipc_col_type(h, c)
            if t not in _TYPES:
                raise ValueError(
                    "ipc_cpp: unsupported column type (use the Python "
                    "reader)")
            names.append(lib.a1t_ipc_col_name(h, c).decode())
            dtypes.append(np.dtype(_TYPES[t]))
        batches = []
        for b in range(lib.a1t_ipc_nbatches(h)):
            rows = lib.a1t_ipc_batch_rows(h, b)
            cols: List[Tuple[np.ndarray, np.ndarray]] = []
            for c in range(ncols):
                n = ctypes.c_uint64()
                ptr = lib.a1t_ipc_col_data(h, b, c, ctypes.byref(n))
                raw = bytes(ctypes.cast(
                    ptr, ctypes.POINTER(ctypes.c_uint8 * n.value)
                ).contents) if n.value else b""
                if dtypes[c] == np.bool_:
                    bits = np.frombuffer(raw, np.uint8)
                    vals = np.unpackbits(bits, bitorder="little")[:rows] \
                        .astype(np.bool_)
                else:
                    vals = np.frombuffer(raw, dtypes[c])[:rows]
                vptr = lib.a1t_ipc_col_validity(h, b, c, ctypes.byref(n))
                valid = None
                if lib.a1t_ipc_col_nulls(h, b, c) > 0 and n.value:
                    vraw = bytes(ctypes.cast(
                        vptr, ctypes.POINTER(ctypes.c_uint8 * n.value)
                    ).contents)
                    valid = np.unpackbits(
                        np.frombuffer(vraw, np.uint8),
                        bitorder="little")[:rows].astype(np.bool_)
                cols.append((vals, valid))
            batches.append(cols)
        return names, batches
    finally:
        lib.a1t_ipc_close(h)
