"""Line-delimited JSON reader.

Reference: cpp/src/arrow/json/ — parallel block parse (json/reader.cc),
per-key column assembly + inference (json/converter.cc). The native
path is an original C++ implementation (native/src/json.cpp) for the
flat-object common case: lines parse to (key, token) maps in parallel,
the key union defines columns in first-appearance order, inference
follows null -> int64 -> bool -> float64 -> string, strings unescape
(\\uXXXX incl. surrogate pairs) and dictionary-encode at parse time.

Nesting parses natively at ARBITRARY depth: the parser captures
balanced nested spans and a recursive assembler (json.cpp
assemble_nested) emits a column TREE — T_LIST nodes with a ".$"
element child and struct presence nodes with "name.key" children —
reassembled into List/StructColumns by _native_tbl.py. Mixed
scalar/nested columns and explicit schemas fall back to pyarrow.json —
the same C++ engine the reference ships.
"""

from __future__ import annotations

import os
from typing import Optional

from ..interop import record_batch_from_arrow
from ..table import RecordBatch, Table

__all__ = ["read_json"]


def _as_bytes(path_or_buf) -> Optional[bytes]:
    if isinstance(path_or_buf, (bytes, bytearray)):
        return bytes(path_or_buf)
    if isinstance(path_or_buf, (str, os.PathLike)) and \
            os.path.exists(path_or_buf):
        with open(path_or_buf, "rb") as f:
            return f.read()
    if hasattr(path_or_buf, "read"):
        data = path_or_buf.read()
        return data.encode() if isinstance(data, str) else bytes(data)
    return None


def read_json(path_or_buf, read_options=None, parse_options=None,
              native: bool = True) -> Table:
    """Read newline-delimited JSON -> Table (pyarrow.json surface)."""
    data = None
    if native and read_options is None and parse_options is None:
        from ._native_tbl import result_to_batch, tbl_lib

        lib = tbl_lib()
        data = _as_bytes(path_or_buf) if lib is not None else None
        if data is not None:
            h = lib.a1t_json_parse(data, len(data), 0)
            try:
                err = lib.a1t_tbl_error(h)
                if not err:
                    return Table([result_to_batch(lib, h)])
            finally:
                lib.a1t_tbl_free(h)
    from pyarrow import json as pajson

    import io as _io

    # a file-like source was already consumed by the native attempt —
    # fall back on the bytes we read, not the exhausted stream
    src = data if data is not None else path_or_buf
    if isinstance(src, (bytes, bytearray)):
        src = _io.BytesIO(src)
    tbl = pajson.read_json(src, read_options=read_options,
                           parse_options=parse_options)
    return Table([record_batch_from_arrow(tbl)])
