"""Feather V1 reader (legacy pre-IPC format).

Reference: cpp/src/arrow/ipc/feather.{h,cc} ReaderV1 — the reference
reads both Feather versions; V2 is the Arrow IPC file format (which
io/ipc_native.py already speaks), V1 is this older flatbuffer layout:

  "FEA1" | column data blocks ... | CTable flatbuffer | <u32 meta len>
  | "FEA1"

CTable/Column/PrimitiveArray tables are navigated with the same
hand-built vtable reader the IPC path uses (ipc_native._T). Per
column: optional null bitmap (LSB bit order, 8-byte padded) then
values; UTF8/BINARY carry an int32 offsets vector (8-byte padded)
before the byte blob. CATEGORY columns carry the codes in the primary
array and the dictionary values in the metadata's `levels`.
"""

from __future__ import annotations

import struct
from typing import List, Optional

import numpy as np

from .. import dtypes as dt
from ..column import Column, Dictionary
from ..errors import Invalid
from ..table import RecordBatch
from .ipc_native import _T

__all__ = ["is_feather_v1", "read_feather_v1"]

# feather.fbs Type enum (ReaderV1's column types)
_PRIM = {
    0: (dt.bool_, None), 1: (dt.int8, np.int8), 2: (dt.int16, np.int16),
    3: (dt.int32, np.int32), 4: (dt.int64, np.int64),
    5: (dt.uint8, np.uint8), 6: (dt.uint16, np.uint16),
    7: (dt.uint32, np.uint32), 8: (dt.uint64, np.uint64),
    9: (dt.float32, np.float32), 10: (dt.float64, np.float64),
}
T_UTF8, T_BINARY = 11, 12
# TypeMetadata union tags
M_CATEGORY, M_TIMESTAMP, M_DATE, M_TIME = 1, 2, 3, 4
_UNITS = {0: "s", 1: "ms", 2: "us", 3: "ns"}


def is_feather_v1(buf: bytes) -> bool:
    return len(buf) > 8 and buf[:4] == b"FEA1" and buf[-4:] == b"FEA1"


def _pad8(n: int) -> int:
    return (n + 7) & ~7


class _PrimArray:
    """feather.fbs PrimitiveArray: type(0) encoding(1) offset(2)
    length(3) null_count(4) total_bytes(5)."""

    def __init__(self, t: _T):
        self.type = t.i8(0)
        self.encoding = t.i8(1)
        self.offset = t.i64(2)
        self.length = t.i64(3)
        self.null_count = t.i64(4)
        self.total_bytes = t.i64(5)


def _read_values(buf: bytes, pa_: _PrimArray):
    """-> (values ndarray | list of bytes, validity bool[n] | None)."""
    pos = pa_.offset
    n = pa_.length
    validity = None
    if pa_.null_count > 0:
        nbytes = _pad8((n + 7) // 8)
        bits = np.frombuffer(buf, np.uint8, (n + 7) // 8, pos)
        validity = np.unpackbits(bits, bitorder="little",
                                 count=n).astype(bool)
        pos += nbytes
    if pa_.type in _PRIM:
        typ, npdt = _PRIM[pa_.type]
        if pa_.type == 0:  # bool: bit-packed
            bits = np.frombuffer(buf, np.uint8, (n + 7) // 8, pos)
            vals = np.unpackbits(bits, bitorder="little",
                                 count=n).astype(bool)
        else:
            vals = np.frombuffer(buf, npdt, n, pos)
        return vals, validity
    if pa_.type in (T_UTF8, T_BINARY):
        offs = np.frombuffer(buf, np.int32, n + 1, pos)
        blob_pos = pos + _pad8(4 * (n + 1))
        vals = [buf[blob_pos + offs[i]: blob_pos + offs[i + 1]]
                for i in range(n)]
        return vals, validity
    raise Invalid(f"feather v1: column type {pa_.type}")


def _column(buf: bytes, name: str, col_t: _T) -> Column:
    import jax.numpy as jnp

    arr = _PrimArray(col_t.table(1))
    meta_type = col_t.i8(2)
    meta = col_t.table(3)
    vals, validity = _read_values(buf, arr)
    vj = None if validity is None else jnp.asarray(validity)

    if meta_type == M_CATEGORY and meta is not None:
        levels = _PrimArray(meta.table(0))
        lvals, _ = _read_values(buf, levels)
        uniq = np.asarray([v.decode("utf8") for v in lvals] or [""],
                          object)
        return Column(jnp.asarray(np.asarray(vals).astype(np.int32)),
                      dt.string, validity=vj,
                      dictionary=Dictionary(uniq))
    if arr.type in (T_UTF8, T_BINARY):
        typ = dt.string if arr.type == T_UTF8 else dt.binary
        dec = [v.decode("utf8") for v in vals] if arr.type == T_UTF8 \
            else vals
        uniq, codes = (np.unique(np.asarray(dec, object),
                                 return_inverse=True)
                       if dec else (np.asarray([""], object),
                                    np.zeros(0, np.int64)))
        return Column(jnp.asarray(codes.astype(np.int32)), typ,
                      validity=vj, dictionary=Dictionary(uniq))
    typ = _PRIM[arr.type][0]
    if meta_type == M_TIMESTAMP and meta is not None:
        unit = _UNITS.get(meta.i8(0), "us")
        tz = meta.string(1)
        typ = dt.timestamp(unit, tz)
    elif meta_type == M_DATE:
        typ = dt.date32
        vals = np.asarray(vals).astype(np.int32)
    elif meta_type == M_TIME and meta is not None:
        unit = _UNITS.get(meta.i8(0), "s")
        typ = dt.time32(unit) if unit in ("s", "ms") else dt.time64(unit)
    bits = None
    if typ.kind == "float64":
        bits = jnp.asarray(np.ascontiguousarray(vals).view(np.int64))
    return Column(jnp.asarray(vals), typ, validity=vj, bits=bits)


def read_feather_v1(buf: bytes, columns: Optional[List[str]] = None
                    ) -> RecordBatch:
    if not is_feather_v1(buf):
        raise Invalid("feather v1: bad magic")
    (meta_len,) = struct.unpack_from("<I", buf, len(buf) - 8)
    meta = buf[len(buf) - 8 - meta_len: len(buf) - 8]
    root = _T(meta, struct.unpack_from("<i", meta, 0)[0])
    # CTable: description(0) num_rows(1) columns(2) version(3)
    vec_pos, vec_len = root.vector(2)
    cols, names = [], []
    for i in range(vec_len):
        off = struct.unpack_from("<i", meta, vec_pos + 4 * i)[0]
        col_t = _T(meta, vec_pos + 4 * i + off)
        name = col_t.string(0)
        if columns is not None and name not in columns:
            continue
        cols.append(_column(buf, name, col_t))
        names.append(name)
    if columns is not None:
        order = {n: i for i, n in enumerate(names)}
        cols = [cols[order[n]] for n in columns if n in order]
        names = [n for n in columns if n in order]
    return RecordBatch(tuple(cols), tuple(names))
