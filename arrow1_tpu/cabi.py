"""Arrow C data interface — native struct implementation.

Reference: cpp/src/arrow/c/abi.h:30 (ArrowSchema), :46 (ArrowArray) and
c/bridge.cc import/export. This module lays out those exact C structs
with ctypes and speaks the PyCapsule protocol ("arrow_schema" /
"arrow_array" capsules, the Python standardization of the same ABI) —
no pyarrow on the export or import path. Any ABI consumer (pyarrow,
polars, duckdb, nanoarrow) can exchange columns with the engine
zero-copy on the host side.

Layout notes (Columnar.rst):
- buffers are [validity, data] for fixed-width, [validity, offsets,
  data] for var-binary; validity is LSB-packed bits, NULL when all
  valid
- format strings: abi.h / c/bridge.cc Schema export ("l"=int64,
  "g"=float64, "u"=utf8, "tsu:TZ"=timestamp, "d:P,S"=decimal128, ...)
- release callbacks: the consumer calls release(self) once done; the
  producer must keep buffers alive until then and mark the struct
  released by nulling the callback
"""

from __future__ import annotations

import ctypes
from typing import List, Optional, Sequence, Tuple

import numpy as np

from . import dtypes as dt
from .column import Column, Dictionary
from .errors import Invalid
from .table import RecordBatch

__all__ = ["ArrowSchema", "ArrowArray", "export_array_capsules",
           "import_array_capsules", "CArrayExportable"]


class ArrowSchema(ctypes.Structure):
    pass


_SchemaReleaseFn = ctypes.CFUNCTYPE(None, ctypes.POINTER(ArrowSchema))

ArrowSchema._fields_ = [
    ("format", ctypes.c_char_p),
    ("name", ctypes.c_char_p),
    ("metadata", ctypes.c_char_p),
    ("flags", ctypes.c_int64),
    ("n_children", ctypes.c_int64),
    ("children", ctypes.POINTER(ctypes.POINTER(ArrowSchema))),
    ("dictionary", ctypes.POINTER(ArrowSchema)),
    ("release", _SchemaReleaseFn),
    ("private_data", ctypes.c_void_p),
]


class ArrowArray(ctypes.Structure):
    pass


_ArrayReleaseFn = ctypes.CFUNCTYPE(None, ctypes.POINTER(ArrowArray))

ArrowArray._fields_ = [
    ("length", ctypes.c_int64),
    ("null_count", ctypes.c_int64),
    ("offset", ctypes.c_int64),
    ("n_buffers", ctypes.c_int64),
    ("n_children", ctypes.c_int64),
    ("buffers", ctypes.POINTER(ctypes.c_void_p)),
    ("children", ctypes.POINTER(ctypes.POINTER(ArrowArray))),
    ("dictionary", ctypes.POINTER(ArrowArray)),
    ("release", _ArrayReleaseFn),
    ("private_data", ctypes.c_void_p),
]

ARROW_FLAG_NULLABLE = 2

# format strings per abi.h docs / c/bridge.cc
_FMT = {
    "bool": "b", "int8": "c", "uint8": "C", "int16": "s", "uint16": "S",
    "int32": "i", "uint32": "I", "int64": "l", "uint64": "L",
    "float16": "e", "float32": "f", "float64": "g",
    "string": "u", "large_string": "U", "binary": "z", "large_binary": "Z",
    "date32": "tdD", "date64": "tdm",
}
_FMT_REV = {v: k for k, v in _FMT.items()}
_TIME_FMT = {"s": "s", "ms": "m", "us": "u", "ns": "n"}
_TIME_REV = {v: k for k, v in _TIME_FMT.items()}


def _format_for(t: dt.DataType) -> str:
    if t.kind in _FMT:
        return _FMT[t.kind]
    if t.kind == "timestamp":
        return f"ts{_TIME_FMT[t.unit]}:{t.tz or ''}"
    if t.kind == "time32":
        return f"tt{_TIME_FMT[t.unit]}"
    if t.kind == "time64":
        return f"tt{_TIME_FMT[t.unit]}"
    if t.kind == "duration":
        return f"tD{_TIME_FMT[t.unit]}"
    if t.kind == "decimal128":
        return f"d:{t.precision},{t.scale}"
    if t.kind == "decimal256":
        return f"d:{t.precision},{t.scale},256"
    raise Invalid(f"cabi: unsupported export type {t}")


def _type_from_format(fmt: str) -> dt.DataType:
    if fmt in _FMT_REV:
        return dt.DataType(_FMT_REV[fmt])
    if fmt.startswith("ts"):
        unit = _TIME_REV[fmt[2]]
        tz = fmt[4:] or None
        return dt.timestamp(unit, tz)
    if fmt.startswith("tt"):
        unit = _TIME_REV[fmt[2]]
        return dt.time32(unit) if unit in ("s", "ms") else dt.time64(unit)
    if fmt.startswith("tD"):
        return dt.duration(_TIME_REV[fmt[2]])
    if fmt.startswith("d:"):
        parts = fmt[2:].split(",")
        if len(parts) == 3 and parts[2] == "256":
            return dt.decimal256(int(parts[0]), int(parts[1]))
        return dt.decimal128(int(parts[0]), int(parts[1]))
    raise Invalid(f"cabi: unsupported import format {fmt!r}")


# Exported buffers stay alive in this registry until the consumer calls
# the struct's release callback. Release must survive Python teardown
# and foreign threads, so it lives in the native library
# (native/src/cabi.cpp): it records the export id on a drain list that
# we empty (freeing the buffers) on each subsequent export.
_live_exports = {}
_export_seq = [0]


def _release_fns():
    from .native import load_library

    lib = load_library()
    if lib is None:
        raise Invalid("cabi export needs the native library (release "
                      "callbacks must outlive the Python runtime); build "
                      "toolchain unavailable")
    sc = ctypes.cast(lib.a1t_cabi_release_schema, _SchemaReleaseFn)
    ac = ctypes.cast(lib.a1t_cabi_release_array, _ArrayReleaseFn)
    return lib, sc, ac


def _drain_released(lib):
    buf = (ctypes.c_int64 * 256)()
    lib.a1t_cabi_drain.restype = ctypes.c_int64
    while True:
        n = lib.a1t_cabi_drain(buf, 256)
        for i in range(n):
            _live_exports.pop(int(buf[i]), None)
        if n < 256:
            break


def _export_schema(t: dt.DataType, name: str = "") -> ArrowSchema:
    lib, rel_s, _ = _release_fns()
    _drain_released(lib)
    s = ArrowSchema()
    fmt = _format_for(t).encode()
    nameb = name.encode()
    s.format = fmt
    s.name = nameb
    s.metadata = None
    s.flags = ARROW_FLAG_NULLABLE
    s.n_children = 0
    s.children = None
    s.dictionary = None
    s.release = rel_s
    _export_seq[0] += 1
    s.private_data = _export_seq[0]
    _live_exports[_export_seq[0]] = (s, fmt, nameb)
    return s


def _column_host_buffers(col: Column) -> Tuple[List, int, int]:
    """-> (numpy buffers or None, length, null_count); buffer 0 is the
    LSB-packed validity (None when all valid)."""
    n = col.length
    nulls = 0
    vbuf = None
    if col.validity is not None:
        mask = np.asarray(col.validity)
        nulls = int((~mask).sum())
        if nulls:
            vbuf = np.packbits(mask, bitorder="little")
    t = col.dtype
    if t.kind == "bool":
        data = np.packbits(np.asarray(col.data), bitorder="little")
        return [vbuf, data], n, nulls
    if t.kind in ("decimal128", "decimal256"):
        nl = 2 if t.kind == "decimal128" else 4
        words = np.empty((n, nl), dtype="<u8")
        words[:, 0] = np.ascontiguousarray(
            np.asarray(col.data)).view(np.uint64)
        hi = np.ascontiguousarray(np.asarray(col.data2)).view(np.uint64)
        if nl == 2:
            words[:, 1] = hi
        else:
            words[:, 1:] = hi.reshape(n, 3)
        return [vbuf, words], n, nulls
    if t.is_binary:
        codes = np.asarray(col.data)
        values = col.dictionary.values
        enc = [v.encode("utf8") if isinstance(v, str) else bytes(v)
               for v in values]
        lens = np.array([len(e) for e in enc] or [0], dtype=np.int64)
        row_lens = lens[codes] if n else np.zeros(0, np.int64)
        if col.validity is not None:
            row_lens = np.where(np.asarray(col.validity), row_lens, 0)
        odt = np.int64 if t.kind.startswith("large") else np.int32
        offsets = np.zeros(n + 1, dtype=odt)
        np.cumsum(row_lens, out=offsets[1:])
        buf = bytearray()
        valid = (np.ones(n, bool) if col.validity is None
                 else np.asarray(col.validity))
        for i, c in enumerate(codes):
            if valid[i]:
                buf += enc[int(c)]
        data = np.frombuffer(bytes(buf), np.uint8)
        return [vbuf, offsets, data], n, nulls
    data = np.ascontiguousarray(np.asarray(col.data))
    return [vbuf, data], n, nulls


def _export_array(col: Column) -> ArrowArray:
    lib, _, rel_a = _release_fns()
    _drain_released(lib)
    bufs, n, nulls = _column_host_buffers(col)
    a = ArrowArray()
    a.length = n
    a.null_count = nulls
    a.offset = 0
    a.n_buffers = len(bufs)
    a.n_children = 0
    a.children = None
    a.dictionary = None
    ptrs = (ctypes.c_void_p * len(bufs))()
    for i, b in enumerate(bufs):
        ptrs[i] = None if b is None else b.ctypes.data
    a.buffers = ptrs
    a.release = rel_a
    _export_seq[0] += 1
    a.private_data = _export_seq[0]
    _live_exports[_export_seq[0]] = (a, bufs, ptrs)
    return a


_PyCapsule_New = ctypes.pythonapi.PyCapsule_New
_PyCapsule_New.restype = ctypes.py_object
_PyCapsule_New.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                           ctypes.c_void_p]
_PyCapsule_GetPointer = ctypes.pythonapi.PyCapsule_GetPointer
_PyCapsule_GetPointer.restype = ctypes.c_void_p
_PyCapsule_GetPointer.argtypes = [ctypes.py_object, ctypes.c_char_p]


def export_array_capsules(col: Column, name: str = ""):
    """-> ("arrow_schema", "arrow_array") PyCapsule pair for one column.
    The structs live until the consumer calls their release callbacks
    (buffer ownership per c/bridge.cc producer rules)."""
    s = _export_schema(col.dtype, name)
    a = _export_array(col)
    sc = _PyCapsule_New(ctypes.addressof(s), b"arrow_schema", None)
    ac = _PyCapsule_New(ctypes.addressof(a), b"arrow_array", None)
    return sc, ac


def _np_from(ptr, count, dtype):
    if not ptr or count == 0:
        return np.zeros(count, dtype)
    buf_t = ctypes.c_char * (count * np.dtype(dtype).itemsize)
    raw = buf_t.from_address(ptr)
    return np.frombuffer(raw, dtype=dtype, count=count)


def import_array_capsules(schema_capsule, array_capsule) -> Column:
    """("arrow_schema", "arrow_array") capsules -> device Column.
    Walks the C structs directly (c/bridge.cc import side)."""
    import jax.numpy as jnp

    sp = _PyCapsule_GetPointer(schema_capsule, b"arrow_schema")
    ap = _PyCapsule_GetPointer(array_capsule, b"arrow_array")
    s = ArrowSchema.from_address(sp)
    a = ArrowArray.from_address(ap)
    if s.dictionary:
        raise Invalid("cabi import: dictionary-encoded input — use the "
                      "pyarrow bridge in cdata.py")
    t = _type_from_format(s.format.decode())
    n = a.length
    off = a.offset
    bufs = [a.buffers[i] if a.buffers else None
            for i in range(a.n_buffers)]
    validity = None
    if a.null_count != 0 and bufs and bufs[0]:
        bits = _np_from(bufs[0], (off + n + 7) // 8, np.uint8)
        validity = jnp.asarray(np.unpackbits(
            bits, bitorder="little", count=off + n)[off:].astype(bool))
    if t.kind == "bool":
        bits = _np_from(bufs[1], (off + n + 7) // 8, np.uint8)
        data = np.unpackbits(bits, bitorder="little",
                             count=off + n)[off:].astype(bool)
        return Column(jnp.asarray(data), t, validity=validity)
    if t.kind in ("decimal128", "decimal256"):
        nl = 2 if t.kind == "decimal128" else 4
        words = _np_from(bufs[1], (off + n) * nl, "<u8").reshape(-1, nl)
        words = words[off:]
        lo = words[:, 0].copy().view(np.int64)
        hi = (words[:, 1].copy().view(np.int64) if nl == 2
              else words[:, 1:].copy().view(np.int64))
        return Column(jnp.asarray(lo), t, validity=validity,
                      data2=jnp.asarray(hi))
    if t.is_binary:
        odt = np.int64 if t.kind.startswith("large") else np.int32
        offsets = _np_from(bufs[1], off + n + 1, odt)[off:]
        nbytes = int(offsets[-1]) if n else 0
        data = _np_from(bufs[2], nbytes, np.uint8)
        vals = [bytes(data[offsets[i]: offsets[i + 1]]).decode("utf8")
                if t.is_string else
                bytes(data[offsets[i]: offsets[i + 1]])
                for i in range(n)]
        uniq, codes = (np.unique(np.asarray(vals, object),
                                 return_inverse=True) if n else
                       (np.asarray([""], object), np.zeros(0, np.int64)))
        return Column(jnp.asarray(codes.astype(np.int32)), t,
                      validity=validity, dictionary=Dictionary(uniq))
    npdt = np.dtype(t.physical_dtype())
    data = _np_from(bufs[1], off + n, npdt)[off:]
    bits = None
    if t.kind == "float64":
        bits = jnp.asarray(data.copy().view(np.int64))
    return Column(jnp.asarray(data.copy()), t, validity=validity,
                  bits=bits)


class CArrayExportable:
    """Wraps a Column with the __arrow_c_array__ protocol so ANY Arrow
    C ABI consumer can ingest it (the engine-native producer side)."""

    def __init__(self, col: Column, name: str = ""):
        self._col = col
        self._name = name

    def __arrow_c_array__(self, requested_schema=None):
        return export_array_capsules(self._col, self._name)


# ====================================================================
# ArrowArrayStream: the C stream interface (reference: c/abi.h:85 +
# c/stream.cc ExportRecordBatchReader/ImportRecordBatchReader). The
# struct and its callbacks are built HERE with ctypes — pyarrow's
# RecordBatchReader.from_stream consumes our capsule over the raw ABI.
# ====================================================================

class ArrowArrayStream(ctypes.Structure):
    pass


_StreamGetSchemaFn = ctypes.CFUNCTYPE(
    ctypes.c_int, ctypes.POINTER(ArrowArrayStream),
    ctypes.POINTER(ArrowSchema))
_StreamGetNextFn = ctypes.CFUNCTYPE(
    ctypes.c_int, ctypes.POINTER(ArrowArrayStream),
    ctypes.POINTER(ArrowArray))
_StreamGetErrFn = ctypes.CFUNCTYPE(
    ctypes.c_char_p, ctypes.POINTER(ArrowArrayStream))
_StreamReleaseFn = ctypes.CFUNCTYPE(
    None, ctypes.POINTER(ArrowArrayStream))

ArrowArrayStream._fields_ = [
    ("get_schema", _StreamGetSchemaFn),
    ("get_next", _StreamGetNextFn),
    ("get_last_error", _StreamGetErrFn),
    ("release", _StreamReleaseFn),
    ("private_data", ctypes.c_void_p),
]

_live_streams: dict = {}


def _export_struct_schema(batch: RecordBatch) -> ArrowSchema:
    """Struct-typed schema with one child per column (the stream's
    batch type, format '+s')."""
    lib, rel_s, _ = _release_fns()
    _drain_released(lib)
    n = len(batch.names)
    kids = (ctypes.POINTER(ArrowSchema) * n)()
    kid_structs = []
    for i, name in enumerate(batch.names):
        ks = _export_schema(batch.column(name).dtype, name)
        kid_structs.append(ks)
        kids[i] = ctypes.pointer(ks)
    s = ArrowSchema()
    s.format = b"+s"
    s.name = b""
    s.metadata = None
    s.flags = 0
    s.n_children = n
    s.children = kids
    s.dictionary = None
    s.release = rel_s
    _export_seq[0] += 1
    s.private_data = _export_seq[0]
    _live_exports[_export_seq[0]] = (s, kids, kid_structs, b"+s")
    return s


def _export_struct_array(batch: RecordBatch) -> ArrowArray:
    """Struct array: no own value buffers, one child per column."""
    lib, _, rel_a = _release_fns()
    _drain_released(lib)
    n = len(batch.names)
    kids = (ctypes.POINTER(ArrowArray) * n)()
    kid_structs = []
    for i, name in enumerate(batch.names):
        ka = _export_array(batch.column(name))
        kid_structs.append(ka)
        kids[i] = ctypes.pointer(ka)
    a = ArrowArray()
    a.length = batch.num_rows
    a.null_count = 0
    a.offset = 0
    ptrs = (ctypes.c_void_p * 1)()
    ptrs[0] = None  # struct validity: absent (all valid)
    a.n_buffers = 1
    a.buffers = ptrs
    a.n_children = n
    a.children = kids
    a.dictionary = None
    a.release = rel_a
    _export_seq[0] += 1
    a.private_data = _export_seq[0]
    _live_exports[_export_seq[0]] = (a, kids, kid_structs, ptrs)
    return a


def export_stream_capsule(batches: Sequence[RecordBatch]):
    """RecordBatch sequence -> "arrow_array_stream" PyCapsule.

    The stream struct's callbacks move freshly-exported structs into
    the caller's out-pointers per the ABI's move semantics; buffers
    stay alive in the export registry until each struct's own release
    runs (the same C-side release as single-array exports)."""
    if not batches:
        raise Invalid("export_stream_capsule: need at least one batch")
    it = iter(list(batches))
    first = batches[0]

    def get_schema(stream_ptr, out_ptr):
        try:
            s = _export_struct_schema(first)
            ctypes.memmove(out_ptr, ctypes.addressof(s),
                           ctypes.sizeof(ArrowSchema))
            return 0
        except Exception:
            return 22  # EINVAL

    def get_next(stream_ptr, out_ptr):
        try:
            batch = next(it, None)
            if batch is None:
                # end of stream: release = NULL per spec
                ctypes.memset(out_ptr, 0, ctypes.sizeof(ArrowArray))
                return 0
            a = _export_struct_array(batch)
            ctypes.memmove(out_ptr, ctypes.addressof(a),
                           ctypes.sizeof(ArrowArray))
            return 0
        except Exception:
            return 22

    def get_last_error(stream_ptr):
        return None

    sid = None

    def release(stream_ptr):
        stream_ptr.contents.release = _StreamReleaseFn()
        _live_streams.pop(sid, None)

    st = ArrowArrayStream()
    st.get_schema = _StreamGetSchemaFn(get_schema)
    st.get_next = _StreamGetNextFn(get_next)
    st.get_last_error = _StreamGetErrFn(get_last_error)
    st.release = _StreamReleaseFn(release)
    _export_seq[0] += 1
    sid = _export_seq[0]
    st.private_data = sid
    # keep struct + callback objects alive until the consumer releases
    _live_streams[sid] = (st, st.get_schema, st.get_next,
                          st.get_last_error, st.release, it, first)
    return _PyCapsule_New(ctypes.addressof(st), b"arrow_array_stream",
                          None)


class CStreamExportable:
    """__arrow_c_stream__ provider over engine batches (the object shape
    pa.RecordBatchReader.from_stream and DuckDB-style consumers take)."""

    def __init__(self, batches: Sequence[RecordBatch]):
        self._batches = list(batches)

    def __arrow_c_stream__(self, requested_schema=None):
        return export_stream_capsule(self._batches)


def import_stream_capsule(capsule):
    """"arrow_array_stream" capsule -> list of RecordBatch. Walks the
    FOREIGN stream's callbacks directly (c/stream.cc import side) and
    imports each struct batch child-by-child over the raw ABI — no
    pyarrow reader in the path."""
    from .table import RecordBatch as _RB

    ptr = _PyCapsule_GetPointer(capsule, b"arrow_array_stream")
    st = ArrowArrayStream.from_address(ptr)
    schema = ArrowSchema()
    if st.get_schema(ctypes.byref(st), ctypes.byref(schema)):
        raise Invalid("stream get_schema failed")
    try:
        if (schema.format or b"") != b"+s":
            raise Invalid(f"stream import: batch format "
                          f"{schema.format!r} (want struct)")
        names = []
        child_schema_caps = []
        for i in range(schema.n_children):
            cs = schema.children[i].contents
            names.append((cs.name or b"").decode())
            child_schema_caps.append(_PyCapsule_New(
                ctypes.addressof(cs), b"arrow_schema", None))
        out = []
        while True:
            arr = ArrowArray()
            if st.get_next(ctypes.byref(st), ctypes.byref(arr)):
                raise Invalid("stream get_next failed")
            if not arr.release:
                break
            try:
                cols = []
                for i in range(arr.n_children):
                    ca = arr.children[i].contents
                    acap = _PyCapsule_New(ctypes.addressof(ca),
                                          b"arrow_array", None)
                    cols.append(import_array_capsules(
                        child_schema_caps[i], acap))
                out.append(_RB(tuple(cols), tuple(names)))
            finally:
                arr.release(ctypes.byref(arr))
        return out
    finally:
        if schema.release:
            schema.release(ctypes.byref(schema))
        if st.release:
            st.release(ctypes.byref(st))
