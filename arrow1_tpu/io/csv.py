"""CSV reader/writer.

Reference: cpp/src/arrow/csv/ — parallel chunker/parser/converter
pipeline (csv/reader.cc:697,882; parser.cc BlockParser; converter.cc
type inference). The native path is an original C++ implementation of
that architecture (native/src/csv.cpp): a parallel quote-parity prescan
finds record boundaries, row ranges split into fields in parallel, and
per-column inference (the full reference promotion chain, null ->
int64 -> bool -> date32 -> timestamp[s] -> timestamp[ns] -> float64 ->
string, csv/inference_internal.h:34-65, with the reference's default
null/bool spellings and ISO8601 date/timestamp forms) materializes
typed buffers consumed here zero-copy via ctypes.

Options beyond the native feature set (custom converters, include
columns, non-UTF8 encodings) fall back to pyarrow.csv — the same C++
engine the reference ships.
"""

from __future__ import annotations

import os
from typing import Iterator, Optional, Union

from ..interop import record_batch_from_arrow, record_batch_to_arrow
from ..table import RecordBatch, Table

__all__ = ["read_csv", "write_csv", "open_csv_stream"]

def _native_read(data: bytes, delimiter: str, quote: str,
                 column_names, autogenerate, skip_rows: int):
    from ._native_tbl import result_to_batch, tbl_lib

    lib = tbl_lib()
    if lib is None:
        return None
    has_header = 0 if (column_names or autogenerate) else 1
    h = lib.a1t_csv_parse(data, len(data), delimiter.encode(),
                          quote.encode(), has_header, skip_rows, 0)
    try:
        return result_to_batch(lib, h, column_names)
    finally:
        lib.a1t_tbl_free(h)


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
        skip_after = getattr(read_options, "skip_rows_after_names", 0) or 0
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
                    if skip_after:
                        batch = batch.slice(skip_after)
                    return Table([batch])
                # a file-like source was consumed by _as_bytes: fall
                # back on the captured bytes, not the exhausted stream
                import io as _io

                path_or_buf = _io.BytesIO(data)
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
            import io as _io

            path_or_buf = _io.BytesIO(data)  # stream was consumed
    from pyarrow import csv as pacsv

    reader = pacsv.open_csv(path_or_buf, **kwargs)
    for batch in reader:
        yield record_batch_from_arrow(batch)


def write_csv(data: Union[RecordBatch, Table], path: str,
              delimiter: str = ",", include_header: bool = True):
    """Native CSV writer (reference: csv/writer.cc): RFC-4180 quoting,
    null = bare empty field, empty string = quoted \"\" (so the two stay
    distinguishable on the wire), true/false booleans, exact float repr."""
    batches = data.batches if isinstance(data, Table) else [data]
    special = set(delimiter + '"\n\r')

    def fmt(v):
        if v is None:
            return ""
        if isinstance(v, bool) or str(type(v)) == "<class 'numpy.bool_'>":
            return "true" if v else "false"
        if isinstance(v, float):
            s = repr(v)
        elif isinstance(v, bytes):
            s = v.decode("utf8", errors="replace")
        else:
            s = str(v)
        if s == "" or any(c in special for c in s):
            return '"' + s.replace('"', '""') + '"'
        return s

    close = False
    if isinstance(path, (str, bytes)):
        sink = open(path, "w", newline="")
        close = True
    else:
        sink = path
    try:
        if include_header and batches:
            sink.write(delimiter.join(
                fmt(n) for n in batches[0].names) + "\n")
        for b in batches:
            cols = [c.to_pylist() if hasattr(c, "to_pylist")
                    else c.to_arrow().to_pylist() for c in b.columns]
            for row in zip(*cols):
                sink.write(delimiter.join(fmt(v) for v in row) + "\n")
    finally:
        if close:
            sink.close()
