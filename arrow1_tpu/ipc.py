"""pyarrow.ipc-compatible module shape over the native wire format.

Reference: python/pyarrow/ipc.py (new_file/open_file/new_stream/
open_stream + RecordBatch{File,Stream}{Reader,Writer}); the wire format
itself is implemented natively in io/ipc_native.py (flatbuffers
encapsulated messages, ipc/message.h:238 framing), so
`import arrow1_tpu.ipc as ipc` ports 1:1.
"""

from __future__ import annotations

import io as _io
import os
from typing import Optional

from .io import ipc_native
from .table import RecordBatch, Table


def _sink(where):
    return open(where, "wb") if isinstance(where, (str, os.PathLike)) \
        else where


def _source(where):
    if isinstance(where, (bytes, bytearray, memoryview)):
        return _io.BytesIO(bytes(where))
    return open(where, "rb") if isinstance(where, (str, os.PathLike)) \
        else where


class RecordBatchStreamWriter:
    """ipc/writer.h:82 RecordBatchStreamWriter over the native encoder."""

    _write = staticmethod(ipc_native.write_stream)

    def __init__(self, sink, schema=None, *, compression=None):
        self._raw = _sink(sink)
        self._own = sink is not self._raw
        self._compression = compression
        self._schema = schema
        self._batches = []

    def write_batch(self, batch: RecordBatch):
        self._batches.append(batch)

    def write_table(self, table: Table):
        self._batches.extend(table.batches)

    write = write_batch

    def close(self):
        if self._batches is not None:
            self._write(self._raw, self._batches,
                        compression=self._compression,
                        schema_batch=self._schema_batch())
            self._batches = None
        if self._own:
            self._raw.close()

    def _schema_batch(self):
        """Zero-row batch carrying the declared schema, for schema-only
        (empty) streams/files."""
        if self._schema is None:
            return None
        sch = self._schema
        if not hasattr(sch, "empty_table"):  # pyarrow schema
            from . import dtypes as dt

            sch = dt.Schema(tuple(
                dt.Field(f.name, dt.from_arrow(f.type), f.nullable)
                for f in sch))
        return sch.empty_table().batches[0]

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class RecordBatchFileWriter(RecordBatchStreamWriter):
    """ipc/writer.h RecordBatchFileWriter (file format = stream +
    footer, ipc/writer.cc:216)."""

    _write = staticmethod(ipc_native.write_file)


class _ReaderBase:
    def __init__(self, batches):
        self._batches = batches

    @property
    def schema(self):
        return self._batches[0].schema if self._batches else None

    def read_all(self) -> Table:
        return Table(list(self._batches))

    def read_pandas(self, **kwargs):
        return self.read_all().to_pandas()

    def __iter__(self):
        return iter(self._batches)


class RecordBatchStreamReader(_ReaderBase):
    """ipc/reader.h:67 RecordBatchStreamReader over the native decoder."""

    def __init__(self, source):
        src = _source(source)
        try:
            super().__init__(ipc_native.read_stream(src))
        finally:
            if src is not source:
                src.close()


class RecordBatchFileReader(_ReaderBase):
    """ipc/reader.h RecordBatchFileReader (random access by batch)."""

    def __init__(self, source):
        src = _source(source)
        try:
            super().__init__(ipc_native.read_file(src))
        finally:
            if src is not source:
                src.close()

    @property
    def num_record_batches(self) -> int:
        return len(self._batches)

    def get_batch(self, i: int) -> RecordBatch:
        return self._batches[i]

    get_record_batch = get_batch


def new_stream(sink, schema=None, **kw) -> RecordBatchStreamWriter:
    return RecordBatchStreamWriter(sink, schema, **kw)


def open_stream(source) -> RecordBatchStreamReader:
    return RecordBatchStreamReader(source)


def new_file(sink, schema=None, **kw) -> RecordBatchFileWriter:
    return RecordBatchFileWriter(sink, schema, **kw)


def open_file(source) -> RecordBatchFileReader:
    return RecordBatchFileReader(source)


def serialize_pandas(df, *, nthreads=None, preserve_index=None) -> bytes:
    """DataFrame -> IPC stream bytes (pyarrow.serialize_pandas shape)."""
    import pyarrow as pa

    from .interop import record_batch_from_arrow

    pa_batch = pa.RecordBatch.from_pandas(df,
                                          preserve_index=preserve_index)
    buf = _io.BytesIO()
    ipc_native.write_stream(buf, [record_batch_from_arrow(pa_batch)])
    return buf.getvalue()


def deserialize_pandas(buf, *, use_threads=True):
    """IPC stream bytes -> DataFrame."""
    batches = ipc_native.read_stream(_io.BytesIO(bytes(buf)))
    return Table(batches).to_pandas()
