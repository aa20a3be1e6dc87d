"""Arrow IPC stream/file + Feather read/write.

Reference: cpp/src/arrow/ipc/ (encapsulated message format, stream/file
readers+writers, ipc/reader.h:67,102, writer.h:82-150) and ipc/feather.h.
The wire format is produced/consumed NATIVELY by io/ipc_native.py
(hand-built flatbuffers, zero-copy buffer views) for flat schemas —
fixed-width, temporal, decimal, string, dictionary columns; nested
schemas and compressed bodies route through pyarrow. This module is the
engine<->IPC boundary: streaming readers yield device RecordBatches
batch-by-batch so the streaming executor can pipeline them, writers
accept engine batches.

IPC files double as the engine's spill/persist format (SURVEY.md §5
checkpoint note: durable state = the IPC file format).
"""

from __future__ import annotations

from typing import Iterator, List, Optional, Union

from ..interop import record_batch_from_arrow, record_batch_to_arrow
from ..table import RecordBatch, Table

__all__ = ["read_ipc", "write_ipc", "read_feather", "write_feather",
           "IpcStreamReader", "IpcStreamWriter"]


_NATIVE_UNSUPPORTED = ("null", "month_day_nano_interval", "month_interval",
                       "day_time_interval", "extension", "float16",
                       "bfloat16")


def _native_supported_type(t) -> bool:
    if t.kind in _NATIVE_UNSUPPORTED:
        return False
    if t.is_nested:
        return all(_native_supported_type(ct) for _, ct in t.fields)
    return True


def _native_supported(batch: RecordBatch) -> bool:
    return all(_native_supported_type(c.dtype) for c in batch.columns)


def read_ipc(path: str, batched: bool = False, native: bool = True):
    """Read an Arrow IPC file -> Table (or batch iterator if batched).
    Tries the native wire-format reader first; falls back to pyarrow for
    layouts it does not cover (nested, compressed)."""
    import pyarrow as pa

    if native:
        from . import ipc_native

        try:
            with open(path, "rb") as f:
                native_batches = ipc_native.read_file(f)
            return (iter(native_batches) if batched
                    else Table(native_batches))
        except Exception:
            pass  # compressed/nested/legacy: pyarrow path below

    def batches():
        with pa.memory_map(path) as source:
            reader = pa.ipc.open_file(source)
            for i in range(reader.num_record_batches):
                yield record_batch_from_arrow(reader.get_batch(i))

    if batched:
        return batches()
    return Table(list(batches()))


def write_ipc(data: Union[RecordBatch, Table], path: str,
              compression: Optional[str] = None, native: bool = True):
    """Write to an Arrow IPC file (optionally lz4/zstd — the reference's
    IpcWriteOptions codec, ipc/options.h:41). Flat and nested schemas,
    uncompressed or zstd, go through the native writer; lz4 falls back
    to pyarrow (no in-image lz4 codec)."""
    import pyarrow as pa

    batches = data.batches if isinstance(data, Table) else [data]
    if native and compression in (None, "zstd") and batches and \
            all(_native_supported(b) for b in batches):
        from . import ipc_native

        try:
            import io as _io

            sink = _io.BytesIO()
            ipc_native.write_file(sink, batches,
                                  compression=compression)
            with open(path, "wb") as f:
                f.write(sink.getvalue())
            return
        except Exception:
            pass  # e.g. sliced fixed-size-list views: pyarrow below
    pa_batches = [record_batch_to_arrow(b) for b in batches]
    options = pa.ipc.IpcWriteOptions(compression=compression)
    with pa.OSFile(path, "wb") as f:
        with pa.ipc.new_file(f, pa_batches[0].schema, options=options) as w:
            for b in pa_batches:
                w.write_batch(b)


class IpcStreamReader:
    """Streaming-format reader yielding device batches
    (reference: ipc/reader.h:67 RecordBatchStreamReader)."""

    def __init__(self, source):
        import pyarrow as pa

        self._reader = pa.ipc.open_stream(source)

    @property
    def schema(self):
        from .. import dtypes as dt

        return dt.Schema(tuple(
            dt.Field(f.name, dt.from_arrow(f.type), f.nullable)
            for f in self._reader.schema))

    def __iter__(self) -> Iterator[RecordBatch]:
        for batch in self._reader:
            yield record_batch_from_arrow(batch)


class IpcStreamWriter:
    """Streaming-format writer (reference: ipc/writer.h:82)."""

    def __init__(self, sink, schema=None):
        self._sink = sink
        self._writer = None
        self._schema = schema

    def write_batch(self, batch: RecordBatch):
        import pyarrow as pa

        pa_batch = record_batch_to_arrow(batch)
        if self._writer is None:
            self._writer = pa.ipc.new_stream(self._sink, pa_batch.schema)
        self._writer.write_batch(pa_batch)

    def close(self):
        if self._writer is not None:
            self._writer.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def read_feather(path: str) -> Table:
    """Feather V2 == the IPC file format (reference: ipc/feather.h; V1 is
    the legacy pre-IPC framing, not produced since Arrow 0.17)."""
    return read_ipc(path)


def write_feather(data: Union[RecordBatch, Table], path: str,
                  compression: Optional[str] = "lz4",
                  version: int = 2):
    """version=2 (default) is the Arrow IPC file format; version=1
    writes the legacy Feather V1 flatbuffer layout
    (io/feather1.write_feather_v1, reference ipc/feather.h:105)."""
    if version == 1:
        from .feather1 import write_feather_v1

        batch = (data.combine_chunks()
                 if isinstance(data, Table) else data)
        with open(path, "wb") as f:
            write_feather_v1(batch, f)
        return
    write_ipc(data, path, compression=compression)
