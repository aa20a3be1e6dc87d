"""C data interface: zero-copy in-process handoff.

Reference: cpp/src/arrow/c/abi.h:30,46 (ArrowSchema/ArrowArray C
structs) + c/bridge.{h,cc} import/export. The engine lays out those
structs NATIVELY in cabi.py (ctypes structs, native release callbacks,
PyCapsule protocol) — any library speaking the Arrow C ABI (polars,
duckdb, pandas, nanoarrow, pyarrow) can hand columns to and from this
engine without copies on the host side (device transfer is the only
copy, as it must be). Types outside the native walker (nested,
dictionary-encoded input) fall back to the pyarrow bridge.
"""

from __future__ import annotations

from .column import Column
from .errors import Invalid
from .interop import (column_from_arrow, record_batch_from_arrow,
                      record_batch_to_arrow)
from .table import RecordBatch, Table

__all__ = ["export_column", "import_column", "export_batch", "import_batch"]


def export_column(col: Column, name: str = ""):
    """Column -> object implementing __arrow_c_array__ (the ArrowArray +
    ArrowSchema capsule pair, abi.h:30,46), produced natively."""
    from .cabi import CArrayExportable, _format_for

    try:
        _format_for(col.dtype)  # supported by the native producer?
        return CArrayExportable(col, name)
    except Invalid:
        return col.to_arrow()  # nested/interval: pyarrow bridge


def import_column(obj) -> Column:
    """Any __arrow_c_array__ provider -> device Column."""
    if hasattr(obj, "__arrow_c_array__"):
        from .cabi import import_array_capsules

        sc, ac = obj.__arrow_c_array__()
        try:
            return import_array_capsules(sc, ac)
        except Invalid:
            pass
        import pyarrow as pa

        return column_from_arrow(pa.array(obj))
    raise TypeError(f"{type(obj)} does not implement __arrow_c_array__")


def export_batch(batch: RecordBatch):
    """RecordBatch -> __arrow_c_array__/__arrow_c_stream__ provider."""
    return record_batch_to_arrow(batch)


def import_batch(obj) -> RecordBatch:
    """Any __arrow_c_array__/__arrow_c_stream__ provider -> RecordBatch."""
    import pyarrow as pa

    if hasattr(obj, "__arrow_c_stream__"):
        from .cabi import import_stream_capsule
        from .table import Table

        try:
            batches = import_stream_capsule(obj.__arrow_c_stream__())
            if batches:
                return Table(batches).combine_chunks()
        except Invalid:
            pass  # exotic child types -> pyarrow reader fallback
        reader = pa.RecordBatchReader.from_stream(obj)
        return record_batch_from_arrow(reader.read_all())
    if hasattr(obj, "__arrow_c_array__"):
        rb = pa.record_batch(obj)
        return record_batch_from_arrow(rb)
    raise TypeError(f"{type(obj)} does not implement the arrow capsule "
                    "protocol")
