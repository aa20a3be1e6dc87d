"""C data interface: zero-copy in-process handoff.

Reference: cpp/src/arrow/c/abi.h:30,46 (ArrowSchema/ArrowArray C structs)
+ c/bridge.{h,cc} import/export. Python's standardization of the same ABI
is the Arrow PyCapsule protocol (__arrow_c_array__ / __arrow_c_stream__),
which pyarrow implements over the identical C structs — so this module
exports/imports engine data through those capsules: any library speaking
the Arrow C ABI (polars, duckdb, pandas, nanoarrow) can hand columns to
and from this engine without copies on the host side (device transfer is
the only copy, as it must be).
"""

from __future__ import annotations

from .column import Column
from .interop import (column_from_arrow, record_batch_from_arrow,
                      record_batch_to_arrow)
from .table import RecordBatch, Table

__all__ = ["export_column", "import_column", "export_batch", "import_batch"]


def export_column(col: Column):
    """Column -> object implementing __arrow_c_array__ (the ArrowArray +
    ArrowSchema capsule pair, abi.h:30,46)."""
    return col.to_arrow()


def import_column(obj) -> Column:
    """Any __arrow_c_array__ provider -> device Column."""
    import pyarrow as pa

    if hasattr(obj, "__arrow_c_array__"):
        arr = pa.array(obj)
        return column_from_arrow(arr)
    raise TypeError(f"{type(obj)} does not implement __arrow_c_array__")


def export_batch(batch: RecordBatch):
    """RecordBatch -> __arrow_c_array__/__arrow_c_stream__ provider."""
    return record_batch_to_arrow(batch)


def import_batch(obj) -> RecordBatch:
    """Any __arrow_c_array__/__arrow_c_stream__ provider -> RecordBatch."""
    import pyarrow as pa

    if hasattr(obj, "__arrow_c_stream__"):
        reader = pa.RecordBatchReader.from_stream(obj)
        return record_batch_from_arrow(reader.read_all())
    if hasattr(obj, "__arrow_c_array__"):
        rb = pa.record_batch(obj)
        return record_batch_from_arrow(rb)
    raise TypeError(f"{type(obj)} does not implement the arrow capsule "
                    "protocol")
