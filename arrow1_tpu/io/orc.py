"""ORC adapter (reference: cpp/src/arrow/adapters/orc/ — wraps the Apache
ORC C++ library; same library underneath via pyarrow.orc)."""

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
    if not orc_available():
        raise Invalid("pyarrow.orc not available in this build")
    import pyarrow.orc as orc

    tbl = orc.read_table(path, columns=list(columns) if columns else None)
    return Table([record_batch_from_arrow(tbl)])


def write_orc(data: Union[RecordBatch, Table], path: str):
    if not orc_available():
        raise Invalid("pyarrow.orc not available in this build")
    import pyarrow as pa
    import pyarrow.orc as orc

    batches = data.batches if isinstance(data, Table) else [data]
    tbl = pa.Table.from_batches([record_batch_to_arrow(b) for b in batches])
    orc.write_table(tbl, path)
