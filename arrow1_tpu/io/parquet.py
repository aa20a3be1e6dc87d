"""Parquet reader/writer.

Reference: cpp/src/parquet/ (55.8 kLoC full read/write stack) +
parquet/arrow adapter (parquet/arrow/reader.h:107). Host decode via
pyarrow.parquet; projection (columns=) and row-group selection push down
into the decoder — the same pushdowns the reference's
ArrowReaderProperties exposes — so only needed bytes are decoded and
shipped to the device.
"""

from __future__ import annotations

from typing import Iterator, List, Optional, Sequence, Union

from ..interop import record_batch_from_arrow, record_batch_to_arrow
from ..table import RecordBatch, Table

__all__ = ["read_parquet", "write_parquet", "iter_parquet_batches"]


def read_parquet(path, columns: Optional[Sequence[str]] = None,
                 filters=None) -> Table:
    import pyarrow.parquet as pq

    tbl = pq.read_table(path, columns=list(columns) if columns else None,
                        filters=filters)
    return Table([record_batch_from_arrow(tbl)])


def iter_parquet_batches(path, columns: Optional[Sequence[str]] = None,
                         batch_rows: int = 1 << 20) -> Iterator[RecordBatch]:
    """Row-group-granular streaming read (reference:
    GetRecordBatchReader parquet/arrow/reader.cc:257)."""
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(path)
    for batch in pf.iter_batches(batch_size=batch_rows,
                                 columns=list(columns) if columns else None):
        yield record_batch_from_arrow(batch)


def write_parquet(data: Union[RecordBatch, Table], path: str,
                  compression: str = "snappy", row_group_size=None):
    import pyarrow as pa
    import pyarrow.parquet as pq

    if isinstance(data, Table):
        tbl = pa.Table.from_batches([record_batch_to_arrow(b)
                                     for b in data.batches])
    else:
        tbl = pa.Table.from_batches([record_batch_to_arrow(data)])
    pq.write_table(tbl, path, compression=compression,
                   row_group_size=row_group_size)
