"""CSV reader/writer.

Reference: cpp/src/arrow/csv/ — parallel chunker/parser/converter pipeline
(csv/reader.cc:697,882). Host decode via pyarrow.csv (the same C++ engine
the reference ships), normalized to device columns at the boundary; the
ReadOptions/ParseOptions/ConvertOptions knobs are passed through.
"""

from __future__ import annotations

from typing import Iterator, Optional, Union

from ..interop import record_batch_from_arrow, record_batch_to_arrow
from ..table import RecordBatch, Table

__all__ = ["read_csv", "write_csv", "open_csv_stream"]


def read_csv(path_or_buf, read_options=None, parse_options=None,
             convert_options=None) -> Table:
    from pyarrow import csv as pacsv

    tbl = pacsv.read_csv(path_or_buf, read_options=read_options,
                         parse_options=parse_options,
                         convert_options=convert_options)
    return Table([record_batch_from_arrow(tbl)])


def open_csv_stream(path_or_buf, **kwargs) -> Iterator[RecordBatch]:
    """Streaming CSV reader (reference: csv/reader.cc streaming reader),
    yielding device batches for the streaming executor."""
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
