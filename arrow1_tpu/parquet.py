"""pyarrow.parquet-compatible module shape.

Reference: python/pyarrow/parquet/__init__.py public API (read_table,
write_table, ParquetFile, ParquetWriter, read_schema, ParquetDataset),
so `import arrow1_tpu.parquet as pq` ports 1:1. Backed by the native
reader/writer (io/parquet_native.py: Thrift-compact metadata,
RLE-hybrid + dictionary + snappy, one-level nested) with pyarrow
fallback for deeper nesting/encryption (io/parquet.py).
"""

from __future__ import annotations

from typing import Optional, Sequence

from .io.parquet import (  # noqa: F401
    decryption_properties, encryption_properties, iter_parquet_batches,
    read_parquet, write_parquet,
)
from .table import Table


def read_table(source, columns: Optional[Sequence[str]] = None, **kwargs):
    """pyarrow.parquet.read_table shape."""
    return read_parquet(source, columns=columns, **kwargs)


def write_table(table, where, **kwargs):
    """pyarrow.parquet.write_table shape."""
    return write_parquet(table, where, **kwargs)


def read_schema(where):
    """Schema of a parquet file."""
    return read_parquet(where).schema


class ParquetFile:
    """pyarrow.parquet.ParquetFile shape: metadata + per-row-group and
    batched reads over one file."""

    def __init__(self, source, **kwargs):
        self._source = source
        self._kwargs = kwargs
        self._table = None

    def _load(self) -> Table:
        if self._table is None:
            self._table = read_parquet(self._source, **self._kwargs)
        return self._table

    @property
    def schema_arrow(self):
        return self._load().schema

    @property
    def schema(self):
        return self._load().schema

    @property
    def num_row_groups(self) -> int:
        return max(1, len(self._load().batches))

    def read(self, columns: Optional[Sequence[str]] = None):
        t = self._load()
        return t.select(columns) if columns else t

    def read_row_group(self, i: int,
                       columns: Optional[Sequence[str]] = None):
        t = self._load()
        b = t.batches[i] if i < len(t.batches) else t.combine_chunks()
        out = Table([b])
        return out.select(columns) if columns else out

    def iter_batches(self, batch_size: int = 1 << 16,
                     columns: Optional[Sequence[str]] = None):
        t = self.read(columns)
        n = t.num_rows
        combined = t.combine_chunks()
        for lo in range(0, max(n, 1), batch_size):
            if lo >= n:
                break
            yield combined.slice(lo, min(batch_size, n - lo))


class ParquetWriter:
    """pyarrow.parquet.ParquetWriter shape: buffer batches, write on
    close (the native writer emits one file)."""

    def __init__(self, where, schema=None, **kwargs):
        self._where = where
        self._kwargs = kwargs
        self._batches = []

    def write_table(self, table):
        self._batches.extend(table.batches)

    def write_batch(self, batch):
        self._batches.append(batch)

    def close(self):
        if self._batches:
            write_parquet(Table(self._batches), self._where,
                          **self._kwargs)
            self._batches = []

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def ParquetDataset(path_or_paths, **kwargs):
    """pyarrow.parquet.ParquetDataset shape -> dataset.dataset (the
    modern pyarrow implementation does the same)."""
    from .dataset import dataset

    return dataset(path_or_paths, format="parquet", **kwargs)
