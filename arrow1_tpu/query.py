"""Fluent query API over datasets and tables.

The user-facing composition layer tying the stack together — scanner
(dataset.py) -> streaming executor (exec/) -> eager kernels / compiled
pipelines. API shape follows the dataset-scanner workflow the reference's
Python users compose by hand (pyarrow.dataset + compute), as one chain:

    a1t.query(ds).filter(f.field("year") == 2021)
                 .select(["k", "v"])
                 .group_by(["k"], [("v", "sum")])
                 .order_by([("v_sum", "descending")])
                 .to_table()
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple, Union

from .errors import Invalid
from .expr import Expression
from .table import RecordBatch, Table

__all__ = ["Query", "query"]


class Query:
    def __init__(self, source):
        self._source = source
        self._filter: Optional[Expression] = None
        self._columns: Optional[List[str]] = None
        self._projection: Optional[List[Tuple[Expression, str]]] = None
        self._group: Optional[Tuple[List[str], List[Tuple[str, str]]]] = None
        self._order: Optional[List[Tuple[str, str]]] = None
        self._join: Optional[Tuple] = None
        self._limit: Optional[int] = None

    # -- builders --
    def filter(self, expr: Expression) -> "Query":
        self._filter = expr if self._filter is None else \
            (self._filter & expr)
        return self

    def select(self, columns: Sequence[str]) -> "Query":
        self._columns = list(columns)
        return self

    def project(self, exprs: Sequence[Expression],
                names: Sequence[str]) -> "Query":
        self._projection = list(zip(exprs, names))
        return self

    def join(self, right, keys, right_keys=None,
             join_type: str = "inner") -> "Query":
        self._join = (right, keys, right_keys, join_type)
        return self

    def group_by(self, keys: Sequence[str],
                 aggregates: Sequence[Tuple[str, str]]) -> "Query":
        self._group = (list(keys), list(aggregates))
        return self

    def order_by(self, sort_keys) -> "Query":
        self._order = [(k, "ascending") if isinstance(k, str) else k
                       for k in sort_keys]
        return self

    def limit(self, n: int) -> "Query":
        self._limit = n
        return self

    # -- execution --
    def _source_batches(self):
        from .dataset import FileSystemDataset, ScannerBuilder

        src = self._source
        if isinstance(src, FileSystemDataset):
            b = ScannerBuilder(src)
            if self._filter is not None:
                b = b.filter(self._filter)  # pushdown incl. pruning
            if self._columns and self._join is None and \
                    self._group is None and self._projection is None:
                b = b.project(self._columns)
            return list(b.finish().scan_batches()), True
        if isinstance(src, Table):
            return list(src.batches), False
        if isinstance(src, RecordBatch):
            return [src], False
        raise Invalid(f"unsupported query source {type(src)}")

    def to_table(self) -> Table:
        from .registry import call_function
        from .table import concat_batches

        batches, filtered = self._source_batches()
        if not batches:
            raise Invalid("query produced no batches")
        out: List[RecordBatch] = []
        for batch in batches:
            if self._filter is not None and not filtered:
                mask = self._filter.execute(batch)
                batch = call_function("filter", [batch, mask])
            if self._join is not None:
                from .ops.join import join as join_fn

                right, keys, right_keys, join_type = self._join
                rb = right.combine_chunks() if isinstance(right, Table) \
                    else right
                batch = join_fn(batch, rb, keys, right_keys, join_type)
            if self._projection is not None:
                cols, names = [], []
                for e, name in self._projection:
                    cols.append(e.execute(batch))
                    names.append(name)
                batch = RecordBatch(tuple(cols), tuple(names))
            elif self._columns is not None and \
                    set(self._columns) <= set(batch.names):
                batch = batch.select(self._columns)
            out.append(batch)

        if self._group is not None:
            from .exec.streaming import StreamingGroupBy

            keys, aggs = self._group
            gb = StreamingGroupBy(keys, aggs)
            for b in out:
                gb.consume(b)
            out = [gb.finalize()]

        result = concat_batches(out) if len(out) > 1 else out[0]

        if self._order is not None:
            import jax.numpy as jnp

            from .ops.selection import take_column
            from .registry import call_function

            idx = call_function("sort_indices", [result],
                                sort_keys=self._order)
            result = RecordBatch(
                tuple(take_column(c, idx.data.astype(jnp.int64))
                      for c in result.columns), result.names)
        if self._limit is not None:
            result = result.slice(0, self._limit)
        return Table([result])

    def to_batch(self) -> RecordBatch:
        return self.to_table().combine_chunks()

    def count_rows(self) -> int:
        return self.to_table().num_rows


def query(source) -> Query:
    """Start a query over a Dataset, Table, or RecordBatch."""
    return Query(source)
