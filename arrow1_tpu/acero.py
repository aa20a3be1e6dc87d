"""pyarrow.acero-compatible Declaration API.

Reference: the streaming exec engine's declarative layer
(cpp/src/arrow/compute/exec/exec_plan.h Declaration + the options
classes pyarrow surfaces as pyarrow.acero). The factories map onto
exec/plan.py's push-model nodes; naming/shape match pyarrow.acero so
engine users can port plans verbatim.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

from .errors import Invalid
from .exec import plan as _plan
from .table import RecordBatch, Table

__all__ = ["Declaration", "ExecNodeOptions", "TableSourceNodeOptions",
           "FilterNodeOptions", "ProjectNodeOptions",
           "AggregateNodeOptions", "HashJoinNodeOptions",
           "OrderByNodeOptions", "AsofJoinNodeOptions"]


class ExecNodeOptions:
    pass


@dataclasses.dataclass
class TableSourceNodeOptions(ExecNodeOptions):
    table: object = None


@dataclasses.dataclass
class FilterNodeOptions(ExecNodeOptions):
    filter_expression: object = None


@dataclasses.dataclass
class ProjectNodeOptions(ExecNodeOptions):
    expressions: Sequence = ()
    names: Optional[Sequence[str]] = None


@dataclasses.dataclass
class AggregateNodeOptions(ExecNodeOptions):
    aggregates: Sequence = ()
    keys: Optional[Sequence[str]] = None


@dataclasses.dataclass
class HashJoinNodeOptions(ExecNodeOptions):
    join_type: str = "inner"
    left_keys: Sequence[str] = ()
    right_keys: Sequence[str] = ()
    left_output: Optional[Sequence[str]] = None
    right_output: Optional[Sequence[str]] = None
    output_suffix_for_left: str = ""
    output_suffix_for_right: str = ""


@dataclasses.dataclass
class OrderByNodeOptions(ExecNodeOptions):
    sort_keys: Sequence = ()


@dataclasses.dataclass
class AsofJoinNodeOptions(ExecNodeOptions):
    left_on: str = ""
    left_by: Sequence[str] = ()
    right_on: str = ""
    right_by: Sequence[str] = ()
    tolerance: int = 0


class Declaration:
    """pyarrow.acero.Declaration shape: (factory_name, options, inputs);
    chain with from_sequence; materialize with to_table()."""

    def __init__(self, factory_name: str, options: ExecNodeOptions,
                 inputs: Optional[Sequence["Declaration"]] = None):
        self.factory_name = factory_name
        self.options = options
        self.inputs = list(inputs or [])

    @staticmethod
    def from_sequence(decls: Sequence["Declaration"]) -> "Declaration":
        decls = list(decls)
        head = decls[0]
        for d in decls[1:]:
            d.inputs = [head] + list(d.inputs)
            head = d
        return head

    def to_table(self) -> Table:
        return Table([self.to_batch()])

    def to_batch(self) -> RecordBatch:
        return self._run()

    def to_reader(self):
        return iter([self._run()])

    def _run(self) -> RecordBatch:
        f, o = self.factory_name, self.options
        if f == "table_source":
            t = o.table
            if isinstance(t, Table):
                return t.combine_chunks()
            return t
        if f == "filter":
            src = self.inputs[0]._run()
            mask = o.filter_expression.bind(src.schema).execute(src)
            return src.filter(mask)
        if f == "project":
            src = self.inputs[0]._run()
            names = list(o.names) if o.names else \
                [repr(e) for e in o.expressions]
            from .column import Column, column

            cols = []
            for e in o.expressions:
                v = e.bind(src.schema).execute(src)
                cols.append(v if isinstance(v, Column) else column(v))
            return RecordBatch(tuple(cols), tuple(names))
        if f == "aggregate":
            src = self.inputs[0]._run()
            from .ops.groupby import group_by

            aggs = [(c, fn) for c, fn, *_ in
                    [a if len(a) > 2 else (*a, None) for a in o.aggregates]]
            if o.keys:
                return group_by(src, list(o.keys), aggs)
            from .registry import call_function

            import numpy as np

            cols, names = [], []
            for c, fn in aggs:
                s = call_function(fn, [src.column(c)])
                from .column import column as _col

                cols.append(_col([None]) if not s.is_valid
                            else _col(np.asarray([s.value])))
                names.append(f"{c}_{fn}")
            return RecordBatch(tuple(cols), tuple(names))
        if f == "hashjoin":
            left = self.inputs[0]._run()
            right = self.inputs[1]._run()
            from .ops.join import join

            return join(left, right, keys=list(o.left_keys),
                        right_keys=list(o.right_keys) or None,
                        join_type=o.join_type,
                        left_suffix=o.output_suffix_for_left,
                        right_suffix=o.output_suffix_for_right)
        if f == "asofjoin":
            left = self.inputs[0]._run()
            right = self.inputs[1]._run()
            from .ops.join import join_asof

            return join_asof(left, right, on=o.left_on,
                             by=list(o.left_by) or None,
                             tolerance=o.tolerance)
        if f == "order_by":
            src = self.inputs[0]._run()
            return src.sort_by(list(o.sort_keys))
        if f == "union":
            from .table import concat_batches

            return concat_batches([d._run() for d in self.inputs])
        raise Invalid(f"unknown acero factory {self.factory_name!r}")

    def __repr__(self):
        return f"Declaration({self.factory_name!r})"


# ---- pyarrow.acero namespace tail (module-level re-exports) ----
from . import dataset as ds  # noqa: E402,F401
from .column import column as array  # noqa: E402,F401
from .expr import Expression, field  # noqa: E402,F401


class ScanNodeOptions:
    """pyarrow.acero.ScanNodeOptions shape: dataset + scan kwargs."""

    def __init__(self, dataset, **kwargs):
        self.dataset = dataset
        self.scan_kwargs = kwargs
