"""Push-model execution plan.

Reference: cpp/src/arrow/compute/exec/exec_plan.h:142-225 — ExecNode's
InputReceived/InputFinished/StartProducing protocol with topo-sorted
startup (exec_plan.cc:62-79). The reference ships no production nodes
(SURVEY.md); these are designed against the same protocol:

    source -> [filter] -> [project] -> [aggregate|join|order_by] -> sink

Batches flow eagerly (device-resident RecordBatches); pipeline breakers
(aggregate/order_by/join build side) accumulate consume-state and flush on
input_finished, mirroring the consume/merge/finalize kernel shape
(kernel.h:637-676).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional, Sequence, Tuple

from ..errors import Invalid
from ..expr import Expression
from ..table import RecordBatch, Table, concat_batches

__all__ = ["ExecPlan", "ExecNode", "Declaration", "source_node",
           "filter_node", "project_node", "aggregate_node", "join_node",
           "order_by_node", "union_node", "sink_node"]


class ExecNode:
    """Reference: exec_plan.h:84."""

    def __init__(self, plan: "ExecPlan", label: str,
                 inputs: Sequence["ExecNode"]):
        self.plan = plan
        self.label = label
        self.inputs = list(inputs)
        self.outputs: List[ExecNode] = []
        for i in inputs:
            i.outputs.append(self)
        plan.nodes.append(self)

    # push protocol
    def start_producing(self):
        pass

    def input_received(self, input_node: "ExecNode", batch: RecordBatch,
                       seq: int):
        raise NotImplementedError

    def input_finished(self, input_node: "ExecNode", total_batches: int):
        raise NotImplementedError

    def _emit(self, batch: RecordBatch, seq: int):
        for out in self.outputs:
            out.input_received(self, batch, seq)

    def _finish(self, total: int):
        for out in self.outputs:
            out.input_finished(self, total)


class ExecPlan:
    """Reference: exec_plan.h:39. start() topo-starts sources last
    (exec_plan.cc:62-79 starts producers after consumers are ready — with
    eager push both orders work; we keep source-last for parity)."""

    def __init__(self):
        self.nodes: List[ExecNode] = []

    def run(self) -> None:
        sinks = [n for n in self.nodes if not n.outputs]
        if not sinks:
            raise Invalid("plan has no sink")
        for n in self.nodes:
            if n.inputs:
                n.start_producing()
        for n in self.nodes:
            if not n.inputs:
                n.start_producing()


class SourceNode(ExecNode):
    """Emits batches from an iterable (a scanner, a table, ...)."""

    def __init__(self, plan, batches, label="source"):
        super().__init__(plan, label, [])
        self.batches = batches

    def start_producing(self):
        count = 0
        for i, b in enumerate(self.batches):
            self._emit(b, i)
            count += 1
        self._finish(count)


class FilterNode(ExecNode):
    """Reference protocol + FilterSingleBatch semantics
    (dataset/scanner_internal.h:41-70)."""

    def __init__(self, plan, input_node, predicate: Expression,
                 label="filter"):
        super().__init__(plan, label, [input_node])
        self.predicate = predicate

    def input_received(self, _, batch, seq):
        from ..registry import call_function

        mask = self.predicate.execute(batch)
        self._emit(call_function("filter", [batch, mask]), seq)

    def input_finished(self, _, total):
        self._finish(total)


class ProjectNode(ExecNode):
    """Reference: ProjectSingleBatch (scanner_internal.h:72-97)."""

    def __init__(self, plan, input_node, exprs: Sequence[Expression],
                 names: Sequence[str], label="project"):
        super().__init__(plan, label, [input_node])
        self.exprs = list(exprs)
        self.names = list(names)

    def input_received(self, _, batch, seq):
        from ..column import Column
        from ..datum import Scalar

        cols = []
        for e in self.exprs:
            v = e.execute(batch)
            if isinstance(v, Scalar):  # broadcast literal column
                import jax.numpy as jnp

                data = jnp.full(batch.num_rows, v.value,
                                v.dtype.physical_dtype())
                v = Column(data, v.dtype, dictionary=v.dictionary)
            cols.append(v)
        self._emit(RecordBatch(tuple(cols), tuple(self.names)), seq)

    def input_finished(self, _, total):
        self._finish(total)


class AggregateNode(ExecNode):
    """Pipeline breaker: streams batches into consume-state, finalizes on
    input_finished (kernel.h:655 HashAggregateKernel shape)."""

    def __init__(self, plan, input_node, keys, aggregates, label="aggregate"):
        super().__init__(plan, label, [input_node])
        self.keys = list(keys)
        self.aggregates = list(aggregates)
        from .streaming import StreamingGroupBy

        self._state = StreamingGroupBy(self.keys, self.aggregates)

    def input_received(self, _, batch, seq):
        self._state.consume(batch)

    def input_finished(self, _, total):
        result = self._state.finalize()
        self._emit(result, 0)
        self._finish(1)


class JoinNode(ExecNode):
    """Hash join: build side accumulates (pipeline breaker on input 1),
    probe side streams once build is complete. Eager push means build
    batches must arrive before probe start — the plan runs build-side
    sources first (ExecPlan.run starts inner nodes in insertion order)."""

    def __init__(self, plan, probe, build, keys, right_keys=None,
                 join_type="inner", label="join"):
        super().__init__(plan, label, [probe, build])
        self.keys = keys
        self.right_keys = right_keys
        self.join_type = join_type
        self._build: List[RecordBatch] = []
        self._build_done = False
        self._probe_pending: List[Tuple[RecordBatch, int]] = []
        self._probe_total: Optional[int] = None
        self._emitted = 0

    def input_received(self, node, batch, seq):
        if node is self.inputs[1]:
            self._build.append(batch)
            return
        if not self._build_done:
            self._probe_pending.append((batch, seq))
            return
        self._probe(batch, seq)

    def _probe(self, batch, seq):
        from ..ops.join import join

        build = concat_batches(self._build) if self._build else None
        if build is None:
            raise Invalid("join: empty build side")
        self._emit(join(batch, build, self.keys, self.right_keys,
                        self.join_type), seq)
        self._emitted += 1

    def input_finished(self, node, total):
        if node is self.inputs[1]:
            self._build_done = True
            for batch, seq in self._probe_pending:
                self._probe(batch, seq)
            self._probe_pending.clear()
            if self._probe_total is not None:
                self._finish(self._probe_total)
            return
        self._probe_total = total
        if self._build_done:
            self._finish(total)


class OrderByNode(ExecNode):
    """Pipeline breaker: accumulate, sort on finish (Table sort semantics,
    vector_sort.cc:1417)."""

    def __init__(self, plan, input_node, sort_keys, label="order_by"):
        super().__init__(plan, label, [input_node])
        self.sort_keys = list(sort_keys)
        self._batches: List[RecordBatch] = []

    def input_received(self, _, batch, seq):
        self._batches.append(batch)

    def input_finished(self, _, total):
        from ..registry import call_function
        from ..ops.selection import take_column
        import jax.numpy as jnp

        merged = concat_batches(self._batches)
        idx = call_function("sort_indices", [merged],
                            sort_keys=self.sort_keys)
        sorted_batch = RecordBatch(
            tuple(take_column(c, idx.data.astype(jnp.int64))
                  for c in merged.columns), merged.names)
        self._emit(sorted_batch, 0)
        self._finish(1)


class SinkNode(ExecNode):
    """Collects output batches (ordered by seq) into a Table."""

    def __init__(self, plan, input_node, label="sink"):
        super().__init__(plan, label, [input_node])
        self._batches: Dict[int, RecordBatch] = {}
        self.result: Optional[Table] = None

    def input_received(self, _, batch, seq):
        self._batches[seq] = batch

    def input_finished(self, _, total):
        ordered = [self._batches[k] for k in sorted(self._batches)]
        self.result = Table(ordered) if ordered else None


class UnionNode(ExecNode):
    """Multi-input stream merge (reference: exec/union_node.cc): emits
    every input's batches; finishes when ALL inputs finish. Output order
    = input order (sequenced), matching the reference's ordered union."""

    def __init__(self, plan, input_nodes, label="union"):
        super().__init__(plan, label, list(input_nodes))
        self._pending = {id(n): None for n in input_nodes}
        self._buffers: Dict[int, List[RecordBatch]] = {
            id(n): [] for n in input_nodes}

    def input_received(self, node, batch, seq):
        self._buffers[id(node)].append(batch)

    def input_finished(self, node, total):
        self._pending[id(node)] = total
        if any(v is None for v in self._pending.values()):
            return
        seq = 0
        for n in self.inputs:
            for b in self._buffers[id(n)]:
                self._emit(b, seq)
                seq += 1
        self._finish(seq)


# ---- factory helpers (reference: ExecNode registry MakeExecNode) ----

def source_node(plan, batches):
    return SourceNode(plan, batches)


def filter_node(plan, input_node, predicate):
    return FilterNode(plan, input_node, predicate)


def project_node(plan, input_node, exprs, names):
    return ProjectNode(plan, input_node, exprs, names)


def aggregate_node(plan, input_node, keys, aggregates):
    return AggregateNode(plan, input_node, keys, aggregates)


def join_node(plan, probe, build, keys, right_keys=None, join_type="inner"):
    return JoinNode(plan, probe, build, keys, right_keys, join_type)


def order_by_node(plan, input_node, sort_keys):
    return OrderByNode(plan, input_node, sort_keys)


def union_node(plan, input_nodes):
    return UnionNode(plan, input_nodes)


def sink_node(plan, input_node):
    return SinkNode(plan, input_node)


@dataclasses.dataclass
class Declaration:
    """Composable plan fragment (the convenience layer later Arrow calls
    Declaration; factory name + options, chained into a plan)."""

    factory: str
    options: dict
    inputs: Sequence["Declaration"] = ()

    def to_table(self) -> Table:
        plan = ExecPlan()
        node = self._build(plan)
        sink = sink_node(plan, node)
        plan.run()
        return sink.result

    def _build(self, plan) -> ExecNode:
        ins = [d._build(plan) for d in self.inputs]
        f = self.factory
        if f == "source":
            return source_node(plan, **self.options)
        if f == "filter":
            return filter_node(plan, ins[0], **self.options)
        if f == "project":
            return project_node(plan, ins[0], **self.options)
        if f == "aggregate":
            return aggregate_node(plan, ins[0], **self.options)
        if f == "join":
            return join_node(plan, ins[0], ins[1], **self.options)
        if f == "order_by":
            return order_by_node(plan, ins[0], **self.options)
        raise Invalid(f"unknown node factory {f!r}")
