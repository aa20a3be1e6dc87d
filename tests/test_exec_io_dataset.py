"""Exec plan, streaming aggregation, IO round-trips, dataset scanning."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

import arrow1_tpu as a1t
from arrow1_tpu import io as aio
from arrow1_tpu.dataset import (FileSystemDataset, HivePartitioning,
                                ScannerBuilder, dataset, write_dataset)
from arrow1_tpu.exec import Declaration
from arrow1_tpu.exec.plan import (ExecPlan, aggregate_node, filter_node,
                                  join_node, order_by_node, project_node,
                                  sink_node, source_node)
from arrow1_tpu.exec.streaming import (StreamingAggregator, StreamingGroupBy,
                                       run_streaming_aggregate)
from arrow1_tpu.testing import RandomDataGenerator
from test_groupby_join import assert_same_rows


def make_batches(n_batches=4, rows=100, seed=1):
    gen = RandomDataGenerator(seed)
    out = []
    for _ in range(n_batches):
        out.append(a1t.record_batch(pa.record_batch({
            "k": gen.numeric(rows, a1t.int64, low=0, high=10,
                             null_probability=0.05),
            "v": gen.numeric(rows, a1t.int64, low=-100, high=100,
                             null_probability=0.1),
            "f": gen.numeric(rows, a1t.float64, null_probability=0.1),
        })))
    return out


class TestExecPlan:
    def test_source_filter_project_sink(self):
        batches = make_batches()
        plan = ExecPlan()
        src = source_node(plan, batches)
        filt = filter_node(plan, src, a1t.field("v") > 0)
        proj = project_node(plan, filt,
                            [a1t.field("k"), a1t.field("v") * 2],
                            ["k", "v2"])
        sink = sink_node(plan, proj)
        plan.run()
        result = sink.result
        assert result is not None
        merged = result.combine_chunks()
        # oracle: eager per-batch
        total = 0
        for b in batches:
            mask = (a1t.field("v") > 0).execute(b)
            total += a1t.compute.filter(b, mask).num_rows
        assert merged.num_rows == total
        assert merged.names == ("k", "v2")

    def test_aggregate_node_streaming(self):
        batches = make_batches(seed=2)
        plan = ExecPlan()
        src = source_node(plan, batches)
        agg = aggregate_node(plan, src, ["k"], [("v", "sum"), ("v", "count")])
        sink = sink_node(plan, agg)
        plan.run()
        got = sink.result.combine_chunks()
        merged = a1t.concat_batches(batches)
        exp = a1t.group_by(merged, ["k"], [("v", "sum"), ("v", "count")])
        assert_same_rows(got, exp.to_arrow())

    def test_order_by_node(self):
        batches = make_batches(seed=3)
        plan = ExecPlan()
        src = source_node(plan, batches)
        ob = order_by_node(plan, src, [("v", "ascending")])
        sink = sink_node(plan, ob)
        plan.run()
        got = sink.result.combine_chunks()
        vs = [x for x in got["v"].to_arrow().to_pylist() if x is not None]
        assert vs == sorted(vs)

    def test_join_node(self):
        probe = make_batches(2, seed=4)
        build = [a1t.record_batch(pa.record_batch({
            "k": pa.array(np.arange(10, dtype=np.int64)),
            "name": pa.array([f"g{i}" for i in range(10)]),
        }))]
        plan = ExecPlan()
        p = source_node(plan, probe)
        b = source_node(plan, build)
        j = join_node(plan, p, b, keys=["k"])
        sink = sink_node(plan, j)
        plan.run()
        got = sink.result.combine_chunks()
        exp = a1t.join(a1t.concat_batches(probe), build[0], keys=["k"])
        assert got.num_rows == exp.num_rows

    def test_declaration(self):
        batches = make_batches(seed=5)
        decl = Declaration("order_by", {"sort_keys": [("v", "descending")]},
                           [Declaration("filter",
                                        {"predicate": a1t.field("v") > 50},
                                        [Declaration("source",
                                                     {"batches": batches})])])
        tbl = decl.to_table()
        vs = tbl.combine_chunks()["v"].to_numpy()
        assert (vs > 50).all()
        assert list(vs) == sorted(vs, reverse=True)


class TestStreaming:
    def test_streaming_scalar_aggs(self):
        batches = make_batches(6, seed=6)
        agg = StreamingAggregator([("v", "sum"), ("v", "count"),
                                   ("v", "min"), ("v", "max"),
                                   ("f", "mean"), ("f", "variance")])
        for b in batches:
            agg.consume(b)
        got = agg.finalize()
        merged = a1t.concat_batches(batches)
        assert got["v_sum"].as_py() == a1t.compute.sum(merged["v"]).as_py()
        assert got["v_count"].as_py() == a1t.compute.count(merged["v"]).as_py()
        assert got["v_min"].as_py() == a1t.compute.min(merged["v"]).as_py()
        assert got["v_max"].as_py() == a1t.compute.max(merged["v"]).as_py()
        assert got["f_mean"].as_py() == pytest.approx(
            a1t.compute.mean(merged["f"]).as_py())
        assert got["f_variance"].as_py() == pytest.approx(
            a1t.compute.variance(merged["f"]).as_py())

    def test_streaming_group_by_matches_monolithic(self):
        batches = make_batches(5, seed=7)
        got = run_streaming_aggregate(
            batches, ["k"], [("v", "sum"), ("v", "count"), ("v", "min"),
                             ("f", "mean")])
        merged = a1t.concat_batches(batches)
        exp = a1t.group_by(merged, ["k"], [("v", "sum"), ("v", "count"),
                                           ("v", "min"), ("f", "mean")])
        g = sorted(got.to_arrow().to_pylist(), key=lambda r: repr(r["k"]))
        e = sorted(exp.to_arrow().to_pylist(), key=lambda r: repr(r["k"]))
        assert len(g) == len(e)
        for a, b in zip(g, e):
            assert (a["k"], a["v_sum"], a["v_count"], a["v_min"]) == \
                (b["k"], b["v_sum"], b["v_count"], b["v_min"])
            # chunked partial sums reassociate float addition -> ULP noise
            assert a["f_mean"] == pytest.approx(b["f_mean"], nan_ok=True)


class TestIO:
    def test_ipc_roundtrip(self, tmp_path):
        rb = a1t.record_batch({"x": [1, 2, 3], "s": ["a", None, "b"]})
        path = str(tmp_path / "t.arrow")
        aio.write_ipc(rb, path)
        back = aio.read_ipc(path).combine_chunks()
        assert back["x"].to_numpy().tolist() == [1, 2, 3]
        assert back["s"].to_numpy().tolist() == ["a", None, "b"]

    def test_ipc_compressed(self, tmp_path):
        rb = a1t.record_batch({"x": list(range(1000))})
        path = str(tmp_path / "t.arrow")
        aio.write_ipc(rb, path, compression="zstd")
        assert aio.read_ipc(path).num_rows == 1000

    def test_feather_roundtrip(self, tmp_path):
        rb = a1t.record_batch({"x": [1.5, None, 3.5]})
        path = str(tmp_path / "t.feather")
        aio.write_feather(rb, path)
        back = aio.read_feather(path).combine_chunks()
        assert back["x"].to_arrow().to_pylist() == [1.5, None, 3.5]

    def test_parquet_roundtrip(self, tmp_path):
        rb = a1t.record_batch({"x": [1, 2, None], "s": ["p", "q", "p"]})
        path = str(tmp_path / "t.parquet")
        aio.write_parquet(rb, path)
        back = aio.read_parquet(path).combine_chunks()
        assert back["x"].to_arrow().to_pylist() == [1, 2, None]
        # column pruning pushdown
        only_x = aio.read_parquet(path, columns=["x"])
        assert only_x.combine_chunks().names == ("x",)

    def test_csv_roundtrip(self, tmp_path):
        rb = a1t.record_batch({"x": [1, 2, 3], "y": [0.5, 1.5, 2.5]})
        path = str(tmp_path / "t.csv")
        aio.write_csv(rb, path)
        back = aio.read_csv(path).combine_chunks()
        assert back["x"].to_numpy().tolist() == [1, 2, 3]

    def test_json_read(self, tmp_path):
        path = str(tmp_path / "t.ndjson")
        with open(path, "w") as f:
            f.write('{"a": 1, "b": "x"}\n{"a": 2, "b": "y"}\n')
        back = aio.read_json(path).combine_chunks()
        assert back["a"].to_numpy().tolist() == [1, 2]

    def test_ipc_stream_reader_writer(self, tmp_path):
        import pyarrow as pa

        path = str(tmp_path / "s.arrows")
        batches = make_batches(3, rows=10)
        with pa.OSFile(path, "wb") as f:
            with aio.IpcStreamWriter(f) as w:
                for b in batches:
                    w.write_batch(b)
        with pa.OSFile(path, "rb") as f:
            got = list(aio.IpcStreamReader(f))
        assert len(got) == 3
        assert got[0].num_rows == 10

    def test_prefetch(self):
        batches = make_batches(5, rows=20)
        out = list(aio.prefetch_batches(batches, readahead=3))
        assert len(out) == 5

    def test_prefetch_propagates_errors(self):
        def gen():
            yield make_batches(1)[0]
            raise RuntimeError("boom")

        it = aio.prefetch_batches(gen(), readahead=2)
        next(it)
        with pytest.raises(RuntimeError, match="boom"):
            list(it)


class TestDataset:
    def _write_partitioned(self, tmp_path):
        rb = a1t.record_batch({
            "year": [2020, 2020, 2021, 2021, 2022],
            "v": [1, 2, 3, 4, 5],
            "s": ["a", "b", "c", "d", "e"],
        })
        write_dataset(rb, str(tmp_path / "ds"), partitioning_keys=["year"])
        return rb

    def test_discovery_and_scan(self, tmp_path):
        self._write_partitioned(tmp_path)
        ds = dataset(str(tmp_path / "ds"), partitioning=HivePartitioning())
        assert len(ds.fragments) == 3
        tbl = ds.scanner().to_table().combine_chunks()
        assert tbl.num_rows == 5
        assert set(tbl.names) >= {"v", "s", "year"}

    def test_partition_pruning(self, tmp_path):
        self._write_partitioned(tmp_path)
        ds = dataset(str(tmp_path / "ds"), partitioning=HivePartitioning())
        frags = ds.get_fragments(a1t.field("year") == 2021)
        assert len(frags) == 1
        scanner = ScannerBuilder(ds).filter(a1t.field("year") == 2021).finish()
        tbl = scanner.to_table().combine_chunks()
        assert sorted(tbl["v"].to_numpy().tolist()) == [3, 4]

    def test_filter_pushdown_row_level(self, tmp_path):
        self._write_partitioned(tmp_path)
        ds = dataset(str(tmp_path / "ds"), partitioning=HivePartitioning())
        scanner = ScannerBuilder(ds).filter(
            (a1t.field("year") >= 2021) & (a1t.field("v") > 3)).finish()
        tbl = scanner.to_table().combine_chunks()
        assert sorted(tbl["v"].to_numpy().tolist()) == [4, 5]

    def test_projection(self, tmp_path):
        self._write_partitioned(tmp_path)
        ds = dataset(str(tmp_path / "ds"), partitioning=HivePartitioning())
        scanner = ScannerBuilder(ds).project(
            [a1t.field("v") * 10], ["v10"]).finish()
        tbl = scanner.to_table().combine_chunks()
        assert tbl.names == ("v10",)
        assert sorted(tbl["v10"].to_numpy().tolist()) == [10, 20, 30, 40, 50]

    def test_head_and_count(self, tmp_path):
        self._write_partitioned(tmp_path)
        ds = dataset(str(tmp_path / "ds"), partitioning=HivePartitioning())
        assert ds.scanner().count_rows() == 5
        assert ds.scanner().head(2).num_rows == 2

    def test_single_file_dataset(self, tmp_path):
        rb = a1t.record_batch({"x": [1, 2, 3]})
        path = str(tmp_path / "one.parquet")
        aio.write_parquet(rb, path)
        ds = dataset(path)
        assert ds.scanner().to_table().num_rows == 3


class TestAceroDeclarations:
    def test_pipeline_parity_with_pyarrow_acero(self):
        import pyarrow.acero as pacero

        from arrow1_tpu import acero
        from arrow1_tpu.table import Table

        src = {"k": [1, 1, 2, 2], "v": [1.0, 2.0, 3.0, 4.0]}
        exp = pacero.Declaration.from_sequence([
            pacero.Declaration("table_source",
                               pacero.TableSourceNodeOptions(
                                   pa.table(src))),
            pacero.Declaration("filter", pacero.FilterNodeOptions(
                pacero.field("v") > 1.5)),
            pacero.Declaration("aggregate", pacero.AggregateNodeOptions(
                [("v", "hash_sum", None, "v_sum")], keys=["k"])),
        ]).to_table().to_pydict()
        got = acero.Declaration.from_sequence([
            acero.Declaration("table_source", acero.TableSourceNodeOptions(
                Table.from_pydict(src))),
            acero.Declaration("filter", acero.FilterNodeOptions(
                a1t.field("v") > 1.5)),
            acero.Declaration("aggregate", acero.AggregateNodeOptions(
                [("v", "sum")], keys=["k"])),
        ]).to_table().to_pydict()
        assert sorted(zip(got["k"], got["v_sum"])) == \
            sorted(zip(exp["k"], exp["v_sum"]))

    def test_join_and_asof_declarations(self):
        from arrow1_tpu import acero
        from arrow1_tpu.table import Table

        l = acero.Declaration("table_source", acero.TableSourceNodeOptions(
            Table.from_pydict({"k": [1, 2], "a": [10, 20]})))
        r = acero.Declaration("table_source", acero.TableSourceNodeOptions(
            Table.from_pydict({"k": [1, 2], "b": [7, 9]})))
        j = acero.Declaration("hashjoin", acero.HashJoinNodeOptions(
            "inner", ["k"], ["k"]), inputs=[l, r]).to_table().to_pydict()
        assert j["b"] == [7, 9]
        la = acero.Declaration("table_source", acero.TableSourceNodeOptions(
            Table.from_pydict({"t": [5], "x": [1]})))
        ra = acero.Declaration("table_source", acero.TableSourceNodeOptions(
            Table.from_pydict({"t": [4], "y": [8]})))
        aj = acero.Declaration("asofjoin", acero.AsofJoinNodeOptions(
            left_on="t", right_on="t", tolerance=-5),
            inputs=[la, ra]).to_table().to_pydict()
        assert aj["y"] == [8]
