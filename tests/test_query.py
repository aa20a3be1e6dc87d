"""Fluent query API over datasets/tables/batches."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

import arrow1_tpu as a1t
from arrow1_tpu import io as aio
from arrow1_tpu.dataset import HivePartitioning, dataset, write_dataset
from test_groupby_join import assert_same_rows


def source_batch():
    rng = np.random.default_rng(9)
    return pa.record_batch({
        "year": pa.array(rng.choice([2020, 2021, 2022], 300).astype(np.int64)),
        "k": pa.array(rng.integers(0, 10, 300).astype(np.int64)),
        "v": pa.array(rng.integers(-50, 50, 300).astype(np.int64)),
    })


class TestQuery:
    def test_filter_group_order(self):
        rb = source_batch()
        b = a1t.record_batch(rb)
        got = (a1t.query(b)
               .filter(a1t.field("v") > 0)
               .group_by(["k"], [("v", "sum")])
               .order_by([("v_sum", "descending")])
               .to_batch())
        hot = rb.filter(pc.greater(rb.column("v"), pa.scalar(0)))
        exp = pa.Table.from_batches([hot]).group_by(["k"]).aggregate(
            [("v", "sum")]).sort_by([("v_sum", "descending")])
        assert got["v_sum"].to_numpy().tolist() == \
            exp.column("v_sum").to_pylist()

    def test_over_partitioned_dataset_with_pruning(self, tmp_path):
        rb = source_batch()
        write_dataset(a1t.record_batch(rb), str(tmp_path / "ds"),
                      partitioning_keys=["year"])
        ds = dataset(str(tmp_path / "ds"), partitioning=HivePartitioning())
        got = (a1t.query(ds)
               .filter(a1t.field("year") == 2021)
               .group_by(["k"], [("v", "count")])
               .to_batch())
        sub = rb.filter(pc.equal(rb.column("year"), pa.scalar(2021)))
        exp = pa.Table.from_batches([sub]).group_by(["k"]).aggregate(
            [("v", "count")])
        assert_same_rows(got, exp)

    def test_join_then_group(self):
        rb = source_batch()
        dims = a1t.record_batch({"k": list(range(10)),
                                 "label_code": list(range(10))})
        got = (a1t.query(a1t.record_batch(rb))
               .join(dims, keys=["k"])
               .group_by(["label_code"], [("v", "sum")])
               .to_batch())
        exp_j = pa.Table.from_batches([rb]).join(
            pa.Table.from_batches([dims.to_arrow()]), keys=["k"])
        exp = exp_j.group_by(["label_code"]).aggregate([("v", "sum")])
        assert_same_rows(got, exp)

    def test_project_and_limit(self):
        b = a1t.record_batch({"x": [5, 1, 9, 3]})
        got = (a1t.query(b)
               .project([a1t.field("x") * 10], ["x10"])
               .order_by([("x10", "ascending")])
               .limit(2)
               .to_batch())
        assert got["x10"].to_numpy().tolist() == [10, 30]

    def test_count_rows(self):
        b = a1t.record_batch({"x": [1, 2, 3, 4]})
        assert a1t.query(b).filter(a1t.field("x") > 2).count_rows() == 2


class TestModels:
    def test_q1_template(self):
        from arrow1_tpu.models import q1_pricing_summary
        from test_tpch_pipeline import make_lineitem, q1_oracle

        li = make_lineitem(seed=31)
        got = q1_pricing_summary(a1t.record_batch(li))
        exp = q1_oracle(li).sort_by([("l_returnflag", "ascending")])
        assert got["l_quantity_sum"].to_arrow().to_pylist() == \
            exp.column("l_quantity_sum").to_pylist()

    def test_q5_template_multi_join(self):
        from arrow1_tpu.models import q5_local_supplier_volume
        from test_tpch_pipeline import make_lineitem, make_orders

        rng = np.random.default_rng(33)
        li, orders = make_lineitem(seed=33), make_orders(seed=34)
        customers = pa.record_batch({
            "c_custkey": pa.array(np.arange(30, dtype=np.int64)),
            "c_segment": pa.array(
                rng.choice(["AUTO", "HOUSE", "MACH"], 30).tolist()),
        })
        got = q5_local_supplier_volume(
            a1t.record_batch(li), a1t.record_batch(orders),
            a1t.record_batch(customers))
        # oracle
        t = pa.Table.from_batches([li]).join(
            pa.Table.from_batches([orders]), keys=["l_orderkey"],
            right_keys=["o_orderkey"]).join(
            pa.Table.from_batches([customers]), keys=["o_custkey"],
            right_keys=["c_custkey"])
        exp = t.group_by(["c_segment"]).aggregate(
            [("l_extendedprice", "sum")]).sort_by(
            [("l_extendedprice_sum", "descending")])
        g = got.to_arrow().to_pylist()
        e = exp.to_pylist()
        assert len(g) == len(e)
        for a, b in zip(g, e):
            assert a["c_segment"] == b["c_segment"]
            assert a["l_extendedprice_sum"] == pytest.approx(
                b["l_extendedprice_sum"])
