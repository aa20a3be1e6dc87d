"""Skew detection + salted repartitioning in the distributed join."""

import numpy as np
import pyarrow as pa
import pytest

import arrow1_tpu as a1t
from arrow1_tpu.errors import Invalid
from arrow1_tpu.parallel import dist_join, make_mesh
from test_groupby_join import assert_same_rows


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8)


def skewed_tables(n=400, hot_frac=0.9, seed=0):
    rng = np.random.default_rng(seed)
    lk = np.where(rng.random(n) < hot_frac, 7,
                  rng.integers(0, 50, n)).astype(np.int64)
    left = pa.record_batch({"k": pa.array(lk),
                            "lv": pa.array(np.arange(n, dtype=np.int64))})
    rk = np.arange(50, dtype=np.int64)
    right = pa.record_batch({"k": pa.array(rk),
                             "rv": pa.array(rk * 100)})
    return left, right


class TestSkewSalting:
    def test_unsalted_overflows(self, mesh):
        # bucket capacity below the per-source hot-row count: every source
        # sends ~45 hot rows to one destination, capacity 20 -> overflow
        left, right = skewed_tables()
        lb, rb = a1t.record_batch(left), a1t.record_batch(right)
        with pytest.raises(Invalid, match="overflow"):
            dist_join(lb, rb, keys=["k"], mesh=mesh, salt=False,
                      capacity_per_dest=20, output_capacity=4096)

    def test_salted_fits_same_capacity(self, mesh):
        # with salting the hot key spreads over S sub-partitions and the
        # same tight capacity suffices
        left, right = skewed_tables()
        lb, rb = a1t.record_batch(left), a1t.record_batch(right)
        got = dist_join(lb, rb, keys=["k"], mesh=mesh,
                        capacity_per_dest=20, output_capacity=4096)
        exp = a1t.join(lb, rb, keys=["k"])
        assert got.num_rows == exp.num_rows

    def test_salted_succeeds_and_matches(self, mesh):
        left, right = skewed_tables()
        lb, rb = a1t.record_batch(left), a1t.record_batch(right)
        got = dist_join(lb, rb, keys=["k"], mesh=mesh)
        exp = a1t.join(lb, rb, keys=["k"])
        assert got.num_rows == exp.num_rows
        assert_same_rows(got, exp.to_arrow())

    def test_salted_left_outer(self, mesh):
        left, right = skewed_tables(seed=3)
        # make some probe keys unmatched
        left = left.set_column(0, "k", pa.array(
            np.where(np.arange(400) % 11 == 0, 999,
                     left.column("k").to_numpy()).astype(np.int64)))
        lb, rb = a1t.record_batch(left), a1t.record_batch(right)
        got = dist_join(lb, rb, keys=["k"], join_type="left outer",
                        mesh=mesh)
        exp = a1t.join(lb, rb, keys=["k"], join_type="left outer")
        assert got.num_rows == exp.num_rows
        assert_same_rows(got, exp.to_arrow())

    def test_no_skew_no_salting_effect(self, mesh):
        rng = np.random.default_rng(5)
        left = pa.record_batch({
            "k": pa.array(rng.permutation(200).astype(np.int64)),
            "lv": pa.array(np.arange(200, dtype=np.int64))})
        right = pa.record_batch({
            "k": pa.array(np.arange(200, dtype=np.int64)),
            "rv": pa.array(np.arange(200, dtype=np.int64) * 3)})
        lb, rb = a1t.record_batch(left), a1t.record_batch(right)
        got = dist_join(lb, rb, keys=["k"], mesh=mesh)
        exp = a1t.join(lb, rb, keys=["k"])
        assert_same_rows(got, exp.to_arrow())
