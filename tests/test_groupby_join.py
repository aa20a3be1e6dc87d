"""Group-by and join parity.

Oracles: pyarrow TableGroupBy.aggregate (group-by) and pyarrow Table.join
(Acero HashJoinNode) — row-order-insensitive comparison, since Acero's
output order is nondeterministic while ours is probe-major deterministic.
"""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

import arrow1_tpu as a1t
from arrow1_tpu.errors import Invalid
from arrow1_tpu.testing import RandomDataGenerator


def _sorted_pylist(tbl):
    """Canonical row-set representation (order-insensitive compare)."""
    if isinstance(tbl, pa.RecordBatch):
        tbl = pa.Table.from_batches([tbl])
    rows = [tuple(sorted(d.items())) for d in tbl.to_pylist()]
    return sorted(rows, key=repr)


def assert_same_rows(got, expected):
    g = _sorted_pylist(got.to_arrow() if hasattr(got, "to_arrow") else got)
    e = _sorted_pylist(expected)
    assert len(g) == len(e), f"row count {len(g)} != {len(e)}"
    for i, (a, b) in enumerate(zip(g, e)):
        assert a == b, f"row {i}: {a} != {b}"


class TestGroupBy:
    def _oracle(self, rb, keys, aggs):
        return pa.Table.from_batches([rb]).group_by(keys).aggregate(aggs)

    def test_sum_count(self):
        rb = pa.record_batch({
            "k": pa.array(["a", "b", "a", "c", "b", "a"]),
            "v": pa.array([1, 2, None, 4, 5, 6], type=pa.int64()),
        })
        got = a1t.group_by(a1t.record_batch(rb), ["k"],
                           [("v", "sum"), ("v", "count")])
        assert_same_rows(got, self._oracle(rb, ["k"],
                                           [("v", "sum"), ("v", "count")]))

    def test_min_max_mean(self):
        rb = pa.record_batch({
            "k": pa.array([1, 2, 1, 2, 3, None], type=pa.int64()),
            "v": pa.array([10.0, 2.5, None, 4.0, 5.0, 1.0]),
        })
        for agg in ["min", "max", "mean"]:
            got = a1t.group_by(a1t.record_batch(rb), ["k"], [("v", agg)])
            assert_same_rows(got, self._oracle(rb, ["k"], [("v", agg)]))

    def test_null_key_group(self):
        rb = pa.record_batch({
            "k": pa.array(["x", None, "x", None]),
            "v": pa.array([1, 2, 3, 4], type=pa.int64()),
        })
        got = a1t.group_by(a1t.record_batch(rb), ["k"], [("v", "sum")])
        assert_same_rows(got, self._oracle(rb, ["k"], [("v", "sum")]))

    def test_multi_key(self):
        rb = pa.record_batch({
            "a": pa.array([1, 1, 2, 2, 1], type=pa.int64()),
            "b": pa.array(["x", "y", "x", "x", "x"]),
            "v": pa.array([10, 20, 30, 40, 50], type=pa.int64()),
        })
        got = a1t.group_by(a1t.record_batch(rb), ["a", "b"], [("v", "sum")])
        assert_same_rows(got, self._oracle(rb, ["a", "b"], [("v", "sum")]))

    def test_all_null_group_sum_is_null(self):
        rb = pa.record_batch({
            "k": pa.array(["a", "a", "b"]),
            "v": pa.array([None, None, 1], type=pa.int64()),
        })
        got = a1t.group_by(a1t.record_batch(rb), ["k"], [("v", "sum")])
        assert_same_rows(got, self._oracle(rb, ["k"], [("v", "sum")]))

    def test_first_appearance_order(self):
        rb = pa.record_batch({
            "k": pa.array(["z", "a", "z", "m"]),
            "v": pa.array([1, 2, 3, 4], type=pa.int64()),
        })
        got = a1t.group_by(a1t.record_batch(rb), ["k"], [("v", "sum")])
        assert got["k"].to_numpy().tolist() == ["z", "a", "m"]

    def test_count_distinct(self):
        rb = pa.record_batch({
            "k": pa.array(["a", "a", "a", "b", "b"]),
            "v": pa.array([1, 1, 2, 3, None], type=pa.int64()),
        })
        got = a1t.group_by(a1t.record_batch(rb), ["k"],
                           [("v", "count_distinct")])
        assert_same_rows(got, self._oracle(rb, ["k"], [("v", "count_distinct")]))

    def test_variance_stddev(self):
        rb = pa.record_batch({
            "k": pa.array(["a", "a", "b", "b", "b"]),
            "v": pa.array([1.0, 3.0, 2.0, 4.0, 9.0]),
        })
        for agg in ["variance", "stddev"]:
            got = a1t.group_by(a1t.record_batch(rb), ["k"], [("v", agg)])
            exp = self._oracle(rb, ["k"], [("v", agg)])
            g = {r["k"]: r[f"v_{agg}"] for r in got.to_arrow().to_pylist()}
            e = {r["k"]: r[f"v_{agg}"] for r in exp.to_pylist()}
            for k in e:
                assert g[k] == pytest.approx(e[k])

    def test_random_parity(self):
        gen = RandomDataGenerator(23)
        rb = gen.batch(2000, [("k", a1t.string), ("v", a1t.int64)],
                       null_probability=0.1)
        # restrict cardinality for meaningful groups
        aggs = [("v", "sum"), ("v", "count"), ("v", "min"), ("v", "max")]
        got = a1t.group_by(a1t.record_batch(rb), ["k"], aggs)
        assert_same_rows(got, self._oracle(rb, ["k"], aggs))


LEFT = pa.record_batch({
    "k": pa.array([1, 2, 3, 4, 2, None], type=pa.int64()),
    "lv": pa.array(["a", "b", "c", "d", "e", "f"]),
})
RIGHT = pa.record_batch({
    "k": pa.array([2, 2, 4, 5, None], type=pa.int64()),
    "rv": pa.array([20.0, 21.0, 40.0, 50.0, 0.5]),
})


def _oracle_join(join_type):
    lt = pa.Table.from_batches([LEFT])
    rt = pa.Table.from_batches([RIGHT])
    return lt.join(rt, keys=["k"], join_type=join_type)


class TestJoin:
    @pytest.mark.parametrize("jt", ["inner", "left outer", "right outer",
                                    "full outer", "left semi", "left anti",
                                    "right semi", "right anti"])
    def test_join_types(self, jt):
        got = a1t.join(a1t.record_batch(LEFT), a1t.record_batch(RIGHT),
                       keys=["k"], join_type=jt)
        assert_same_rows(got, _oracle_join(jt))

    def test_duplicate_build_keys_fanout(self):
        # k=2 appears twice in RIGHT: each left k=2 row fans out to 2 rows
        got = a1t.join(a1t.record_batch(LEFT), a1t.record_batch(RIGHT),
                       keys=["k"], join_type="inner")
        ks = got["k"].to_numpy().tolist()
        assert ks.count(2) == 4  # 2 left rows x 2 right rows

    def test_multi_key_join(self):
        left = pa.record_batch({
            "a": pa.array([1, 1, 2], type=pa.int64()),
            "b": pa.array(["x", "y", "x"]),
            "lv": pa.array([10, 20, 30], type=pa.int64()),
        })
        right = pa.record_batch({
            "a": pa.array([1, 2, 1], type=pa.int64()),
            "b": pa.array(["x", "x", "z"]),
            "rv": pa.array([100, 200, 300], type=pa.int64()),
        })
        got = a1t.join(a1t.record_batch(left), a1t.record_batch(right),
                       keys=["a", "b"], join_type="inner")
        exp = pa.Table.from_batches([left]).join(
            pa.Table.from_batches([right]), keys=["a", "b"], join_type="inner")
        assert_same_rows(got, exp)

    def test_string_key_join(self):
        left = pa.record_batch({
            "s": pa.array(["aa", "bb", "cc"]),
            "lv": pa.array([1, 2, 3], type=pa.int64()),
        })
        right = pa.record_batch({
            "s": pa.array(["bb", "dd", "aa"]),
            "rv": pa.array([20, 40, 10], type=pa.int64()),
        })
        for jt in ["inner", "left outer", "full outer"]:
            got = a1t.join(a1t.record_batch(left), a1t.record_batch(right),
                           keys=["s"], join_type=jt)
            exp = pa.Table.from_batches([left]).join(
                pa.Table.from_batches([right]), keys=["s"], join_type=jt)
            assert_same_rows(got, exp)

    def test_different_key_names(self):
        left = pa.record_batch({"lk": pa.array([1, 2], type=pa.int64()),
                                "lv": pa.array([5, 6], type=pa.int64())})
        right = pa.record_batch({"rk": pa.array([2, 3], type=pa.int64()),
                                 "rv": pa.array([7, 8], type=pa.int64())})
        got = a1t.join(a1t.record_batch(left), a1t.record_batch(right),
                       keys=["lk"], right_keys=["rk"], join_type="inner")
        exp = pa.Table.from_batches([left]).join(
            pa.Table.from_batches([right]), keys=["lk"], right_keys=["rk"],
            join_type="inner")
        assert_same_rows(got, exp)

    def test_skewed_keys(self):
        # one hot key with heavy fanout
        gen = RandomDataGenerator(31)
        lk = np.where(gen.rng.random(500) < 0.5, 7,
                      gen.rng.integers(0, 100, 500)).astype(np.int64)
        rk = np.where(gen.rng.random(100) < 0.3, 7,
                      gen.rng.integers(0, 100, 100)).astype(np.int64)
        left = pa.record_batch({"k": pa.array(lk),
                                "lv": pa.array(np.arange(500, dtype=np.int64))})
        right = pa.record_batch({"k": pa.array(rk),
                                 "rv": pa.array(np.arange(100, dtype=np.int64))})
        got = a1t.join(a1t.record_batch(left), a1t.record_batch(right),
                       keys=["k"], join_type="inner")
        exp = pa.Table.from_batches([left]).join(
            pa.Table.from_batches([right]), keys=["k"], join_type="inner")
        assert got.num_rows == exp.num_rows
        assert_same_rows(got, exp)

    def test_bad_join_type(self):
        with pytest.raises(Invalid):
            a1t.join(a1t.record_batch(LEFT), a1t.record_batch(RIGHT),
                     keys=["k"], join_type="bogus")


class TestNewGroupedAggregates:
    def batch(self):
        t = pa.record_batch({"k": [1, 1, 1, 2, 2],
                             "v": [None, 3.0, 1.0, 5.0, None]})
        return t, a1t.record_batch(t)

    def test_first_last_one(self):
        t, b = self.batch()
        got = a1t.group_by(b, ["k"], [("v", "first"), ("v", "last"),
                                      ("v", "one")])
        d = {n: c.to_arrow().to_pylist() for n, c in zip(got.names,
                                                         got.columns)}
        exp = pa.Table.from_batches([t]).group_by(
            "k", use_threads=False).aggregate(
            [("v", "first"), ("v", "last")]).to_pydict()
        assert d["v_first"] == exp["v_first"]
        assert d["v_last"] == exp["v_last"]
        assert d["v_one"] == exp["v_first"]  # any valid value; first is one

    def test_list_and_distinct(self):
        t, b = self.batch()
        for fn in ("list", "distinct"):
            got = a1t.group_by(b, ["k"], [("v", fn)])
            d = {n: c.to_arrow().to_pylist() for n, c in zip(got.names,
                                                             got.columns)}
            exp = pa.Table.from_batches([t]).group_by("k").aggregate(
                [("v", fn)]).to_pydict()
            assert d[f"v_{fn}"] == exp[f"v_{fn}"], fn

    def test_skew_kurtosis_grouped(self):
        t = pa.record_batch({"k": [1, 1, 1, 1, 2, 2, 2],
                             "v": [4.0, 1.0, 3.0, 2.0, 7.0, 7.0, 1.0]})
        b = a1t.record_batch(t)
        got = a1t.group_by(b, ["k"], [("v", "skew"), ("v", "kurtosis")])
        d = {n: c.to_arrow().to_pylist() for n, c in zip(got.names,
                                                         got.columns)}
        assert d["v_skew"] == pytest.approx(
            [pc.skew(pa.array([4.0, 1.0, 3.0, 2.0])).as_py(),
             pc.skew(pa.array([7.0, 7.0, 1.0])).as_py()])
        assert d["v_kurtosis"] == pytest.approx(
            [pc.kurtosis(pa.array([4.0, 1.0, 3.0, 2.0])).as_py(),
             pc.kurtosis(pa.array([7.0, 7.0, 1.0])).as_py()])

    def test_median_and_count_all(self):
        t, b = self.batch()
        got = a1t.group_by(b, ["k"], [("v", "approximate_median"),
                                      ("v", "count_all")])
        d = {n: c.to_arrow().to_pylist() for n, c in zip(got.names,
                                                         got.columns)}
        assert d["v_approximate_median"] == [2.0, 5.0]  # exact medians
        assert d["v_count_all"] == [3, 2]

    def test_hash_kernel_entry_points(self):
        import numpy as np

        v = a1t.column(pa.array([None, 3.0, 1.0, 5.0, None]))
        gids = a1t.column(np.array([0, 0, 0, 1, 1], dtype=np.int32))
        assert a1t.call_function("hash_first", [v, gids]).to_arrow() \
            .to_pylist() == [3.0, 5.0]
        assert a1t.call_function("hash_list", [v, gids]).to_arrow() \
            .to_pylist() == [[None, 3.0, 1.0], [5.0, None]]
        assert a1t.call_function("hash_count_distinct", [v, gids]) \
            .to_arrow().to_pylist() == [2, 1]


class TestNewScalarAggregates:
    def test_first_last_skew_kurtosis(self):
        a = pa.array([3.0, 1.0, None, 2.0])
        assert float(a1t.call_function("first", [a1t.column(a)]).value) \
            == pc.first(a).as_py()
        assert float(a1t.call_function("last", [a1t.column(a)]).value) \
            == pc.last(a).as_py()
        for fn in ("skew", "kurtosis"):
            for b in (True, False):
                got = a1t.call_function(fn, [a1t.column(a)], biased=b)
                exp = getattr(pc, fn)(a, biased=b).as_py()
                if exp is None:
                    assert not got.is_valid
                else:
                    assert float(got.value) == pytest.approx(exp)

    def test_count_distinct_and_median(self):
        arr = pa.array([1, 1, 2, None])
        assert int(a1t.call_function("count_distinct",
                                     [a1t.column(arr)]).value) == 2
        assert int(a1t.call_function("count_distinct", [a1t.column(arr)],
                                     mode="all").value) == 3
        a = pa.array([3.0, 1.0, None, 2.0])
        assert float(a1t.call_function("approximate_median",
                                       [a1t.column(a)]).value) == 2.0

    def test_winsorize(self):
        import numpy as np

        w = pa.array([float(i) for i in range(1, 11)])
        got = a1t.call_function("winsorize", [a1t.column(w)],
                                lower_limit=0.2, upper_limit=0.8).to_numpy()
        exp = pc.call_function("winsorize", [w], pc.WinsorizeOptions(
            lower_limit=0.2, upper_limit=0.8)).to_numpy()
        np.testing.assert_allclose(got, exp)


class TestJoinAsof:
    def tables(self):
        from arrow1_tpu.table import Table

        L = Table.from_pydict({"t": [1, 5, 10], "k": [1, 1, 2],
                               "lv": [10, 20, 30]})
        R = Table.from_pydict({"t": [0, 4, 6, 9], "k": [1, 1, 1, 2],
                               "rv": [100, 200, 300, 400]})
        lpa = pa.table({"t": [1, 5, 10], "k": [1, 1, 2], "lv": [10, 20, 30]})
        rpa = pa.table({"t": [0, 4, 6, 9], "k": [1, 1, 1, 2],
                        "rv": [100, 200, 300, 400]})
        return L, R, lpa, rpa

    def test_matches_pyarrow_all_tolerances(self):
        L, R, lpa, rpa = self.tables()
        for tol in (-10, -2, 0, 2):
            got = L.join_asof(R, on="t", by="k", tolerance=tol).to_pydict()
            exp = lpa.join_asof(rpa, on="t", by="k",
                                tolerance=tol).to_pydict()
            assert got["rv"] == exp["rv"], tol

    def test_duplicate_tie_direction(self):
        from arrow1_tpu.table import Table

        L = Table.from_pydict({"t": [5], "k": [1], "lv": [1]})
        R = Table.from_pydict({"t": [4, 4, 6, 6], "k": [1, 1, 1, 1],
                               "rv": [100, 200, 300, 400]})
        assert L.join_asof(R, on="t", by="k",
                           tolerance=-5).to_pydict()["rv"] == [200]
        assert L.join_asof(R, on="t", by="k",
                           tolerance=5).to_pydict()["rv"] == [300]

    def test_fuzz_vs_pyarrow(self):
        from arrow1_tpu.table import Table

        rng = np.random.default_rng(3)
        for _ in range(6):
            nl, nr = 40, 60
            lt = np.sort(rng.integers(0, 100, nl)).astype(np.int64)
            rt = np.sort(rng.integers(0, 100, nr)).astype(np.int64)
            lk = rng.integers(0, 4, nl).astype(np.int64)
            rk = rng.integers(0, 4, nr).astype(np.int64)
            tol = int(rng.integers(-20, 20))
            exp = pa.table({"t": lt, "k": lk, "lv": np.arange(nl)}) \
                .join_asof(pa.table({"t": rt, "k": rk,
                                     "rv": np.arange(nr)}),
                           on="t", by="k", tolerance=tol).to_pydict()
            got = Table.from_pydict(
                {"t": lt, "k": lk, "lv": np.arange(nl)}).join_asof(
                Table.from_pydict({"t": rt, "k": rk,
                                   "rv": np.arange(nr)}),
                on="t", by="k", tolerance=tol).to_pydict()
            assert got["rv"] == exp["rv"], tol


def test_join_accepts_tables():
    """a1t.join on Table inputs (chunked columns) matches pyarrow
    Table.join — the module-level entry used to crash on
    ChunkedColumn."""
    import numpy as np
    import pyarrow as pa

    import arrow1_tpu as a1t

    rng = np.random.default_rng(9)
    n = 5000
    left = pa.table({"k": pa.array(rng.integers(0, 300, n)),
                     "v": pa.array(rng.standard_normal(n))})
    right = pa.table({"k": pa.array(np.arange(300, dtype=np.int64)),
                      "w": pa.array(rng.integers(0, 100, 300))})
    got = a1t.join(a1t.table(left), a1t.table(right),
                   keys=["k"]).to_arrow()
    if not isinstance(got, pa.Table):
        got = pa.table({c: got.column(c) for c in got.column_names})
    want = left.join(right, keys=["k"], join_type="inner")
    gs = got.sort_by([("k", "ascending"), ("v", "ascending")])
    ws = want.sort_by([("k", "ascending"), ("v", "ascending")])
    for c in ("k", "v", "w"):
        np.testing.assert_array_equal(
            np.asarray(gs.column(c).to_numpy(zero_copy_only=False)),
            np.asarray(ws.column(c).to_numpy(zero_copy_only=False)))
