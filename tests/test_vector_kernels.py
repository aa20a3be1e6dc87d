"""Vector kernel parity: filter/take/sort/unique/value_counts/dict-encode.

Oracle: pyarrow.compute (SURVEY.md §4.2 pattern — random data + exact
compare, mirroring vector_selection_test.cc's 56 tests and
vector_sort_test.cc's 62 tests in spirit)."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

import arrow1_tpu as a1t
import arrow1_tpu.compute as ac
from arrow1_tpu.errors import IndexError_, Invalid
from arrow1_tpu.testing import (RandomDataGenerator, assert_batch_equal,
                                assert_column_equal, assert_equals_arrow)


class TestFilter:
    def test_basic(self):
        a = pa.array([1, 2, 3, 4, 5], type=pa.int64())
        m = pa.array([True, False, True, False, True])
        assert_equals_arrow(ac.filter(a, m), pc.filter(a, m))

    def test_null_mask_drop(self):
        a = pa.array([1, 2, 3, 4], type=pa.int64())
        m = pa.array([True, None, False, True])
        assert_equals_arrow(ac.filter(a, m), pc.filter(a, m))

    def test_null_mask_emit_null(self):
        a = pa.array([1, 2, 3, 4], type=pa.int64())
        m = pa.array([True, None, False, True])
        got = ac.filter(a, m, null_selection_behavior="emit_null")
        assert_equals_arrow(got, pc.filter(a, m,
                                           null_selection_behavior="emit_null"))

    def test_values_with_nulls(self):
        a = pa.array([1, None, 3, None], type=pa.int64())
        m = pa.array([True, True, False, True])
        assert_equals_arrow(ac.filter(a, m), pc.filter(a, m))

    def test_strings(self):
        a = pa.array(["a", "b", None, "c"])
        m = pa.array([True, False, True, True])
        got = ac.filter(a, m)
        assert got.to_numpy().tolist() == ["a", None, "c"]

    def test_record_batch(self):
        rb = pa.record_batch({"x": pa.array([1, 2, 3, 4]),
                              "y": pa.array([1.0, None, 3.0, 4.0])})
        m = pa.array([True, True, None, False])
        got = ac.filter(a1t.record_batch(rb), m)
        assert_batch_equal(got, pc.filter(rb, m))

    def test_empty_result(self):
        a = pa.array([1, 2, 3], type=pa.int64())
        m = pa.array([False, False, False])
        got = ac.filter(a, m)
        assert got.length == 0

    def test_random_parity(self, rng):
        gen = RandomDataGenerator(11)
        for null_p in (0.0, 0.3):
            a = gen.numeric(500, a1t.int64, null_probability=null_p)
            m = gen.numeric(500, a1t.bool_, null_probability=null_p)
            for sel in ("drop", "emit_null"):
                got = ac.filter(a, m, null_selection_behavior=sel)
                assert_equals_arrow(got,
                                    pc.filter(a, m, null_selection_behavior=sel))


class TestTake:
    def test_basic(self):
        a = pa.array([10, 20, 30], type=pa.int64())
        i = pa.array([2, 0, 2, 1], type=pa.int32())
        assert_equals_arrow(ac.take(a, i), pc.take(a, i))

    def test_null_indices(self):
        a = pa.array([10, 20, 30], type=pa.int64())
        i = pa.array([2, None, 0], type=pa.int32())
        assert_equals_arrow(ac.take(a, i), pc.take(a, i))

    def test_values_with_nulls(self):
        a = pa.array([10, None, 30], type=pa.int64())
        i = pa.array([1, 1, 2, 0], type=pa.int64())
        assert_equals_arrow(ac.take(a, i), pc.take(a, i))

    def test_oob_raises(self):
        a = pa.array([10, 20, 30], type=pa.int64())
        with pytest.raises(IndexError_):
            ac.take(a, pa.array([0, 5], type=pa.int64()))
        with pytest.raises(IndexError_):
            ac.take(a, pa.array([-1], type=pa.int64()))

    def test_record_batch(self):
        rb = pa.record_batch({"x": pa.array([1, 2, 3]),
                              "s": pa.array(["a", None, "c"])})
        i = pa.array([2, 2, 0, None], type=pa.int32())
        got = ac.take(a1t.record_batch(rb), i)
        exp = pc.take(rb, i)
        assert got["x"].to_arrow().equals(exp.column(0))
        assert got["s"].to_arrow().cast(pa.string()).equals(exp.column(1))

    def test_drop_null(self):
        a = pa.array([1, None, 3], type=pa.int64())
        assert_equals_arrow(ac.drop_null(a), pc.drop_null(a))


class TestSort:
    @pytest.mark.parametrize("order", ["ascending", "descending"])
    def test_array_sort_int(self, order):
        a = pa.array([3, 1, None, 2, None, -5], type=pa.int64())
        got = ac.array_sort_indices(a, order=order)
        assert_equals_arrow(got, pc.array_sort_indices(a, order=order))

    @pytest.mark.parametrize("order", ["ascending", "descending"])
    def test_array_sort_float_nan(self, order):
        a = pa.array([3.0, float("nan"), None, 1.5, float("nan"), -2.0])
        got = ac.array_sort_indices(a, order=order)
        assert_equals_arrow(got, pc.array_sort_indices(a, order=order))

    def test_int64_extremes(self):
        lo, hi = np.iinfo(np.int64).min, np.iinfo(np.int64).max
        a = pa.array([hi, lo, hi - 1, None, lo + 1, 0], type=pa.int64())
        assert_equals_arrow(ac.array_sort_indices(a), pc.array_sort_indices(a))

    def test_uint64_extremes(self):
        hi = np.iinfo(np.uint64).max
        a = pa.array([hi, 0, hi - 1, 1], type=pa.uint64())
        assert_equals_arrow(ac.array_sort_indices(a), pc.array_sort_indices(a))

    def test_stability(self):
        # equal keys keep original order
        a = pa.array([1, 1, 1, 0, 0], type=pa.int64())
        got = ac.array_sort_indices(a)
        assert got.to_numpy().tolist() == [3, 4, 0, 1, 2]

    def test_strings(self):
        a = pa.array(["pear", "apple", None, "banana", "apple"])
        assert_equals_arrow(ac.array_sort_indices(a), pc.array_sort_indices(a))

    def test_multi_key_batch(self):
        rb = pa.record_batch({
            "a": pa.array([2, 1, 2, 1, None, 2], type=pa.int64()),
            "b": pa.array(["x", "y", None, "x", "z", "x"]),
        })
        keys = [("a", "ascending"), ("b", "descending")]
        got = ac.sort_indices(a1t.record_batch(rb), sort_keys=keys)
        assert_equals_arrow(got, pc.sort_indices(rb, sort_keys=keys))

    def test_random_multikey_parity(self):
        gen = RandomDataGenerator(5)
        rb = gen.batch(300, [("k", a1t.string), ("v", a1t.int64),
                             ("f", a1t.float64)], null_probability=0.15)
        for keys in ([("k", "ascending"), ("v", "descending")],
                     [("f", "ascending"), ("k", "ascending")],
                     [("v", "descending")]):
            got = ac.sort_indices(a1t.record_batch(rb), sort_keys=keys)
            assert_equals_arrow(got, pc.sort_indices(rb, sort_keys=keys))

    def test_sort_then_take_roundtrip(self):
        a = pa.array([5, 3, 8, 1], type=pa.int64())
        idx = ac.array_sort_indices(a)
        taken = ac.take(a, ac.cast(idx, a1t.int64))
        assert taken.to_numpy().tolist() == [1, 3, 5, 8]


class TestVectorHash:
    def test_unique_int(self):
        a = pa.array([3, 1, 3, None, 1, 7], type=pa.int64())
        assert_equals_arrow(ac.unique(a), pc.unique(a))

    def test_unique_string(self):
        a = pa.array(["b", "a", "b", None, "c"])
        got = ac.unique(a)
        assert got.to_numpy().tolist() == ["b", "a", None, "c"]

    def test_value_counts(self):
        a = pa.array([3, 1, 3, None, 1, 3], type=pa.int64())
        got = ac.value_counts(a)
        exp = pc.value_counts(a)
        assert_column_equal(got["values"], exp.field("values"))
        assert_column_equal(got["counts"], exp.field("counts"))

    def test_dictionary_encode(self):
        a = pa.array([5, 2, 5, None, 2, 9], type=pa.int64())
        got = ac.dictionary_encode(a)
        exp = pc.dictionary_encode(a)
        back = got.to_arrow()
        assert back.dictionary.to_pylist() == exp.dictionary.to_pylist()
        assert back.to_pylist() == exp.to_pylist()

    def test_random_unique_parity(self):
        gen = RandomDataGenerator(13)
        a = gen.numeric(1000, a1t.int32, null_probability=0.1,
                        low=0, high=50)
        assert_equals_arrow(ac.unique(a), pc.unique(a))


class TestAggregates:
    A_INT = pa.array([1, 5, None, 3, -2], type=pa.int64())
    A_FLOAT = pa.array([1.5, None, -2.5, 4.0])

    def test_count(self):
        assert ac.count(self.A_INT).as_py() == pc.count(self.A_INT).as_py()
        assert ac.count(self.A_INT, mode="only_null").as_py() == \
            pc.count(self.A_INT, mode="only_null").as_py()
        assert ac.count(self.A_INT, mode="all").as_py() == \
            pc.count(self.A_INT, mode="all").as_py()

    def test_sum(self):
        assert ac.sum(self.A_INT).as_py() == pc.sum(self.A_INT).as_py()
        assert ac.sum(self.A_FLOAT).as_py() == pytest.approx(
            pc.sum(self.A_FLOAT).as_py())

    def test_sum_all_null(self):
        a = pa.array([None, None], type=pa.int64())
        assert ac.sum(a).as_py() is None
        assert pc.sum(a).as_py() is None

    def test_sum_types(self):
        for t, at in [(pa.int32(), a1t.int32), (pa.uint16(), a1t.uint16),
                      (pa.float32(), a1t.float32)]:
            a = pa.array([1, 2, 3], type=t)
            got, exp = ac.sum(a), pc.sum(a)
            assert got.as_py() == exp.as_py()

    def test_mean(self):
        assert ac.mean(self.A_INT).as_py() == pytest.approx(
            pc.mean(self.A_INT).as_py())

    def test_min_max(self):
        got = ac.min_max(self.A_INT)
        exp = pc.min_max(self.A_INT)
        assert got["min"].to_numpy()[0] == exp["min"].as_py()
        assert got["max"].to_numpy()[0] == exp["max"].as_py()

    def test_min_max_strings(self):
        a = pa.array(["pear", "apple", None, "zebra"])
        got = ac.min_max(a)
        exp = pc.min_max(a)
        assert got["min"].to_numpy()[0] == exp["min"].as_py()
        assert got["max"].to_numpy()[0] == exp["max"].as_py()

    def test_any_all(self):
        a = pa.array([True, None, False])
        assert ac.any(a).as_py() == pc.any(a).as_py()
        assert ac.all(a).as_py() == pc.all(a).as_py()

    def test_variance_stddev(self):
        for ddof in (0, 1):
            got = ac.variance(self.A_INT, ddof=ddof)
            exp = pc.variance(self.A_INT, ddof=ddof)
            assert got.as_py() == pytest.approx(exp.as_py())
            got = ac.stddev(self.A_INT, ddof=ddof)
            exp = pc.stddev(self.A_INT, ddof=ddof)
            assert got.as_py() == pytest.approx(exp.as_py())

    @pytest.mark.parametrize("interp", ["linear", "lower", "higher",
                                        "nearest", "midpoint"])
    def test_quantile(self, interp):
        a = pa.array([1, 9, 2, None, 7, 4], type=pa.int64())
        got = ac.quantile(a, q=[0.25, 0.5, 0.75], interpolation=interp)
        exp = pc.quantile(a, q=[0.25, 0.5, 0.75], interpolation=interp)
        assert_column_equal(got, exp, check_dtype=False, approx=True)

    def test_mode(self):
        a = pa.array([3, 1, 3, None, 1, 3], type=pa.int64())
        got = ac.mode(a)
        exp = pc.mode(a)
        assert got["mode"].to_numpy().tolist() == [
            s["mode"] for s in exp.to_pylist()]
        assert got["count"].to_numpy().tolist() == [
            s["count"] for s in exp.to_pylist()]

    def test_mode_ties(self):
        a = pa.array([5, 5, 2, 2, 9], type=pa.int64())
        got = ac.mode(a, n=2)
        exp = pc.mode(a, n=2)
        assert got["mode"].to_numpy().tolist() == [
            s["mode"] for s in exp.to_pylist()]

    def test_index(self):
        a = pa.array([4, 7, None, 7], type=pa.int64())
        assert ac.index(a, 7).as_py() == pc.index(a, pa.scalar(7)).as_py()
        assert ac.index(a, 99).as_py() == pc.index(a, pa.scalar(99)).as_py()

    def test_random_agg_parity(self):
        gen = RandomDataGenerator(17)
        a = gen.numeric(2000, a1t.int64, null_probability=0.2,
                        low=-1000, high=1000)
        assert ac.sum(a).as_py() == pc.sum(a).as_py()
        assert ac.count(a).as_py() == pc.count(a).as_py()
        assert ac.mean(a).as_py() == pytest.approx(pc.mean(a).as_py())
        got, exp = ac.min_max(a), pc.min_max(a)
        assert got["min"].to_numpy()[0] == exp["min"].as_py()
        assert got["max"].to_numpy()[0] == exp["max"].as_py()


class TestRegistryRound2:
    """The round-2 kernel batches: bitwise, cumulative, conditional,
    misc vector ops — differential vs pyarrow."""

    def test_bitwise_and_shifts(self):
        a = pa.array([5, -3, 255, None], type=pa.int32())
        b = pa.array([3, 1, 8, 2], type=pa.int32())
        for fn in ("bit_wise_and", "bit_wise_or", "bit_wise_xor",
                   "shift_left", "shift_right"):
            got = a1t.call_function(
                fn, [a1t.column(a), a1t.column(b)]).to_arrow().to_pylist()
            assert got == getattr(pc, fn)(a, b).to_pylist(), fn
        with pytest.raises(Exception):
            a1t.call_function("shift_left_checked",
                              [a1t.column(pa.array([1], type=pa.int32())),
                               a1t.column(pa.array([33], type=pa.int32()))])

    def test_cumulative_family(self):
        a = pa.array([1, 2, None, 4], type=pa.int64())
        for fn, kw in [("cumulative_sum", {}),
                       ("cumulative_sum", {"skip_nulls": True}),
                       ("cumulative_sum", {"start": 10}),
                       ("cumulative_prod", {"skip_nulls": True}),
                       ("cumulative_min", {"skip_nulls": True}),
                       ("cumulative_max", {}),
                       ("pairwise_diff", {}),
                       ("pairwise_diff", {"period": -1}),
                       ("fill_null_forward", {}),
                       ("fill_null_backward", {})]:
            got = a1t.call_function(fn, [a1t.column(a)],
                                    **kw).to_arrow().to_pylist()
            assert got == getattr(pc, fn)(a, **kw).to_pylist(), (fn, kw)

    def test_conditional(self):
        from arrow1_tpu.table import RecordBatch

        a = pa.array([1, None, 3], type=pa.int64())
        b = pa.array([10, 20, None], type=pa.int64())
        cond = pa.array([True, False, None])
        got = a1t.call_function(
            "case_when",
            [RecordBatch((a1t.column(cond),), ("c",)), a1t.column(a),
             a1t.column(b)]).to_arrow().to_pylist()
        exp = pc.case_when(pa.StructArray.from_arrays([cond], ["c"]),
                           a, b).to_pylist()
        assert got == exp
        got = a1t.call_function(
            "choose", [a1t.column(pa.array([0, 1, 0], type=pa.int64())),
                       a1t.column(a), a1t.column(b)]).to_arrow().to_pylist()
        assert got == pc.choose(pa.array([0, 1, 0], type=pa.int64()),
                                a, b).to_pylist()

    def test_rank_variants_and_select_k(self):
        d = pa.array([2.0, 1.0, 2.0, None])
        for fn in ("rank_quantile", "rank_normal"):
            got = a1t.call_function(fn, [a1t.column(d)]).to_numpy()
            exp = np.asarray(getattr(pc, fn)(d).to_pylist())
            np.testing.assert_allclose(got, exp, rtol=1e-12)
        v = pa.array([5, 1, 4, 2], type=pa.int64())
        got = a1t.call_function("select_k_unstable", [a1t.column(v)], k=2,
                                sort_keys=[("x", "ascending")]).to_numpy()
        assert sorted(np.asarray(v)[got.astype(int)].tolist()) == [1, 2]

    def test_run_end_roundtrip_and_scatter(self):
        src = pa.array([1, 1, 2, 2, 2, None, None, 3])
        enc = a1t.call_function("run_end_encode", [a1t.column(src)])
        assert enc["run_ends"].to_numpy().tolist() == [2, 5, 7, 8]
        dec = a1t.call_function("run_end_decode", [enc])
        assert dec.to_arrow().to_pylist() == src.to_pylist()
        got = a1t.call_function(
            "scatter", [a1t.column(pa.array([10, 20, 30])),
                        a1t.column(pa.array([2, 0, 1], type=pa.int64()))],
            max_index=4).to_arrow().to_pylist()
        assert got == pc.scatter(pa.array([10, 20, 30]),
                                 pa.array([2, 0, 1], type=pa.int64()),
                                 max_index=4).to_pylist()

    def test_pivot_wider(self):
        got = a1t.call_function(
            "pivot_wider", [a1t.column(pa.array(["w", "h"])),
                            a1t.column(pa.array([1.0, 2.0]))],
            key_names=("w", "h"))
        assert got["w"].to_numpy().tolist() == [1.0]
        assert got["h"].to_numpy().tolist() == [2.0]
        got = a1t.call_function(
            "hash_pivot_wider",
            [a1t.column(pa.array(["w", "h", "w"])),
             a1t.column(pa.array([1.0, 2.0, 3.0])),
             a1t.column(np.array([0, 0, 1], dtype=np.int32))],
            key_names=("w", "h"))
        assert got["w"].to_numpy().tolist() == [1.0, 3.0]
        assert got["h"].to_arrow().to_pylist() == [2.0, None]

    def test_registry_coverage_vs_pyarrow(self):
        """Every pyarrow compute function is registered (306/306)."""
        ours = set(a1t.list_functions())
        theirs = set(pc.list_functions())
        assert theirs - ours == set(), sorted(theirs - ours)

    def test_set_lookup_meta_binary(self):
        """Binary-arg is_in/index_in forms; value set as 2nd argument
        (reference: scalar_set_lookup.cc IsInMetaBinary)."""
        for arr, vs in [
            (pa.array([1, 2, 3, None]), pa.array([2, 3])),
            (pa.array([1, 2, None]), pa.array([2, None])),
            (pa.array(["a", "b", None]), pa.array(["b", None, "c"])),
        ]:
            for fn in ("is_in_meta_binary", "index_in_meta_binary"):
                want = pc.call_function(fn, [arr, vs]).to_pylist()
                got = a1t.call_function(
                    fn, [a1t.column(arr), a1t.column(vs)]
                ).to_arrow().to_pylist()
                assert got == want, (fn, got, want)
