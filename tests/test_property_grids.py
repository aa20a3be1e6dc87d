"""Systematic type x null-density x selectivity grids.

Mirrors the reference's exhaustive kernel matrices
(vector_selection_test.cc: 56 TESTs across every type; vector_sort_test.cc:
62 TESTs): random data, every supported dtype, multiple null densities,
exact parity vs pyarrow.compute. Plus math-kernel parity.
"""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

import arrow1_tpu as a1t
import arrow1_tpu.compute as ac
from arrow1_tpu.testing import RandomDataGenerator, assert_equals_arrow

NUMERIC_TYPES = [a1t.int8, a1t.int16, a1t.int32, a1t.int64,
                 a1t.uint8, a1t.uint16, a1t.uint32, a1t.uint64,
                 a1t.float32, a1t.float64]
NULLS = [0.0, 0.2, 0.9]


def gen_col(gen, t, n, null_p):
    if t is None:
        return gen.strings(n, num_unique=20, null_probability=null_p)
    return gen.numeric(n, t, null_probability=null_p)


class TestFilterGrid:
    @pytest.mark.parametrize("t", NUMERIC_TYPES + [None],
                             ids=[x.kind for x in NUMERIC_TYPES] + ["string"])
    @pytest.mark.parametrize("null_p", NULLS)
    def test_filter(self, t, null_p):
        gen = RandomDataGenerator(hash((str(t), null_p)) % 2**31)
        a = gen_col(gen, t, 200, null_p)
        m = gen.numeric(200, a1t.bool_, null_probability=null_p)
        for sel in ("drop", "emit_null"):
            got = ac.filter(a, m, null_selection_behavior=sel)
            exp = pc.filter(a, m, null_selection_behavior=sel)
            if t is None:
                assert got.to_numpy().tolist() == exp.to_pylist()
            else:
                assert_equals_arrow(got, exp)


class TestTakeGrid:
    @pytest.mark.parametrize("t", NUMERIC_TYPES + [None],
                             ids=[x.kind for x in NUMERIC_TYPES] + ["string"])
    @pytest.mark.parametrize("null_p", [0.0, 0.3])
    def test_take(self, t, null_p):
        gen = RandomDataGenerator(hash((str(t), null_p, "take")) % 2**31)
        a = gen_col(gen, t, 150, null_p)
        idx = pa.array(gen.rng.integers(0, 150, 80).astype(np.int32))
        got = ac.take(a, idx)
        exp = pc.take(a, idx)
        if t is None:
            assert got.to_numpy().tolist() == exp.to_pylist()
        else:
            assert_equals_arrow(got, exp)


class TestSortGrid:
    @pytest.mark.parametrize("t", NUMERIC_TYPES + [None],
                             ids=[x.kind for x in NUMERIC_TYPES] + ["string"])
    @pytest.mark.parametrize("null_p", NULLS)
    @pytest.mark.parametrize("order", ["ascending", "descending"])
    def test_sort(self, t, null_p, order):
        gen = RandomDataGenerator(hash((str(t), null_p, order)) % 2**31)
        a = gen_col(gen, t, 150, null_p)
        got = ac.array_sort_indices(a, order=order)
        exp = pc.array_sort_indices(a, order=order)
        assert_equals_arrow(got, exp)


class TestUniqueGrid:
    @pytest.mark.parametrize("t", [a1t.int8, a1t.int64, a1t.float64, None],
                             ids=["int8", "int64", "float64", "string"])
    def test_unique_and_counts(self, t):
        gen = RandomDataGenerator(hash((str(t), "u")) % 2**31)
        if t is None:
            a = gen.strings(300, num_unique=12, null_probability=0.1)
        else:
            a = gen.numeric(300, t, null_probability=0.1,
                            low=0, high=15) if t.is_integer else \
                pa.array(gen.rng.choice([1.5, 2.5, np.nan, 7.0], 300))
        got = ac.unique(a)
        exp = pc.unique(a)
        if t is None:
            assert got.to_numpy().tolist() == exp.to_pylist()
        else:
            assert_equals_arrow(got, exp)


class TestMathParity:
    X = pa.array([0.5, 2.0, None, 9.0, 0.1])

    @pytest.mark.parametrize("name", ["ln", "log2", "log10", "log1p", "exp",
                                      "sqrt", "sin", "cos", "tan", "asin",
                                      "acos", "atan"])
    def test_unary(self, name):
        a = self.X if name not in ("asin", "acos") else \
            pa.array([0.5, -0.2, None, 0.9, 0.1])
        got = getattr(ac, name)(a)
        exp = getattr(pc, name)(a)
        assert_equals_arrow(got, exp, approx=True, rtol=1e-12)

    def test_int_promotes(self):
        a = pa.array([1, 2, None], type=pa.int64())
        got = ac.ln(a)
        exp = pc.ln(a)
        assert_equals_arrow(got, exp, approx=True, rtol=1e-12)

    def test_atan2(self):
        y = pa.array([1.0, -1.0, None])
        x = pa.array([1.0, -1.0, 2.0])
        assert_equals_arrow(ac.atan2(y, x), pc.atan2(y, x), approx=True)

    @pytest.mark.parametrize("name", ["floor", "ceil", "trunc"])
    def test_rounding_family(self, name):
        a = pa.array([1.5, -1.5, None, 2.7, -0.2])
        got = getattr(ac, name)(a)
        exp = getattr(pc, name)(a)
        # arrow returns float; ours too
        assert got.to_arrow().cast(pa.float64()).to_pylist() == \
            exp.cast(pa.float64()).to_pylist()

    def test_round_half_to_even(self):
        a = pa.array([0.5, 1.5, 2.5, -0.5, None, 2.675])
        got = ac.round(a)
        exp = pc.round(a)
        assert got.to_arrow().to_pylist() == exp.to_pylist()

    def test_round_ndigits(self):
        a = pa.array([1.2345, -9.8765, None])
        got = ac.round(a, ndigits=2)
        exp = pc.round(a, ndigits=2)
        g, e = got.to_arrow().to_pylist(), exp.to_pylist()
        for gi, ei in zip(g, e):
            assert gi == pytest.approx(ei, nan_ok=True)


class TestEdgeCases:
    def test_empty_column_ops(self):
        a = pa.array([], type=pa.int64())
        assert ac.add(a, a).length == 0
        assert ac.unique(a).length == 0
        assert ac.sum(a).as_py() is None
        assert ac.array_sort_indices(a).length == 0

    def test_empty_filter(self):
        a = pa.array([], type=pa.int64())
        m = pa.array([], type=pa.bool_())
        assert ac.filter(a, m).length == 0

    def test_empty_group_by(self):
        rb = a1t.record_batch(pa.record_batch(
            {"k": pa.array([], type=pa.int64()),
             "v": pa.array([], type=pa.int64())}))
        got = a1t.group_by(rb, ["k"], [("v", "sum")])
        assert got.num_rows == 0

    def test_single_row(self):
        rb = a1t.record_batch({"k": [1], "v": [10]})
        got = a1t.group_by(rb, ["k"], [("v", "sum")])
        assert got.num_rows == 1
        assert got["v_sum"].to_numpy()[0] == 10

    def test_all_null_column_sort(self):
        a = pa.array([None, None, None], type=pa.int64())
        assert_equals_arrow(ac.array_sort_indices(a),
                            pc.array_sort_indices(a))

    def test_join_empty_probe(self):
        left = a1t.record_batch(pa.record_batch(
            {"k": pa.array([], type=pa.int64()),
             "lv": pa.array([], type=pa.int64())}))
        right = a1t.record_batch({"k": [1, 2], "rv": [10, 20]})
        got = a1t.join(left, right, keys=["k"])
        assert got.num_rows == 0


class TestRound2KernelGrid:
    """New-kernel differential grid: dtypes x null-patterns vs pyarrow."""

    DTYPES = [pa.int32(), pa.int64(), pa.float64()]

    def _arr(self, t, seed, with_nulls=True):
        rng = np.random.default_rng(seed)
        n = 40
        if pa.types.is_floating(t):
            vals = rng.normal(scale=10, size=n).tolist()
        else:
            vals = rng.integers(-100, 100, n).tolist()
        if with_nulls:
            for i in rng.integers(0, n, 5):
                vals[int(i)] = None
        return pa.array(vals, type=t)

    def test_cumulative_grid(self):
        for t in self.DTYPES:
            for fn in ("cumulative_sum", "cumulative_min",
                       "cumulative_max", "cumulative_prod"):
                for skip in (True, False):
                    a = self._arr(t, hash((fn, str(t), skip)) % 2**31)
                    got = a1t.call_function(
                        fn, [a1t.column(a)],
                        skip_nulls=skip).to_arrow().to_pylist()
                    exp = getattr(pc, fn)(a, skip_nulls=skip).to_pylist()
                    if pa.types.is_floating(t):
                        for g, e in zip(got, exp):
                            assert (g is None) == (e is None)
                            if g is not None:
                                assert g == pytest.approx(e, rel=1e-12)
                    else:
                        # integer overflow wraps in both engines
                        assert got == exp, (fn, t, skip)

    def test_bitwise_grid(self):
        for t in (pa.int8(), pa.int16(), pa.int32(), pa.int64(),
                  pa.uint8(), pa.uint32()):
            rng = np.random.default_rng(hash(str(t)) % 2**31)
            info_bits = 8 * t.bit_width // 8
            a = pa.array(rng.integers(0, 100, 30).tolist(), type=t)
            b = pa.array(rng.integers(0, info_bits, 30).tolist(), type=t)
            for fn in ("bit_wise_and", "bit_wise_or", "bit_wise_xor",
                       "shift_left", "shift_right"):
                got = a1t.call_function(
                    fn, [a1t.column(a), a1t.column(b)]) \
                    .to_arrow().to_pylist()
                exp = getattr(pc, fn)(a, b).to_pylist()
                assert got == exp, (fn, t)

    def test_fill_null_directional_grid(self):
        for t in self.DTYPES + [pa.string()]:
            for seed in (1, 2):
                if pa.types.is_string(t):
                    rng = np.random.default_rng(seed)
                    vals = [None if rng.random() < 0.3
                            else str(rng.integers(0, 5)) for _ in range(30)]
                    a = pa.array(vals)
                else:
                    a = self._arr(t, seed)
                for fn in ("fill_null_forward", "fill_null_backward"):
                    got = a1t.call_function(
                        fn, [a1t.column(a)]).to_arrow().to_pylist()
                    assert got == getattr(pc, fn)(a).to_pylist(), (fn, t)

    def test_checked_math_domain_grid(self):
        ok = pa.array([0.5, 1.0, 0.1])
        for fn in ("ln_checked", "log10_checked", "sqrt_checked",
                    "asin_checked", "acos_checked"):
            got = a1t.call_function(fn, [a1t.column(ok)]).to_numpy()
            exp = np.asarray(getattr(pc, fn)(ok).to_pylist())
            np.testing.assert_allclose(got, exp, rtol=1e-13)
        for fn, bad in [("ln_checked", [0.0]), ("sqrt_checked", [-1.0]),
                        ("asin_checked", [1.5]), ("atanh_checked", [1.0])]:
            with pytest.raises(Exception):
                a1t.call_function(fn, [a1t.column(pa.array(bad))])

    def test_temporal_components_grid(self):
        import datetime as dtm

        rng = np.random.default_rng(9)
        base = dtm.datetime(1995, 1, 1)
        ts = pa.array([base + dtm.timedelta(
            days=int(d), seconds=int(s), microseconds=int(us))
            for d, s, us in zip(rng.integers(0, 15000, 60),
                                rng.integers(0, 86400, 60),
                                rng.integers(0, 10**6, 60))])
        for fn in ("quarter", "iso_week", "iso_year", "us_week", "us_year",
                   "is_leap_year", "week", "subsecond"):
            got = a1t.call_function(fn, [a1t.column(ts)]) \
                .to_arrow().to_pylist()
            assert got == getattr(pc, fn)(ts).to_pylist(), fn

    def test_temporal_rounding_grid(self):
        import datetime as dtm

        rng = np.random.default_rng(10)
        base = dtm.datetime(2001, 1, 1)
        ts = pa.array([base + dtm.timedelta(days=int(d), seconds=int(s))
                       for d, s in zip(rng.integers(-3000, 9000, 50),
                                       rng.integers(0, 86400, 50))])
        for fn in ("floor_temporal", "ceil_temporal", "round_temporal"):
            for kw in (dict(unit="hour"), dict(unit="day"),
                       dict(unit="week"), dict(unit="month"),
                       dict(unit="quarter"), dict(unit="year"),
                       dict(multiple=30, unit="minute")):
                got = a1t.call_function(fn, [a1t.column(ts)],
                                        **kw).to_arrow().to_pylist()
                assert got == getattr(pc, fn)(ts, **kw).to_pylist(), (fn, kw)
