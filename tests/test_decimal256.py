"""Decimal256 arithmetic (arrow1_tpu/ops/decimal256.py).

Oracle: python Decimal exact math + pyarrow decimal256 semantics.
Reference: util/basic_decimal.{h,cc} BasicDecimal256; promotion rules
from compute/kernels/scalar_arithmetic.cc (cap 76).
"""

from decimal import Context, Decimal

import pyarrow as pa
import pytest

# python Decimal's default 28-digit context would round the oracles
C80 = Context(prec=80)

import arrow1_tpu as a1t
import arrow1_tpu.compute as ac
from arrow1_tpu import dtypes as dt


def dcol(values, precision=60, scale=4):
    return a1t.column(pa.array(
        [None if v is None else Decimal(v) for v in values],
        type=pa.decimal256(precision, scale)))


BIG = "12345678901234567890123456789012345.6789"   # > 128 bits unscaled


class TestAddSub:
    def test_add_beyond_128_bits(self):
        a = dcol([BIG, "1.0000", None])
        b = dcol(["0.0001", "2.5000", "3.0000"])
        out = ac.add(a, b)
        got = out.to_arrow().to_pylist()
        assert got[0] == C80.add(Decimal(BIG), Decimal("0.0001"))
        assert got[1] == Decimal("3.5")
        assert got[2] is None

    def test_subtract_negative_result(self):
        a = dcol(["1.0000"])
        b = dcol([BIG])
        out = ac.subtract(a, b)
        assert out.to_arrow().to_pylist()[0] == \
            C80.subtract(Decimal("1.0000"), Decimal(BIG))

    def test_mixed_scale_rescale(self):
        a = dcol(["1.50"], precision=50, scale=2)
        b = dcol(["0.2500"], precision=50, scale=4)
        out = ac.add(a, b)
        assert out.to_arrow().to_pylist()[0] == Decimal("1.75")
        assert out.dtype.scale == 4

    def test_negate(self):
        a = dcol([BIG, "-2.0000"])
        out = ac.negate(a)
        assert out.to_arrow().to_pylist() == [
            Decimal(BIG).copy_negate(), Decimal("2.0000")]


class TestMultiply:
    def test_exact_wide_product(self):
        x = Decimal("123456789012345678.9012")
        y = Decimal("987654321098765432.1098")
        a = dcol([str(x)], precision=40, scale=4)
        b = dcol([str(y)], precision=40, scale=4)
        out = ac.multiply(a, b)
        assert out.to_arrow().to_pylist()[0] == C80.multiply(x, y)
        assert out.dtype.scale == 8

    def test_signs(self):
        a = dcol(["-2.0000"])
        b = dcol(["3.0000"])
        assert ac.multiply(a, b).to_arrow().to_pylist()[0] == \
            Decimal("-6")


class TestDivide:
    def test_truncated_quotient(self):
        a = dcol(["7.0000"], precision=40, scale=4)
        b = dcol(["3.0000"], precision=40, scale=4)
        out = ac.divide(a, b)
        got = out.to_arrow().to_pylist()[0]
        # reference scale: max(4, 4+40-4+1) = 41 fractional digits of 7/3
        assert str(got).startswith("2.33333333333333333333")

    def test_wide_dividend(self):
        a = dcol([BIG], precision=60, scale=4)
        b = dcol(["2.0000"], precision=10, scale=4)
        out = ac.divide(a, b)
        got = out.to_arrow().to_pylist()[0]
        expect = C80.divide(Decimal(BIG), Decimal(2))
        assert abs(got - expect) < Decimal("1e-10")

    def test_divide_by_zero_raises(self):
        a = dcol(["1.0000"], precision=20, scale=4)
        b = dcol(["0.0000"], precision=20, scale=4)
        with pytest.raises(Exception, match="[Dd]ivide by zero"):
            ac.divide(a, b)

    def test_null_divisor_zero_is_dead(self):
        a = dcol(["1.0000", "4.0000"], precision=20, scale=4)
        b = a1t.column(pa.array([None, Decimal("2.0000")],
                                type=pa.decimal256(20, 4)))
        out = ac.divide(a, b)
        got = out.to_arrow().to_pylist()
        assert got[0] is None
        assert got[1] == Decimal("2")


class TestCompare:
    def test_all_ops_beyond_128_bits(self):
        a = dcol([BIG, "1.0000", "-5.0000"])
        b = dcol(["1.0000", "1.0000", BIG])
        assert ac.greater(a, b).to_arrow().to_pylist() == \
            [True, False, False]
        assert ac.equal(a, b).to_arrow().to_pylist() == \
            [False, True, False]
        assert ac.less_equal(a, b).to_arrow().to_pylist() == \
            [False, True, True]

    def test_mixed_128_256(self):
        a = dcol(["2.0000"])
        b = a1t.column(pa.array([Decimal("2.0000")],
                                type=pa.decimal128(20, 4)))
        assert ac.equal(a, b).to_arrow().to_pylist() == [True]
        out = ac.add(a, b)
        assert out.to_arrow().to_pylist() == [Decimal("4.0000")]
        assert out.dtype.kind == "decimal256"


class TestAggregates:
    def test_min_max_vs_pyarrow(self):
        import pyarrow.compute as pc

        vals = [Decimal(BIG), Decimal("1.0000"), None,
                Decimal("-99999999999999999999999999.0001")]
        arr = pa.array(vals, type=pa.decimal256(60, 4))
        mm = ac.min_max(a1t.column(arr))
        oracle = pc.min_max(arr)
        assert mm.column("min").to_arrow().to_pylist()[0] == \
            oracle["min"].as_py()
        assert mm.column("max").to_arrow().to_pylist()[0] == \
            oracle["max"].as_py()


class TestCast:
    def test_to_float(self):
        a = dcol(["-1234.5678", "0.0001"])
        out = ac.cast(a, a1t.float64)
        vals = out.to_numpy()
        assert abs(vals[0] + 1234.5678) < 1e-9
        assert abs(vals[1] - 0.0001) < 1e-12


class TestDecimalGroupedAggregates:
    """decimal128 grouped sum/min/max (two-limb exact, groupby.py
    _grouped_seg_decimal) vs the pyarrow oracle."""

    def test_parity_fuzz(self):
        import numpy as np

        import arrow1_tpu as a1t

        rng = np.random.default_rng(0)
        ctx = C80
        n = 400
        vals = [None if rng.random() < 0.15 else
                Decimal(int(rng.integers(-(10**18), 10**18))
                        * int(rng.integers(1, 50))).scaleb(-2, ctx)
                for _ in range(n)]
        k = rng.integers(0, 7, n)
        t = pa.table({"k": pa.array(k),
                      "d": pa.array(vals, pa.decimal128(38, 2))})
        batch = a1t.record_batch(pa.record_batch(
            {"k": pa.array(k), "d": pa.array(vals, pa.decimal128(38, 2))}))
        ours = a1t.group_by(batch, ["k"],
                            [("d", "sum"), ("d", "min"),
                             ("d", "max")]).to_arrow()
        oracle = t.group_by("k", use_threads=False).aggregate(
            [("d", "sum"), ("d", "min"), ("d", "max")])
        od = {r["k"]: r for r in oracle.to_pylist()}
        ud = {r["k"]: r for r in ours.to_pylist()}
        for key in od:
            for f in ("d_sum", "d_min", "d_max"):
                assert ud[key][f] == od[key][f], (key, f)

    def test_all_null_group(self):
        import arrow1_tpu as a1t

        vals = [None, None, Decimal("1.00")]
        b = a1t.record_batch(pa.record_batch(
            {"k": pa.array([1, 1, 2]),
             "d": pa.array(vals, pa.decimal128(38, 2))}))
        got = a1t.group_by(b, ["k"], [("d", "sum"),
                                      ("d", "max")]).to_arrow().to_pylist()
        by_k = {r["k"]: r for r in got}
        assert by_k[1]["d_sum"] is None and by_k[1]["d_max"] is None
        assert by_k[2]["d_sum"] == Decimal("1.00")

    def test_decimal256_grouped(self):
        import numpy as np

        import arrow1_tpu as a1t

        rng = np.random.default_rng(1)
        n = 200
        vals = [None if rng.random() < 0.15 else
                (Decimal(int(rng.integers(-(10**18), 10**18)))
                 * Decimal(10) ** int(rng.integers(0, 20))
                 ).scaleb(-2, C80) for _ in range(n)]
        k = rng.integers(0, 5, n)
        t = pa.table({"k": pa.array(k),
                      "d": pa.array(vals, pa.decimal256(70, 2))})
        batch = a1t.record_batch(pa.record_batch(
            {"k": pa.array(k),
             "d": pa.array(vals, pa.decimal256(70, 2))}))
        ours = a1t.group_by(batch, ["k"],
                            [("d", "sum"), ("d", "min"),
                             ("d", "max")]).to_arrow()
        oracle = t.group_by("k", use_threads=False).aggregate(
            [("d", "sum"), ("d", "min"), ("d", "max")])
        od = {r["k"]: r for r in oracle.to_pylist()}
        ud = {r["k"]: r for r in ours.to_pylist()}
        for key in od:
            for f in ("d_sum", "d_min", "d_max"):
                assert ud[key][f] == od[key][f], (key, f)


class TestScalarDecimalAggregates:
    def test_sum_mean_product_parity(self):
        import numpy as np

        import pyarrow.compute as pc

        rng = np.random.default_rng(7)
        vals = [None if rng.random() < 0.15 else
                Decimal(int(rng.integers(-(10**17), 10**17))
                        ).scaleb(-2, C80) for _ in range(150)]
        if all(v is None for v in vals):
            vals[0] = Decimal("1.00")
        arr = pa.array(vals, pa.decimal128(38, 2))
        col = a1t.column(arr)
        assert ac.sum(col).as_py() == pc.sum(arr).as_py()
        assert ac.mean(col).as_py() == pc.mean(arr).as_py()
        small = pa.array([Decimal("2.49"), Decimal("-8.76"),
                          Decimal("0.55"), Decimal("-3.50")],
                         pa.decimal128(38, 2))
        assert ac.product(a1t.column(small)).as_py() == \
            pc.product(small).as_py()

    def test_decimal256_sum_mean(self):
        import pyarrow.compute as pc

        arr = pa.array([Decimal(BIG.replace(".6789", ".67")),
                        Decimal("0.01")], pa.decimal256(60, 2))
        col = a1t.column(arr)
        assert ac.sum(col).as_py() == pc.sum(arr).as_py()
        assert ac.mean(col).as_py() == pc.mean(arr).as_py()

    def test_product_overflow_raises(self):
        big = pa.array([Decimal("9" * 30 + ".00")] * 4,
                       pa.decimal128(38, 2))
        with pytest.raises(Exception, match="overflow"):
            ac.product(a1t.column(big))

    def test_variance_quantile_index(self):
        import pyarrow.compute as pc

        arr = pa.array([Decimal("1.00"), Decimal("2.00"),
                        Decimal("4.00")], pa.decimal128(38, 2))
        col = a1t.column(arr)
        assert abs(ac.variance(col).as_py()
                   - pc.variance(arr).as_py()) < 1e-12
        assert abs(ac.stddev(col).as_py()
                   - pc.stddev(arr).as_py()) < 1e-12
        assert ac.quantile(col).to_arrow().to_pylist() == \
            pc.quantile(arr).to_pylist()
        assert ac.index(col,
                        a1t.scalar(Decimal("2.00"),
                                   col.dtype)).as_py() == 1


class TestDecimalUnaryOps:
    def test_abs_sign_round(self):
        import pyarrow.compute as pc

        big = Decimal("92233720368547758.08")
        arr = pa.array([big, -big, Decimal("0.00"), Decimal("-1.00"),
                        None], pa.decimal128(38, 2))
        col = a1t.column(arr)
        assert ac.abs(col).to_arrow().to_pylist() == \
            pc.abs(arr).to_pylist()
        assert ac.sign(col).to_arrow().to_pylist() == \
            pc.sign(arr).to_pylist()
        ties = pa.array([Decimal("1.500"), Decimal("-1.500"),
                         Decimal("2.500"), Decimal("-2.500")],
                        pa.decimal128(38, 3))
        tc = a1t.column(ties)
        # all modes except half_to_odd (pyarrow's decimal kernel
        # disagrees with its own float kernel on negative ties)
        for mode in ("half_to_even", "half_towards_infinity",
                     "half_towards_zero", "half_up", "half_down",
                     "towards_zero", "towards_infinity", "up", "down"):
            got = ac.round(tc, ndigits=0,
                           round_mode=mode).to_arrow().to_pylist()
            want = pc.round(ties, ndigits=0,
                            round_mode=mode).to_pylist()
            assert got == want, mode
        # half_to_odd follows the float semantics (the odd neighbor)
        got = ac.round(tc, ndigits=0,
                       round_mode="half_to_odd").to_arrow().to_pylist()
        assert got == [Decimal("1.000"), Decimal("-1.000"),
                       Decimal("3.000"), Decimal("-3.000")]

    def test_select_family_fuzz(self):
        import numpy as np

        import pyarrow.compute as pc

        rng = np.random.default_rng(4)

        def mk(n, width):
            t = (pa.decimal128(38, 2) if width == 128
                 else pa.decimal256(60, 2))
            vals = [None if rng.random() < 0.3 else
                    Decimal(int(rng.integers(-(10**18), 10**18))
                            * int(rng.integers(1, 9))).scaleb(-2, C80)
                    for _ in range(n)]
            return pa.array(vals, t)

        for width in (128, 256):
            a, b = mk(50, width), mk(50, width)
            ca, cb = a1t.column(a), a1t.column(b)
            cond = pa.array(rng.random(50) < 0.5)
            assert (ac.if_else(a1t.column(cond), ca, cb).to_arrow()
                    .to_pylist() == pc.if_else(cond, a, b).to_pylist())
            assert (ac.coalesce(ca, cb).to_arrow().to_pylist()
                    == pc.coalesce(a, b).to_pylist())
            assert (ac.max_element_wise(ca, cb).to_arrow().to_pylist()
                    == pc.max_element_wise(a, b).to_pylist())
            assert (ac.min_element_wise(ca, cb).to_arrow().to_pylist()
                    == pc.min_element_wise(a, b).to_pylist())
            assert (ac.fill_null(ca, a1t.scalar(Decimal("9.99"),
                                                ca.dtype))
                    .to_arrow().to_pylist()
                    == pc.fill_null(a, pa.scalar(
                        Decimal("9.99"), a.type)).to_pylist())

    def test_case_when_and_set_lookup(self):
        import pyarrow.compute as pc

        x = int(Decimal("1.00").scaleb(2))
        d1 = Decimal(x).scaleb(-2)
        d2 = Decimal(x + (1 << 64)).scaleb(-2)
        arr = pa.array([d1, d2, None], pa.decimal128(38, 2))
        vs = pa.array([d2, d1], pa.decimal128(38, 2))
        col = a1t.column(arr)
        assert (ac.is_in(col, value_set=a1t.column(vs)).to_arrow()
                .to_pylist() == pc.is_in(arr, value_set=vs).to_pylist())
        assert (ac.index_in(col, value_set=a1t.column(vs)).to_arrow()
                .to_pylist() == pc.index_in(arr,
                                            value_set=vs).to_pylist())
        cond = pa.array([True, False, None])
        b = pa.array([Decimal("2.00"), d2, None], pa.decimal128(38, 2))
        got = ac.case_when(a1t.record_batch({"c": cond}), col,
                           a1t.column(b)).to_arrow().to_pylist()
        want = pc.case_when(pc.make_struct(cond), arr, b).to_pylist()
        assert got == want

    def test_cast_family(self):
        import pyarrow.compute as pc

        big = Decimal("92233720368547758.08")
        arr = pa.array([big, Decimal("-1.50"), None],
                       pa.decimal128(38, 2))
        col = a1t.column(arr)
        assert (ac.cast(col, dt.decimal128(38, 4)).to_arrow().to_pylist()
                == pc.cast(arr, pa.decimal128(38, 4)).to_pylist())
        assert (ac.cast(col, dt.decimal256(60, 2)).to_arrow().to_pylist()
                == pc.cast(arr, pa.decimal256(60, 2)).to_pylist())
        c = pa.array([Decimal("5.00"), Decimal("-3.00")],
                     pa.decimal128(38, 2))
        assert (ac.cast(a1t.column(c), dt.int64).to_arrow().to_pylist()
                == pc.cast(c, pa.int64()).to_pylist())
        d = pa.array([Decimal("1.25")], pa.decimal128(38, 2))
        with pytest.raises(Exception, match="loss"):
            ac.cast(a1t.column(d), dt.decimal128(38, 1))
        assert (ac.cast(a1t.column(d), dt.decimal128(38, 1), safe=False)
                .to_arrow().to_pylist()
                == pc.cast(d, pa.decimal128(38, 1), safe=False)
                .to_pylist())
        with pytest.raises(Exception, match="Precision"):
            ac.cast(a1t.column(pa.array([5])), dt.decimal128(20, 2))
        f = pa.array([1.255, -2.5, None])
        assert (ac.cast(a1t.column(f), dt.decimal128(20, 2)).to_arrow()
                .to_pylist()
                == pc.cast(f, pa.decimal128(20, 2)).to_pylist())

    def test_review_fix_regressions(self):
        """Round-3 review findings: scalar scale rescale in fill_null,
        mixed-scale element-wise, finer-scale set members, scalar
        cases/conditions, float->decimal guards, grouped mean."""
        import numpy as np

        import pyarrow.compute as pc

        col = a1t.column(pa.array([Decimal("1.0000"), None],
                                  pa.decimal128(38, 4)))
        assert (ac.fill_null(col, a1t.scalar(Decimal("9.99"))).to_arrow()
                .to_pylist() == [Decimal("1.0000"), Decimal("9.9900")])
        a = pa.array([Decimal("1.00")], pa.decimal128(38, 2))
        b = pa.array([Decimal("2.0000")], pa.decimal128(38, 4))
        assert (ac.max_element_wise(a1t.column(a), a1t.column(b))
                .to_arrow().to_pylist() == [Decimal("2.0000")])
        assert (ac.is_in(a1t.column(a), value_set=[Decimal("1.005")])
                .to_arrow().to_pylist() == [False])
        c1 = a1t.column(pa.array([Decimal("5.00"), Decimal("6.00")],
                                 pa.decimal128(38, 2)))
        sc = a1t.scalar(Decimal("7.00"), dt.decimal128(38, 2))
        cond = pa.array([True, False])
        got = ac.case_when(a1t.record_batch({"c": cond}), c1,
                           sc).to_arrow().to_pylist()
        assert got == [Decimal("5.00"), Decimal("7.00")]
        assert (ac.if_else(a1t.scalar(True), c1, c1).to_arrow()
                .to_pylist() == [Decimal("5.00"), Decimal("6.00")])
        with pytest.raises(Exception, match="representable"):
            ac.cast(a1t.column(pa.array([1e30])), dt.decimal128(38, 0))
        assert (ac.cast(a1t.column(pa.array([2**63 + 10], pa.uint64())),
                        dt.decimal128(38, 0)).to_arrow().to_pylist()
                == [Decimal(2**63 + 10)])
        # grouped mean stays decimal and exact
        k = pa.array([1, 1, 2])
        d = pa.array([Decimal("1.00"), Decimal("2.00"), Decimal("5.00")],
                     pa.decimal128(38, 2))
        batch = a1t.record_batch(pa.record_batch({"k": k, "d": d}))
        got = a1t.group_by(batch, ["k"],
                           [("d", "mean")]).to_arrow().to_pylist()
        want = pa.table({"k": k, "d": d}).group_by(
            "k", use_threads=False).aggregate([("d", "mean")]).to_pylist()
        assert {r["k"]: r["d_mean"] for r in got} == \
            {r["k"]: r["d_mean"] for r in want}
