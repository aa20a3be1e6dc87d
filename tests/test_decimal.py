"""Decimal128 two-limb arithmetic parity vs pyarrow."""

from decimal import Decimal

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

import arrow1_tpu as a1t
import arrow1_tpu.compute as ac


def dec_array(vals, precision=20, scale=2):
    return pa.array([None if v is None else Decimal(v) for v in vals],
                    type=pa.decimal128(precision, scale))


class TestDecimal:
    A = dec_array(["1.25", "-3.50", None, "99999999999999.99"])
    B = dec_array(["0.75", "1.25", "2.00", "0.01"])

    def test_roundtrip(self):
        col = a1t.column(self.A)
        assert col.dtype.kind == "decimal128"
        back = col.to_arrow()
        assert back.cast(pa.decimal128(20, 2)).to_pylist() == \
            self.A.to_pylist()

    def test_add(self):
        got = ac.add(self.A, self.B)
        exp = pc.add(self.A, self.B)
        assert got.to_arrow().cast(exp.type).to_pylist() == exp.to_pylist()

    def test_subtract(self):
        got = ac.subtract(self.A, self.B)
        exp = pc.subtract(self.A, self.B)
        assert got.to_arrow().cast(exp.type).to_pylist() == exp.to_pylist()

    def test_mixed_scale_add(self):
        b1 = dec_array(["1.5", "2.5"], scale=1)
        b3 = dec_array(["0.125", "0.250"], precision=20, scale=3)
        got = ac.add(b1, b3)
        exp = pc.add(b1, b3)
        assert got.to_arrow().cast(exp.type).to_pylist() == exp.to_pylist()

    @pytest.mark.parametrize("op", ["equal", "not_equal", "less",
                                    "less_equal", "greater", "greater_equal"])
    def test_compare(self, op):
        got = getattr(ac, op)(self.A, self.B)
        exp = getattr(pc, op)(self.A, self.B)
        assert got.to_arrow().to_pylist() == exp.to_pylist()

    def test_negative_values_compare(self):
        a = dec_array(["-5.00", "-0.01", "3.00"])
        b = dec_array(["-4.99", "0.01", "-3.00"])
        got = ac.less(a, b)
        exp = pc.less(a, b)
        assert got.to_arrow().to_pylist() == exp.to_pylist()

    def test_cast_to_float(self):
        got = ac.cast(self.B, a1t.float64)
        exp = self.B.cast(pa.float64())
        assert got.to_arrow().to_pylist() == pytest.approx(exp.to_pylist())

    def test_sort_large_magnitudes(self):
        # values crossing the 64-bit limb boundary
        a = dec_array(["184467440737095516.15", "-184467440737095516.15",
                       "0.01", "-0.01"], precision=37, scale=2)
        got = ac.subtract(a, dec_array(["0.01"] * 4, precision=37, scale=2))
        exp = pc.subtract(a, dec_array(["0.01"] * 4, precision=37, scale=2))
        assert got.to_arrow().cast(exp.type).to_pylist() == exp.to_pylist()


class TestDecimalMulDiv:
    def _oracle(self, av, ta, bv, tb, op):
        a, b = pa.array(av, type=ta), pa.array(bv, type=tb)
        exp = getattr(pc, op)(a, b)
        got = a1t.call_function(op, [a1t.column(a), a1t.column(b)]).to_arrow()
        assert str(got.type) == str(exp.type)
        assert got.to_pylist() == exp.to_pylist()

    def test_multiply_promotion_and_values(self):
        self._oracle([Decimal("1.00"), Decimal("-2.50"), None],
                     pa.decimal128(10, 2),
                     [Decimal("3.000"), Decimal("0.500"), Decimal("1.000")],
                     pa.decimal128(10, 3), "multiply")

    def test_multiply_crosses_64bit_limb(self):
        self._oracle([Decimal("123456789012345.678")], pa.decimal128(18, 3),
                     [Decimal("9876543210.12")], pa.decimal128(12, 2),
                     "multiply")

    def test_divide_truncates_toward_zero(self):
        self._oracle([Decimal("2.00"), Decimal("-2.00"), Decimal("1.00")],
                     pa.decimal128(10, 2),
                     [Decimal("3.000"), Decimal("3.000"), Decimal("6.000")],
                     pa.decimal128(10, 3), "divide")

    def test_divide_by_zero_raises(self):
        a = a1t.column(pa.array([Decimal("1.0")], type=pa.decimal128(5, 1)))
        z = a1t.column(pa.array([Decimal("0.0")], type=pa.decimal128(5, 1)))
        with pytest.raises(Exception, match="[Dd]ivide by zero"):
            a1t.call_function("divide", [a, z])

    def test_null_divisor_row_is_dead(self):
        a = a1t.column(pa.array([Decimal("1.0"), Decimal("4.0")],
                                type=pa.decimal128(5, 1)))
        b = a1t.column(pa.array([None, Decimal("2.0")],
                                type=pa.decimal128(5, 1)))
        out = a1t.call_function("divide", [a, b]).to_arrow().to_pylist()
        assert out[0] is None and out[1] == Decimal("2.000000")

    def test_mixed_scale_addsub_promotion(self):
        self._oracle([Decimal("191452"), Decimal("-294433")],
                     pa.decimal128(6, 0),
                     [Decimal("0.22"), Decimal("-0.20")],
                     pa.decimal128(6, 2), "add")
        self._oracle([Decimal("191452"), Decimal("-294433")],
                     pa.decimal128(6, 0),
                     [Decimal("0.22"), Decimal("-0.20")],
                     pa.decimal128(6, 2), "subtract")

    def test_fuzz_all_ops(self):
        rng = np.random.default_rng(77)
        for _ in range(4):
            p1, s1 = int(rng.integers(3, 19)), int(rng.integers(0, 4))
            p2, s2 = int(rng.integers(3, 19)), int(rng.integers(0, 4))
            s1, s2 = min(s1, p1 - 1), min(s2, p2 - 1)
            hi1, hi2 = 10 ** min(p1 - s1, 17), 10 ** min(p2 - s2, 17)
            av = [Decimal(int(rng.integers(-hi1, hi1))).scaleb(-s1)
                  for _ in range(40)]
            bv = [Decimal(int(x)).scaleb(-s2)
                  for x in rng.integers(-hi2, hi2, 40) if x != 0][:30]
            av = av[:len(bv)]
            av[3] = None
            for op in ("multiply", "divide", "add", "subtract"):
                self._oracle(av, pa.decimal128(p1, s1), bv,
                             pa.decimal128(p2, s2), op)


class TestDecimalAsKey:
    D = dec_array(["2.50", "-1.75", None, "2.50", "0.00"],
                  precision=10, scale=2)

    def test_sort_both_orders(self):
        rb = pa.record_batch({"d": self.D, "v": pa.array([1, 2, 3, 4, 5])})
        b = a1t.record_batch(rb)
        for order in ("ascending", "descending"):
            got = a1t.query(b).order_by([("d", order)]) \
                .to_batch()["v"].to_numpy().tolist()
            exp = pa.Table.from_batches([rb]).sort_by(
                [("d", order)]).column("v").to_pylist()
            assert got == exp, order

    def test_group_by_decimal_key(self):
        rb = pa.record_batch({"d": self.D, "v": pa.array([1, 2, 3, 4, 5])})
        got = a1t.group_by(a1t.record_batch(rb), ["d"], [("v", "sum")])
        gd = {n: c.to_arrow().to_pylist() for n, c in zip(got.names,
                                                          got.columns)}
        exp = pa.Table.from_batches([rb]).group_by("d").aggregate(
            [("v", "sum")]).to_pydict()
        assert sorted(zip(map(str, gd["d"]), gd["v_sum"])) == \
            sorted(zip(map(str, exp["d"]), exp["v_sum"]))

    def test_unique_and_limb_crossing_sort(self):
        got = a1t.call_function("unique", [a1t.column(self.D)]) \
            .to_arrow().to_pylist()
        assert sorted(map(str, got)) == \
            sorted(map(str, pc.unique(self.D).to_pylist()))
        big = pa.array([Decimal("99999999999999999999999999.99"),
                        Decimal("-99999999999999999999999999.99"),
                        Decimal("1.00")], type=pa.decimal128(38, 2))
        rb = pa.record_batch({"d": big, "v": pa.array([1, 2, 3])})
        got = a1t.query(a1t.record_batch(rb)).order_by(
            [("d", "ascending")]).to_batch()["v"].to_numpy().tolist()
        assert got == [2, 3, 1]


class TestDecimalMinMax:
    """ADVICE r1: min/max must reduce over both limbs, not just the low
    one (reference: aggregate_basic.cc MinMax over Decimal128)."""

    BIG = dec_array(["92233720368547758.08", "1.00", None, "-5.25"])

    def test_min_max_crosses_limb(self):
        got = ac.min_max(self.BIG)
        exp = pc.min_max(self.BIG)
        assert got["min"].to_arrow().to_pylist()[0] == exp["min"].as_py()
        assert got["max"].to_arrow().to_pylist()[0] == exp["max"].as_py()

    def test_min_max_scalars(self):
        assert ac.min(self.BIG).as_py() == pc.min(self.BIG).as_py()
        assert ac.max(self.BIG).as_py() == pc.max(self.BIG).as_py()

    def test_min_max_negative_crossing(self):
        a = dec_array(["-92233720368547758.08", "-1.00", "0.02"])
        got = ac.min_max(a)
        exp = pc.min_max(a)
        assert got["min"].to_arrow().to_pylist()[0] == exp["min"].as_py()
        assert got["max"].to_arrow().to_pylist()[0] == exp["max"].as_py()

    def test_min_max_all_null(self):
        a = dec_array([None, None])
        got = ac.min_max(a)
        assert got["min"].to_arrow().to_pylist() == [None]


class TestDecimalJoinKeys:
    """ADVICE r1: full-outer join on a decimal key must coalesce both
    limbs; output must export cleanly."""

    def test_full_outer_decimal_key(self):
        import pyarrow as pa
        lk = dec_array(["92233720368547758.08", "1.00", "-2.50"])
        self._check(lk)

    def test_full_outer_decimal_key_with_null(self):
        # null on one side only: 2-vs-3 normalized key components (the
        # r1 zip-truncation bug paired mismatched limbs)
        import pyarrow as pa
        lk = dec_array(["92233720368547758.08", "1.00", None])
        self._check(lk)

    def _check(self, lk):
        import pyarrow as pa
        rk = dec_array(["1.00", "7.75", "92233720368547758.08"])
        lt = pa.table({"k": lk, "a": [1, 2, 3]})
        rt = pa.table({"k": rk, "b": [10, 20, 30]})
        got = a1t.table(lt).join(
            a1t.table(rt), keys="k", join_type="full outer")
        exp = lt.join(rt, keys="k", join_type="full outer")
        gl = sorted(got.to_arrow().to_pylist(),
                    key=lambda r: (str(r["k"]), str(r["a"])))
        el = sorted(exp.to_pylist(),
                    key=lambda r: (str(r["k"]), str(r["a"])))
        assert gl == el
