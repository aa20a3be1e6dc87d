"""Decimal128 two-limb arithmetic parity vs pyarrow."""

from decimal import Decimal

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
