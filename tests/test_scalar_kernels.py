"""Scalar kernel parity vs pyarrow.compute (oracle strategy: SURVEY.md §4.2).

Mirrors the declarative CheckScalarUnary/Binary pattern of the reference
(compute/kernels/test_util.h:93-117): inputs as literals or random arrays,
expected output computed by pyarrow.compute on CPU, compared exactly.
"""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

import arrow1_tpu as a1t
import arrow1_tpu.compute as ac
from arrow1_tpu.errors import Invalid
from arrow1_tpu.testing import RandomDataGenerator, assert_equals_arrow


def check_binary(name, a, b, **kwargs):
    got = getattr(ac, name)(a, b, **kwargs)
    expected = getattr(pc, name)(a, b, **kwargs)
    assert_equals_arrow(got, expected)


def check_unary(name, a, **kwargs):
    got = getattr(ac, name)(a, **kwargs)
    expected = getattr(pc, name)(a, **kwargs)
    assert_equals_arrow(got, expected)


INT_BIN = [
    pa.array([1, 2, None, 4], type=pa.int64()),
    pa.array([10, None, 30, 40], type=pa.int64()),
]
FLOAT_BIN = [
    pa.array([1.5, -2.0, None, 4.25]),
    pa.array([0.5, None, 3.0, -1.0]),
]


class TestArithmetic:
    @pytest.mark.parametrize("name", ["add", "subtract", "multiply"])
    def test_int_binary(self, name):
        check_binary(name, *INT_BIN)

    @pytest.mark.parametrize("name", ["add", "subtract", "multiply", "divide"])
    def test_float_binary(self, name):
        check_binary(name, *FLOAT_BIN)

    def test_int_divide_truncates(self):
        a = pa.array([7, -7, 9, None], type=pa.int64())
        b = pa.array([2, 2, -4, 3], type=pa.int64())
        check_binary("divide", a, b)

    def test_divide_by_zero_raises(self):
        with pytest.raises(Invalid):
            ac.divide(pa.array([1, 2]), pa.array([1, 0]))

    def test_divide_by_zero_null_slot_ok(self):
        # null slots do not raise (reference skips null slots)
        got = ac.divide(pa.array([1, None]), pa.array([1, 0]))
        assert got.to_arrow().to_pylist() == [1, None]

    def test_add_mixed_types_promotes(self):
        a = pa.array([1, 2, 3], type=pa.int32())
        b = pa.array([1, 2, 3], type=pa.int64())
        check_binary("add", a, b)

    def test_scalar_broadcast(self):
        a = pa.array([1, 2, None], type=pa.int64())
        got = ac.add(a, 10)
        expected = pc.add(a, pa.scalar(10))
        assert_equals_arrow(got, expected)

    def test_null_scalar_poisons(self):
        a = pa.array([1, 2, 3], type=pa.int64())
        got = ac.add(a, None)
        expected = pc.add(a, pa.scalar(None, type=pa.int64()))
        assert_equals_arrow(got, expected)

    def test_add_wraps_unchecked(self):
        a = pa.array([np.iinfo(np.int64).max], type=pa.int64())
        got = ac.add(a, pa.array([1], type=pa.int64()))
        assert got.to_numpy()[0] == np.iinfo(np.int64).min

    def test_add_checked_overflow_raises(self):
        a = pa.array([np.iinfo(np.int64).max], type=pa.int64())
        with pytest.raises(Invalid):
            ac.add_checked(a, pa.array([1], type=pa.int64()))

    @pytest.mark.parametrize("name", ["add_checked", "subtract_checked",
                                      "multiply_checked"])
    def test_checked_matches_when_no_overflow(self, name):
        check_binary(name, *INT_BIN)

    def test_multiply_checked_overflow(self):
        a = pa.array([1 << 40], type=pa.int64())
        b = pa.array([1 << 40], type=pa.int64())
        with pytest.raises(Invalid):
            ac.multiply_checked(a, b)

    def test_negate(self):
        check_unary("negate", pa.array([1, -2, None], type=pa.int64()))
        check_unary("negate", pa.array([1.5, -2.5, None]))

    def test_power(self):
        a = pa.array([2, 3, 4, None], type=pa.int64())
        b = pa.array([10, 0, 2, 3], type=pa.int64())
        check_binary("power", a, b)

    def test_power_float(self):
        # XLA pow differs from libm pow by ~1 ULP; row parity allows
        # ULP-bounded float compare (SURVEY.md §7 bit-exactness note)
        a, b = pa.array([2.0, 9.0]), pa.array([0.5, 0.5])
        got = ac.power(a, b)
        assert_equals_arrow(got, pc.power(a, b), approx=True, rtol=1e-14)

    def test_abs(self):
        check_unary("abs", pa.array([-5, 3, None], type=pa.int64()))

    def test_random_parity(self):
        gen = RandomDataGenerator(3)
        a = gen.numeric(1000, a1t.int64, null_probability=0.2,
                        low=-1 << 30, high=1 << 30)
        b = gen.numeric(1000, a1t.int64, null_probability=0.2,
                        low=-1 << 30, high=1 << 30)
        for name in ["add", "subtract", "multiply"]:
            check_binary(name, a, b)


class TestCompare:
    @pytest.mark.parametrize("name", ["equal", "not_equal", "greater",
                                      "greater_equal", "less", "less_equal"])
    def test_int(self, name):
        a = pa.array([1, 2, None, 4, 5], type=pa.int64())
        b = pa.array([5, 2, 3, None, 1], type=pa.int64())
        check_binary(name, a, b)

    @pytest.mark.parametrize("name", ["equal", "less"])
    def test_scalar(self, name):
        a = pa.array([1, 2, None, 4, 5], type=pa.int64())
        got = getattr(ac, name)(a, 3)
        expected = getattr(pc, name)(a, pa.scalar(3))
        assert_equals_arrow(got, expected)

    def test_mixed_width(self):
        a = pa.array([1, 2, 3], type=pa.int32())
        b = pa.array([2, 2, 2], type=pa.int64())
        check_binary("less", a, b)

    def test_string_equal_scalar(self):
        a = pa.array(["foo", "bar", None, "foo"])
        got = ac.equal(a, "foo")
        expected = pc.equal(a, pa.scalar("foo"))
        assert_equals_arrow(got, expected)

    def test_string_order_scalar(self):
        a = pa.array(["apple", "banana", None, "cherry"])
        got = ac.less(a, "banana")
        expected = pc.less(a, pa.scalar("banana"))
        assert_equals_arrow(got, expected)

    def test_string_order_scalar_absent_value(self):
        a = pa.array(["apple", "banana", "cherry"])
        got = ac.less(a, "bb")  # not in dictionary
        expected = pc.less(a, pa.scalar("bb"))
        assert_equals_arrow(got, expected)

    def test_string_columns(self):
        a = pa.array(["a", "b", "c", None])
        b = pa.array(["b", "b", "a", "a"])
        for name in ["equal", "not_equal", "less", "greater_equal"]:
            check_binary(name, a, b)


class TestBoolean:
    A = pa.array([True, True, False, False, None, None, True, False, None])
    B = pa.array([True, False, True, False, True, False, None, None, None])

    @pytest.mark.parametrize("name", ["xor", "and_not"])
    def test_binary(self, name):
        check_binary(name, self.A, self.B)

    def test_and_or(self):
        # python keywords: registry names "and"/"or", attrs and_/or_
        got = ac.and_(self.A, self.B)
        assert_equals_arrow(got, pc.and_(self.A, self.B))
        got = ac.or_(self.A, self.B)
        assert_equals_arrow(got, pc.or_(self.A, self.B))

    @pytest.mark.parametrize("name", ["and_kleene", "or_kleene",
                                      "and_not_kleene"])
    def test_kleene(self, name):
        check_binary(name, self.A, self.B)

    def test_invert(self):
        check_unary("invert", self.A)


class TestValidity:
    def test_is_valid_null(self):
        a = pa.array([1, None, 3], type=pa.int64())
        check_unary("is_valid", a)
        check_unary("is_null", a)

    def test_is_nan(self):
        a = pa.array([1.0, float("nan"), None])
        check_unary("is_nan", a)

    def test_fill_null(self):
        a = pa.array([1, None, 3], type=pa.int64())
        got = ac.fill_null(a, 99)
        assert_equals_arrow(got, pc.fill_null(a, pa.scalar(99, pa.int64())))

    def test_fill_null_string(self):
        a = pa.array(["x", None, "y"])
        got = ac.fill_null(a, "zzz")
        expected = pc.fill_null(a, pa.scalar("zzz"))
        assert got.to_numpy().tolist() == expected.to_pylist()

    def test_if_else(self):
        cond = pa.array([True, False, None, True])
        left = pa.array([1, 2, 3, None], type=pa.int64())
        right = pa.array([10, 20, 30, 40], type=pa.int64())
        got = ac.if_else(cond, left, right)
        assert_equals_arrow(got, pc.if_else(cond, left, right))


class TestCast:
    def test_int_widening(self):
        a = pa.array([1, None, 3], type=pa.int32())
        got = ac.cast(a, a1t.int64)
        assert_equals_arrow(got, a.cast(pa.int64()))

    def test_int_narrowing_safe_ok(self):
        a = pa.array([1, 2, 127], type=pa.int64())
        got = ac.cast(a, a1t.int8)
        assert_equals_arrow(got, a.cast(pa.int8()))

    def test_int_narrowing_overflow_raises(self):
        a = pa.array([1, 300], type=pa.int64())
        with pytest.raises(Invalid):
            ac.cast(a, a1t.int8)

    def test_int_narrowing_unsafe_wraps(self):
        a = pa.array([300], type=pa.int64())
        got = ac.cast(a, a1t.int8, safe=False)
        assert got.to_numpy()[0] == a.cast(pa.int8(), safe=False)[0].as_py()

    def test_float_to_int_exact(self):
        a = pa.array([1.0, -2.0, None])
        got = ac.cast(a, a1t.int64)
        assert_equals_arrow(got, a.cast(pa.int64()))

    def test_float_to_int_truncation_raises(self):
        with pytest.raises(Invalid):
            ac.cast(pa.array([1.5]), a1t.int64)

    def test_int_to_float(self):
        a = pa.array([1, 2, None], type=pa.int64())
        got = ac.cast(a, a1t.float64)
        assert_equals_arrow(got, a.cast(pa.float64()))

    def test_bool_to_int(self):
        a = pa.array([True, False, None])
        got = ac.cast(a, a1t.int32)
        assert_equals_arrow(got, a.cast(pa.int32()))

    def test_string_to_int(self):
        a = pa.array(["1", "22", None, "-3"])
        got = ac.cast(a, a1t.int64)
        assert_equals_arrow(got, a.cast(pa.int64()))

    def test_timestamp_unit_cast(self):
        a = pa.array([1_000_000, 2_000_000], type=pa.timestamp("us"))
        got = ac.cast(a, a1t.timestamp("ms"))
        assert_equals_arrow(got, a.cast(pa.timestamp("ms")))

    def test_timestamp_truncation_raises(self):
        a = pa.array([1_000_001], type=pa.timestamp("us"))
        with pytest.raises(Invalid):
            ac.cast(a, a1t.timestamp("ms"))


class TestDictionaryDecode:
    def test_cast_from_dictionary(self):
        a = pa.array([5, 2, 5, None, 9], type=pa.int64())
        enc = ac.dictionary_encode(a)
        assert ac.cast(enc, a1t.int64).to_arrow().to_pylist() == a.to_pylist()
        assert ac.cast(enc, a1t.float64).to_arrow().to_pylist() == \
            [5.0, 2.0, 5.0, None, 9.0]

    def test_string_dict_passthrough(self):
        s = pa.array(["x", "y", None, "x"])
        enc = ac.dictionary_encode(s)
        back = ac.cast(enc, a1t.string)
        assert back.to_numpy().tolist() == ["x", "y", None, "x"]


class TestTemporalCompare:
    def test_cross_unit_timestamp_compare(self):
        a = pa.array([1_000_000, 2_000_000], type=pa.timestamp("us"))
        b = pa.array([1_500, 1_500], type=pa.timestamp("ms"))
        got = ac.less(a, b)
        exp = pc.less(a, b)
        assert_equals_arrow(got, exp)

    def test_date32_vs_timestamp(self):
        a = pa.array([1, 2], type=pa.date32())
        b = pa.array([86_400_000_000, 86_400_000_000],
                     type=pa.timestamp("us"))
        got = ac.greater(a, b)
        exp = pc.greater(a, b)
        assert_equals_arrow(got, exp)


def test_fill_null_coalesce_dict_strings():
    """Column-fill over dict strings must unify dictionaries (codes from
    different pools are not comparable)."""
    import pyarrow.compute as pc

    s1 = pa.array(["a", None, "c", None])
    s2 = pa.array(["x", "y", None, None])
    assert (ac.coalesce(a1t.column(s1), a1t.column(s2)).to_arrow()
            .to_pylist() == pc.coalesce(s1, s2).to_pylist())
    assert (ac.fill_null(a1t.column(s1), a1t.column(s2)).to_arrow()
            .to_pylist() == pc.fill_null(s1, s2).to_pylist())


def test_conditional_family_mixed_dictionaries_and_decimals():
    from decimal import Decimal

    s1 = pa.array(["a", "q", "c", None])
    s2 = pa.array(["x", "b", None, "k"])
    cond = pa.array([True, False, None, True])
    assert (ac.case_when(a1t.record_batch({"c": cond}), a1t.column(s1),
                         a1t.column(s2)).to_arrow().to_pylist()
            == pc.case_when(pc.make_struct(cond), s1, s2).to_pylist())
    idx = pa.array([0, 1, 1, 0], pa.int64())
    assert (ac.choose(a1t.column(idx), a1t.column(s1),
                      a1t.column(s2)).to_arrow().to_pylist()
            == pc.choose(idx, s1, s2).to_pylist())
    mask = pa.array([False, True, False, True])
    repl = pa.array(["R1", "R2"])
    assert (ac.replace_with_mask(a1t.column(s1), a1t.column(mask),
                                 a1t.column(repl)).to_arrow().to_pylist()
            == pc.replace_with_mask(s1, mask, repl).to_pylist())
    for fn in ("max_element_wise", "min_element_wise"):
        assert (getattr(ac, fn)(a1t.column(s1), a1t.column(s2))
                .to_arrow().to_pylist()
                == getattr(pc, fn)(s1, s2).to_pylist())
    big = Decimal("92233720368547758.08")
    d1 = pa.array([big, Decimal("1.00")], pa.decimal128(38, 2))
    d2 = pa.array([Decimal("2.00"), -big], pa.decimal128(38, 2))
    i2 = pa.array([1, 0], pa.int64())
    assert (ac.choose(a1t.column(i2), a1t.column(d1),
                      a1t.column(d2)).to_arrow().to_pylist()
            == pc.choose(i2, d1, d2).to_pylist())
