"""Incremental array builders (arrow1_tpu/builders.py).

Reference semantics: builder_base.h:49 Append/AppendNull/AppendValues/
Finish/Reset; typed builders; MakeBuilder dispatch. Oracle: pyarrow
builders' results via to_arrow() equality.
"""

from decimal import Decimal

import numpy as np
import pyarrow as pa
import pytest

import arrow1_tpu as a1t
from arrow1_tpu import dtypes as dt
from arrow1_tpu.builders import (BinaryBuilder, BooleanBuilder,
                                 Decimal128Builder, DictionaryBuilder,
                                 Float64Builder, Int64Builder, ListBuilder,
                                 StringBuilder, StructBuilder, builder_for)
from arrow1_tpu.errors import Invalid


class TestPrimitive:
    def test_int64_roundtrip(self):
        b = Int64Builder()
        b.append(1).append(2).append_null().append(-4)
        assert len(b) == 4 and b.null_count == 1
        col = b.finish()
        assert col.to_arrow().equals(pa.array([1, 2, None, -4]))
        # builder resets after finish
        assert len(b) == 0 and b.null_count == 0

    def test_growth_beyond_initial_capacity(self):
        b = Int64Builder()
        for i in range(1000):
            b.append(i)
        col = b.finish()
        np.testing.assert_array_equal(col.to_numpy(),
                                      np.arange(1000))

    def test_append_values_bulk_ndarray(self):
        b = Float64Builder()
        b.append_values(np.arange(100, dtype=np.float64))
        b.append_null()
        col = b.finish()
        assert col.length == 101
        assert col.to_arrow()[100].as_py() is None
        # f64 builders carry the bits view for movement kernels
        assert col.bits is not None

    def test_append_values_with_none(self):
        b = Int64Builder()
        b.append_values([1, None, 3])
        assert b.null_count == 1
        assert b.finish().to_arrow().equals(pa.array([1, None, 3]))

    def test_append_values_valid_mask(self):
        b = Int64Builder()
        b.append_values([1, 2, 3], valid=[True, False, True])
        assert b.finish().to_arrow().equals(pa.array([1, None, 3]))

    def test_boolean(self):
        b = BooleanBuilder()
        b.append(True).append(False).append_null()
        assert b.finish().to_arrow().equals(
            pa.array([True, False, None]))

    def test_reserve(self):
        b = Int64Builder()
        b.reserve(10_000)
        for i in range(10_000):
            b.append(i)
        assert len(b) == 10_000


class TestVarWidth:
    def test_string_builder_dictionary_encodes(self):
        b = StringBuilder()
        b.append("x").append("y").append_null().append("x")
        col = b.finish()
        assert col.dictionary is not None
        assert col.to_arrow().to_pylist() == ["x", "y", None, "x"]

    def test_binary_builder(self):
        b = BinaryBuilder()
        b.append(b"ab").append_null().append(b"ab").append(b"c")
        col = b.finish()
        assert col.to_arrow().to_pylist() == [b"ab", None, b"ab", b"c"]

    def test_dictionary_builder_code_order(self):
        b = DictionaryBuilder()
        for v in ["b", "a", "b", "c", "a"]:
            b.append(v)
        assert b.dictionary_length == 3
        col = b.finish()
        assert col.to_arrow().to_pylist() == ["b", "a", "b", "c", "a"]


class TestDecimal:
    def test_decimal128_two_limbs(self):
        t = dt.decimal128(38, 2)
        b = Decimal128Builder(t)
        big = Decimal("92233720368547758.08")  # unscaled > int64
        b.append(big).append(Decimal("1.00")).append_null()
        col = b.finish()
        assert col.data2 is not None
        vals = col.to_arrow().to_pylist()
        assert vals[0] == big
        assert vals[1] == Decimal("1.00")
        assert vals[2] is None

    def test_negative_decimal(self):
        t = dt.decimal128(20, 3)
        col = Decimal128Builder(t).append(Decimal("-12.345")).finish()
        assert col.to_arrow().to_pylist() == [Decimal("-12.345")]

    def test_wrong_dtype_raises(self):
        with pytest.raises(Invalid):
            Decimal128Builder(dt.int64)


class TestNested:
    def test_list_builder(self):
        b = ListBuilder(Int64Builder())
        b.append([1, 2]).append([]).append_null().append([3, None])
        col = b.finish()
        assert col.to_arrow().to_pylist() == [[1, 2], [], None, [3, None]]

    def test_list_builder_child_feed(self):
        b = ListBuilder(Int64Builder())
        b.values.append(1)
        b.values.append(2)
        b.close_row()
        b.values.append(3)
        b.close_row()
        assert b.finish().to_arrow().to_pylist() == [[1, 2], [3]]

    def test_struct_builder(self):
        b = StructBuilder(["x", "s"], [Int64Builder(), StringBuilder()])
        b.append({"x": 1, "s": "a"}).append({"x": 2, "s": "b"})
        b.append_null()
        col = b.finish()
        got = col.to_arrow().to_pylist()
        assert got[0] == {"x": 1, "s": "a"}
        assert got[1] == {"x": 2, "s": "b"}
        assert got[2] is None


class TestFactory:
    def test_builder_for_dispatch(self):
        assert isinstance(builder_for(dt.int32), type(builder_for(dt.int32)))
        assert builder_for(dt.string).__class__ is StringBuilder
        assert builder_for(dt.decimal128(10, 2)).__class__ is \
            Decimal128Builder
        lb = builder_for(dt.list_(dt.float64))
        assert isinstance(lb, ListBuilder)
        lb.append([1.5]).append([2.5, 3.5])
        assert lb.finish().to_arrow().to_pylist() == [[1.5], [2.5, 3.5]]
        with pytest.raises(Invalid):
            builder_for(dt.struct([("x", dt.int64)]))


class TestDecimal256Builder:
    def test_wide_values_four_limbs(self):
        from arrow1_tpu.builders import Decimal256Builder

        t = dt.decimal256(70, 4)
        big = Decimal("12345678901234567890123456789012345.6789")
        b = Decimal256Builder(t)
        b.append(big).append_null().append(Decimal("-1.0001"))
        col = b.finish()
        assert col.data2.shape == (3, 3)
        got = col.to_arrow().to_pylist()
        assert got == [big, None, Decimal("-1.0001")]

    def test_builder_for_routes_256(self):
        from arrow1_tpu.builders import Decimal256Builder

        assert isinstance(builder_for(dt.decimal256(50, 2)),
                          Decimal256Builder)

    def test_128_rejects_256_dtype(self):
        with pytest.raises(Invalid):
            Decimal128Builder(dt.decimal256(50, 2))


def test_dictionary_builder_bytes_dtype():
    from arrow1_tpu.builders import DictionaryBuilder

    b = DictionaryBuilder()
    b.append(b"aa").append(b"bb").append(b"aa")
    col = b.finish()
    assert col.dtype == dt.binary
    assert col.to_arrow().to_pylist() == [b"aa", b"bb", b"aa"]
    b2 = DictionaryBuilder()
    b2.append(1)
    with pytest.raises(Invalid):
        b2.finish()
