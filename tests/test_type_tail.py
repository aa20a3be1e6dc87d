"""Type-system tail (VERDICT r1 next #10): decimal256, interval types,
extension-type storage-unwrap hook.

Scope matches the reference's behavior surface: ingest/export roundtrip
byte-exact, selection/movement, sort/group keys; decimal256 arithmetic
(four-limb, ops/decimal256.py) is covered in tests/test_decimal256.py;
interval_between family covered below."""

from decimal import Decimal

import numpy as np
import pyarrow as pa
import pytest

import jax.numpy as jnp

import arrow1_tpu as a1t
import arrow1_tpu.compute as ac
from arrow1_tpu import dtypes as dt
from arrow1_tpu.column import Column
from arrow1_tpu.interop import column_from_arrow


DEC256 = [Decimal("123456789012345678901234567890123456789012345.67"),
          Decimal("-98765432109876543210987654321098765432109876.54"),
          None,
          Decimal("0.01"), Decimal("-1.00"),
          Decimal("170141183460469231731687303715884105727.00")]


class TestDecimal256:
    def test_roundtrip(self):
        arr = pa.array(DEC256, type=pa.decimal256(70, 2))
        col = column_from_arrow(arr)
        assert col.dtype.kind == "decimal256"
        assert col.data2.shape == (len(DEC256), 3)
        assert col.to_arrow().equals(arr)

    def test_take_and_slice(self):
        arr = pa.array(DEC256, type=pa.decimal256(70, 2))
        col = column_from_arrow(arr)
        idx = Column(jnp.asarray([5, 0, 2, 1], jnp.int64), dt.int64)
        taken = ac.take(col, idx)
        assert taken.to_arrow().equals(arr.take(pa.array([5, 0, 2, 1])))
        assert col.slice(1, 3).to_arrow().equals(arr.slice(1, 3))

    def test_filter(self):
        arr = pa.array(DEC256, type=pa.decimal256(70, 2))
        col = column_from_arrow(arr)
        m = [True, False, True, True, False, True]
        mask = Column(jnp.asarray(m), dt.bool_)
        got = ac.filter(col, mask)
        assert got.to_arrow().equals(arr.filter(pa.array(m)))

    def test_sort_key(self):
        arr = pa.array(DEC256, type=pa.decimal256(70, 2))
        col = column_from_arrow(arr)
        idx = ac.sort_indices(col)
        import pyarrow.compute as pc

        exp = pc.sort_indices(arr)
        assert np.asarray(idx.data).tolist() == exp.to_pylist()

    def test_arithmetic_four_limb(self):
        # full arithmetic landed in round 2 (ops/decimal256.py);
        # detailed coverage in tests/test_decimal256.py
        from decimal import Context

        arr = pa.array(DEC256[:2], type=pa.decimal256(70, 2))
        col = column_from_arrow(arr)
        out = ac.add(col, col)
        ctx = Context(prec=80)
        expect = [ctx.add(v, v) for v in DEC256[:2]]
        assert out.to_arrow().to_pylist() == expect


class TestMonthDayNanoInterval:
    VALS = [(1, 2, 3), (-1, 15, 10**15), None, (0, 0, 0),
            (1200, -31, -999_999_999)]

    def test_roundtrip(self):
        arr = pa.array(self.VALS, type=pa.month_day_nano_interval())
        col = column_from_arrow(arr)
        assert col.dtype.kind == "month_day_nano_interval"
        back = col.to_arrow()
        assert back.equals(arr)

    def test_take(self):
        arr = pa.array(self.VALS, type=pa.month_day_nano_interval())
        col = column_from_arrow(arr)
        idx = Column(jnp.asarray([4, 2, 0], jnp.int64), dt.int64)
        got = ac.take(col, idx)
        assert got.to_arrow().equals(arr.take(pa.array([4, 2, 0])))

    def test_engine_native_interval_kinds(self):
        # month/day_time intervals exist as engine types even though
        # pyarrow 25 exposes no Python constructor for them
        assert dt.month_interval().is_interval
        assert dt.day_time_interval().is_interval
        with pytest.raises(TypeError, match="month_interval"):
            dt.to_arrow(dt.month_interval())


class _UuidType(pa.ExtensionType):
    def __init__(self):
        super().__init__(pa.int64(), "a1t.test_uuid")

    def __arrow_ext_serialize__(self):
        return b""

    @classmethod
    def __arrow_ext_deserialize__(cls, storage_type, serialized):
        return cls()


class TestExtensionType:
    def test_roundtrip_and_filter(self):
        ext = _UuidType()
        storage = pa.array([10, 20, 30, 40], pa.int64())
        arr = pa.ExtensionArray.from_storage(ext, storage)
        col = column_from_arrow(arr)
        assert col.dtype.kind == "extension"
        assert col.dtype.unit == "a1t.test_uuid"
        assert col.dtype.value_type == dt.int64
        back = col.to_arrow()
        assert back.type == ext
        assert back.storage.equals(storage)

        # storage-unwrap semantics (vector_selection.cc:1178): selection
        # operates on storage and the result is re-wrapped
        m = Column(jnp.asarray([True, False, True, False]), dt.bool_)
        got = ac.filter(col, m)
        assert got.to_arrow().storage.equals(
            pa.array([10, 30], pa.int64()))
        assert got.dtype.kind == "extension"


class TestIntervalBetween:
    def test_mdn_parity_fuzz(self):
        import pyarrow.compute as pc

        rng = np.random.default_rng(0)
        a = pa.array(rng.integers(0, 40000, 300).astype(np.int32),
                     type=pa.date32())
        b = pa.array(rng.integers(0, 40000, 300).astype(np.int32),
                     type=pa.date32())
        ours = ac.month_day_nano_interval_between(
            column_from_arrow(a), column_from_arrow(b))
        assert ours.to_arrow().to_pylist() == \
            pc.month_day_nano_interval_between(a, b).to_pylist()

    def test_mdn_timestamps(self):
        import datetime as dtm

        import pyarrow.compute as pc

        ta = pa.array([dtm.datetime(2020, 1, 31, 23, 59, 1)],
                      type=pa.timestamp("us"))
        tb = pa.array([dtm.datetime(2020, 3, 1, 0, 0, 0)],
                      type=pa.timestamp("us"))
        ours = ac.month_day_nano_interval_between(
            column_from_arrow(ta), column_from_arrow(tb))
        assert ours.to_arrow().to_pylist() == \
            pc.month_day_nano_interval_between(ta, tb).to_pylist()

    def test_month_and_daytime_outputs(self):
        # pyarrow's python layer cannot represent these output types
        # (pc.month_interval_between raises on conversion) — check the
        # engine values directly
        a = pa.array([0, 100], type=pa.date32())       # 1970-01-01, ...
        b = pa.array([400, 70], type=pa.date32())
        m = ac.month_interval_between(column_from_arrow(a),
                                      column_from_arrow(b))
        assert m.dtype.kind == "month_interval"
        assert np.asarray(m.data).tolist() == [13, -1]
        d = ac.day_time_interval_between(column_from_arrow(a),
                                         column_from_arrow(b))
        assert d.dtype.kind == "day_time_interval"
        assert (np.asarray(d.data) >> 32).tolist() == [400, -30]
