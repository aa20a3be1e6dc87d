"""Native Arrow C data interface (cabi.py) vs pyarrow as ABI peer.

Reference: cpp/src/arrow/c/abi.h:30,46 struct layout + c/bridge.cc
import/export semantics (buffer order, LSB validity, offset handling,
release-callback contract)."""

import gc
from decimal import Decimal

import numpy as np
import pyarrow as pa
import pytest

import arrow1_tpu as a1t
from arrow1_tpu import cabi
from arrow1_tpu.cabi import CArrayExportable, import_array_capsules
from arrow1_tpu.cdata import export_column, import_column
from arrow1_tpu.native import native_available


pytestmark = pytest.mark.skipif(
    not native_available(), reason="native release callbacks need the "
    "toolchain")


def sample():
    return pa.record_batch({
        "i": pa.array([1, 2, None, 4], type=pa.int64()),
        "f": pa.array([1.5, None, 3.0, 4.5]),
        "b": pa.array([True, False, None, True]),
        "s": pa.array(["aa", None, "cc", "aa"]),
        "u16": pa.array([1, 2, 3, 4], type=pa.uint16()),
        "ts": pa.array([1, 2, 3, 4], type=pa.timestamp("us", "UTC")),
        "dur": pa.array([1, -2, 3, 4], type=pa.duration("ms")),
    })


def test_export_to_pyarrow():
    rb = sample()
    batch = a1t.record_batch(rb)
    for name in rb.schema.names:
        got = pa.array(CArrayExportable(batch.column(name), name))
        assert got.to_pylist() == rb.column(name).to_pylist(), name
        assert got.type == rb.column(name).type, name


def test_import_from_pyarrow_capsules():
    rb = sample()
    for name in rb.schema.names:
        col = import_array_capsules(*rb.column(name).__arrow_c_array__())
        assert col.to_arrow().to_pylist() == \
            rb.column(name).to_pylist(), name


def test_offset_slice_import():
    sl = pa.array([10, 20, None, 40, 50]).slice(1, 3)
    col = import_array_capsules(*sl.__arrow_c_array__())
    assert col.to_arrow().to_pylist() == [20, None, 40]


def test_decimal_roundtrip():
    d = pa.array([None, Decimal("12.34"), Decimal("-1.00")],
                 pa.decimal128(10, 2))
    col = import_array_capsules(*d.__arrow_c_array__())
    assert col.to_arrow().to_pylist() == d.to_pylist()
    assert pa.array(CArrayExportable(col)).to_pylist() == d.to_pylist()


def test_release_drains_registry():
    rb = sample()
    batch = a1t.record_batch(rb)
    arrs = [pa.array(CArrayExportable(batch.column("i")))
            for _ in range(8)]
    del arrs
    gc.collect()
    pa.array(CArrayExportable(batch.column("f")))  # triggers drain
    # only the last export pair may still be live
    assert len(cabi._live_exports) <= 2


def test_cdata_prefers_native():
    rb = sample()
    batch = a1t.record_batch(rb)
    exp = export_column(batch.column("i"), "i")
    assert isinstance(exp, CArrayExportable)
    back = import_column(exp)
    assert back.to_arrow().to_pylist() == rb.column("i").to_pylist()
    # pyarrow -> engine through the protocol
    got = import_column(pa.array([5, None, 7]))
    assert got.to_arrow().to_pylist() == [5, None, 7]


def test_cpp_consumer_walks_the_abi():
    """A NON-PYTHON consumer: native/src/cabi.cpp a1t_cabi_consume walks
    exported ArrowSchema/ArrowArray structs from the spec alone and its
    checksums must match the engine's own values."""
    import ctypes

    import numpy as np

    from arrow1_tpu.native import load_library

    lib = load_library()
    if lib is None:
        import pytest

        pytest.skip("native lib unavailable")
    lib.a1t_cabi_consume.restype = ctypes.c_int64
    lib.a1t_cabi_consume.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                     ctypes.c_void_p]

    import pyarrow as pa

    import arrow1_tpu as a1t
    from arrow1_tpu import cabi

    cases = [
        ("l", pa.array([1, None, 3, -7], pa.int64()), 3, -3),
        ("g", pa.array([1.5, None, 2.25]), 2, 3.75),
        ("u", pa.array(["ab", None, "cdef"]), 2, 6),
    ]
    for fmt, arr, want_valid, want_agg in cases:
        col = a1t.column(arr)
        s = cabi._export_schema(col.dtype, "x")
        a = cabi._export_array(col)
        out = (ctypes.c_int64 * 2)()
        rc = lib.a1t_cabi_consume(ctypes.addressof(s),
                                  ctypes.addressof(a),
                                  ctypes.addressof(out))
        assert rc == 0, fmt
        assert out[0] == want_valid, fmt
        if fmt == "g":
            got = np.array([out[1]], np.int64).view(np.float64)[0]
            assert abs(got - want_agg) < 1e-12
        else:
            assert out[1] == want_agg, fmt


def test_native_stream_export_to_pyarrow():
    """pyarrow consumes OUR ArrowArrayStream over the raw ABI."""
    import pyarrow as pa

    from arrow1_tpu.cabi import CStreamExportable
    from arrow1_tpu.interop import record_batch_from_arrow

    rbs = [pa.record_batch({"x": pa.array([1, None, 3]),
                            "s": pa.array(["a", "bb", None])}),
           pa.record_batch({"x": pa.array([7, 8]),
                            "s": pa.array([None, "z"])})]
    ours = [record_batch_from_arrow(rb) for rb in rbs]
    reader = pa.RecordBatchReader.from_stream(CStreamExportable(ours))
    got = reader.read_all()
    assert got.to_pylist() == pa.Table.from_batches(rbs).to_pylist()


def test_native_stream_import_from_pyarrow():
    """We consume a pyarrow stream by walking its callbacks directly."""
    import pyarrow as pa

    from arrow1_tpu.cabi import import_stream_capsule

    rbs = [pa.record_batch({"x": pa.array([1, None]),
                            "f": pa.array([0.5, 1.5])})]
    r = pa.RecordBatchReader.from_batches(rbs[0].schema, rbs)
    batches = import_stream_capsule(r.__arrow_c_stream__())
    assert len(batches) == 1
    assert batches[0].to_arrow().to_pylist() == rbs[0].to_pylist()
