"""Native IPC wire format vs pyarrow (VERDICT r1 missing #5).

Byte-level interop both directions: pyarrow must read native-written
streams/files; the native reader must read pyarrow-written ones. No
pyarrow on the native wire path (asserted by stubbing the module)."""

import io
import sys
from decimal import Decimal

import numpy as np
import pyarrow as pa
import pyarrow.ipc as pi
import pytest

import arrow1_tpu as a1t
from arrow1_tpu.io import ipc_native as ipn


def sample_rb(n=64, seed=0):
    rng = np.random.default_rng(seed)
    return pa.record_batch({
        "i64": pa.array(rng.integers(-1000, 1000, n), pa.int64()),
        "i16": pa.array(rng.integers(-9, 9, n).astype(np.int16)),
        "u32": pa.array(rng.integers(0, 100, n).astype(np.uint32)),
        "f64": pa.array(rng.normal(size=n)),
        "f32": pa.array(rng.normal(size=n).astype(np.float32)),
        "bool": pa.array(rng.integers(0, 2, n).astype(bool)),
        "s": pa.array(rng.choice(["alpha", "bb", "c", None], n).tolist()),
        "ts": pa.array(rng.integers(0, 10**12, n), pa.timestamp("us")),
        "dur": pa.array(rng.integers(-10**6, 10**6, n), pa.duration("ms")),
        "d32": pa.array(rng.integers(0, 20000, n).astype(np.int32),
                        pa.date32()),
        "withnulls": pa.array(
            [None if i % 5 == 0 else float(i) for i in range(n)],
            pa.float64()),
        "dec": pa.array([Decimal("1.23") * i for i in range(n)],
                        pa.decimal128(20, 2)),
        "dec256": pa.array(
            [Decimal("12345678901234567890123456789012345.67") * i
             for i in range(n)], pa.decimal256(60, 2)),
    })


class TestNativeToPyarrow:
    def test_stream(self):
        rb = sample_rb()
        batch = a1t.record_batch(rb)
        buf = io.BytesIO()
        ipn.write_stream(buf, batch)
        got = pi.open_stream(buf.getvalue()).read_all().combine_chunks()
        exp = pa.Table.from_batches([rb])
        for name in exp.schema.names:
            assert got.column(name).equals(exp.column(name)), name

    def test_file_multiple_batches(self):
        rb1, rb2 = sample_rb(seed=1), sample_rb(seed=2)
        buf = io.BytesIO()
        ipn.write_file(buf, [a1t.record_batch(rb1), a1t.record_batch(rb2)])
        reader = pi.open_file(buf.getvalue())
        assert reader.num_record_batches == 2
        got = reader.get_batch(1)
        for name in rb2.schema.names:
            assert got.column(name).equals(rb2.column(name)), name

    def test_dictionary_column(self):
        rb = pa.record_batch({
            "d": pa.array(["x", "y", "x", None, "z"]).dictionary_encode()})
        batch = a1t.record_batch(rb)
        buf = io.BytesIO()
        ipn.write_stream(buf, batch)
        got = pi.open_stream(buf.getvalue()).read_all()
        assert got.column("d").to_pylist() == ["x", "y", "x", None, "z"]


class TestPyarrowToNative:
    def test_stream(self):
        rb = sample_rb(seed=3)
        sink = io.BytesIO()
        with pi.new_stream(sink, rb.schema) as w:
            w.write_batch(rb)
        (batch,) = ipn.read_stream(sink.getvalue())
        back = batch.to_arrow()
        for name in rb.schema.names:
            assert back.column(name).equals(rb.column(name)), name

    def test_file(self):
        rb = sample_rb(seed=4)
        sink = io.BytesIO()
        with pi.new_file(sink, rb.schema) as w:
            w.write_batch(rb)
            w.write_batch(rb)
        batches = ipn.read_file(sink.getvalue())
        assert len(batches) == 2
        back = batches[0].to_arrow()
        for name in rb.schema.names:
            assert back.column(name).equals(rb.column(name)), name

    def test_dictionary(self):
        rb = pa.record_batch({
            "d": pa.array(["p", "q", "p", "r"]).dictionary_encode()})
        sink = io.BytesIO()
        with pi.new_stream(sink, rb.schema) as w:
            w.write_batch(rb)
        (batch,) = ipn.read_stream(sink.getvalue())
        assert batch.column("d").to_arrow().to_pylist() == \
            ["p", "q", "p", "r"]


class TestEngineRoundtrip:
    def test_roundtrip_no_pyarrow_on_wire(self, monkeypatch):
        """The native path must not touch pyarrow: stub the module out
        for the duration of serialize/deserialize."""
        rb = sample_rb(seed=5)
        batch = a1t.record_batch(rb)  # ingest uses pyarrow (host decode)
        import builtins

        real_import = builtins.__import__

        def guarded(name, *a, **k):
            if name == "pyarrow" or name.startswith("pyarrow."):
                raise AssertionError("native IPC path imported pyarrow")
            return real_import(name, *a, **k)

        buf = io.BytesIO()
        monkeypatch.setattr(builtins, "__import__", guarded)
        try:
            ipn.write_stream(buf, batch)
            (back,) = ipn.read_stream(buf.getvalue())
        finally:
            monkeypatch.setattr(builtins, "__import__", real_import)
        got = back.to_arrow()
        for name in rb.schema.names:
            assert got.column(name).equals(rb.column(name)), name

    def test_write_ipc_uses_native(self, tmp_path):
        from arrow1_tpu.io.ipc import read_ipc, write_ipc

        rb = sample_rb(seed=6)
        batch = a1t.record_batch(rb)
        p = str(tmp_path / "t.arrow")
        write_ipc(batch, p)
        # pyarrow can open the native-written file
        t = pi.open_file(p).read_all()
        assert t.num_rows == rb.num_rows
        # and the native reader reads it back
        tab = read_ipc(p)
        assert tab.num_rows == rb.num_rows


def nested_rb():
    return pa.record_batch({
        "i": pa.array([1, 2, None, 4], type=pa.int64()),
        "l": pa.array([[1, 2], None, [], [3]], type=pa.list_(pa.int32())),
        "ll": pa.array([[1], [2, 3], None, []],
                       type=pa.large_list(pa.int64())),
        "fsl": pa.array([[1.0, 2.0], [3.0, 4.0], None, [5.0, 6.0]],
                        type=pa.list_(pa.float64(), 2)),
        "st": pa.array([{"a": 1, "b": "x"}, {"a": 2, "b": None}, None,
                        {"a": 4, "b": "z"}],
                       type=pa.struct([("a", pa.int64()),
                                       ("b", pa.string())])),
        "m": pa.array([[("k1", 1)], [], None, [("k2", 2), ("k3", 3)]],
                      type=pa.map_(pa.string(), pa.int64())),
        "lst": pa.array([[{"x": 1}], None, [], [{"x": None}, {"x": 3}]],
                        type=pa.list_(pa.struct([("x", pa.int64())]))),
    })


class TestNested:
    """Nested family on the native wire (reference ArrayLoader,
    ipc/reader.cc:138-520): list/large_list/fixed_size_list/struct/map +
    deep nesting (list<struct>)."""

    def test_native_write_pyarrow_read(self):
        rb = nested_rb()
        buf = io.BytesIO()
        ipn.write_stream(buf, a1t.record_batch(rb))
        got = pi.open_stream(buf.getvalue()).read_all()
        exp = pa.Table.from_batches([rb])
        for name in exp.schema.names:
            assert got.column(name).to_pylist() == \
                exp.column(name).to_pylist(), name

    def test_pyarrow_write_native_read(self):
        rb = nested_rb()
        buf = io.BytesIO()
        with pi.new_stream(buf, rb.schema) as w:
            w.write_batch(rb)
        back = ipn.read_stream(buf.getvalue())[0].to_arrow()
        for name in rb.schema.names:
            assert back.column(name).to_pylist() == \
                rb.column(name).to_pylist(), name

    def test_native_file_roundtrip(self):
        rb = nested_rb()
        buf = io.BytesIO()
        ipn.write_file(buf, a1t.record_batch(rb))
        rt = ipn.read_file(io.BytesIO(buf.getvalue()))[0].to_arrow()
        for name in rb.schema.names:
            assert rt.column(name).to_pylist() == \
                rb.column(name).to_pylist(), name

    def test_sparse_union(self):
        u = pa.UnionArray.from_sparse(
            pa.array([0, 1, 0, 1], type=pa.int8()),
            [pa.array([1, 2, 3, 4], type=pa.int64()),
             pa.array(["a", "b", "c", "d"])])
        urb = pa.record_batch({"u": u})
        buf = io.BytesIO()
        ipn.write_stream(buf, a1t.record_batch(urb))
        got = pi.open_stream(buf.getvalue()).read_all()
        assert got.column("u").to_pylist() == urb.column("u").to_pylist()
        back = ipn.read_stream(buf.getvalue())[0].to_arrow()
        assert back.column("u").to_pylist() == urb.column("u").to_pylist()

    def test_dense_union(self):
        u = pa.UnionArray.from_dense(
            pa.array([0, 1, 0, 1], type=pa.int8()),
            pa.array([0, 0, 1, 1], type=pa.int32()),
            [pa.array([1, 2], type=pa.int64()),
             pa.array(["a", "b"])])
        urb = pa.record_batch({"u": u})
        buf = io.BytesIO()
        ipn.write_stream(buf, a1t.record_batch(urb))
        got = pi.open_stream(buf.getvalue()).read_all()
        assert got.column("u").to_pylist() == urb.column("u").to_pylist()
        back = ipn.read_stream(buf.getvalue())[0].to_arrow()
        assert back.column("u").to_pylist() == urb.column("u").to_pylist()


class TestCompression:
    """BodyCompression buffer framing (Message.fbs): int64
    uncompressed-length prefix per buffer, -1 = stored raw."""

    def test_zstd_native_write_both_readers(self):
        flat = pa.record_batch({
            "x": pa.array(np.arange(10000, dtype=np.int64)),
            "s": pa.array(["ab", "cd"] * 5000)})
        buf = io.BytesIO()
        ipn.write_stream(buf, a1t.record_batch(flat), compression="zstd")
        assert len(buf.getvalue()) < 10000 * 8  # actually compressed
        got = pi.open_stream(buf.getvalue()).read_all()
        assert got.column("x").to_pylist() == flat.column("x").to_pylist()
        back = ipn.read_stream(buf.getvalue())[0].to_arrow()
        assert back.column("x").to_pylist() == flat.column("x").to_pylist()

    def test_zstd_pyarrow_write_native_read(self):
        flat = pa.record_batch({
            "x": pa.array(np.arange(5000, dtype=np.int64)),
            "s": pa.array(["ab", "cd"] * 2500)})
        buf = io.BytesIO()
        opts = pi.IpcWriteOptions(compression="zstd")
        with pi.new_stream(buf, flat.schema, options=opts) as w:
            w.write_batch(flat)
        back = ipn.read_stream(buf.getvalue())[0].to_arrow()
        for name in flat.schema.names:
            assert back.column(name).to_pylist() == \
                flat.column(name).to_pylist(), name

    def test_zstd_compressed_nested_file(self):
        rb = nested_rb()
        buf = io.BytesIO()
        ipn.write_file(buf, a1t.record_batch(rb), compression="zstd")
        rt = ipn.read_file(io.BytesIO(buf.getvalue()))[0].to_arrow()
        for name in rb.schema.names:
            assert rt.column(name).to_pylist() == \
                rb.column(name).to_pylist(), name
