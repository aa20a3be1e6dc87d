"""pyarrow top-level namespace parity: type aliases, types predicates,
error hierarchy, buffer/stream layer, memory pools, thread counts, and
the pyarrow-named io facade modules (parquet/csv/json/ipc/feather).

Reference: python/pyarrow/__init__.py public surface.
"""

import io
import os

import pandas as pd
import pyarrow as pa
import pyarrow.types as pt
import pytest

import arrow1_tpu as a1t
import arrow1_tpu.types as types


class TestTypes:
    def test_all_predicates_exist(self):
        missing = [n for n in dir(pt)
                   if n.startswith("is_") and not hasattr(types, n)]
        assert missing == []

    def test_predicates(self):
        assert types.is_integer(a1t.int32)
        assert types.is_signed_integer(a1t.int64)
        assert not types.is_unsigned_integer(a1t.int64)
        assert types.is_floating(a1t.float32)
        assert types.is_string(a1t.string)
        assert not types.is_string(a1t.binary)
        assert types.is_decimal(a1t.decimal128(10, 2))
        assert types.is_decimal256(a1t.decimal256(50, 2))
        assert types.is_list(a1t.list_(a1t.int32))
        assert types.is_nested(a1t.struct([("a", a1t.int32)]))
        assert types.is_temporal(a1t.timestamp("us"))
        assert types.is_interval(a1t.month_interval())
        # pyarrow DataType accepted too
        assert types.is_timestamp(pa.timestamp("ns"))

    def test_type_aliases(self):
        assert a1t.utf8 is a1t.string
        assert a1t.large_utf8 is a1t.large_string
        assert a1t.type_for_alias("f8") is a1t.float64
        assert a1t.type_for_alias("timestamp[ms]").unit == "ms"
        with pytest.raises(ValueError):
            a1t.type_for_alias("nope")
        assert a1t.infer_type([1, 2]) == a1t.int64
        assert a1t.union([("a", a1t.int32)],
                         mode="dense").kind == "dense_union"

    def test_repeat(self):
        assert a1t.repeat(7, 3).to_pylist() == [7, 7, 7]


class TestErrors:
    def test_hierarchy(self):
        assert issubclass(a1t.ArrowInvalid, ValueError)
        assert issubclass(a1t.ArrowNotImplementedError, NotImplementedError)
        assert issubclass(a1t.ArrowKeyError, KeyError)
        with pytest.raises(a1t.ArrowInvalid):
            a1t.compute.round(a1t.column(pa.array([1.0])),
                              round_mode="nope")


class TestBuffers:
    def test_buffer(self):
        b = a1t.py_buffer(b"hello")
        assert b.size == 5
        assert b.to_pybytes() == b"hello"
        assert b.slice(1, 3).to_pybytes() == b"ell"
        assert b.equals(a1t.py_buffer(b"hello"))
        ab = a1t.allocate_buffer(8)
        assert ab.size == 8 and ab.is_mutable
        fb = a1t.foreign_buffer(b.address, 5, b)
        assert fb.to_pybytes() == b"hello"

    def test_streams(self, tmp_path):
        p = tmp_path / "f.bin"
        with a1t.output_stream(str(p)) as s:
            s.write(b"abc")
        assert a1t.input_stream(str(p)).read() == b"abc"
        assert a1t.input_stream(b"xyz").read() == b"xyz"
        mm = a1t.create_memory_map(str(tmp_path / "m.bin"), 16)
        mm.write(b"0123456789abcdef")
        mm.close()
        assert a1t.memory_map(str(tmp_path / "m.bin")).read(4) == b"0123"


class TestPoolsThreads:
    def test_pools(self):
        assert hasattr(a1t.default_memory_pool(), "bytes_allocated")
        assert a1t.system_memory_pool() is not None
        assert a1t.supported_memory_backends() == ["system"]
        with pytest.raises(a1t.ArrowNotImplementedError):
            a1t.jemalloc_memory_pool()

    def test_threads(self):
        assert a1t.cpu_count() > 0
        a1t.set_io_thread_count(4)
        assert a1t.io_thread_count() == 4


class TestIpcModule:
    TBL = None

    def _tbl(self):
        return a1t.table({"x": pa.array([1, 2, 3]),
                          "s": pa.array(["a", "b", "c"])})

    def test_file_roundtrip(self):
        buf = io.BytesIO()
        with a1t.ipc.new_file(buf) as w:
            w.write_table(self._tbl())
        rd = a1t.ipc.open_file(buf.getvalue())
        assert rd.num_record_batches >= 1
        assert rd.read_all().num_rows == 3

    def test_stream_wire_interop(self):
        buf = io.BytesIO()
        with a1t.ipc.new_stream(buf) as w:
            w.write_table(self._tbl())
        assert a1t.ipc.open_stream(buf.getvalue()).read_all().num_rows == 3
        # pyarrow reads our native stream bytes
        assert pa.ipc.open_stream(buf.getvalue()).read_all().num_rows == 3

    def test_serialize_pandas(self):
        df = pd.DataFrame({"a": [1, 2], "b": ["x", "y"]})
        out = a1t.deserialize_pandas(a1t.serialize_pandas(df))
        assert out.reset_index(drop=True).equals(df)


class TestIoFacades:
    def test_csv(self, tmp_path):
        import arrow1_tpu.csv as acsv

        p = tmp_path / "t.csv"
        p.write_text("a,b\n1,x\n2,y\n")
        t = acsv.read_csv(str(p))
        assert t.column("a").to_pylist() == [1, 2]
        t2 = acsv.read_csv(str(p), parse_options=acsv.ParseOptions(
            delimiter=","))
        assert t2.num_rows == 2

    def test_parquet(self, tmp_path):
        import arrow1_tpu.parquet as apq

        tbl = a1t.table({"x": pa.array([1, 2, 3])})
        p = str(tmp_path / "t.parquet")
        apq.write_table(tbl, p)
        assert apq.read_table(p).num_rows == 3
        assert len(apq.read_schema(p).fields) == 1
        pf = apq.ParquetFile(p)
        assert pf.num_row_groups >= 1
        assert sum(b.num_rows for b in pf.iter_batches(2)) == 3
        with apq.ParquetWriter(str(tmp_path / "w.parquet")) as w:
            w.write_table(tbl)
        assert apq.read_table(str(tmp_path / "w.parquet")).num_rows == 3

    def test_feather_json(self, tmp_path):
        import arrow1_tpu.feather as aft
        import arrow1_tpu.json as ajson

        tbl = a1t.table({"x": pa.array([1, 2, 3])})
        p = str(tmp_path / "t.feather")
        aft.write_table(tbl, p)
        assert aft.read_table(p).num_rows == 3
        assert aft.read_feather(p)["x"].tolist() == [1, 2, 3]
        j = tmp_path / "t.ndjson"
        j.write_text('{"a": 1}\n{"a": 2}\n')
        assert ajson.read_json(str(j)).num_rows == 2


class TestMethodParity:
    """Array/ChunkedArray/Schema/Table/RecordBatch convenience methods
    (python/pyarrow/{array,table,types}.pxi surface)."""

    def test_column_methods(self):
        col = a1t.column(pa.array([3.0, 1.0, None, 1.0]))
        assert col.type == a1t.float64
        assert col.nbytes > 0
        assert col.cast(a1t.int64, safe=False).to_pylist() == [3, 1, None, 1]
        assert col.drop_null().to_pylist() == [3.0, 1.0, 1.0]
        assert col.sort().to_pylist() == [1.0, 1.0, 3.0, None]
        assert col.fill_null(9.0).to_pylist() == [3.0, 1.0, 9.0, 1.0]
        assert col.is_null().to_pylist() == [False, False, True, False]
        assert col.index(1.0).as_py() == 1
        assert col.sum().as_py() == 5.0
        assert col.equals(a1t.column(pa.array([3.0, 1.0, None, 1.0])))
        assert col.tolist() == col.to_pylist()

    def test_chunked_methods(self):
        ca = a1t.chunked_array([[1, 2], [3]])
        assert len(list(ca.iterchunks())) == 2
        assert ca.sort("descending").to_pylist() == [3, 2, 1]
        assert ca.take(a1t.column(pa.array([2, 0]))).to_pylist() == [3, 1]
        assert ca.nbytes > 0

    def test_schema_methods(self):
        s = a1t.schema([("a", a1t.int32), ("b", a1t.string)])
        assert s.get_field_index("b") == 1
        assert s.get_field_index("zz") == -1
        assert s.remove(0).names == ("b",)
        assert s.set(0, a1t.Field("z", a1t.int8)).names == ("z", "b")
        assert s.equals(a1t.schema([("a", a1t.int32), ("b", a1t.string)]))
        et = s.empty_table()
        assert et.num_rows == 0 and et.schema.names == ("a", "b")
        # serialized schema is a valid IPC stream pyarrow can open
        rd = pa.ipc.open_stream(s.serialize())
        assert [f.name for f in rd.schema] == ["a", "b"]

    def test_table_methods(self):
        t = a1t.Table.from_pylist([{"a": 1, "b": "x"}, {"a": 2, "b": "y"}])
        assert t.num_rows == 2
        sa = t.to_struct_array()
        assert sa.names == ("a", "b")
        assert a1t.Table.from_struct_array(sa).num_rows == 2
        assert sum(b.num_rows for b in t.to_reader(1)) == 2
        assert t.nbytes > 0

    def test_table_flatten(self):
        rb = a1t.record_batch(pa.record_batch(
            {"s": pa.array([{"u": 1, "v": 2}, {"u": 3, "v": 4}]),
             "x": pa.array([5, 6])}))
        ft = a1t.Table([rb]).flatten()
        assert ft.schema.names == ("s.u", "s.v", "x")

    def test_recordbatch_serialize(self):
        rb = a1t.RecordBatch.from_pandas(pd.DataFrame({"q": [1, 2]}))
        assert pa.ipc.open_stream(rb.serialize()).read_all().num_rows == 2
