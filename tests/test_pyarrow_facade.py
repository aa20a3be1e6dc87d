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


class TestReviewFixes:
    """Regressions for the round-2 review findings on the facade."""

    def test_binary_string_kernels(self):
        import pyarrow.compute as pc

        bvals = [b"xyz", b"\xff\x00y", None, b"abcy"]
        barr = pa.array(bvals, type=pa.binary())
        bcol = a1t.column(barr)
        import arrow1_tpu.compute as ac
        for name, kw in [
                ("match_substring", dict(pattern="y", ignore_case=True)),
                ("starts_with", dict(pattern="x", ignore_case=True)),
                ("ends_with", dict(pattern="y", ignore_case=True)),
                ("ends_with", dict(pattern="y")),
                ("count_substring", dict(pattern="y", ignore_case=True)),
                ("find_substring", dict(pattern="y", ignore_case=True)),
                ("match_substring_regex", dict(pattern="[ab]c"))]:
            assert getattr(ac, name)(bcol, **kw).to_pylist() == \
                getattr(pc, name)(barr, **kw).to_pylist(), (name, kw)
        assert ac.split_pattern(bcol, pattern="b").to_arrow().to_pylist() \
            == pc.split_pattern(barr, pattern="b").to_pylist()

    def test_open_csv_and_convert_options(self, tmp_path):
        import arrow1_tpu.csv as acsv

        p = tmp_path / "x.csv"
        p.write_text("a;b\n1;x\n2;y\n")
        batches = list(acsv.open_csv(
            str(p), parse_options=acsv.ParseOptions(delimiter=";")))
        assert batches[0].num_rows == 2 and "a" in batches[0].names
        q = tmp_path / "y.csv"
        q.write_text("a,b\n1,NA\n2,z\n")
        t = acsv.read_csv(str(q), convert_options=acsv.ConvertOptions(
            null_values=["NA"], strings_can_be_null=True))
        assert t.column("b").to_pylist() == [None, "z"]
        t2 = acsv.read_csv(str(q), read_options=acsv.ReadOptions(
            skip_rows_after_names=1))
        assert t2.column("a").to_pylist() == [2]

    def test_schema_only_ipc(self):
        sch = a1t.schema([("a", a1t.int64), ("b", a1t.string)])
        buf = io.BytesIO()
        with a1t.ipc.new_stream(buf, sch):
            pass
        rd = a1t.ipc.open_stream(buf.getvalue())
        assert rd.read_all().num_rows == 0
        assert rd.schema.names == ("a", "b")
        assert pa.ipc.open_stream(buf.getvalue()).read_all().num_rows == 0

    def test_read_pandas(self):
        buf = io.BytesIO()
        with a1t.ipc.new_stream(buf) as w:
            w.write_table(a1t.table({"q": pa.array([1, 2])}))
        got = a1t.ipc.open_stream(buf.getvalue()).read_pandas()
        assert got["q"].tolist() == [1, 2]

    def test_to_pandas_nulls(self):
        assert pd.isna(a1t.column(pa.array([1, None])).to_pandas().iloc[1])

    def test_inverse_permutation_bounds(self):
        import arrow1_tpu.compute as ac

        with pytest.raises(a1t.ArrowIndexError):
            ac.inverse_permutation(a1t.column(pa.array([5])), max_index=2)
        with pytest.raises(a1t.ArrowIndexError):
            ac.inverse_permutation(a1t.column(pa.array([-1])))

    def test_flatten_null_parent(self):
        sa = pa.array([{"u": 1}, {"u": 2}, None])
        ft = a1t.Table([a1t.record_batch(pa.record_batch({"s": sa}))])
        want = pa.Table.from_batches(
            [pa.record_batch({"s": sa})]).flatten()
        assert ft.flatten().column("s.u").to_pylist() == \
            want.column("s.u").to_pylist()

    def test_log_memory_toggle(self):
        a1t.log_memory_allocations(True)
        a1t.log_memory_allocations(True)
        a1t.log_memory_allocations(False)
        assert not isinstance(a1t.default_memory_pool(),
                              a1t.LoggingMemoryPool)


class TestDatasetFsParity:
    """pyarrow.dataset / pyarrow.fs namespace + behavior parity."""

    def test_namespaces_complete(self):
        import pyarrow.dataset as pds
        import pyarrow.fs as pfs

        import arrow1_tpu.dataset as ads
        import arrow1_tpu.fs as afs
        missing_ds = [n for n in dir(pds) if not n.startswith("_")
                      and n != "pa" and not hasattr(ads, n)]
        missing_fs = [n for n in dir(pfs) if not n.startswith("_")
                      and n != "atexit" and not hasattr(afs, n)]
        assert missing_ds == [] and missing_fs == []

    def test_dataset_variants(self, tmp_path):
        import arrow1_tpu.dataset as ads
        import arrow1_tpu.fs as afs

        t = a1t.table({"x": pa.array([1, 2, 3, 4]),
                       "p": pa.array(["a", "a", "b", "b"])})
        d = str(tmp_path)
        ads.write_dataset(t, d, partitioning_keys=["p"], format="parquet")
        ds = ads.dataset(d, format=ads.ParquetFileFormat(),
                         partitioning="hive")
        assert ds.to_table().num_rows == 4
        frag = ds.get_fragments()[0]
        assert ads.get_partition_keys(frag.partition_expression) in (
            {"p": "a"}, {"p": "b"})
        assert ads.InMemoryDataset(t).to_table().num_rows == 4
        assert ads.UnionDataset(children=[
            ads.InMemoryDataset(t), ads.InMemoryDataset(t)
        ]).to_table().num_rows == 8
        files = [f.path for f in ds.fragments]
        assert ads.dataset(files, format="parquet").to_table().num_rows == 4
        fac = ads.FileSystemDatasetFactory(
            afs.LocalFileSystem(), files, ads.ParquetFileFormat())
        assert fac.finish().to_table().num_rows == 4
        e = ads.FilenamePartitioning(["k"]).parse("7_part.parquet")
        assert ads.get_partition_keys(e) == {"k": 7}

    def test_fs_helpers(self, tmp_path):
        import arrow1_tpu.fs as afs

        lfs = afs.LocalFileSystem()
        src = tmp_path / "f.txt"
        src.write_text("hi")
        assert lfs.get_file_info(str(src)).type == afs.FileType.File
        sub = afs.SubTreeFileSystem(str(tmp_path), lfs)
        assert any(i.path.endswith("f.txt") for i in sub.ls(""))
        dst = tmp_path / "g.txt"
        afs.copy_files(str(src), str(dst))
        assert dst.read_text() == "hi"
        sel = afs.FileSelector(str(tmp_path), recursive=True)
        assert sel.recursive


class TestExprFlightParity:
    def test_expression_namespace(self):
        import pyarrow.dataset as pds

        import arrow1_tpu.expr as ae
        pa_e = {n for n in dir(pds.field("x")) if not n.startswith("_")}
        us_e = {n for n in dir(ae.field("x")) if not n.startswith("_")}
        assert pa_e - us_e == set()

    def test_expression_methods(self):
        import arrow1_tpu.expr as ae
        b = a1t.record_batch(pa.record_batch(
            {"x": pa.array([1.0, float("nan")])}))
        assert ae.field("x").is_nan().execute(b).to_pylist() == \
            [False, True]
        assert ae.field("x").is_null(
            nan_is_null=True).execute(b).to_pylist() == [False, True]
        assert ae.field("x").equals(ae.field("x"))
        assert not ae.field("x").equals(ae.field("y"))

    def test_flight_namespace(self):
        import pyarrow.flight as pf

        import arrow1_tpu.flight as af
        missing = [n for n in dir(pf) if not n.startswith("_")
                   and not hasattr(af, n)]
        assert missing == []
        assert issubclass(af.FlightUnauthorizedError, af.FlightError)
        rt = af.BasicAuth.deserialize(af.BasicAuth("u", "p").serialize())
        assert rt.username == "u" and rt.password == "p"


class TestAceroScalarParity:
    def test_acero_namespace(self):
        import pyarrow.acero as pac

        import arrow1_tpu.acero as aac
        missing = [n for n in dir(pac) if not n.startswith("_")
                   and not hasattr(aac, n)]
        assert missing == []

    def test_scalar_methods(self):
        s = a1t.scalar(5)
        assert s.type == a1t.int64
        assert s.equals(a1t.scalar(5))
        assert not s.equals(a1t.scalar(6))
        assert s.cast(a1t.float64).as_py() == 5.0
        missing = [n for n in dir(pa.scalar(5)) if not n.startswith("_")
                   and not hasattr(s, n)]
        assert missing == []
