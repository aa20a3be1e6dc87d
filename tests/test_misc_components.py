"""Tensor/sparse, Flight, C-data interface, cancel, runtime info,
ChunkedColumn."""

import numpy as np
import pyarrow as pa
import pytest

import arrow1_tpu as a1t
from arrow1_tpu.cancel import CancelledError, StopSource
from arrow1_tpu.cdata import export_batch, import_batch, import_column
from arrow1_tpu.runtime import (MemoryLog, build_info, device_memory_stats,
                                runtime_info)
from arrow1_tpu.table import ChunkedColumn, concat_columns
from arrow1_tpu.tensor import SparseCOOTensor, Tensor


class TestTensor:
    def test_dense_roundtrip(self):
        x = np.arange(12, dtype=np.float32).reshape(3, 4)
        t = Tensor.from_arrow(pa.Tensor.from_numpy(x, dim_names=["r", "c"]))
        assert t.shape == (3, 4)
        assert t.dim_names == ("r", "c")
        back = t.to_arrow()
        np.testing.assert_array_equal(back.to_numpy(), x)

    def test_coo_conversion(self):
        x = np.zeros((4, 5), dtype=np.float64)
        x[0, 1] = 2.0
        x[3, 4] = -1.0
        t = Tensor(a1t.column(x.ravel()).data.reshape(4, 5))
        coo = t.to_coo()
        assert coo.non_zero_length == 2
        dense = coo.to_dense()
        np.testing.assert_array_equal(dense.to_numpy(), x)

    def test_csr_and_matvec(self):
        x = np.array([[1.0, 0, 2], [0, 0, 3], [4, 5, 0]])
        import jax.numpy as jnp

        t = Tensor(jnp.asarray(x))
        csr = t.to_coo().to_csr()
        v = jnp.asarray(np.array([1.0, 2.0, 3.0]))
        np.testing.assert_allclose(np.asarray(csr.matvec(v)), x @ [1, 2, 3])
        np.testing.assert_array_equal(csr.to_dense().to_numpy(), x)

    def test_arrow_sparse_roundtrip(self):
        x = np.array([[0, 1.5], [2.5, 0]])
        import jax.numpy as jnp

        coo = Tensor(jnp.asarray(x)).to_coo()
        pa_t = coo.to_arrow()
        back = SparseCOOTensor.from_arrow(pa_t)
        np.testing.assert_array_equal(back.to_dense().to_numpy(), x)


class TestFlight:
    def test_put_get_list_drop(self):
        from arrow1_tpu.flight import FlightClient, serve_tables

        rb = a1t.record_batch({"x": [1, 2, 3], "s": ["a", None, "b"]})
        with serve_tables({"t1": rb}) as server:
            client = FlightClient(server.location)
            assert client.list() == ["t1"]
            got = client.get("t1").combine_chunks()
            assert got["x"].to_numpy().tolist() == [1, 2, 3]
            assert got["s"].to_numpy().tolist() == ["a", None, "b"]
            client.put("t2", rb)
            assert sorted(client.list()) == ["t1", "t2"]
            got2 = client.get("t2").combine_chunks()
            assert got2["x"].to_numpy().tolist() == [1, 2, 3]
            client.drop("t1")
            assert client.list() == ["t2"]


class TestCData:
    def test_import_capsule_provider(self):
        arr = pa.array([1, 2, None], type=pa.int64())
        col = import_column(arr)
        assert col.to_arrow().equals(arr)

    def test_batch_roundtrip_via_capsules(self):
        rb = a1t.record_batch({"x": [1, 2], "y": [0.5, None]})
        exported = export_batch(rb)
        assert hasattr(exported, "__arrow_c_array__")
        back = import_batch(exported)
        assert back["x"].to_numpy().tolist() == [1, 2]

    def test_import_stream(self):
        tbl = pa.table({"a": [1, 2, 3]})
        reader = pa.RecordBatchReader.from_batches(tbl.schema,
                                                   tbl.to_batches())
        back = import_batch(reader)
        assert back["a"].to_numpy().tolist() == [1, 2, 3]


class TestCancel:
    def test_stop_token(self):
        src = StopSource()
        tok = src.token()
        tok.poll()  # no-op
        src.request_stop("user abort")
        assert tok.is_stop_requested()
        with pytest.raises(CancelledError, match="user abort"):
            tok.poll()
        src.reset()
        tok.poll()


class TestRuntime:
    def test_build_info(self):
        bi = build_info()
        assert bi.version and bi.jax_version

    def test_runtime_info(self):
        ri = runtime_info()
        assert ri.backend == "cpu"  # pinned by conftest
        assert ri.device_count >= 8
        assert ri.x64_enabled

    def test_memory_log(self):
        with MemoryLog() as log:
            _ = a1t.column(np.arange(1000))
        assert isinstance(log.delta, dict)


class TestChunkedColumn:
    def test_basics(self):
        c1 = a1t.column(np.array([1, 2, 3], dtype=np.int64))
        c2 = a1t.column(pa.array([4, None], type=pa.int64()))
        cc = ChunkedColumn([c1, c2])
        assert cc.length == 5
        assert cc.num_chunks == 2
        assert cc.null_count == 1
        merged = cc.combine_chunks()
        assert merged.to_arrow().to_pylist() == [1, 2, 3, 4, None]

    def test_slice(self):
        c1 = a1t.column(np.array([1, 2, 3], dtype=np.int64))
        c2 = a1t.column(np.array([4, 5], dtype=np.int64))
        cc = ChunkedColumn([c1, c2])
        sl = cc.slice(2, 2)
        assert sl.combine_chunks().to_numpy().tolist() == [3, 4]

    def test_to_arrow(self):
        cc = ChunkedColumn([a1t.column(np.array([1], dtype=np.int64))])
        assert cc.to_arrow().num_chunks == 1


class TestFlightExchange:
    def test_do_exchange_with_transform(self):
        import arrow1_tpu.compute as ac
        from arrow1_tpu.flight import FlightClient, serve_tables

        rb = a1t.record_batch({"x": [1, 2, 3]})
        with serve_tables({}) as srv:
            srv.set_exchange_fn(lambda b: a1t.RecordBatch(
                (ac.multiply(b["x"], 2),), ("x2",)))
            cli = FlightClient(srv.location)
            out = cli.exchange("job", rb).combine_chunks()
            assert out["x2"].to_numpy().tolist() == [2, 4, 6]

    def test_do_exchange_echo(self):
        from arrow1_tpu.flight import FlightClient, serve_tables

        rb = a1t.record_batch({"x": [9, 8]})
        with serve_tables({}) as srv:
            cli = FlightClient(srv.location)
            out = cli.exchange("echo", rb).combine_chunks()
            assert out["x"].to_numpy().tolist() == [9, 8]


class TestSparseCSF:
    def test_byte_parity_with_pyarrow(self):
        import jax.numpy as jnp

        from arrow1_tpu.tensor import SparseCSFTensor, Tensor

        for shape, seed in [((2, 3, 4), 0), ((5, 7), 1), ((2, 3, 2, 2), 3),
                            ((4, 2, 5, 3), 5)]:
            rng = np.random.default_rng(seed)
            y = np.where(rng.random(shape) > 0.6, rng.random(shape), 0)
            c = Tensor(jnp.asarray(y)).to_coo().to_csf()
            ref = pa.SparseCSFTensor.from_tensor(pa.Tensor.from_numpy(y))
            assert np.allclose(c.to_dense().to_numpy(), y)
            assert c.to_arrow().equals(ref), shape
            back = SparseCSFTensor.from_arrow(ref)
            assert np.allclose(back.to_dense().to_numpy(), y)
            assert np.allclose(c.to_coo().to_dense().to_numpy(), y)

    def test_empty(self):
        import jax.numpy as jnp

        from arrow1_tpu.tensor import Tensor

        z = Tensor(jnp.zeros((3, 3))).to_coo().to_csf()
        assert z.non_zero_length == 0
        assert np.array_equal(z.to_dense().to_numpy(), np.zeros((3, 3)))


class TestUnionColumn:
    def _dense(self):
        types = pa.array([2, 5, 2, 5], type=pa.int8())
        offs = pa.array([0, 0, 1, 1], type=pa.int32())
        ints = pa.array([10, None], type=pa.int64())
        floats = pa.array([0.5, 1.5], type=pa.float64())
        return pa.UnionArray.from_dense(types, offs, [ints, floats],
                                        ["i", "f"], [2, 5])

    def test_dense_roundtrip_slice_take(self):
        d = self._dense()
        col = a1t.column(d)
        assert col.dtype.kind == "dense_union"
        assert col.to_arrow().to_pylist() == d.to_pylist()
        assert col.to_arrow().type == d.type
        assert col.null_count == d.null_count == 0
        assert col.logical_null_count == 1
        assert col.slice(1, 2).to_pylist() == d.slice(1, 2).to_pylist()
        idx = np.array([3, 0])
        assert col.take(idx).to_pylist() == \
            d.take(pa.array(idx)).to_pylist()

    def test_sparse_roundtrip_take(self):
        types = pa.array([0, 1, 0], type=pa.int8())
        s = pa.UnionArray.from_sparse(
            types, [pa.array([1, 0, 3], type=pa.int64()),
                    pa.array([0.0, 2.5, 0.0])], ["i", "f"])
        col = a1t.column(s)
        assert col.dtype.kind == "sparse_union"
        assert col.to_arrow().to_pylist() == s.to_pylist()
        assert col.take(np.array([2, 1])).to_pylist() == \
            s.take(pa.array([2, 1])).to_pylist()

    def test_dtype_conversion(self):
        from arrow1_tpu import dtypes as dtm

        d = self._dense()
        t = dtm.from_arrow(d.type)
        assert t.type_codes == (2, 5)
        assert dtm.to_arrow(t) == d.type

    def test_batch_roundtrip(self):
        d = self._dense()
        rb = pa.record_batch({"u": d, "x": pa.array([1, 2, 3, 4])})
        back = a1t.record_batch(rb).to_arrow()
        assert back.column("u").to_pylist() == d.to_pylist()


class TestNestedTypeConcatValidate:
    def test_concat_and_validate_all_nested(self):
        from arrow1_tpu.table import concat_columns
        from arrow1_tpu.validate import validate_column

        s = pa.array([{"x": 1}, None])
        m = pa.array([[("a", 1)], []], type=pa.map_(pa.string(),
                                                    pa.int64()))
        u = pa.UnionArray.from_sparse(
            pa.array([0, 1], type=pa.int8()),
            [pa.array([1, 0], type=pa.int64()), pa.array([0.0, 2.5])],
            ["i", "f"])
        du = pa.UnionArray.from_dense(
            pa.array([2, 5, 2], type=pa.int8()),
            pa.array([0, 0, 1], type=pa.int32()),
            [pa.array([10, 20], type=pa.int64()), pa.array([0.5])],
            ["i", "f"], [2, 5])
        for arr in (s, m, u, du):
            col = a1t.column(arr)
            cc = concat_columns([col, col])
            assert cc.to_arrow().to_pylist() == arr.to_pylist() * 2
            validate_column(col, full=True)

    def test_ipc_roundtrip_struct_map(self, tmp_path):
        from arrow1_tpu import io as aio

        s = pa.array([{"x": 1}, None])
        m = pa.array([[("a", 1)], []], type=pa.map_(pa.string(),
                                                    pa.int64()))
        b = a1t.record_batch(pa.record_batch({"s": s, "m": m}))
        path = str(tmp_path / "t.arrow")
        aio.write_ipc(b, path)
        back = aio.read_ipc(path).combine_chunks()
        assert back["s"].to_arrow().to_pylist() == s.to_pylist()
        assert back["m"].to_arrow().to_pylist() == m.to_pylist()


class TestStreamsAndMemory:
    def test_mmap_and_cache(self, tmp_path):
        from arrow1_tpu.io.streams import MemoryMappedFile, ReadRangeCache
        import io as _io

        p = tmp_path / "f.bin"
        p.write_bytes(bytes(range(256)) * 16)
        with MemoryMappedFile(str(p)) as mm:
            assert mm.size() == 4096
            assert mm.read_at(256, 4).tobytes() == bytes(range(4))
        f = _io.BytesIO(b"z" * 10000)
        rc = ReadRangeCache(f, hole_size_limit=64)
        rc.cache([(0, 100), (120, 50), (9000, 10)])
        assert rc.num_fetches == 2
        assert rc.read(130, 8) == b"z" * 8

    def test_buffered_and_buffer_io(self, tmp_path):
        from arrow1_tpu.io.streams import (BufferedInputStream,
                                           BufferedOutputStream,
                                           BufferOutputStream, BufferReader)

        p = tmp_path / "b.bin"
        with BufferedOutputStream(str(p)) as out:
            out.write(b"hello")
        with BufferedInputStream(str(p)) as inp:
            assert inp.read() == b"hello"
        r = BufferReader(b"abc")
        assert r.read(2) == b"ab"
        import pytest as _pytest

        from arrow1_tpu.errors import Invalid

        with _pytest.raises(Invalid):
            r.write(b"x")
        o = BufferOutputStream()
        o.write(b"xy")
        assert o.getvalue() == b"xy"

    def test_memory_pools(self):
        from arrow1_tpu.memory import (LoggingMemoryPool, MemoryPool,
                                       ProxyMemoryPool,
                                       default_memory_pool)
        import io as _io

        base = MemoryPool()
        proxy = ProxyMemoryPool(base)
        proxy.allocate(100)
        assert proxy.bytes_allocated == 100
        assert base.bytes_allocated == 100
        proxy.free(100)
        assert proxy.bytes_allocated == 0
        sink = _io.StringIO()
        logp = LoggingMemoryPool(MemoryPool(), sink=sink)
        logp.allocate(64)
        assert "Allocate: size = 64" in sink.getvalue()
        assert logp.max_memory == 64

    def test_builders_account_to_pool(self):
        from arrow1_tpu.builders import Int64Builder
        from arrow1_tpu.memory import default_memory_pool

        pool = default_memory_pool()
        before = pool.bytes_allocated
        b = Int64Builder()
        for i in range(5000):
            b.append(i)
        assert pool.bytes_allocated >= before + 5000 * 8
        b.finish()

    def test_array_from_json(self):
        from arrow1_tpu import dtypes as dt
        from arrow1_tpu.testing import array_from_json, batch_from_json

        c = array_from_json(dt.float64, "[1.5, null, 2.5]")
        assert c.to_arrow().to_pylist() == [1.5, None, 2.5]
        b = batch_from_json([("x", dt.int64)], '[{"x": 3}]')
        assert b.to_arrow().to_pydict() == {"x": [3]}
