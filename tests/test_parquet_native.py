"""Native Parquet reader/writer vs pyarrow.parquet (the reference's
own engine, cpp/src/parquet/).

Differential oracle: pyarrow-written files (default SNAPPY +
RLE_DICTIONARY, plus per-codec / per-version / per-dictionary-toggle
grids) must decode byte-identically through the native reader
(arrow1_tpu/io/parquet_native.py: hand-rolled Thrift compact metadata,
RLE-hybrid levels, dictionary pages, native snappy); natively written
files must read back exactly through pyarrow."""

import io

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import arrow1_tpu as a1t

from arrow1_tpu.interop import record_batch_from_arrow
from arrow1_tpu.io.parquet import read_parquet, write_parquet
from arrow1_tpu.io.parquet_native import (read_parquet_native,
                                          write_parquet_native)
from arrow1_tpu.native import native_available


def _mixed_table(n=257, seed=0, nulls=True):
    rng = np.random.default_rng(seed)
    mask = rng.random(n) < 0.15 if nulls else np.zeros(n, bool)

    def m(vals):
        return [None if mask[i] else v for i, v in enumerate(vals)]

    return pa.table({
        "i64": pa.array(m(rng.integers(-2**40, 2**40, n)), pa.int64()),
        "i32": pa.array(m(rng.integers(-2**20, 2**20, n)), pa.int32()),
        "f64": pa.array(m(rng.normal(size=n)), pa.float64()),
        "f32": pa.array(m(rng.normal(size=n).astype(np.float32)),
                        pa.float32()),
        "b": pa.array(m(rng.random(n) < 0.5), pa.bool_()),
        "s": pa.array(m([f"val{int(x) % 37}" for x in
                         rng.integers(0, 1000, n)]), pa.string()),
    })


def _assert_tables_equal(a: pa.Table, b: pa.Table):
    assert a.column_names == b.column_names
    for name in a.column_names:
        assert (a.column(name).to_pylist() ==
                b.column(name).to_pylist()), name


def _roundtrip_via_native_reader(t: pa.Table, **write_kw):
    buf = io.BytesIO()
    pq.write_table(t, buf, **write_kw)
    rb = read_parquet_native(buf.getvalue())
    _assert_tables_equal(t.combine_chunks(), rb.to_arrow())


@pytest.mark.parametrize("use_dictionary", [True, False])
@pytest.mark.parametrize("version", ["1.0", "2.4", "2.6"])
def test_read_pyarrow_grid(use_dictionary, version):
    if not native_available():
        pytest.skip("native snappy unavailable")
    _roundtrip_via_native_reader(_mixed_table(),
                                 use_dictionary=use_dictionary,
                                 version=version)


@pytest.mark.parametrize("codec", ["none", "gzip", "zstd"])
def test_read_codecs(codec):
    _roundtrip_via_native_reader(_mixed_table(), compression=codec)


def test_read_data_page_v2():
    if not native_available():
        pytest.skip("native snappy unavailable")
    _roundtrip_via_native_reader(_mixed_table(),
                                 data_page_version="2.0")


def test_read_multi_row_group():
    if not native_available():
        pytest.skip("native snappy unavailable")
    t = _mixed_table(n=1000)
    buf = io.BytesIO()
    pq.write_table(t, buf, row_group_size=123)
    rb = read_parquet_native(buf.getvalue())
    _assert_tables_equal(t, rb.to_arrow())


def test_read_no_nulls_and_empty():
    _roundtrip_via_native_reader(_mixed_table(nulls=False),
                                 compression="none")
    _roundtrip_via_native_reader(_mixed_table(n=0),
                                 compression="none")


def test_read_temporal_types():
    t = pa.table({
        "d": pa.array([0, 1, None, 20000], pa.date32()),
        "ts_us": pa.array([0, 10**15, None, 7], pa.timestamp("us")),
        "ts_ms": pa.array([0, 10**12, None, 7], pa.timestamp("ms")),
    })
    _roundtrip_via_native_reader(t, compression="none")


def test_read_column_projection():
    t = _mixed_table()
    buf = io.BytesIO()
    pq.write_table(t, buf, compression="none")
    rb = read_parquet_native(buf.getvalue(), columns=["f64", "s"])
    assert list(rb.names) == ["f64", "s"]
    _assert_tables_equal(t.select(["f64", "s"]), rb.to_arrow())


def test_nested_one_level_reads_natively():
    t = pa.table({
        "l": pa.array([[1, 2], [], None, [3, None]], pa.list_(pa.int64())),
        "s": pa.array([{"a": 1, "b": "x"}, None, {"a": None, "b": "y"},
                       {"a": 4, "b": None}]),
        "ls": pa.array([["u"], None, [], ["v", "w"]]),
    })
    buf = io.BytesIO()
    pq.write_table(t, buf)
    rb = read_parquet_native(buf.getvalue())
    got = rb.to_arrow()
    for name in t.column_names:
        assert got[name].to_pylist() == t[name].to_pylist(), name


def test_nested_write_native_pyarrow_reads():
    t = pa.table({
        "l": pa.array([[1, 2], [], None, [3, None]], pa.list_(pa.int64())),
        "s": pa.array([{"a": 1, "b": 0.5}, None, {"a": None, "b": 1.5},
                       {"a": 4, "b": None}]),
    })
    batch = a1t.record_batch(t.to_batches()[0])
    buf = io.BytesIO()
    write_parquet_native(batch, buf, compression="none")
    got = pq.read_table(io.BytesIO(buf.getvalue()))
    for name in t.column_names:
        assert got[name].to_pylist() == t[name].to_pylist(), name
    # and our own reader round-trips it
    rb = read_parquet_native(buf.getvalue())
    for name in t.column_names:
        assert rb.to_arrow()[name].to_pylist() == t[name].to_pylist()


def test_deeper_nesting_reads_natively():
    """Arbitrary-depth nesting decodes through the Dremel assembler
    (reference: parquet/arrow/path_internal.cc reconstruction)."""
    cases = [
        pa.array([[[1]], None, [[2, 3], []], [None]],
                 pa.list_(pa.list_(pa.int64()))),
        pa.array([[{"a": 1, "b": "x"}], None,
                  [{"a": None, "b": "y"}, {"a": 3, "b": None}], []],
                 pa.list_(pa.struct([("a", pa.int64()),
                                     ("b", pa.string())]))),
        pa.array([{"s": {"a": 1}}, {"s": None}, None, {"s": {"a": None}}],
                 pa.struct([("s", pa.struct([("a", pa.int64())]))])),
        pa.array([[("k1", 1), ("k2", 2)], None, [], [("k3", None)]],
                 pa.map_(pa.string(), pa.int64())),
        pa.array([{"m": [("a", [1, 2])]}, {"m": None},
                  {"m": [("b", []), ("c", [3])]}],
                 pa.struct([("m", pa.map_(pa.string(),
                                          pa.list_(pa.int64())))])),
        pa.array([[[[1, 2], [3]], [[4]]], [], [[[5]]]],
                 pa.list_(pa.list_(pa.list_(pa.int64())))),
    ]
    for arr in cases:
        t = pa.table({"x": arr})
        buf = io.BytesIO()
        pq.write_table(t, buf)
        rb = read_parquet_native(buf.getvalue())
        assert rb.to_arrow()["x"].to_pylist() == t["x"].to_pylist(), \
            str(arr.type)


@pytest.mark.parametrize("seed", range(4))
def test_deep_nested_differential_fuzz(seed):
    """Random depth-2..4 nested schemas with nulls at every level:
    pyarrow-written files must decode identically through the native
    Dremel assembler."""
    rng = np.random.default_rng(100 + seed)

    def rand_type(depth):
        if depth == 0:
            return rng.choice([pa.int64(), pa.float64(), pa.string()])
        k = rng.integers(0, 4)
        if k == 0:
            return pa.list_(rand_type(depth - 1))
        if k == 1:
            return pa.struct([("f0", rand_type(depth - 1)),
                              ("f1", pa.int32())])
        if k == 2:
            return pa.map_(pa.string(), rand_type(depth - 1))
        return rand_type(depth - 1)

    def rand_value(t):
        if rng.random() < 0.15:
            return None
        if pa.types.is_list(t):
            return [rand_value(t.value_type)
                    for _ in range(rng.integers(0, 4))]
        if pa.types.is_map(t):
            return [(f"k{j}", rand_value(t.item_type))
                    for j in range(rng.integers(0, 3))]
        if pa.types.is_struct(t):
            return {f.name: rand_value(f.type) for f in t}
        if t == pa.int64() or t == pa.int32():
            return int(rng.integers(-1000, 1000))
        if t == pa.float64():
            return float(np.round(rng.standard_normal(), 6))
        return str(rng.choice(["a", "bb", "ccc", ""]))

    n = int(rng.integers(1, 50))
    t = rand_type(int(rng.integers(2, 5)))
    arr = pa.array([rand_value(t) for _ in range(n)], t)
    table = pa.table({"x": arr})
    buf = io.BytesIO()
    pq.write_table(table, buf)
    rb = read_parquet_native(buf.getvalue())
    assert rb.to_arrow()["x"].to_pylist() == table["x"].to_pylist(), \
        str(t)


@pytest.mark.parametrize("codec", ["snappy", "none", "gzip", "zstd"])
def test_write_native_pyarrow_reads(codec):
    if codec == "snappy" and not native_available():
        pytest.skip("native snappy unavailable")
    t = _mixed_table()
    rb = record_batch_from_arrow(t)
    out = io.BytesIO()
    write_parquet_native(rb, out, compression=codec)
    back = pq.read_table(io.BytesIO(out.getvalue()))
    _assert_tables_equal(t, back)


def test_write_native_self_read():
    t = _mixed_table()
    rb = record_batch_from_arrow(t)
    out = io.BytesIO()
    write_parquet_native(rb, out, compression="none")
    rb2 = read_parquet_native(out.getvalue())
    _assert_tables_equal(t, rb2.to_arrow())


def test_high_level_path_roundtrip(tmp_path):
    """read_parquet/write_parquet use the native path for flat tables
    and still agree with the oracle."""
    t = _mixed_table()
    p = str(tmp_path / "t.parquet")
    write_parquet(record_batch_from_arrow(t), p, compression="gzip")
    back = read_parquet(p)
    _assert_tables_equal(t, back.to_arrow())
    # nested falls back to pyarrow transparently
    tn = pa.table({"l": pa.array([[1], [2, 3]], pa.list_(pa.int64()))})
    pq.write_table(tn, p)
    back = read_parquet(p)
    assert back.to_arrow().column("l").to_pylist() == [[1], [2, 3]]


@pytest.mark.parametrize("seed", range(6))
def test_nested_differential_fuzz(seed):
    """Random one-level-nested tables: pyarrow-written files read back
    natively must match, and natively-written files must read back via
    pyarrow identically."""
    rng = np.random.default_rng(seed)
    n = int(rng.integers(1, 60))

    def rand_scalar(dt_kind):
        if dt_kind == "i":
            return int(rng.integers(-1000, 1000))
        if dt_kind == "f":
            return float(np.round(rng.standard_normal(), 6))
        return str(rng.choice(["a", "bb", "ccc", ""]))

    def rand_list(dt_kind):
        if rng.random() < 0.15:
            return None
        return [None if rng.random() < 0.2 else rand_scalar(dt_kind)
                for _ in range(int(rng.integers(0, 5)))]

    def rand_struct():
        if rng.random() < 0.15:
            return None
        return {"x": None if rng.random() < 0.2 else rand_scalar("i"),
                "y": None if rng.random() < 0.2 else rand_scalar("f")}

    kind = ["i", "f", "s"][seed % 3]
    patype = {"i": pa.int64(), "f": pa.float64(), "s": pa.string()}[kind]
    t = pa.table({
        "flat": pa.array([None if rng.random() < 0.2
                          else rand_scalar(kind) for _ in range(n)],
                         type=patype),
        "l": pa.array([rand_list(kind) for _ in range(n)],
                      type=pa.list_(patype)),
        "st": pa.array([rand_struct() for _ in range(n)]),
    })
    # pyarrow writes -> native reads
    buf = io.BytesIO()
    pq.write_table(t, buf, version="2.6")
    rb = read_parquet_native(buf.getvalue())
    got = rb.to_arrow()
    for name in t.column_names:
        assert got[name].to_pylist() == t[name].to_pylist(), (seed, name)
    # native writes -> pyarrow reads
    batch = a1t.record_batch(t.to_batches()[0])
    buf2 = io.BytesIO()
    write_parquet_native(batch, buf2, compression="none")
    back = pq.read_table(io.BytesIO(buf2.getvalue()))
    for name in t.column_names:
        assert back[name].to_pylist() == t[name].to_pylist(), (seed, name)


# --------------------------------------------------------------------
# DELTA_* / BYTE_STREAM_SPLIT encodings (reference: parquet/encoding.cc
# DeltaBitPackDecoder:1372, DeltaLengthByteArrayDecoder:1640,
# DeltaByteArrayDecoder:1721, ByteStreamSplitDecoder:1801)
# --------------------------------------------------------------------

def _enc_case(kind, rng, n):
    if kind == "i32":
        return (pa.array(rng.integers(-2**30, 2**30, n), pa.int32()),
                "DELTA_BINARY_PACKED")
    if kind == "i64":
        return (pa.array(rng.integers(-2**60, 2**60, n), pa.int64()),
                "DELTA_BINARY_PACKED")
    if kind == "i64_seq":  # near-constant deltas: tiny bit widths
        return (pa.array(np.arange(n, dtype=np.int64) * 3 +
                         rng.integers(0, 2, n), pa.int64()),
                "DELTA_BINARY_PACKED")
    if kind == "f32":
        return (pa.array(rng.normal(size=n).astype(np.float32)),
                "BYTE_STREAM_SPLIT")
    if kind == "f64":
        return (pa.array(rng.normal(size=n)), "BYTE_STREAM_SPLIT")
    if kind == "str_dlba":
        return (pa.array([f"val{i % 97}x{i}" for i in range(n)]),
                "DELTA_LENGTH_BYTE_ARRAY")
    return (pa.array(sorted(f"prefix{i % 31}/suffix{i}"
                            for i in range(n))), "DELTA_BYTE_ARRAY")


@pytest.mark.parametrize("withnull", [False, True])
@pytest.mark.parametrize("kind", ["i32", "i64", "i64_seq", "f32", "f64",
                                  "str_dlba", "str_dba"])
def test_read_delta_and_bss_encodings(kind, withnull):
    rng = np.random.default_rng(7)
    n = 3001  # multiple miniblocks, non-multiple of block size
    arr, enc = _enc_case(kind, rng, n)
    if withnull:
        m = rng.random(n) < 0.1
        arr = pa.array([None if mm else v.as_py()
                        for mm, v in zip(m, arr)], type=arr.type)
    t = pa.table({"x": arr})
    buf = io.BytesIO()
    pq.write_table(t, buf, use_dictionary=False,
                   column_encoding={"x": enc}, compression="NONE")
    rb = read_parquet_native(buf.getvalue())
    _assert_tables_equal(t, rb.to_arrow())


def test_read_delta_binary_packed_edge_values():
    """int64 extremes exercise the mod-2^64 wraparound the reference
    decodes with unsigned overflow (encoding.cc DeltaBitPackDecoder)."""
    vals = [0, 2**63 - 1, -2**63, -1, 1, 2**62, -2**62, 0]
    t = pa.table({"x": pa.array(vals, pa.int64())})
    buf = io.BytesIO()
    pq.write_table(t, buf, use_dictionary=False,
                   column_encoding={"x": "DELTA_BINARY_PACKED"},
                   compression="NONE")
    rb = read_parquet_native(buf.getvalue())
    _assert_tables_equal(t, rb.to_arrow())


def test_iter_parquet_batches_native(tmp_path):
    """Row-group streaming read decodes natively, group by group."""
    rng = np.random.default_rng(0)
    t = pa.table({"a": rng.integers(0, 100, 5000),
                  "s": [f"v{i % 9}" for i in range(5000)]})
    p = str(tmp_path / "t.parquet")
    pq.write_table(t, p, row_group_size=1200)
    from arrow1_tpu.io.parquet import iter_parquet_batches

    rows = []
    for rb in iter_parquet_batches(p, batch_rows=500):
        assert rb.num_rows <= 500
        rows.extend(rb.to_arrow()["a"].to_pylist())
    assert rows == t["a"].to_pylist()
    got = [v for rb in iter_parquet_batches(p, columns=["s"])
           for v in rb.to_arrow()["s"].to_pylist()]
    assert got == t["s"].to_pylist()


def test_read_parquet_filters_native(tmp_path):
    """filters= rides the native reader + engine expressions (pyarrow
    row-level filter semantics; python/pyarrow/parquet.py
    filters_to_expression)."""
    import numpy as np

    from arrow1_tpu.io.parquet import read_parquet

    rng = np.random.default_rng(0)
    n = 3000
    t = pa.table({"a": rng.integers(0, 100, n),
                  "b": rng.standard_normal(n),
                  "c": rng.choice(["x", "y", "z"], n)})
    p = str(tmp_path / "f.parquet")
    pq.write_table(t, p)
    for filters in ([("a", "<", 50)],
                    [("a", ">=", 20), ("c", "in", ["x", "y"])],
                    [[("a", "=", 3)], [("a", "=", 7), ("c", "!=", "x")]]):
        got = read_parquet(p, filters=filters).to_arrow()
        want = pq.read_table(p, filters=filters)
        assert got.num_rows == want.num_rows, filters
        ga = sorted(map(repr, zip(got["a"].to_pylist(),
                                  got["c"].to_pylist())))
        wa = sorted(map(repr, zip(want["a"].to_pylist(),
                                  want["c"].to_pylist())))
        assert ga == wa, filters
    got = read_parquet(p, columns=["b"], filters=[("a", "<", 10)])
    assert got.to_arrow().schema.names == ["b"]
    assert got.num_rows == pq.read_table(
        p, columns=["b"], filters=[("a", "<", 10)]).num_rows


class TestWriterNestedDepth:
    """Round-4 writer upgrades: arbitrary nesting depth (recursive
    Dremel level writer, the inverse of _assemble_node; reference write
    path: parquet/arrow/path_internal.cc)."""

    CASES = {
        "list_of_list": lambda: pa.array(
            [[[1, 2], []], None, [[3], None, [4, None, 5]], []]),
        "struct_of_list": lambda: pa.array(
            [{"x": 1, "v": [1, 2]}, None, {"x": None, "v": None},
             {"x": 4, "v": []}],
            type=pa.struct([("x", pa.int64()),
                            ("v", pa.list_(pa.int64()))])),
        "list_of_struct": lambda: pa.array(
            [[{"a": 1, "b": "x"}, None], [], None,
             [{"a": None, "b": "y"}]],
            type=pa.list_(pa.struct([("a", pa.int64()),
                                     ("b", pa.string())]))),
        "triple_list": lambda: pa.array(
            [[[["a", None], []]], None, [[["b"]], []], [[]]],
            type=pa.list_(pa.list_(pa.list_(pa.string())))),
    }

    @pytest.mark.parametrize("case", sorted(CASES))
    def test_roundtrip_both_readers(self, case):
        import io as _io

        import pyarrow.parquet as pq

        from arrow1_tpu.interop import record_batch_from_arrow
        from arrow1_tpu.io.parquet_native import (read_parquet_native,
                                                  write_parquet_native)

        rb = pa.record_batch({"c": self.CASES[case]()})
        sink = _io.BytesIO()
        write_parquet_native(record_batch_from_arrow(rb), sink)
        buf = sink.getvalue()
        assert pq.read_table(_io.BytesIO(buf)).to_pylist() == \
            pa.table(rb).to_pylist()
        got = read_parquet_native(buf)
        b = got.batches[0] if hasattr(got, "batches") else got
        assert b.to_arrow().to_pylist() == rb.to_pylist()


class TestWriterEncodings:
    def _roundtrip(self, rb, **kw):
        import io as _io

        import pyarrow.parquet as pq

        from arrow1_tpu.interop import record_batch_from_arrow
        from arrow1_tpu.io.parquet_native import (read_parquet_native,
                                                  write_parquet_native)

        sink = _io.BytesIO()
        write_parquet_native(record_batch_from_arrow(rb), sink, **kw)
        buf = sink.getvalue()
        assert pq.read_table(_io.BytesIO(buf)).to_pylist() == \
            pa.table(rb).to_pylist()
        got = read_parquet_native(buf)
        b = got.batches[0] if hasattr(got, "batches") else got
        assert b.to_arrow().to_pylist() == rb.to_pylist()

    def test_byte_stream_split(self, rng):
        n = 5000
        rb = pa.record_batch({
            "f32": pa.array(rng.standard_normal(n).astype(np.float32)),
            "f64": pa.array(rng.standard_normal(n))})
        self._roundtrip(rb, compression="zstd",
                        use_byte_stream_split=True)

    @pytest.mark.parametrize("vals", [
        [], [5], [None, 3, None, -9, 2 ** 40, None],
        list(range(129)), list(range(257))])
    def test_delta_binary_packed_edges(self, vals):
        rb = pa.record_batch({"x": pa.array(vals, type=pa.int64())})
        self._roundtrip(rb, compression="none",
                        use_delta_binary_packed=True)

    def test_delta_binary_packed_fuzz(self, rng):
        n = 10000
        rb = pa.record_batch({
            "i32": pa.array(rng.integers(-2 ** 31, 2 ** 31, n,
                                         dtype=np.int64)
                            .astype(np.int32)),
            "i64": pa.array(rng.integers(-2 ** 62, 2 ** 62, n)),
            "sorted": pa.array(np.sort(rng.integers(0, 10 ** 12, n)))})
        self._roundtrip(rb, compression="zstd",
                        use_delta_binary_packed=True)


class TestBloomFilters:
    def test_write_read_prune(self, rng, tmp_path):
        import io as _io

        import pyarrow.parquet as pq

        from arrow1_tpu.interop import record_batch_from_arrow
        from arrow1_tpu.io.parquet_native import (
            bloom_prune_row_groups, read_bloom_filters,
            write_parquet_native)

        n = 40000
        k = np.concatenate([np.arange(i * 1000, i * 1000 + 1000)
                            .repeat(10) for i in range(4)])
        rb = pa.record_batch({
            "k": pa.array(k),
            "s": pa.array([f"val{int(x) // 100}" for x in k])})
        sink = _io.BytesIO()
        write_parquet_native(record_batch_from_arrow(rb), sink,
                             compression="zstd", row_group_size=10000,
                             bloom_filter_columns=True)
        buf = sink.getvalue()
        assert pq.ParquetFile(_io.BytesIO(buf)).num_row_groups == 4
        assert pq.read_table(_io.BytesIO(buf)).to_pylist() == \
            pa.table(rb).to_pylist()
        assert len(read_bloom_filters(buf)) == 8
        assert bloom_prune_row_groups(buf, [("k", "==", 1500)]) == [1]
        assert bloom_prune_row_groups(buf, [("k", "==", 10 ** 9)]) == []
        keep = bloom_prune_row_groups(buf, [("s", "==", "val5")])
        assert 0 in keep and 3 not in keep

    def test_row_group_skip_through_read_parquet(self, rng, tmp_path):
        """End-to-end: filters= on read_parquet uses the blooms to skip
        row groups, and the row filter still yields exact rows."""
        from arrow1_tpu.io import read_parquet, write_parquet
        from arrow1_tpu.table import RecordBatch

        import arrow1_tpu as a1t

        n = 8000
        k = np.repeat(np.arange(8), 1000) * 100
        v = np.arange(n)
        rb = a1t.record_batch(pa.record_batch(
            {"k": pa.array(k), "v": pa.array(v)}))
        path = str(tmp_path / "bloomy.parquet")
        write_parquet(rb, path, compression="none",
                      row_group_size=2000, bloom_filter_columns=["k"])
        t = read_parquet(path, filters=[("k", "==", 300)])
        got = t.combine_chunks()
        assert got.num_rows == 1000
        np.testing.assert_array_equal(
            np.asarray(got.column("v").data), v[k == 300])
        t0 = read_parquet(path, filters=[("k", "==", 12345)])
        assert t0.num_rows == 0


class TestModularEncryption:
    """Native AES_GCM_V1 encrypted-footer mode (reference:
    parquet/encryption/encryption_internal.h AesEncryptor +
    CreateModuleAad; file layout per file_writer.cc
    CloseEncryptedFile)."""

    KEY = bytes(range(16))

    def _write(self, rb, **kw):
        import io as _io

        from arrow1_tpu.interop import record_batch_from_arrow
        from arrow1_tpu.io.parquet_native import write_parquet_native

        sink = _io.BytesIO()
        write_parquet_native(record_batch_from_arrow(rb), sink,
                             encryption={"footer_key": self.KEY}, **kw)
        return sink.getvalue()

    def test_roundtrip_and_magic(self, rng):
        from arrow1_tpu.io.parquet_native import read_parquet_native

        n = 2000
        rb = pa.record_batch({
            "i": pa.array(rng.integers(-100, 100, n)),
            "s": pa.array([f"v{i % 13}" for i in range(n)]),
            "nested": pa.array([[1, 2] if i % 3 else None
                                for i in range(n)])})
        buf = self._write(rb, compression="zstd", row_group_size=700)
        assert buf[:4] == b"PARE" and buf[-4:] == b"PARE"
        got = read_parquet_native(buf,
                                  decryption={"footer_key": self.KEY})
        b = got.batches[0] if hasattr(got, "batches") else got
        assert b.to_arrow().to_pylist() == rb.to_pylist()
        # encrypted row-group selection still works
        part = read_parquet_native(buf, columns=["i"], row_groups=[1],
                                   decryption={"footer_key": self.KEY})
        pb = part.batches[0] if hasattr(part, "batches") else part
        assert pb.num_rows == 700

    def test_rejections(self, rng):
        from arrow1_tpu.errors import Invalid
        from arrow1_tpu.io.parquet_native import read_parquet_native

        rb = pa.record_batch({"x": pa.array([1, 2, 3])})
        buf = self._write(rb)
        with pytest.raises(Invalid, match="requires decryption"):
            read_parquet_native(buf)
        with pytest.raises(Invalid, match="decryption failed"):
            read_parquet_native(buf,
                                decryption={"footer_key": bytes(16)})
        bad = bytearray(buf)
        bad[60] ^= 1  # flip a bit inside the first module
        with pytest.raises(Invalid, match="decryption failed"):
            read_parquet_native(bytes(bad),
                                decryption={"footer_key": self.KEY})
