"""Native ORC reader (arrow1_tpu/io/orc_native.py) vs pyarrow.orc — the
reference's own engine (it wraps the same Apache ORC C++ library the
reference wraps, cpp/src/arrow/adapters/orc/adapter.cc).

Differential oracle: liborc-written files across all five codecs, all
four RLEv2 submodes, nulls at every level, nested types, and
multi-stripe layouts must decode identically through the native
reader."""

import io

import numpy as np
import pyarrow as pa
import pytest

from arrow1_tpu.io.orc import read_orc
from arrow1_tpu.io.orc_native import read_orc_native

orc = pytest.importorskip("pyarrow.orc")


def _mixed_table(n=500, seed=0):
    from decimal import Decimal

    rng = np.random.default_rng(seed)
    mask = rng.random(n) < 0.12

    def m(vals):
        return [None if mask[i] else v for i, v in enumerate(vals)]

    ts_raw = rng.integers(-2 * 10**15, 2 * 10**15, n)
    return pa.table({
        "i64": pa.array(m(rng.integers(-2**40, 2**40, n))),
        "i32": pa.array(m(rng.integers(-2**20, 2**20, n)), pa.int32()),
        "i16": pa.array(m(rng.integers(-2**10, 2**10, n)), pa.int16()),
        "i8": pa.array(m(rng.integers(-100, 100, n)), pa.int8()),
        "f64": pa.array(m(rng.normal(size=n))),
        "f32": pa.array(m(rng.normal(size=n).astype(np.float32))),
        "b": pa.array(m(rng.random(n) < 0.5)),
        "s": pa.array(m([f"val{i % 37}" for i in range(n)])),
        "s_uniq": pa.array(m([f"u{i}" for i in range(n)])),
        "bin": pa.array(m([bytes([i % 250]) for i in range(n)]),
                        pa.binary()),
        "d32": pa.array(m(rng.integers(-10000, 20000, n).tolist()),
                        pa.date32()),
        "ts": pa.array(pa.array(m(ts_raw.tolist()), pa.int64()).cast(
            pa.timestamp("us"))),
        "dec": pa.array(m([Decimal(int(x)).scaleb(-2) for x in
                           rng.integers(-10**10, 10**10, n)]),
                        pa.decimal128(18, 2)),
        "l": pa.array(m([[int(x) for x in rng.integers(
            0, 100, rng.integers(0, 4))] for _ in range(n)]),
            pa.list_(pa.int64())),
        "st": pa.array(m([{"a": int(rng.integers(0, 100)),
                           "b": f"x{i % 5}"} for i in range(n)]),
                       pa.struct([("a", pa.int64()),
                                  ("b", pa.string())])),
        "mp": pa.array(m([[(f"k{j}", int(rng.integers(0, 50)))
                           for j in range(rng.integers(0, 3))]
                          for _ in range(n)]),
                       pa.map_(pa.string(), pa.int64())),
    })


def _assert_equal(t: pa.Table, rb):
    got = rb.to_arrow()
    for name in t.column_names:
        assert got[name].to_pylist() == t[name].to_pylist(), name


@pytest.mark.parametrize("codec", ["uncompressed", "zlib", "snappy",
                                   "zstd", "lz4"])
def test_read_codecs(codec):
    t = _mixed_table()
    buf = io.BytesIO()
    orc.write_table(t, buf, compression=codec)
    _assert_equal(t, read_orc_native(buf.getvalue()))


def test_rlev2_submodes_and_multistripe():
    """Monotonic (DELTA), constant (SHORT_REPEAT), outliers over a tight
    base (PATCHED_BASE incl. negative sign-magnitude base), random
    (DIRECT), across 10+ stripes."""
    rng = np.random.default_rng(1)
    n = 120_000
    pb = np.full(n, 1000, np.int64)
    idx = rng.integers(0, n, n // 50)
    pb[idx] = rng.integers(2**33, 2**40, len(idx))
    t = pa.table({
        "mono": pa.array(np.arange(n, dtype=np.int64) * 3),
        "pb": pa.array(pb),
        "pbn": pa.array(-pb),
        "rand": pa.array(rng.integers(-2**50, 2**50, n)),
        "const": pa.array(np.full(n, 42, np.int64)),
        "s": pa.array([f"v{i % 97}" for i in range(n)]),
    })
    buf = io.BytesIO()
    orc.write_table(t, buf, compression="zlib", stripe_size=64 * 1024)
    assert orc.ORCFile(io.BytesIO(buf.getvalue())).nstripes > 5
    tbl = read_orc_native(buf.getvalue())
    got = tbl.to_arrow()
    for name in t.column_names:
        assert got[name].to_pylist() == t[name].to_pylist(), name


def test_deep_nesting():
    t = pa.table({"x": pa.array(
        [[{"x": [1, 2], "y": "a"}], None,
         [{"x": [], "y": None}, {"x": [3], "y": "b"}]],
        pa.list_(pa.struct([("x", pa.list_(pa.int64())),
                            ("y", pa.string())])))})
    buf = io.BytesIO()
    orc.write_table(t, buf)
    _assert_equal(t, read_orc_native(buf.getvalue()))


def test_column_projection_and_facade(tmp_path):
    t = _mixed_table(n=100)
    p = str(tmp_path / "t.orc")
    orc.write_table(t, p)
    out = read_orc(p, columns=["i64", "s"])
    got = out.to_arrow()
    assert got.column_names == ["i64", "s"]
    assert got["i64"].to_pylist() == t["i64"].to_pylist()
    # pyarrow-shaped module facade rides the native reader
    from arrow1_tpu import orc as a1t_orc

    t2 = a1t_orc.read_table(p)
    assert t2.to_arrow()["s"].to_pylist() == t["s"].to_pylist()


@pytest.mark.parametrize("seed", range(4))
def test_differential_fuzz(seed):
    t = _mixed_table(n=int(np.random.default_rng(seed).integers(1, 400)),
                     seed=seed)
    buf = io.BytesIO()
    orc.write_table(t, buf, compression="zstd")
    _assert_equal(t, read_orc_native(buf.getvalue()))


def test_orc_dataset_fragments(tmp_path):
    """ORC files scan through the dataset layer (hive partitions)."""
    import os

    from arrow1_tpu.dataset import HivePartitioning, dataset

    rng = np.random.default_rng(0)
    for part in ("a=1", "a=2"):
        os.makedirs(tmp_path / part)
        t = pa.table({"x": rng.integers(0, 100, 50).astype(np.int64)})
        orc.write_table(t, str(tmp_path / part / "f.orc"))
    ds = dataset(str(tmp_path), format="orc",
                 partitioning=HivePartitioning())
    t = ds.to_table(columns=["x"])
    assert t.num_rows == 100


def test_write_native_liborc_reads(tmp_path):
    """Native WRITER oracle: liborc (pyarrow.orc) reads our files
    value-equal, incl. nulls, nesting, negative timestamps, decimals."""
    t = _mixed_table(n=300, seed=7)
    from arrow1_tpu import record_batch as _rb
    from arrow1_tpu.io.orc_writer import write_orc_native

    batch = _rb(t.to_batches()[0])
    buf = write_orc_native(batch)
    got = orc.read_table(io.BytesIO(buf))
    for name in t.schema.names:
        a, b = got.column(name), t.column(name)
        assert a.equals(b.cast(a.type)), name


def test_write_native_roundtrip_negative_ts():
    import pyarrow as pa

    from arrow1_tpu import record_batch as _rb
    from arrow1_tpu.interop import record_batch_to_arrow
    from arrow1_tpu.io.orc_writer import write_orc_native

    ts = pa.array([-1, -1_000_001, 0, 1, -2_500_000, 1_500_000, None],
                  type=pa.timestamp("us"))
    rb = pa.record_batch({"t": ts})
    buf = write_orc_native(_rb(rb))
    assert record_batch_to_arrow(
        read_orc_native(buf)).column(0).equals(rb.column(0))
    got = orc.read_table(io.BytesIO(buf))
    assert got.column("t").equals(
        pa.Table.from_batches([rb]).column("t").cast(got.column("t").type))


def test_write_orc_facade_native_path(tmp_path):
    """io/orc.py write_orc rides the native writer (no pyarrow.orc on
    the path) and read_orc round-trips it."""
    import pyarrow as pa

    from arrow1_tpu import orc as a1t_orc
    from arrow1_tpu import table as _t
    from arrow1_tpu import record_batch as _rb

    rb = pa.record_batch({
        "x": pa.array([1, None, 3], type=pa.int64()),
        "s": pa.array(["a", "bb", None]),
    })
    p = str(tmp_path / "w.orc")
    a1t_orc.write_table(_rb(rb), p)
    with open(p, "rb") as f:
        assert f.read(3) == b"ORC"
    t2 = a1t_orc.read_table(p)
    assert t2.to_arrow()["x"].to_pylist() == [1, None, 3]
    assert t2.to_arrow()["s"].to_pylist() == ["a", "bb", None]


def test_write_dataset_orc(tmp_path):
    """write_dataset(format='orc') rides the native writer; hive
    partitions scan back through the dataset layer."""
    import numpy as np

    from arrow1_tpu import record_batch as _rb
    from arrow1_tpu.dataset import HivePartitioning, dataset, write_dataset

    rng = np.random.default_rng(0)
    rb = pa.record_batch({"part": pa.array(rng.integers(0, 3, 200)),
                          "x": pa.array(rng.standard_normal(200))})
    write_dataset(_rb(rb), str(tmp_path), format="orc",
                  partitioning_keys=["part"])
    ds = dataset(str(tmp_path), format="orc",
                 partitioning=HivePartitioning())
    t = ds.to_table()
    assert t.num_rows == 200
    assert abs(float(np.sum(t.to_arrow()["x"].to_numpy()))
               - float(np.sum(rb.column("x").to_numpy()))) < 1e-9


def _union_table(n=200, seed=3):
    rng = np.random.default_rng(seed)
    tags = rng.integers(0, 2, n).astype(np.int8)
    n0, n1 = int((tags == 0).sum()), int((tags == 1).sum())
    offs = np.zeros(n, np.int32)
    offs[tags == 0] = np.arange(n0)
    offs[tags == 1] = np.arange(n1)
    m0 = rng.random(n0) < 0.15
    m1 = rng.random(n1) < 0.15
    c0 = pa.array([None if m0[i] else int(v) for i, v in
                   enumerate(rng.integers(-1000, 1000, n0))], pa.int64())
    c1 = pa.array([None if m1[i] else f"s{v}" for i, v in
                   enumerate(rng.integers(0, 50, n1))], pa.string())
    arr = pa.UnionArray.from_dense(
        pa.array(tags, pa.int8()), pa.array(offs, pa.int32()), [c0, c1])
    return pa.table({"u": arr, "k": pa.array(range(n), pa.int64())})


def test_union_read_vs_liborc():
    """ORC union (liborc-written) decodes identically: sparse union,
    _union_<i> child names (adapter convention)."""
    from arrow1_tpu.interop import record_batch_to_arrow

    t = _union_table()
    buf = io.BytesIO()
    orc.write_table(t, buf)
    oracle = orc.ORCFile(io.BytesIO(buf.getvalue())).read()
    ours = read_orc_native(buf.getvalue())
    got = record_batch_to_arrow(
        ours.batches[0] if hasattr(ours, "batches") else ours)
    assert got.column("u").to_pylist() == oracle.column("u").to_pylist()
    assert got.schema.field("u").type == oracle.schema.field("u").type
    assert got.column("k").to_pylist() == oracle.column("k").to_pylist()


@pytest.mark.parametrize("mode", ["dense", "sparse"])
def test_union_write_native_liborc_reads(mode):
    """Native-written ORC unions read back via liborc AND the native
    reader (both union storage layouts on the engine side)."""
    from arrow1_tpu.interop import (record_batch_from_arrow,
                                    record_batch_to_arrow)
    from arrow1_tpu.io.orc_writer import write_orc_native

    t = _union_table(seed=4)
    b = record_batch_from_arrow(
        pa.record_batch({"u": t["u"].combine_chunks(),
                         "k": t["k"].combine_chunks()}))
    if mode == "sparse":
        from arrow1_tpu import dtypes as dt
        from arrow1_tpu.column import UnionColumn
        import jax.numpy as jnp

        u = b.column("u")
        n = len(u)
        # densify children to full length (sparse layout)
        kids = []
        tags = np.asarray(u.type_ids)
        offs = np.asarray(u.offsets)
        for i, ch in enumerate(u.children):
            data = np.zeros(n, np.asarray(ch.data).dtype)
            valid = np.zeros(n, bool)
            sel = tags == i
            data[sel] = np.asarray(ch.data)[offs[sel]]
            vm = (np.ones(len(ch), bool) if ch.validity is None
                  else np.asarray(ch.validity))
            valid[sel] = vm[offs[sel]]
            kids.append(type(ch)(jnp.asarray(data), ch.dtype,
                                 validity=jnp.asarray(valid),
                                 dictionary=ch.dictionary))
        u2 = UnionColumn(u.type_ids, tuple(kids),
                         dt.sparse_union([(f"_union_{i}", c.dtype)
                                          for i, c in enumerate(kids)]))
        from arrow1_tpu.table import RecordBatch
        b = RecordBatch((u2, b.column("k")), ("u", "k"))
    raw = write_orc_native(b)
    oracle = orc.ORCFile(io.BytesIO(raw)).read()
    exp = t.column("u").to_pylist()
    assert oracle.column("u").to_pylist() == exp
    ours = read_orc_native(raw)
    got = record_batch_to_arrow(
        ours.batches[0] if hasattr(ours, "batches") else ours)
    assert got.column("u").to_pylist() == exp
