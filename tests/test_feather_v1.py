"""Feather V1 reader (arrow1_tpu/io/feather1.py) vs pyarrow.feather —
the reference reads both versions (ipc/feather.h ReaderV1)."""

import warnings

import numpy as np
import pyarrow as pa
import pytest

fe = pytest.importorskip("pyarrow.feather")

from arrow1_tpu import feather as a1t_feather
from arrow1_tpu.io.feather1 import read_feather_v1


def _table(n=400, seed=0):
    rng = np.random.default_rng(seed)
    mask = rng.random(n) < 0.15

    def m(vals):
        return [None if mask[i] else v for i, v in enumerate(vals)]

    return pa.table({
        "i64": pa.array(m(rng.integers(-2**40, 2**40, n))),
        "i8": pa.array(m(rng.integers(-100, 100, n)), pa.int8()),
        "u32": pa.array(m(rng.integers(0, 2**31, n)), pa.uint32()),
        "f64": pa.array(m(rng.normal(size=n))),
        "f32": pa.array(m(rng.normal(size=n).astype(np.float32))),
        "b": pa.array(m(rng.random(n) < 0.5)),
        "s": pa.array(m([f"val{i % 37}" for i in range(n)])),
        "bin": pa.array(m([bytes([i % 250]) for i in range(n)]),
                        pa.binary()),
        "cat": pa.array(m([f"c{i % 5}" for i in range(n)])
                        ).dictionary_encode(),
        "ts": pa.array(pa.array(
            m(rng.integers(0, 2 * 10**15, n).tolist()),
            pa.int64()).cast(pa.timestamp("us"))),
        "d32": pa.array(m(rng.integers(0, 20000, n).tolist()),
                        pa.date32()),
    })


@pytest.mark.parametrize("seed", range(3))
def test_v1_differential(tmp_path, seed):
    t = _table(seed=seed)
    p = str(tmp_path / "t.feather")
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        fe.write_feather(t, p, version=1)
        oracle = fe.read_table(p)
    rb = read_feather_v1(open(p, "rb").read())
    got = rb.to_arrow()
    for name in oracle.column_names:
        assert got[name].to_pylist() == oracle[name].to_pylist(), name


def test_facade_reads_both_versions(tmp_path):
    t = _table(n=50)
    for version in (1, 2):
        p = str(tmp_path / f"v{version}.feather")
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            fe.write_feather(t, p, version=version)
            oracle = fe.read_table(p)
        out = a1t_feather.read_table(p, columns=["i64", "s"])
        got = out.to_arrow()
        assert got.column_names == ["i64", "s"]
        assert got["i64"].to_pylist() == oracle["i64"].to_pylist()
        assert got["s"].to_pylist() == oracle["s"].to_pylist()


def test_write_feather_v1_pyarrow_reads(tmp_path, rng):
    """Round-4: the V1 WRITER (write_feather_v1) against the pyarrow
    oracle reader, plus our own reader (reference ipc/feather.h:105
    kFeatherV1Version write path)."""
    import numpy as np
    import pyarrow as pa

    import arrow1_tpu as a1t
    from arrow1_tpu.feather import read_table
    from arrow1_tpu.io.ipc import write_feather

    n = 500
    rb = pa.record_batch({
        "i": pa.array(rng.integers(-100, 100, n)),
        "f": pa.array(rng.standard_normal(n)),
        "b": pa.array(rng.random(n) < 0.5),
        "withnull": pa.array([None if i % 5 == 0 else i
                              for i in range(n)], type=pa.int64()),
        "s": pa.array([f"cat{i % 7}" for i in range(n)]),
        "d": pa.array((np.datetime64("2020-01-01")
                       + rng.integers(0, 1000, n))
                      .astype("datetime64[D]")),
    })
    p = str(tmp_path / "v1.feather")
    write_feather(a1t.record_batch(rb), p, version=1)
    assert open(p, "rb").read(4) == b"FEA1"

    import pyarrow.feather as paf

    got = paf.read_table(p)
    for name in rb.schema.names:
        g = got.column(name).combine_chunks()
        if pa.types.is_dictionary(g.type):
            g = g.cast(pa.string())
        assert g.to_pylist() == rb.column(name).to_pylist(), name

    ours = read_table(p).combine_chunks().to_arrow()
    assert ours.num_rows == n
