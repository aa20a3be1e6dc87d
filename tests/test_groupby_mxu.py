"""Engine-level parity for the MXU group-by fast path (A1T_SEGSUM=interpret
forces the kernel path on CPU). Oracle: pyarrow TableGroupBy.aggregate."""

import numpy as np
import pyarrow as pa
import pytest

import arrow1_tpu as a1t


def _sorted_pylist(tbl):
    if isinstance(tbl, pa.RecordBatch):
        tbl = pa.Table.from_batches([tbl])
    rows = [tuple(sorted(d.items())) for d in tbl.to_pylist()]
    return sorted(rows, key=repr)


def _assert_same(got, expected):
    g = _sorted_pylist(got.to_arrow())
    e = _sorted_pylist(expected)
    assert len(g) == len(e)
    for a, b in zip(g, e):
        assert a == b, (a, b)


def _run(rb, keys, aggs, monkeypatch):
    monkeypatch.setenv("A1T_SEGSUM", "interpret")
    from arrow1_tpu.ops.groupby import _mxu_group_by
    batch = a1t.record_batch(rb)
    got = _mxu_group_by(batch, keys, aggs)
    assert got is not None, "fast path unexpectedly declined"
    oracle = pa.Table.from_batches([rb]).group_by(keys).aggregate(aggs)
    _assert_same(got, oracle)


class TestMxuGroupBy:
    def test_int_key_sum_count_mean(self, rng, monkeypatch):
        n = 4000
        rb = pa.record_batch({
            "k": pa.array(rng.integers(-50, 50, n), type=pa.int64()),
            "v": pa.array(rng.integers(-(1 << 40), 1 << 40, n),
                          type=pa.int64()),
        })
        _run(rb, ["k"], [("v", "sum"), ("v", "count"), ("v", "mean")],
             monkeypatch)

    def test_null_key_and_values(self, rng, monkeypatch):
        n = 2000
        k = rng.integers(0, 20, n).astype(float)
        k[rng.random(n) < 0.1] = np.nan
        v = rng.integers(0, 1000, n).astype(float)
        v[rng.random(n) < 0.3] = np.nan
        rb = pa.record_batch({
            "k": pa.array([None if np.isnan(x) else int(x) for x in k],
                          type=pa.int32()),
            "v": pa.array([None if np.isnan(x) else int(x) for x in v],
                          type=pa.int16()),
        })
        _run(rb, ["k"], [("v", "sum"), ("v", "count"), ("v", "mean")],
             monkeypatch)

    def test_dict_key(self, rng, monkeypatch):
        n = 1000
        codes = rng.integers(0, 5, n)
        words = ["aa", "bb", "cc", "dd", "ee"]
        rb = pa.record_batch({
            "k": pa.array([words[c] for c in codes]).dictionary_encode(),
            "v": pa.array(rng.integers(0, 100, n), type=pa.int64()),
        })
        _run(rb, ["k"], [("v", "sum")], monkeypatch)

    def test_uint_and_small_dtypes(self, rng, monkeypatch):
        n = 3000
        rb = pa.record_batch({
            "k": pa.array(rng.integers(0, 300, n), type=pa.uint16()),
            "a": pa.array(rng.integers(0, 250, n), type=pa.uint8()),
            "b": pa.array(rng.integers(-128, 127, n), type=pa.int8()),
        })
        _run(rb, ["k"], [("a", "sum"), ("b", "sum"), ("b", "mean"),
                         ("a", "count")], monkeypatch)

    def test_declines_out_of_scope(self, monkeypatch):
        monkeypatch.setenv("A1T_SEGSUM", "interpret")
        from arrow1_tpu.ops.groupby import _mxu_group_by
        rb = pa.record_batch({
            "k": pa.array([1.5, 2.5]),   # float key
            "v": pa.array([1, 2], type=pa.int64()),
        })
        assert _mxu_group_by(a1t.record_batch(rb), ["k"],
                             [("v", "sum")]) is None
        rb2 = pa.record_batch({
            "k": pa.array([1, 2], type=pa.int64()),
            "v": pa.array([1.0, 2.0]),   # float values
        })
        assert _mxu_group_by(a1t.record_batch(rb2), ["k"],
                             [("v", "sum")]) is None
        # min aggregate not in the MXU set
        assert _mxu_group_by(a1t.record_batch(rb2), ["k"],
                             [("v", "min")]) is None
        # huge key range
        rb3 = pa.record_batch({
            "k": pa.array([0, 1 << 40], type=pa.int64()),
            "v": pa.array([1, 2], type=pa.int64()),
        })
        assert _mxu_group_by(a1t.record_batch(rb3), ["k"],
                             [("v", "sum")]) is None

    def test_group_by_entry_point_uses_fast_path(self, rng, monkeypatch):
        monkeypatch.setenv("A1T_SEGSUM", "interpret")
        n = 1500
        rb = pa.record_batch({
            "k": pa.array(rng.integers(0, 9, n), type=pa.int64()),
            "v": pa.array(rng.integers(-5, 1 << 30, n), type=pa.int64()),
        })
        got = a1t.group_by(a1t.record_batch(rb), ["k"],
                           [("v", "sum"), ("v", "count")])
        oracle = pa.Table.from_batches([rb]).group_by(["k"]).aggregate(
            [("v", "sum"), ("v", "count")])
        _assert_same(got, oracle)

    def test_int64_extremes_wraparound(self, monkeypatch):
        # pyarrow sum wraps mod 2^64 (C++ int64 accumulate); match it
        rb = pa.record_batch({
            "k": pa.array([0, 0, 1], type=pa.int64()),
            "v": pa.array([(1 << 62), (1 << 62), -5], type=pa.int64()),
        })
        _run(rb, ["k"], [("v", "sum")], monkeypatch)
