"""kernels/radix.py: minimal-width key packing vs the 64-bit normalized
sort oracle (and pyarrow for end-to-end sort_indices)."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

import arrow1_tpu as a1t
import arrow1_tpu.compute as ac
from arrow1_tpu.kernels.radix import (keys_total_bits, minimal_sort_keys,
                                      pack_words, radix_sort_indices)
from arrow1_tpu.ops.sort import normalize_sort_key, sort_indices_device

rng = np.random.default_rng(7)
N = 3000


def _with_nulls(arr, p=0.15):
    m = rng.random(len(arr)) < p
    return pa.array([None if mm else v
                     for v, mm in zip(arr.to_pylist(), m)], type=arr.type)


CASES = [
    pa.array(rng.integers(-100, 100, N, dtype=np.int8)),
    pa.array(rng.integers(-2**15, 2**15, N, dtype=np.int16)),
    pa.array(rng.integers(-2**31, 2**31, N, dtype=np.int32)),
    pa.array(rng.integers(-2**62, 2**62, N, dtype=np.int64)),
    pa.array(rng.integers(0, 255, N, dtype=np.uint8)),
    pa.array(rng.integers(0, 2**16, N, dtype=np.uint16)),
    pa.array(rng.integers(0, 2**63, N, dtype=np.uint64)),
    pa.array(rng.standard_normal(N).astype(np.float32)),
    pa.array(rng.standard_normal(N)),
    pa.array(np.where(rng.random(N) < 0.1, np.nan, rng.standard_normal(N))),
    pa.array(rng.choice(["aa", "bb", "cc", "dd", ""], N)),
    pa.array(rng.integers(0, 50, N), type=pa.timestamp("us")),
    pa.array(rng.integers(0, 2, N).astype(bool)),
]


@pytest.mark.parametrize("idx", range(len(CASES)))
@pytest.mark.parametrize("nulls", [False, True])
@pytest.mark.parametrize("order", ["ascending", "descending"])
def test_single_key_matches_oracle(idx, nulls, order):
    a = _with_nulls(CASES[idx]) if nulls else CASES[idx]
    col = a1t.column(a)
    want = np.asarray(sort_indices_device(normalize_sort_key(col, order)))
    got = np.asarray(radix_sort_indices(minimal_sort_keys(col, order)))
    assert np.array_equal(want, got)


def test_multikey_packs_and_matches():
    cols = [a1t.column(_with_nulls(CASES[10])),
            a1t.column(_with_nulls(CASES[2])),
            a1t.column(CASES[7])]
    orders = ("ascending", "descending", "ascending")
    pairs, norm = [], []
    for c, o in zip(cols, orders):
        pairs.extend(minimal_sort_keys(c, o))
        norm.extend(normalize_sort_key(c, o))
    # 6 key arrays pack into 2 words
    assert len(pack_words(pairs)) < len(norm)
    want = np.asarray(sort_indices_device(norm))
    got = np.asarray(radix_sort_indices(pairs))
    assert np.array_equal(want, got)


def test_valuesort_path_taken_for_narrow_keys():
    # int16 + nulls: 2 (class) + 16 (key) + 12 (rowid) bits -> one word
    col = a1t.column(_with_nulls(CASES[1]))
    pairs = minimal_sort_keys(col, "ascending")
    n = col.length
    assert keys_total_bits(pairs) + (n - 1).bit_length() <= 64


def test_sort_indices_pyarrow_parity_multikey():
    t = pa.table({
        "s": _with_nulls(CASES[10]),
        "i": _with_nulls(CASES[2]),
        "f": CASES[9],
    })
    batch = a1t.record_batch(pa.record_batch(
        {k: t[k].combine_chunks() for k in t.column_names}))
    got = ac.sort_indices(batch, sort_keys=[("s", "ascending"),
                                            ("i", "descending"),
                                            ("f", "ascending")])
    want = pc.sort_indices(t, sort_keys=[("s", "ascending"),
                                         ("i", "descending"),
                                         ("f", "ascending")])
    assert np.array_equal(np.asarray(got.data), want.to_numpy())


def test_rank_functions_still_match():
    a = _with_nulls(CASES[9])
    col = a1t.column(a)
    got = ac.rank(col)
    # pyarrow rank with default options (first tiebreak, nulls last)
    want = pc.rank(a, sort_keys="ascending", null_placement="at_end",
                   tiebreaker="first")
    assert np.array_equal(np.asarray(got.data), want.to_numpy())


def _mat_oracle_table():
    rng2 = np.random.default_rng(11)
    n = 5000
    s = pa.array(rng2.choice(["sym%03d" % i for i in range(40)], n))
    k = _with_nulls(pa.array(rng2.integers(-2**60, 2**60, n)), p=0.05)
    pay = pa.array(rng2.integers(0, 2**30, n))
    price = pa.array(np.where(rng2.random(n) < 0.05, np.nan,
                              rng2.standard_normal(n)))
    return pa.table({"s": s, "k": k, "pay": pay, "price": price})


@pytest.mark.parametrize("keys", [
    [("s", "ascending"), ("k", "descending")],
    [("k", "ascending")],
    [("price", "descending"), ("s", "descending")],
    [("s", "ascending"), ("k", "ascending"), ("price", "ascending")],
])
def test_materialize_sorted_decode_parity(keys):
    """sort_by fast path: key columns decoded from sorted packed words
    (not carried as payload operands) must round-trip values, nulls,
    NaN, and descending flips exactly (vs pyarrow sort_by)."""
    t = _mat_oracle_table()
    batch = a1t.record_batch(pa.record_batch(
        {c: t[c].combine_chunks() for c in t.column_names}))
    got = batch.sort_by(keys).to_arrow()
    want = t.sort_by(keys).combine_chunks()
    for c in t.column_names:
        g = got.column(c).to_pylist() if hasattr(got, "column") else None
        w = want[c].to_pylist()
        gl = got[c].to_pylist() if g is None else g
        for a, b in zip(gl, w):
            if isinstance(b, float) and np.isnan(b):
                assert isinstance(a, float) and np.isnan(a)
            else:
                assert a == b, (c, a, b)


def test_sort_rows_with_keys_extracts_pair_values():
    from arrow1_tpu.kernels.radix import sort_rows_with_keys
    import jax.numpy as jnp

    rng2 = np.random.default_rng(5)
    n = 4096
    col = a1t.column(pa.array(rng2.integers(-1000, 1000, n)))
    pairs = minimal_sort_keys(col, "ascending")
    pay = jnp.asarray(rng2.integers(0, 10**9, n))
    (spay,), vals = sort_rows_with_keys(pairs, [pay])
    # extracted key values must equal the packed key in sorted order
    order = np.argsort(np.asarray(col.data), kind="stable")
    want_key = np.asarray(col.data)[order].astype(np.int64).view(
        np.uint64) ^ np.uint64(1 << 63)
    assert np.array_equal(np.asarray(vals[-1]), want_key)
    assert np.array_equal(np.asarray(spay), np.asarray(pay)[order])
