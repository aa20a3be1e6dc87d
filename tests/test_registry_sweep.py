"""Registry-wide differential smoke: every unary/binary function that
pyarrow accepts on a simple typed input must agree (skipping documented
divergences). This catches silently-diverging kernels that per-family
tests miss — the sweep that found integer rounding, strftime
subseconds, and dictionary_decode passthrough.
"""

import warnings

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

import arrow1_tpu as a1t
from arrow1_tpu.registry import function_registry, list_functions

warnings.filterwarnings("ignore")

import decimal as _decimal

COLS = {
    "i64": pa.array([3, None, -5, 7, 0], type=pa.int64()),
    "u8": pa.array([3, None, 5, 7, 0], type=pa.uint8()),
    "f32": pa.array([1.5, None, -2.25, 8.0, 0.0], type=pa.float32()),
    "f64": pa.array([1.5, None, -2.25, float("nan"), 0.0]),
    "str": pa.array(["b", None, "a", "b", ""]),
    "bool": pa.array([True, None, False, True, False]),
    "ts": pa.array(np.array(
        ["2020-01-01T10:20:30", "NaT", "1999-12-31T23:59:59",
         "2026-08-18T00:00:00", "1970-01-01T00:00:00"],
        dtype="datetime64[us]")),
    "date32": pa.array([0, None, 10000, -3, 20000], type=pa.date32()),
    "time64": pa.array([0, None, 7200000000, 60000000, 1],
                       type=pa.time64("us")),
    "dur": pa.array([0, None, -5000, 123, 99], type=pa.duration("us")),
    "dec": pa.array([_decimal.Decimal("1.25"), None,
                     _decimal.Decimal("-7.50"), _decimal.Decimal("0.01"),
                     _decimal.Decimal("92233720368547758.08")],
                    type=pa.decimal128(20, 2)),
    "bin": pa.array([b"xy", None, b"\xff", b"", b"abc"],
                    type=pa.binary()),
}

# documented divergences / shape differences (each justified in
# COMPONENTS.md or the owning module docstring)
KNOWN = {
    # struct-shaped results: ours are RecordBatch (same fields/values)
    "min_max", "mode", "first_last", "iso_calendar", "year_month_day",
    "value_counts", "run_end_encode", "month_day_nano_between",
    # pyarrow's find/count_substring_regex run RE2 in Latin-1 mode
    # (strings_host.py docstring) — ASCII inputs still compared below
}


def _norm(x):
    if isinstance(x, float) and x != x:
        return "nan"
    return x


def _close(a, b):
    if isinstance(a, float) and isinstance(b, float):
        if _norm(a) == _norm(b):
            return True
        # f32 kernels differ from arrow's libm by a few ULPs (e.g.
        # jnp.tanh saturates at 1.0 where libm returns 0.99999976)
        return abs(a - b) <= 1e-6 * max(1.0, abs(b))
    return _norm(a) == _norm(b)


def _sweep_one(name, fn):
    hits = 0
    for key, arr in COLS.items():
        try:
            want = pc.call_function(name, [arr] * fn.arity)
            want = want.to_pylist() if hasattr(want, "to_pylist") \
                else want.as_py()
        except Exception:
            continue
        got = a1t.call_function(name, [a1t.column(arr)] * fn.arity)
        if hasattr(got, "to_arrow"):
            g = got.to_arrow()
            if pa.types.is_dictionary(g.type):
                g = g.cast(g.type.value_type)
            got = g.to_pylist()
        elif hasattr(got, "as_py"):
            got = got.as_py()
        if isinstance(want, list) and isinstance(got, list):
            assert len(got) == len(want) and all(
                _close(a, b) for a, b in zip(got, want)), \
                (name, key, got, want)
        else:
            assert _close(got, want), (name, key, got, want)
        hits += 1
    return hits


def test_registry_differential_sweep():
    covered, skipped = 0, 0
    for name in sorted(list_functions()):
        fn = function_registry.get(name)
        if fn.arity not in (1, 2) or name in KNOWN:
            skipped += 1
            continue
        try:
            pc.get_function(name)
        except Exception:
            skipped += 1
            continue
        hits = _sweep_one(name, fn)
        if hits:
            covered += hits
        else:
            skipped += 1
    # the sweep must keep real coverage — fail if it silently shrinks
    # (829 (function, dtype) pairs agreed at last count)
    assert covered >= 800, (covered, skipped)


class TestSweepRegressions:
    def test_integer_rounding(self):
        xs = pa.array([1234, -567, 1250, -1250, 0, None, 2**60 + 7])
        import arrow1_tpu.compute as ac
        for m in ["half_to_even", "half_up", "half_down",
                  "half_towards_infinity", "towards_zero", "up", "down"]:
            for nd in (-2, -1, 0, -18):
                got = ac.round(a1t.column(xs), ndigits=nd,
                               round_mode=m).to_pylist()
                want = pc.round(xs, ndigits=nd, round_mode=m).to_pylist()
                assert got == want, (m, nd)
        nds = pa.array([-2, -1, 0, -3, -2, -1, -5])
        got = ac.round_binary(a1t.column(xs), a1t.column(nds)).to_pylist()
        assert got == pc.round_binary(xs, nds).to_pylist()

    def test_strftime_subseconds(self):
        import arrow1_tpu.compute as ac
        for unit in ("s", "ms", "us", "ns"):
            arr = pa.array(np.array(
                ["2020-01-01T10:20:30.123456789",
                 "1969-12-31T23:59:59.5"], dtype=f"datetime64[{unit}]"))
            got = ac.strftime(a1t.column(arr)).to_arrow().cast(
                pa.string()).to_pylist()
            assert got == pc.strftime(arr).to_pylist(), unit
        d64 = pa.array([0, 86400123], type=pa.date64())
        got = ac.strftime(a1t.column(d64)).to_arrow().cast(
            pa.string()).to_pylist()
        assert got == pc.strftime(d64).to_pylist()

    def test_dictionary_decode_passthrough(self):
        import arrow1_tpu.compute as ac
        got = ac.dictionary_decode(a1t.column(pa.array([1, 2])))
        assert got.to_pylist() == [1, 2]
