"""Native timezone kernels (utils/tzif.py + ops/temporal.py) and native
numeric<->string casts (ops/formatting.py + ops/cast.py) vs their
oracles.

The tz oracle is pyarrow.compute for instants before 2036 (pyarrow's
vendored tzdb stops expanding DST rules at the classic 32-bit 2037
horizon and silently falls back to standard time past it — verified
divergence, our TZif+footer expansion agrees with Python zoneinfo out
to 2100), plus zoneinfo for the far-future range.
"""

import datetime as dtm

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from arrow1_tpu import dtypes as dt
from arrow1_tpu.errors import Invalid
from arrow1_tpu.interop import column_from_arrow
from arrow1_tpu.ops.cast import cast
from arrow1_tpu.ops.temporal import AssumeTimezoneOptions
from arrow1_tpu.registry import call_function
from arrow1_tpu.utils.tzif import load_tz, utc_period_index

ZONES = ["America/New_York", "Europe/Paris", "Australia/Sydney",
         "Asia/Kolkata", "America/Santiago", "UTC", "Asia/Kathmandu",
         "Europe/Dublin"]


@pytest.mark.parametrize("zone", ZONES)
def test_tzif_parser_vs_zoneinfo(zone):
    from zoneinfo import ZoneInfo

    tz = load_tz(zone)
    zi = ZoneInfo(zone)
    rng = np.random.default_rng(0)
    secs = rng.integers(-1_262_304_000, 3_786_912_000, 500)  # 1930..2090
    idx = utc_period_index(tz, secs)
    for s, o, d in zip(secs, tz.utoff[idx], tz.isdst[idx]):
        dtv = dtm.datetime.fromtimestamp(int(s), tz=zi)
        assert int(dtv.utcoffset().total_seconds()) == o, (zone, s)
        want_dst = dtv.dst() is not None and dtv.dst().total_seconds() != 0
        assert want_dst == bool(d), (zone, s)


@pytest.mark.parametrize("zone", ["America/New_York", "Australia/Sydney",
                                  "Asia/Kolkata"])
@pytest.mark.parametrize("unit", ["s", "us"])
def test_tz_kernels_vs_pyarrow(zone, unit):
    rng = np.random.default_rng(3)
    mult = {"s": 1, "us": 10**6}[unit]
    secs = (rng.integers(0, 2_000_000_000, 400) * mult).astype(np.int64)
    arr = pa.array(secs, pa.timestamp(unit, zone))
    col = column_from_arrow(arr)
    assert (call_function("local_timestamp", [col]).to_arrow().to_pylist()
            == pc.local_timestamp(arr).to_pylist())
    assert (call_function("is_dst", [col]).to_arrow().to_pylist()
            == pc.is_dst(arr).to_pylist())
    naive = pc.local_timestamp(arr)
    ncol = column_from_arrow(naive)
    for amb in ("earliest", "latest"):
        got = call_function(
            "assume_timezone", [ncol],
            AssumeTimezoneOptions(zone, amb, "latest")).to_arrow()
        want = pc.assume_timezone(naive, timezone=zone, ambiguous=amb,
                                  nonexistent="latest")
        assert got.to_pylist() == want.to_pylist()


def test_assume_timezone_gap_and_overlap_edges():
    walls = ["2023-03-12 01:59:59", "2023-03-12 02:00:00",
             "2023-03-12 02:30:00", "2023-03-12 03:00:00",
             "2023-11-05 01:00:00", "2023-11-05 01:30:00",
             "2023-11-05 02:00:00"]
    naive = pa.array([dtm.datetime.fromisoformat(w) for w in walls],
                     pa.timestamp("us"))
    ncol = column_from_arrow(naive)
    z = "America/New_York"
    for amb in ("earliest", "latest"):
        for nonex in ("earliest", "latest"):
            got = call_function(
                "assume_timezone", [ncol],
                AssumeTimezoneOptions(z, amb, nonex)).to_arrow()
            want = pc.assume_timezone(naive, timezone=z, ambiguous=amb,
                                      nonexistent=nonex)
            assert got.to_pylist() == want.to_pylist(), (amb, nonex)
    with pytest.raises(Invalid):
        call_function("assume_timezone", [ncol],
                      AssumeTimezoneOptions(z, "raise", "latest"))
    with pytest.raises(Invalid):
        call_function("assume_timezone", [ncol],
                      AssumeTimezoneOptions(z, "earliest", "raise"))


def test_tz_far_future_matches_zoneinfo_not_pyarrow():
    """Past pyarrow's 2037 horizon we follow the tzdb footer rule
    (like zoneinfo); pyarrow falls back to standard time."""
    from zoneinfo import ZoneInfo

    s = 2172563117  # 2038-11-05, EDT still in effect
    arr = pa.array([s], pa.timestamp("s", "America/New_York"))
    col = column_from_arrow(arr)
    got = call_function("local_timestamp", [col]).to_arrow().to_pylist()[0]
    zi = dtm.datetime.fromtimestamp(
        s, tz=ZoneInfo("America/New_York")).replace(tzinfo=None)
    assert got == zi
    assert got != pc.local_timestamp(arr).to_pylist()[0]  # pyarrow bug


# ---------------------------------------------------------------------
# native numeric <-> string casts
# ---------------------------------------------------------------------

def _roundtrip(name, arr, target):
    col = column_from_arrow(arr)
    got = cast(col, dt.from_arrow(target)).to_arrow().to_pylist()
    want = arr.cast(target).to_pylist()
    for g, w in zip(got, want):
        if isinstance(g, float) and isinstance(w, float) and \
                np.isnan(g) and np.isnan(w):
            continue
        assert g == w, (name, g, w)


def test_float_to_string_formatting():
    rng = np.random.default_rng(0)
    vals = np.concatenate([
        rng.normal(size=400) * (10.0 ** rng.integers(-20, 20, 400)),
        [0.0, -0.0, np.inf, -np.inf, np.nan, 1e15, 1e-6, 1e-7, 5e-324,
         1.0, 123456.789, 2**53 - 1.0]])
    _roundtrip("f64", pa.array(vals), pa.string())
    _roundtrip("f32", pa.array(np.concatenate([
        (rng.normal(size=200) * (10.0 ** rng.integers(-10, 10, 200))
         ).astype(np.float32),
        np.array([0, -0.0, np.inf, 1e7, 16777216.0], np.float32)])),
        pa.string())


def test_int_bool_decimal_to_string():
    rng = np.random.default_rng(1)
    _roundtrip("i64", pa.array(rng.integers(-2**62, 2**62, 300)),
               pa.string())
    _roundtrip("u8", pa.array(rng.integers(0, 256, 50), pa.uint8()),
               pa.string())
    _roundtrip("bool", pa.array([True, False, None]), pa.string())
    from decimal import Decimal

    _roundtrip("dec", pa.array(
        [Decimal("1.23"), Decimal("-0.05"), Decimal("1000"), None],
        pa.decimal128(10, 2)), pa.string())
    _roundtrip("dec256", pa.array(
        [Decimal("-" + "9" * 40 + ".55"), Decimal("0.01")],
        pa.decimal256(50, 2)), pa.string())


def test_temporal_to_string():
    _roundtrip("ts_us", pa.array(
        [dtm.datetime(2020, 1, 2, 3, 4, 5, 123456),
         dtm.datetime(1999, 12, 31, 23, 59, 59), None],
        pa.timestamp("us")), pa.string())
    _roundtrip("ts_s", pa.array([dtm.datetime(2020, 1, 2, 3, 4, 5)],
                                pa.timestamp("s")), pa.string())
    _roundtrip("tstz", pa.array(
        [dtm.datetime(2020, 6, 1, 12), dtm.datetime(2020, 12, 25, 1, 2)],
        pa.timestamp("us", "America/New_York")), pa.string())
    _roundtrip("date32", pa.array([18628, 0, None], pa.date32()),
               pa.string())
    _roundtrip("time64ns", pa.array([0, 86399999999999],
                                    pa.time64("ns")), pa.string())
    _roundtrip("dur", pa.array([5000000, -3], pa.duration("us")),
               pa.string())


def test_string_parsing():
    _roundtrip("s->i64", pa.array(
        ["1", "-5", "0x10", "9223372036854775807"]), pa.int64())
    _roundtrip("s->f64", pa.array(
        ["1.5", "-2e3", "inf", "NaN", ".5", "1e400"]), pa.float64())
    _roundtrip("s->bool", pa.array(["true", "0", "TRUE", "False"]),
               pa.bool_())
    _roundtrip("s->dec", pa.array(["1.23", "-0.05", "1000"]),
               pa.decimal128(10, 2))
    _roundtrip("s->ts", pa.array(
        ["2020-01-02 03:04:05", "2020-01-02T03:04:05.123456",
         "2020-01-02"]), pa.timestamp("us"))
    _roundtrip("s->date32", pa.array(["2020-01-02", "1969-12-31"]),
               pa.date32())
    # rejects what the reference's parsers reject
    for bad, typ in [("+7", dt.int64), (" 1", dt.int64), ("", dt.int64),
                     ("1.0", dt.int64), ("128", dt.int8),
                     ("t", dt.bool_), ("1.234", dt.decimal128(10, 2))]:
        with pytest.raises(Invalid):
            cast(column_from_arrow(pa.array([bad])), typ)
    # bad value under a null row does not raise
    import jax.numpy as jnp

    col = column_from_arrow(pa.array(["1", "zzz"])).with_validity(
        jnp.asarray(np.array([True, False])))
    assert cast(col, dt.int64).to_arrow().to_pylist() == [1, None]
