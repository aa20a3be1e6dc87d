"""Temporal kernels: strptime, strftime, component extraction, rounding.

Reference: cpp/src/arrow/compute/kernels/scalar_cast_temporal.cc
(strptime via vendored datetime) and the temporal component kernels.

TPU design: strptime/strftime are string<->time conversions -> run once
per unique dictionary value on the host (like ops/strings.py). Component
extraction (year/month/day/...) is pure int64 arithmetic on epoch values
-> device math using Howard Hinnant's civil-from-days algorithm (the same
algorithm the reference vendors in arrow/vendored/datetime).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np

from .. import dtypes as dt
from ..column import Column, Dictionary
from ..errors import Invalid
from ..registry import register_function

__all__ = ["StrptimeOptions", "StrftimeOptions"]


@dataclasses.dataclass
class StrptimeOptions:
    """Reference: api_scalar.h StrptimeOptions (format + TimeUnit)."""

    format: str = "%Y-%m-%dT%H:%M:%S"
    unit: str = "us"
    error_is_null: bool = False


@dataclasses.dataclass
class StrftimeOptions:
    format: str = "%Y-%m-%dT%H:%M:%S"


_UNIT_PER_S = {"s": 1, "ms": 10**3, "us": 10**6, "ns": 10**9}


def _strptime_exec(args, options: StrptimeOptions, ctx):
    from datetime import datetime, timezone

    (col,) = args
    if not col.dtype.is_binary:
        raise Invalid("strptime expects strings")
    options = options or StrptimeOptions()
    mult = _UNIT_PER_S[options.unit]
    vals = col.dictionary.values.tolist()
    parsed = np.zeros(max(len(vals), 1), dtype=np.int64)
    ok = np.zeros(max(len(vals), 1), dtype=bool)
    for i, v in enumerate(vals):
        try:
            ts = datetime.strptime(v, options.format).replace(
                tzinfo=timezone.utc).timestamp()
            parsed[i] = round(ts * mult)
            ok[i] = True
        except (ValueError, TypeError):
            if not options.error_is_null:
                raise Invalid(f"strptime: cannot parse {v!r} with "
                              f"{options.format!r}") from None
    lut = jnp.asarray(parsed)
    okl = jnp.asarray(ok)
    codes = jnp.clip(col.data, 0, max(len(vals) - 1, 0))
    data = lut[codes]
    validity = okl[codes] if not bool(np.all(ok)) else None
    if col.validity is not None:
        validity = col.validity if validity is None else (validity & col.validity)
    return Column(data, dt.timestamp(options.unit), validity=validity)


register_function("strptime", "scalar", 1, StrptimeOptions)(_strptime_exec)


def _strftime_exec(args, options: StrftimeOptions, ctx):
    from datetime import datetime, timezone

    (col,) = args
    if not col.dtype.is_temporal:
        raise Invalid("strftime expects a temporal column")
    options = options or StrftimeOptions()
    unit = col.dtype.unit or ("ms" if col.dtype.kind == "date64" else "s")
    if col.dtype.kind == "date32":
        secs = np.asarray(col.data, dtype=np.int64) * 86400
    else:
        secs = np.asarray(col.data, dtype=np.int64) // _UNIT_PER_S[unit]
    # format on host; unique-ify via the values themselves
    uniq, codes = np.unique(secs, return_inverse=True)
    formatted = np.asarray(
        [datetime.fromtimestamp(int(s), tz=timezone.utc)
         .strftime(options.format) for s in uniq], dtype=object)
    return Column(jnp.asarray(codes.astype(np.int32)), dt.string,
                  validity=col.validity, dictionary=Dictionary(formatted))


register_function("strftime", "scalar", 1, StrftimeOptions)(_strftime_exec)


def _civil_from_days(days):
    """days since 1970-01-01 -> (year, month, day); Hinnant's algorithm
    (reference vendors it at arrow/vendored/datetime/date.h) — pure int
    vector math, runs on the VPU."""
    z = days + 719468
    era = jnp.where(z >= 0, z, z - 146096) // 146097
    doe = z - era * 146097
    yoe = (doe - doe // 1460 + doe // 36524 - doe // 146096) // 365
    y = yoe + era * 400
    doy = doe - (365 * yoe + yoe // 4 - yoe // 100)
    mp = (5 * doy + 2) // 153
    d = doy - (153 * mp + 2) // 5 + 1
    m = jnp.where(mp < 10, mp + 3, mp - 9)
    y = jnp.where(m <= 2, y + 1, y)
    return y, m, d


def _epoch_days_and_subsec(col: Column):
    t = col.dtype
    x = col.data.astype(jnp.int64)
    if t.kind == "date32":
        return x, jnp.zeros_like(x)
    if t.kind == "date64":
        per_day = 86400 * 1000
    else:
        per_day = 86400 * _UNIT_PER_S[t.unit]
    days = jnp.floor_divide(x, per_day)
    rem = x - days * per_day
    return days, rem


def _component(name, fn, out_type=dt.int64):
    def exec_fn(args, options, ctx):
        (col,) = args
        if not col.dtype.is_temporal:
            raise Invalid(f"{name}: expects a temporal column")
        days, rem = _epoch_days_and_subsec(col)
        y, m, d = _civil_from_days(days)
        unit = col.dtype.unit or "ms" if col.dtype.kind == "date64" else \
            (col.dtype.unit or "s")
        per_s = _UNIT_PER_S.get(unit, 1) if col.dtype.kind not in (
            "date32",) else 1
        if col.dtype.kind == "date64":
            per_s = 1000
        out = fn(y, m, d, days, rem, per_s)
        return Column(out.astype(out_type.physical_dtype()), out_type,
                      validity=col.validity)

    return exec_fn


register_function("year", "scalar", 1)(
    _component("year", lambda y, m, d, days, rem, ps: y))
register_function("month", "scalar", 1)(
    _component("month", lambda y, m, d, days, rem, ps: m))
register_function("day", "scalar", 1)(
    _component("day", lambda y, m, d, days, rem, ps: d))
register_function("day_of_week", "scalar", 1)(
    _component("day_of_week",
               lambda y, m, d, days, rem, ps: (days + 3) % 7))  # 0=Monday
register_function("day_of_year", "scalar", 1)(
    _component("day_of_year", lambda y, m, d, days, rem, ps:
               days - _days_from_civil(y, 1, 1) + 1))
register_function("hour", "scalar", 1)(
    _component("hour", lambda y, m, d, days, rem, ps: rem // (3600 * ps)))
register_function("minute", "scalar", 1)(
    _component("minute",
               lambda y, m, d, days, rem, ps: (rem // (60 * ps)) % 60))
register_function("second", "scalar", 1)(
    _component("second", lambda y, m, d, days, rem, ps: (rem // ps) % 60))
register_function("millisecond", "scalar", 1)(
    _component("millisecond", lambda y, m, d, days, rem, ps:
               (rem * 1000 // ps) % 1000))
register_function("microsecond", "scalar", 1)(
    _component("microsecond", lambda y, m, d, days, rem, ps:
               (rem * 1000000 // ps) % 1000))


def _days_from_civil(y, m, d):
    """Inverse of _civil_from_days (Hinnant days_from_civil)."""
    y = y - (m <= 2)
    era = jnp.where(y >= 0, y, y - 399) // 400
    yoe = y - era * 400
    mp = jnp.where(m > 2, m - 3, m + 9)
    doy = (153 * mp + 2) // 5 + d - 1
    doe = yoe * 365 + yoe // 4 - yoe // 100 + doy
    return era * 146097 + doe - 719468
