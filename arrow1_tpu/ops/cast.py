"""Cast kernels.

Reference: cpp/src/arrow/compute/cast.h:83 (cast meta-function +
CastOptions safety toggles, cast.h:44) and the scalar_cast_*.cc kernel
families. Safety checks (int narrowing, float truncation, time truncation)
are on-device flag reductions raised at the eager boundary, like the
checked arithmetic kernels.

String<->numeric casts run on the *dictionary values* host-side (a few
unique strings) and gather on device — the dictionary-encode-at-ingest
design means a cast never touches per-row bytes on the TPU.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np

from .. import dtypes as dt
from ..column import Column, Dictionary
from ..datum import Scalar
from ..errors import Invalid
from ..registry import register_function
from .common import result_column, unpack

__all__ = ["CastOptions", "cast", "temporal_to_common"]


@dataclasses.dataclass
class CastOptions:
    """Reference: cast.h:44."""

    target_type: Optional[dt.DataType] = None
    allow_int_overflow: bool = False
    allow_time_truncate: bool = False
    allow_time_overflow: bool = False
    allow_decimal_truncate: bool = False
    allow_float_truncate: bool = False
    allow_invalid_utf8: bool = False

    @classmethod
    def safe(cls, target_type=None):
        return cls(target_type=target_type)

    @classmethod
    def unsafe(cls, target_type=None):
        return cls(target_type=target_type, allow_int_overflow=True,
                   allow_time_truncate=True, allow_time_overflow=True,
                   allow_decimal_truncate=True, allow_float_truncate=True,
                   allow_invalid_utf8=True)


_UNIT_NS = {"s": 1_000_000_000, "ms": 1_000_000, "us": 1_000, "ns": 1}


def _temporal_unit_ns(t: dt.DataType) -> int:
    if t.kind == "date32":
        return 86_400 * _UNIT_NS["s"]
    if t.kind == "date64":
        return _UNIT_NS["ms"]
    return _UNIT_NS[t.unit]


def temporal_to_common(a, b):
    """Storage ints of two temporal args rescaled to the finer unit."""
    na, nb = _temporal_unit_ns(a.dtype), _temporal_unit_ns(b.dtype)
    from .common import value_of

    x = value_of(a).astype(jnp.int64)
    y = value_of(b).astype(jnp.int64)
    if na > nb:
        x = x * (na // nb)
    elif nb > na:
        y = y * (nb // na)
    return x, y


def _raise_if(flag, message, validity):
    if validity is False:
        return
    if validity is not None:
        flag = flag & validity
    if bool(jnp.any(flag)):
        raise Invalid(message)


def _cast_numeric(x, src: dt.DataType, dst: dt.DataType, options: CastOptions,
                  validity):
    tgt = dst.physical_dtype()
    if src.is_boolean:
        return x.astype(tgt)
    if dst.is_boolean:
        return x != 0
    if src.is_integer and dst.is_integer:
        if not options.allow_int_overflow:
            info = np.iinfo(np.dtype(tgt))
            lo, hi = int(info.min), int(info.max)
            sinfo = np.iinfo(np.dtype(src.physical_dtype()))
            if int(sinfo.min) < lo or int(sinfo.max) > hi:
                bad = (x.astype(jnp.int64) < lo) | (
                    x.astype(jnp.uint64) > np.uint64(hi)
                    if src.kind == "uint64"
                    else x.astype(jnp.int64) > hi)
                _raise_if(bad, f"integer value out of bounds casting {src} -> {dst}",
                          validity)
        return x.astype(tgt)
    if src.is_floating and dst.is_integer:
        if not options.allow_float_truncate:
            _raise_if(jnp.floor(x) != x, "float value was truncated converting to"
                      f" {dst}", validity)
        if not options.allow_int_overflow:
            info = np.iinfo(np.dtype(tgt))
            bad = (x < float(info.min)) | (x > float(info.max)) | jnp.isnan(x)
            _raise_if(bad, f"float out of bounds casting to {dst}", validity)
        return x.astype(tgt)
    if src.is_integer and dst.is_floating:
        return x.astype(tgt)
    if src.is_floating and dst.is_floating:
        if (not options.allow_float_truncate
                and np.dtype(tgt).itemsize < np.dtype(x.dtype).itemsize):
            y = x.astype(tgt)
            _raise_if((y.astype(x.dtype) != x) & ~jnp.isnan(x),
                      f"float truncation casting {src} -> {dst}", validity)
            return y
        return x.astype(tgt)
    raise Invalid(f"unsupported numeric cast {src} -> {dst}")


def cast(value, target_type: dt.DataType, safe: bool = True,
         options: Optional[CastOptions] = None):
    """Eager cast entry (reference: compute::Cast cast.cc)."""
    if options is None:
        options = CastOptions.safe(target_type) if safe else CastOptions.unsafe(
            target_type)
    from ..datum import as_datum

    return _cast_exec([as_datum(value)], options, None)


def _cast_exec(args, options: CastOptions, ctx):
    (a,) = args
    dst = options.target_type
    assert dst is not None, "cast requires target_type"
    src = a.dtype
    if src == dst:
        return a
    (x,), validities, n = unpack(args)
    validity = validities[0] if isinstance(a, Column) else (
        None if a.is_valid else False)

    # explicit dictionary type: decode by gathering values through codes
    # (reference: cast from dictionary unpacks, scalar_cast_nested.cc)
    if src.is_dictionary:
        d = a.dictionary
        vt = src.value_type
        if dst.is_binary:
            return result_column(a.data, dst, validity, n, dictionary=d)
        vals = np.asarray(d.values)
        lut = jnp.asarray(vals.astype(np.dtype(vt.physical_dtype())))
        decoded = lut[jnp.clip(x, 0, max(len(d) - 1, 0))] if len(d) \
            else jnp.zeros_like(x, vt.physical_dtype())
        if vt == dst:
            return result_column(decoded, dst, validity, n)
        inner_validity = validity if not (validity is None or
                                          validity is False) else None
        inner = Column(decoded, vt, validity=inner_validity)
        return _cast_exec([inner], options, ctx)

    # dictionary-string source: transform values host-side, gather on device
    if src.is_binary:
        d = a.dictionary if isinstance(a, Column) else a.dictionary
        assert d is not None
        if dst.is_binary:
            return a.with_data(a.data, dst) if isinstance(a, Column) else a
        import pyarrow as pa

        vals = pa.array(d.values.tolist(), type=dt.to_arrow(src))
        try:
            casted = vals.cast(dt.to_arrow(dst), safe=not options.allow_int_overflow)
        except pa.ArrowInvalid as e:
            raise Invalid(str(e)) from None
        lut = jnp.asarray(np.asarray(casted.to_numpy(zero_copy_only=False))
                          .astype(dst.physical_dtype()))
        data = lut[x] if len(d) else jnp.zeros_like(x, dst.physical_dtype())
        return result_column(data, dst, validity, n)

    if dst.is_binary:
        # numeric -> string: format on host via pyarrow on the unique values?
        # values are per-row here; format host-side (host boundary op).
        import pyarrow as pa

        host = np.asarray(x)
        arr = pa.array(host, type=dt.to_arrow(src)).cast(dt.to_arrow(dst))
        from ..interop import column_from_arrow

        col = column_from_arrow(arr)
        if validity is not None and validity is not False:
            col = col.with_validity(validity)
        return col

    if src.is_decimal:
        from .decimal import decimal_cast, decimal_to_float

        if dst.is_floating:
            f = decimal_to_float(a)
            if dst != dt.float64:
                return result_column(f.data.astype(dst.physical_dtype()),
                                     dst, validity, n)
            return f
        if dst.is_decimal or dst.is_integer:
            out = decimal_cast(a, dst,
                               bool(options.allow_decimal_truncate))
            if validity is not None and validity is not False and \
                    out.validity is None:
                out = Column(out.data, out.dtype, validity=validity,
                             data2=out.data2)
            return out
        raise Invalid(f"unsupported decimal cast {src} -> {dst}")
    if dst.is_decimal and (src.is_integer or src.is_floating):
        from .decimal import cast_to_decimal

        return cast_to_decimal(a, dst)

    if src.is_temporal or dst.is_temporal:
        return _cast_temporal(a, x, src, dst, options, validity, n)

    if src.is_null:
        data = jnp.zeros(n or 1, dst.physical_dtype())
        return result_column(data if n is not None else data[0], dst, False, n)

    r = _cast_numeric(x, src, dst, options, validity)
    return result_column(r, dst, validity, n)


def _cast_temporal(a, x, src, dst, options, validity, n):
    if src.is_numeric and dst.is_temporal:
        return result_column(x.astype(dst.physical_dtype()), dst, validity, n)
    if src.is_temporal and dst.is_numeric:
        return result_column(_cast_numeric(x, dt.int64, dst, options, validity),
                             dst, validity, n)
    if src.is_temporal and dst.is_temporal:
        ns_src, ns_dst = _temporal_unit_ns(src), _temporal_unit_ns(dst)
        v = x.astype(jnp.int64)
        if ns_src >= ns_dst:
            r = v * (ns_src // ns_dst)
        else:
            f = ns_dst // ns_src
            if not options.allow_time_truncate:
                _raise_if(v % f != 0, f"casting {src} -> {dst} would lose data",
                          validity)
            # truncation rounds toward negative infinity (arrow divides)
            r = jnp.floor_divide(v, f)
        return result_column(r.astype(dst.physical_dtype()), dst, validity, n)
    raise Invalid(f"unsupported temporal cast {src} -> {dst}")


register_function("cast", "scalar", 1, CastOptions)(_cast_exec)
