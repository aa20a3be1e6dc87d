"""Scalar arithmetic kernels: add/subtract/multiply/divide/negate/power
(+ _checked overflow-raising variants).

Reference: cpp/src/arrow/compute/kernels/scalar_arithmetic.cc. Semantics
preserved, implementation redesigned: types resolve at trace time, null
propagation is a fused mask AND, and the `_checked` variants emit an
overflow-flag reduction that the eager boundary raises from (on-device code
cannot raise; cf. SURVEY.md §7 error-model correspondence).

Integer ops wrap (two's complement — XLA semantics match C); division is
C-style truncation (jax.lax.div), matching Arrow, not numpy's floor
division.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .. import dtypes as dt
from ..column import Column
from ..datum import Scalar
from ..errors import Invalid
from ..registry import register_function
from .common import (common_type, intersect_validity, result_column, unpack)

__all__ = ["ArithmeticOptions"]


@dataclasses.dataclass
class ArithmeticOptions:
    """Reference: api_scalar.h:40."""

    check_overflow: bool = False


def _raise_if(flag, message: str, validity):
    """Host-side reduction of an on-device error flag (eager boundary only).

    Only valid (non-null) lanes can raise — the reference kernels skip null
    slots in their overflow checks."""
    if validity is not None and validity is not False and not isinstance(validity, bool):
        flag = flag & validity
    elif validity is False:
        return
    if bool(jnp.any(flag)):
        raise Invalid(message)


def _int_info(t: dt.DataType):
    np_dt = np.dtype(t.physical_dtype())
    info = np.iinfo(np_dt)
    return info.min, info.max


# ---- add / subtract / multiply ----

def _add_overflow(x, y, r, t: dt.DataType):
    if t.is_unsigned_integer:
        return r < x
    return ((x > 0) & (y > 0) & (r < x)) | ((x < 0) & (y < 0) & (r > x))


def _sub_overflow(x, y, r, t: dt.DataType):
    if t.is_unsigned_integer:
        return y > x
    return ((x >= 0) & (y < 0) & (r < x)) | ((x < 0) & (y > 0) & (r > x))


def _mul_overflow(x, y, r, t: dt.DataType):
    lo, hi = _int_info(t)
    y_nonzero = y != 0
    # r / y != x detects wraparound; the lone undetected case is
    # lo * -1 (division itself wraps), handled explicitly for signed.
    bad = y_nonzero & (jax.lax.div(r, jnp.where(y_nonzero, y, 1)) != x)
    if t.is_signed_integer:
        bad = bad | ((x == lo) & (y == -1)) | ((y == lo) & (x == -1))
    return bad


_UNIT_RANK = {"s": 0, "ms": 1, "us": 2, "ns": 3}
_UNIT_MULT = {"s": 1, "ms": 10**3, "us": 10**6, "ns": 10**9}


def _temporal_parts(a, x):
    """(int64 storage in a scalable unit, unit, kind) where kind is
    instant (timestamp/date), time (time-of-day), dur, or num."""
    t = a.dtype
    if not t.is_temporal:
        return x, None, "num"
    k = t.kind
    if k == "date32":
        return x.astype(jnp.int64) * 86400, "s", "instant"
    if k == "date64":
        return x.astype(jnp.int64), "ms", "instant"
    if k == "timestamp":
        return x.astype(jnp.int64), t.unit or "us", "instant"
    if k == "time32":
        return x.astype(jnp.int64), t.unit or "s", "time"
    if k == "time64":
        return x.astype(jnp.int64), t.unit or "us", "time"
    if k == "duration":
        return x.astype(jnp.int64), t.unit or "us", "dur"
    raise Invalid(f"temporal arithmetic: unsupported type {t}")


def _temporal_arith(name, args):
    """Temporal arithmetic matrix (reference: scalar_temporal_binary.cc /
    scalar_arithmetic.cc timestamp+duration kernels; oracle-verified):
    add:      dur+dur->dur, instant+dur->timestamp, time+dur->time
    subtract: instant-instant->dur, time-time->dur, dur-dur->dur,
              instant-dur->timestamp, time-dur->time
    multiply: dur*int->dur
    divide:   dur/dur->float64, dur/int->dur (truncated)
    Mixed units promote to the finer unit."""
    a, b = args
    (x, y), validities, n = unpack(args)
    xa, ua, ka = _temporal_parts(a, x)
    yb, ub, kb = _temporal_parts(b, y)
    validity = intersect_validity(validities, n)
    units = [u for u in (ua, ub) if u]
    cu = max(units, key=lambda u: _UNIT_RANK[u])
    if ua:
        xa = xa * (_UNIT_MULT[cu] // _UNIT_MULT[ua])
    if ub:
        yb = yb * (_UNIT_MULT[cu] // _UNIT_MULT[ub])

    def time_t(unit):
        return dt.time32(unit) if unit in ("s", "ms") else dt.time64(unit)

    def out(v, t):
        return result_column(v.astype(t.physical_dtype()), t, validity, n)

    pair = (ka, kb)
    if name == "add":
        if pair == ("dur", "dur"):
            return out(xa + yb, dt.duration(cu))
        if "dur" in pair and "instant" in pair:
            return out(xa + yb, dt.timestamp(cu))
        if "dur" in pair and "time" in pair:
            return out(xa + yb, time_t(cu))
    elif name == "subtract":
        if ka == kb and ka in ("instant", "time", "dur"):
            return out(xa - yb, dt.duration(cu))
        if pair == ("instant", "dur"):
            return out(xa - yb, dt.timestamp(cu))
        if pair == ("time", "dur"):
            return out(xa - yb, time_t(cu))
    elif name == "multiply":
        if "dur" in pair and "num" in pair:
            num = yb if ka == "dur" else xa
            other = xa if ka == "dur" else yb
            return out(other * num.astype(jnp.int64), dt.duration(cu))
    elif name == "divide":
        if pair == ("dur", "dur"):
            return result_column(xa.astype(jnp.float64)
                                 / yb.astype(jnp.float64),
                                 dt.float64, validity, n)
        if pair == ("dur", "num"):
            d = y.astype(jnp.int64)
            _raise_if(d == 0, "divide by zero", validity)
            return out(jax.lax.div(xa, jnp.where(d == 0, 1, d)),
                       dt.duration(cu))
    raise Invalid(f"{name}: unsupported temporal combination "
                  f"{a.dtype} / {b.dtype}")


def _binary_arith(name, op, overflow_fn, checked):
    def exec_fn(args, options, ctx):
        a, b = args
        if getattr(a.dtype, "is_decimal", False) or \
                getattr(b.dtype, "is_decimal", False):
            from .decimal import (decimal_add, decimal_divide,
                                  decimal_multiply, decimal_subtract)

            base = name.replace("_checked", "")
            fns = {"add": decimal_add, "subtract": decimal_subtract,
                   "multiply": decimal_multiply, "divide": decimal_divide}
            if base in fns:
                return fns[base](a, b)
            raise Invalid(f"{name}: unsupported for decimal")
        if a.dtype.is_temporal or b.dtype.is_temporal:
            return _temporal_arith(name.replace("_checked", ""), args)
        out_t = common_type(args)
        if not out_t.is_numeric:
            raise Invalid(f"{name}: non-numeric inputs")
        (x, y), validities, n = unpack(args, out_t)
        r = op(x, y)
        validity = intersect_validity(validities, n)
        if checked and out_t.is_integer and overflow_fn is not None:
            _raise_if(overflow_fn(x, y, r, out_t), f"overflow in {name}", validity)
        return result_column(r, out_t, validity, n)

    return exec_fn


register_function("add", "scalar", 2, ArithmeticOptions)(
    _binary_arith("add", jnp.add, None, checked=False))
register_function("add_checked", "scalar", 2)(
    _binary_arith("add_checked", jnp.add, _add_overflow, checked=True))
register_function("subtract", "scalar", 2, ArithmeticOptions)(
    _binary_arith("subtract", jnp.subtract, None, checked=False))
register_function("subtract_checked", "scalar", 2)(
    _binary_arith("subtract_checked", jnp.subtract, _sub_overflow, checked=True))
register_function("multiply", "scalar", 2, ArithmeticOptions)(
    _binary_arith("multiply", jnp.multiply, None, checked=False))
register_function("multiply_checked", "scalar", 2)(
    _binary_arith("multiply_checked", jnp.multiply, _mul_overflow, checked=True))


# ---- divide ----

def _divide_exec(checked):
    def exec_fn(args, options, ctx):
        a, b = args
        if getattr(a.dtype, "is_decimal", False) or \
                getattr(b.dtype, "is_decimal", False):
            from .decimal import decimal_divide

            return decimal_divide(a, b)
        if a.dtype.is_temporal or b.dtype.is_temporal:
            return _temporal_arith("divide", args)
        out_t = common_type(args)
        (x, y), validities, n = unpack(args, out_t)
        validity = intersect_validity(validities, n)
        if out_t.is_integer:
            zero = y == 0
            # divide-by-zero raises in both variants (reference:
            # scalar_arithmetic.cc Divide uses DivideChecked's zero check)
            _raise_if(zero, "divide by zero", validity)
            safe_y = jnp.where(zero, 1, y)
            r = jax.lax.div(x, safe_y)  # C-style truncation
            if checked and out_t.is_signed_integer:
                lo, _ = _int_info(out_t)
                _raise_if((x == lo) & (y == -1), "overflow in divide", validity)
        else:
            r = x / y
        return result_column(r, out_t, validity, n)

    return exec_fn


register_function("divide", "scalar", 2, ArithmeticOptions)(_divide_exec(False))
register_function("divide_checked", "scalar", 2)(_divide_exec(True))


# ---- negate ----

def _negate_exec(checked):
    def exec_fn(args, options, ctx):
        (a,) = args
        out_t = a.dtype
        if getattr(out_t, "is_decimal", False):
            from .decimal import decimal_negate

            return decimal_negate(a)
        (x,), validities, n = unpack(args, out_t)
        validity = intersect_validity(validities, n)
        if checked and out_t.is_unsigned_integer:
            _raise_if(x != 0, "overflow in negate of unsigned", validity)
        if checked and out_t.is_signed_integer:
            lo, _ = _int_info(out_t)
            _raise_if(x == lo, "overflow in negate", validity)
        r = jnp.negative(x) if not out_t.is_unsigned_integer else (
            (-x.astype(jnp.int64)).astype(x.dtype) if checked is False else -x)
        return result_column(r, out_t, validity, n)

    return exec_fn


register_function("negate", "scalar", 1, ArithmeticOptions)(_negate_exec(False))
register_function("negate_checked", "scalar", 1)(_negate_exec(True))


# ---- power ----

def _ipow(x, y, bits_checked=None):
    """Exponentiation by squaring, wraparound semantics (reference:
    scalar_arithmetic.cc Power for integers). 63 iterations bounded by key
    width; XLA unrolls to a fixed sequence."""
    out_t = x.dtype
    result = jnp.ones_like(x)
    base = x
    exp = y.astype(jnp.uint64) if y.dtype != jnp.uint64 else y

    def body(i, carry):
        result, base, exp = carry
        result = jnp.where((exp & 1) == 1, result * base, result)
        base = base * base
        exp = exp >> 1
        return result, base, exp

    result, base, exp = jax.lax.fori_loop(0, 64, body, (result, base, exp))
    return result.astype(out_t)


def _power_exec(checked):
    def exec_fn(args, options, ctx):
        if any(getattr(a.dtype, "is_decimal", False) for a in args):
            from .math import _defloat

            args = _defloat(args)
        out_t = common_type(args)
        (x, y), validities, n = unpack(args, out_t)
        validity = intersect_validity(validities, n)
        if out_t.is_integer:
            _raise_if(y < 0, "integers to negative integer powers are not allowed",
                      validity)
            r = _ipow(x, jnp.maximum(y, 0))
            if checked:
                # overflow check via float64 magnitude bound
                approx = jnp.abs(x.astype(jnp.float64)) ** jnp.maximum(
                    y, 0).astype(jnp.float64)
                _, hi = _int_info(out_t)
                _raise_if((jnp.abs(x) > 1) & (approx > float(hi) * 1.0000001),
                          "overflow in power", validity)
        else:
            r = x ** y
        return result_column(r, out_t, validity, n)

    return exec_fn


register_function("power", "scalar", 2, ArithmeticOptions)(_power_exec(False))
register_function("power_checked", "scalar", 2)(_power_exec(True))


# ---- abs / sign (commonly exercised by expressions; arrow added abs in 5.0) ----

def _abs_exec(checked):
    def exec_fn(args, options, ctx):
        (a,) = args
        out_t = a.dtype
        if getattr(out_t, "is_decimal", False):
            # two-limb abs: negate where the HIGH limb is negative
            from .decimal import decimal_negate

            neg = decimal_negate(a)
            hi = (a.data2 if a.dtype.kind == "decimal128"
                  else a.data2[:, -1])
            is_neg = hi < 0
            from ..column import Column as _C

            if a.dtype.kind == "decimal128":
                return _C(jnp.where(is_neg, neg.data, a.data), out_t,
                          validity=a.validity,
                          data2=jnp.where(is_neg, neg.data2, a.data2))
            return _C(jnp.where(is_neg, neg.data, a.data), out_t,
                      validity=a.validity,
                      data2=jnp.where(is_neg[:, None], neg.data2,
                                      a.data2))
        (x,), validities, n = unpack(args, out_t)
        validity = intersect_validity(validities, n)
        if checked and out_t.is_signed_integer:
            lo, _ = _int_info(out_t)
            _raise_if(x == lo, "overflow in abs", validity)
        r = jnp.abs(x) if not out_t.is_unsigned_integer else x
        return result_column(r, out_t, validity, n)

    return exec_fn


register_function("abs", "scalar", 1)(_abs_exec(False))
register_function("abs_checked", "scalar", 1)(_abs_exec(True))


def _sign_exec(args, options, ctx):
    (a,) = args
    if getattr(a.dtype, "is_decimal", False):
        # sign lives in the HIGH limb; zero means all limbs zero
        from ..column import Column as _C

        hi = (a.data2 if a.dtype.kind == "decimal128"
              else a.data2[:, -1])
        zero = (a.data == 0) & jnp.all(
            jnp.atleast_2d(jnp.asarray(a.data2).T) == 0, axis=0)
        r = jnp.where(zero, 0, jnp.where(hi < 0, -1, 1)).astype(jnp.int8)
        return _C(r, dt.int8, validity=a.validity)
    out_t = a.dtype if a.dtype.is_floating else dt.int8
    (x,), validities, n = unpack(args)
    validity = intersect_validity(validities, n)
    r = jnp.sign(x).astype(out_t.physical_dtype())
    return result_column(r, out_t, validity, n)


register_function("sign", "scalar", 1)(_sign_exec)
