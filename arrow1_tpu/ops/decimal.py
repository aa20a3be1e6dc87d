"""Decimal128 arithmetic: two-limb int64 math on device.

Reference: cpp/src/arrow/util/basic_decimal.{h,cc} — BasicDecimal128 as
(high int64, low uint64) with carry-propagating add/sub and lexicographic
compare. The TPU storage is the same two limbs as separate arrays
(column.py: data = low limb, data2 = high limb), so the kernels are plain
vector ops: no __int128, no per-element loops.

Scale semantics (reference: decimal arithmetic promotion in
compute/kernels/scalar_arithmetic.cc for decimals): add/subtract require
rescale to the max scale; result precision grows by 1 (capped at 38).
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import dtypes as dt
from ..column import Column
from ..errors import Invalid

__all__ = ["decimal_add", "decimal_subtract", "decimal_negate",
           "decimal_compare", "decimal_to_float"]

_U64 = jnp.uint64
_MASK64 = jnp.uint64(0xFFFFFFFFFFFFFFFF)


def _limbs(col: Column):
    return col.data.astype(jnp.uint64), col.data2.astype(jnp.int64)


def _rescale(lo, hi, by: int):
    """Multiply (hi:lo) by 10**by (by >= 0, small). Schoolbook per power
    of ten: x*10 = x*8 + x*2 (shifts + adds with carry)."""
    for _ in range(by):
        lo8 = lo << _U64(3)
        hi8 = (hi << jnp.int64(3)) | (lo >> _U64(61)).astype(jnp.int64)
        lo2 = lo << _U64(1)
        hi2 = (hi << jnp.int64(1)) | (lo >> _U64(63)).astype(jnp.int64)
        lo = lo8 + lo2
        carry = (lo < lo8).astype(jnp.int64)
        hi = hi8 + hi2 + carry
    return lo, hi


def _common_scale(a: Column, b: Column):
    sa, sb = a.dtype.scale, b.dtype.scale
    s = max(sa, sb)
    alo, ahi = _limbs(a)
    blo, bhi = _limbs(b)
    if sa < s:
        alo, ahi = _rescale(alo, ahi, s - sa)
    if sb < s:
        blo, bhi = _rescale(blo, bhi, s - sb)
    prec = min(max(a.dtype.precision, b.dtype.precision) + 1, 38)
    return alo, ahi, blo, bhi, dt.decimal128(prec, s)


def _validity(a: Column, b: Column):
    if a.validity is None:
        return b.validity
    if b.validity is None:
        return a.validity
    return a.validity & b.validity


def decimal_add(a: Column, b: Column) -> Column:
    alo, ahi, blo, bhi, out_t = _common_scale(a, b)
    lo = alo + blo
    carry = (lo < alo).astype(jnp.int64)
    hi = ahi + bhi + carry
    return Column(lo.astype(jnp.int64), out_t, validity=_validity(a, b),
                  data2=hi)


def decimal_subtract(a: Column, b: Column) -> Column:
    alo, ahi, blo, bhi, out_t = _common_scale(a, b)
    lo = alo - blo
    borrow = (alo < blo).astype(jnp.int64)
    hi = ahi - bhi - borrow
    return Column(lo.astype(jnp.int64), out_t, validity=_validity(a, b),
                  data2=hi)


def decimal_negate(a: Column) -> Column:
    lo, hi = _limbs(a)
    nlo = (~lo) + _U64(1)
    nhi = (~hi) + (nlo == _U64(0)).astype(jnp.int64)
    return Column(nlo.astype(jnp.int64), a.dtype, validity=a.validity,
                  data2=nhi)


def decimal_compare(a: Column, b: Column, op: str):
    alo, ahi, blo, bhi, _ = _common_scale(a, b)
    hi_lt = ahi < bhi
    hi_eq = ahi == bhi
    lt = hi_lt | (hi_eq & (alo < blo))
    eq = hi_eq & (alo == blo)
    table = {
        "equal": eq, "not_equal": ~eq,
        "less": lt, "less_equal": lt | eq,
        "greater": ~(lt | eq), "greater_equal": ~lt,
    }
    if op not in table:
        raise Invalid(f"decimal compare: bad op {op}")
    return Column(table[op], dt.bool_, validity=_validity(a, b))


def decimal_to_float(a: Column) -> Column:
    lo, hi = _limbs(a)
    # convert via sign+magnitude: hi*2^64 + lo in float catastrophically
    # cancels for small negative values (hi = -1, lo ~ 2^64)
    neg = hi < 0
    nlo = (~lo) + _U64(1)
    nhi = (~hi) + (nlo == _U64(0)).astype(jnp.int64)
    ulo = jnp.where(neg, nlo, lo)
    uhi = jnp.where(neg, nhi, hi)
    mag = uhi.astype(jnp.float64) * 18446744073709551616.0 + \
        ulo.astype(jnp.float64)
    val = jnp.where(neg, -mag, mag)
    return Column(val / (10.0 ** a.dtype.scale), dt.float64,
                  validity=a.validity)
