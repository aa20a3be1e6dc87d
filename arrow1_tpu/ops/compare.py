"""Comparison kernels: equal/not_equal/greater/greater_equal/less/less_equal.

Reference: cpp/src/arrow/compute/kernels/scalar_compare.cc. Numeric args
promote to a common type; outputs are bool with intersection nulls.

Dict-encoded strings compare without touching bytes on device: equality
compares codes (after unification), ordering maps codes through the
host-computed rank table (Dictionary.rank) — the SURVEY.md §7 recipe for
order-sensitive ops on dictionary columns.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from .. import dtypes as dt
from ..column import Column, Dictionary
from ..datum import Scalar
from ..errors import Invalid
from ..registry import register_function
from .common import common_type, intersect_validity, result_column, unpack

__all__ = ["CompareOptions"]


@dataclasses.dataclass
class CompareOptions:
    """Reference: api_scalar.h:133."""

    op: str = "equal"


def _is_stringlike(a) -> bool:
    return a.dtype.is_binary


def _dict_compare_values(args, ordered: bool):
    """Return (x, y, validities, n) where x/y are device ints that order the
    same way the underlying values do."""
    from .dictionary import unify_dictionaries

    a, b = args
    # scalar vs column
    if isinstance(a, Scalar) or isinstance(b, Scalar):
        col, s, flipped = (b, a, True) if isinstance(a, Scalar) else (a, b, False)
        assert isinstance(col, Column) and col.dictionary is not None
        sval = s.dictionary.values[int(s.value)] if s.dictionary is not None else s.value
        if ordered:
            rank = jnp.asarray(col.dictionary.rank)
            x = rank[col.data] if len(col.dictionary) else col.data
            # rank of scalar among dictionary values: count of values < sval
            svr = int(np.sum(np.sort(col.dictionary.values) < sval))
            # equality-of-rank must only hold when values equal:
            in_dict = sval in col.dictionary.index
            y = jnp.asarray(svr if in_dict else -1 if svr == 0 else svr, jnp.int32)
            # map "not in dict" to a half-rank trick: use 2*rank space
            x = x * 2
            y = jnp.asarray(2 * svr - (0 if in_dict else 1), jnp.int32)
        else:
            x = col.data
            code = col.dictionary.index.get(sval, -1)
            y = jnp.asarray(code, col.data.dtype)
        vs = [col.validity, None if s.is_valid else False]
        if flipped:
            x, y = y, x
            vs = vs[::-1]
        return x, y, vs, col.length
    # column vs column
    assert a.dictionary is not None and b.dictionary is not None
    if a.dictionary is b.dictionary:
        codes_a, codes_b, d = a.data, b.data, a.dictionary
    else:
        merged, d = unify_dictionaries([a, b])
        codes_a, codes_b = merged[: a.length], merged[a.length:]
    if ordered:
        rank = jnp.asarray(d.rank) if len(d) else None
        x = rank[codes_a] if rank is not None else codes_a
        y = rank[codes_b] if rank is not None else codes_b
    else:
        x, y = codes_a, codes_b
    return x, y, [a.validity, b.validity], a.length


_OPS = {
    "equal": (jnp.equal, False),
    "not_equal": (jnp.not_equal, False),
    "greater": (jnp.greater, True),
    "greater_equal": (jnp.greater_equal, True),
    "less": (jnp.less, True),
    "less_equal": (jnp.less_equal, True),
}


def _compare_exec(name):
    op, ordered = _OPS[name]

    def exec_fn(args, options, ctx):
        a, b = args
        if getattr(a.dtype, "is_decimal", False) and \
                getattr(b.dtype, "is_decimal", False):
            from .decimal import decimal_compare

            return decimal_compare(a, b, name)
        if _is_stringlike(a) or _is_stringlike(b):
            if not (_is_stringlike(a) and _is_stringlike(b)):
                raise Invalid(f"{name}: cannot compare string with non-string")
            x, y, validities, n = _dict_compare_values(args, ordered)
            r = op(x, y)
            return result_column(r, dt.bool_, intersect_validity(validities, n), n)
        if a.dtype.is_temporal or b.dtype.is_temporal:
            (x, y), validities, n = unpack(args)  # storage ints, same unit req.
            if a.dtype != b.dtype:
                from .cast import temporal_to_common

                x, y = temporal_to_common(a, b)
        else:
            out_t = common_type(args)
            (x, y), validities, n = unpack(args, out_t)
        r = op(x, y)
        return result_column(r, dt.bool_, intersect_validity(validities, n), n)

    return exec_fn


for _name in _OPS:
    register_function(_name, "scalar", 2)(_compare_exec(_name))


@dataclasses.dataclass
class ElementWiseAggregateOptions:
    """Reference: api_scalar.h ElementWiseAggregateOptions."""
    skip_nulls: bool = True


def _all_valid_mask(args, out):
    """AND of all input validities (None = all-valid) for skip_nulls=False:
    any null input slot nulls the result (scalar_compare.cc MinMaxElementWise
    with ElementWiseAggregateOptions.skip_nulls=false)."""
    masks = []
    for a in args:
        if isinstance(a, Column):
            if a.validity is not None:
                masks.append(a.validity)
        elif not a.is_valid:
            return False
    if not masks:
        return None
    m = masks[0]
    for x in masks[1:]:
        m = m & x
    return m


def _minmax_elementwise(name, op):
    def exec_fn(args, options, ctx):
        strict = options is not None and not options.skip_nulls
        if strict:
            # skip-nulls value == strict value wherever all inputs are
            # valid; strictness only tightens the validity mask
            res = exec_fn(args, None, ctx)
            amask = _all_valid_mask(args, res)
            if amask is False:
                from ..datum import Scalar as _S
                if isinstance(res, Column):
                    return Column(res.data, res.dtype,
                                  validity=jnp.zeros(res.length, jnp.bool_),
                                  data2=res.data2, bits=res.bits,
                                  dictionary=res.dictionary)
                return _S(res.value, res.dtype, is_valid=False,
                          dictionary=getattr(res, "dictionary", None))
            if amask is not None and isinstance(res, Column):
                res = Column(res.data, res.dtype, validity=amask,
                             data2=res.data2, bits=res.bits,
                             dictionary=res.dictionary)
            return res
        if any(getattr(a.dtype, "is_decimal", False) for a in args):
            return _minmax_elementwise_decimal(args, name)
        if any(getattr(a.dtype, "is_binary", False) for a in args):
            return _minmax_elementwise_binary(args, name)
        out_t = common_type(args)
        values, validities, n = unpack(args, out_t)
        # element-wise min/max skip nulls (reference: scalar_compare.cc
        # MinElementWise with skip_nulls=true default)
        r = values[0]
        rv = validities[0]
        for v, m in zip(values[1:], validities[1:]):
            if rv is False:
                r, rv = v, m
                continue
            if m is False:
                continue
            both = op(r, v)
            if rv is None and m is None:
                r = both
            elif m is None:
                r = jnp.where(rv, both, v)
                rv = None
            elif rv is None:
                r = jnp.where(m, both, r)
            else:
                r = jnp.where(rv & m, both, jnp.where(rv, r, v))
                rv = rv | m
        return result_column(r, out_t, rv, n)

    return exec_fn


register_function("min_element_wise", "scalar", -1,
                  ElementWiseAggregateOptions)(
    _minmax_elementwise("min_element_wise", jnp.minimum))
register_function("max_element_wise", "scalar", -1,
                  ElementWiseAggregateOptions)(
    _minmax_elementwise("max_element_wise", jnp.maximum))


def _minmax_elementwise_decimal(args, name):
    """Pairwise null-skipping decimal element-wise min/max via the
    two-limb comparator + plane-wise selects. Mixed scales rescale to
    the max scale first; decimal Scalars materialize as columns."""
    from ..column import Column as _C
    from .decimal import decimal_cast, decimal_planes

    n = max((a.length for a in args if isinstance(a, _C)), default=1)
    smax = max(a.dtype.scale for a in args)
    pmax = max(a.dtype.precision for a in args)
    wide = any(a.dtype.kind == "decimal256" for a in args)
    tgt = (dt.decimal256(max(pmax, 76 if wide else pmax), smax) if wide
           else dt.decimal128(38, smax))

    def to_col(a):
        if isinstance(a, _C):
            return (a if a.dtype.scale == smax and
                    a.dtype.kind == tgt.kind
                    else decimal_cast(a, tgt, allow_truncate=False))
        lo, hi = decimal_planes(a, tgt, n)
        validity = None if a.is_valid else jnp.zeros(n, jnp.bool_)
        return _C(lo, tgt, validity=validity, data2=hi)

    from .decimal import decimal_compare, decimal_where

    is_min = name.startswith("min")
    cols = [to_col(a) for a in args]
    acc = cols[0]
    for nxt in cols[1:]:
        lt = decimal_compare(acc, nxt, "less").data
        pick_acc = lt if is_min else ~lt
        am = acc.validity
        nm = nxt.validity
        # null-skip: if one side null, take the other
        if am is not None:
            pick_acc = pick_acc & am | (jnp.zeros_like(pick_acc)
                                        if nm is None else ~nm) & am
        if nm is not None:
            pick_acc = pick_acc | ~nm & (am if am is not None
                                         else jnp.ones_like(pick_acc))
        data, data2 = decimal_where(
            pick_acc, (acc.data, acc.data2), (nxt.data, nxt.data2),
            acc.dtype)
        validity = None
        if am is not None and nm is not None:
            validity = am | nm
        elif am is not None or nm is not None:
            validity = None  # one side never null -> result never null
        acc = _C(data, acc.dtype, validity=validity, data2=data2)
    return acc


def _minmax_elementwise_binary(args, name):
    """Lexicographic element-wise min/max over dict strings: unify the
    dictionaries, compare sort RANKS, select codes (null-skip)."""
    from ..column import Column as _C, Dictionary
    from ..datum import Scalar as _S

    n = max((a.length for a in args if isinstance(a, _C)), default=1)

    def to_col(a):
        if isinstance(a, _C):
            return a
        # string Scalar -> one-unique dict column
        v = (a.dictionary.values[int(a.value)]
             if a.dictionary is not None else a.value)
        d = Dictionary(np.array([v], dtype=object))
        validity = None if a.is_valid else jnp.zeros(n, jnp.bool_)
        return _C(jnp.zeros(n, jnp.int32), a.dtype, validity=validity,
                  dictionary=d)

    from .dictionary import unify_dictionaries

    is_min = name.startswith("min")
    cols = [to_col(a) for a in args]
    dicts = [c.dictionary for c in cols]
    if any(d is not dicts[0] for d in dicts):
        merged, d = unify_dictionaries(cols)
        pos = 0
        uni = []
        for c in cols:
            uni.append(_C(merged[pos:pos + c.length], c.dtype,
                          validity=c.validity, dictionary=d))
            pos += c.length
        cols = uni
    else:
        d = dicts[0]
    rank = jnp.asarray(d.rank)
    acc = cols[0]
    for nxt in cols[1:]:
        ra = rank[acc.data]
        rn = rank[nxt.data]
        lt = ra < rn
        pick_acc = lt if is_min else ~lt
        am, nm = acc.validity, nxt.validity
        if am is not None:
            pick_acc = pick_acc & am
        if nm is not None:
            pick_acc = pick_acc | ~nm & (
                am if am is not None else jnp.ones_like(pick_acc))
        data = jnp.where(pick_acc, acc.data, nxt.data)
        validity = None
        if am is not None and nm is not None:
            validity = am | nm
        acc = _C(data, acc.dtype, validity=validity, dictionary=d)
    return acc
