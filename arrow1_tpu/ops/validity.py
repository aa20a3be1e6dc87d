"""Validity kernels: is_valid/is_null/is_nan/is_finite/is_inf + fill_null.

Reference: cpp/src/arrow/compute/kernels/scalar_validity.cc and
scalar_fill_null.cc. Outputs of the predicates carry no validity
(NullHandling::OUTPUT_NOT_NULL, kernel.h:428) — a null input slot reports
is_null=true / is_valid=false rather than propagating null.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from .. import dtypes as dt
from ..column import Column
from ..datum import Scalar
from ..errors import Invalid
from ..registry import register_function
from .common import result_column, unpack, value_of


def _is_valid_exec(args, options, ctx):
    (a,) = args
    if isinstance(a, Scalar):
        return Scalar(a.is_valid, dt.bool_)
    if a.validity is None:
        return Column(jnp.ones(a.length, jnp.bool_), dt.bool_)
    return Column(a.validity, dt.bool_)


@dataclasses.dataclass
class NullOptions:
    """Reference: api_scalar.h NullOptions (nan_is_null)."""
    nan_is_null: bool = False


def _is_null_exec(args, options: NullOptions, ctx):
    (a,) = args
    nan_too = bool(options and options.nan_is_null)
    if isinstance(a, Scalar):
        null = not a.is_valid or (nan_too and a.dtype.is_floating
                                  and a.is_valid and np.isnan(a.as_py()))
        return Scalar(null, dt.bool_)
    r = jnp.zeros(a.length, jnp.bool_) if a.validity is None \
        else jnp.logical_not(a.validity)
    if nan_too and a.dtype.is_floating:
        r = r | jnp.isnan(a.data)
    return Column(r, dt.bool_)


def _float_pred(name, fn):
    def exec_fn(args, options, ctx):
        (a,) = args
        (x,), validities, n = unpack(args)
        if not a.dtype.is_floating:
            r = jnp.zeros_like(x, dtype=jnp.bool_) if n is not None else False
            if name == "is_finite":
                r = ~r if n is not None else True
        else:
            r = fn(x)
        # null slots report false but stay valid... except arrow propagates
        # nulls for is_nan (NullHandling::INTERSECTION there); match arrow:
        validity = validities[0] if isinstance(args[0], Column) else (
            None if args[0].is_valid else False)
        return result_column(r, dt.bool_, validity, n)

    return exec_fn


register_function("is_valid", "scalar", 1)(_is_valid_exec)
register_function("is_null", "scalar", 1, NullOptions)(_is_null_exec)
register_function("is_nan", "scalar", 1)(_float_pred("is_nan", jnp.isnan))
register_function("is_finite", "scalar", 1)(_float_pred("is_finite", jnp.isfinite))
register_function("is_inf", "scalar", 1)(_float_pred("is_inf", jnp.isinf))


def _fill_null_exec(args, options, ctx):
    """fill_null(values, fill_value) — reference: scalar_fill_null.cc."""
    values, fill = args
    if isinstance(values, Scalar):
        return values if values.is_valid else fill
    if values.validity is None:
        return values
    if values.dtype.is_decimal:
        from .decimal import decimal_planes, decimal_where

        if isinstance(fill, Scalar) and not fill.is_valid:
            return values
        n = values.length
        fp = decimal_planes(fill, values.dtype, n)
        data, data2 = decimal_where(values.validity,
                                    (values.data, values.data2), fp,
                                    values.dtype)
        validity = None
        if isinstance(fill, Column) and fill.validity is not None:
            validity = values.validity | fill.validity
        return Column(data, values.dtype, validity=validity, data2=data2)
    if isinstance(fill, Column):
        if values.dtype.is_binary:
            # codes come from different dictionaries: unify first
            from ..column import Column as _C
            from .dictionary import unify_dictionaries

            d = values.dictionary
            if fill.dictionary is not d:
                merged, d = unify_dictionaries([values, fill])
                vcodes = merged[: values.length]
                fcodes = merged[values.length:]
            else:
                vcodes, fcodes = values.data, fill.data
            out = jnp.where(values.validity, vcodes, fcodes)
            validity = (values.validity | fill.validity
                        if fill.validity is not None else None)
            return _C(out, values.dtype, validity=validity, dictionary=d)
        fv = fill.data
        fmask = fill.validity
    else:
        if not fill.is_valid:
            return values
        if values.dtype.is_binary:
            # dict column: append fill value to dictionary if missing
            from ..column import Dictionary

            d = values.dictionary
            sval = (fill.dictionary.values[int(fill.value)]
                    if fill.dictionary is not None else fill.value)
            if sval in d.index:
                code = d.index[sval]
                new_d = d
            else:
                new_d = Dictionary(np.concatenate(
                    [d.values, np.array([sval], dtype=object)]))
                code = len(d)
            data = jnp.where(values.validity, values.data,
                             jnp.asarray(code, values.data.dtype))
            return Column(data, values.dtype, dictionary=new_d)
        fv = value_of(fill, values.dtype)
        fmask = None
    out = jnp.where(values.validity, values.data,
                    fv.astype(values.data.dtype) if hasattr(fv, "astype") else fv)
    if fmask is not None:
        validity = values.validity | fmask
        out_validity = jnp.where(values.validity, True, fmask)
        return Column(out, values.dtype, validity=out_validity)
    return Column(out, values.dtype)


register_function("fill_null", "scalar", 2)(_fill_null_exec)


def _coalesce_exec(args, options, ctx):
    """coalesce(*args): first non-null per slot."""
    out = args[0]
    for nxt in args[1:]:
        out = _fill_null_exec([out, nxt], None, ctx)
    return out


register_function("coalesce", "scalar", -1)(_coalesce_exec)


def _if_else_exec(args, options, ctx):
    """if_else(cond, left, right) — reference: scalar_if_else.cc (5.0.0)."""
    cond, left, right = args
    if not cond.dtype.is_boolean:
        raise Invalid("if_else: condition must be boolean")
    out_t = left.dtype if not isinstance(left, Scalar) or left.is_valid else right.dtype
    if getattr(out_t, "is_decimal", False):
        return _if_else_decimal(cond, left, right, out_t)
    c = value_of(cond)
    l = value_of(left, out_t)
    r = value_of(right, out_t)
    n = cond.length if isinstance(cond, Column) else None
    data = jnp.where(c, l, r)
    # validity: cond null -> null; else chosen side's validity
    def v_of(a):
        if isinstance(a, Column):
            return a.validity
        return None if a.is_valid else False

    vl, vr = v_of(left), v_of(right)
    if vl is None and vr is None:
        validity = None
    else:
        def as_arr(v):
            if v is None:
                return jnp.ones_like(data, dtype=jnp.bool_)
            if v is False:
                return jnp.zeros_like(data, dtype=jnp.bool_)
            return v

        validity = jnp.where(c, as_arr(vl), as_arr(vr))
    vc = v_of(cond)
    if vc is not None:
        validity = (jnp.ones_like(data, dtype=jnp.bool_) if validity is None
                    else validity)
        validity = validity & (vc if vc is not False else False)
    dictionary = None
    if out_t.is_binary:
        lc = left if isinstance(left, Column) else None
        rc = right if isinstance(right, Column) else None
        if lc is not None and rc is not None:
            from .dictionary import unify_dictionaries

            if lc.dictionary is not rc.dictionary:
                merged, dictionary = unify_dictionaries([lc, rc])
                l, r = merged[: lc.length], merged[lc.length:]
                data = jnp.where(c, l, r)
            else:
                dictionary = lc.dictionary
        else:
            dictionary = (lc or rc).dictionary if (lc or rc) else None
    return result_column(data, out_t, validity, n, dictionary=dictionary)


register_function("if_else", "scalar", 3)(_if_else_exec)


def _true_unless_null_exec(args, options, ctx):
    """true for valid rows, null for nulls (reference: scalar_validity.cc
    TrueUnlessNull)."""
    (col,) = args
    import jax.numpy as jnp

    return Column(jnp.ones(col.length, jnp.bool_), dt.bool_,
                  validity=col.validity)


register_function("true_unless_null", "scalar", 1)(_true_unless_null_exec)


def _if_else_decimal(cond, left, right, out_t):
    from .decimal import decimal_planes, decimal_where

    if isinstance(cond, Scalar):
        n = next((a.length for a in (left, right)
                  if isinstance(a, Column)), 1)
        c = jnp.full(n, bool(cond.value), jnp.bool_)
        if not cond.is_valid:
            cond_validity = jnp.zeros(n, jnp.bool_)
        else:
            cond_validity = None
    else:
        n = cond.length
        c = cond.data
        cond_validity = cond.validity
    lp = decimal_planes(left, out_t, n)
    rp = decimal_planes(right, out_t, n)
    data, data2 = decimal_where(c, lp, rp, out_t)

    def v_of(a):
        if isinstance(a, Column):
            return a.validity
        return None if a.is_valid else False

    vl, vr = v_of(left), v_of(right)
    if vl is None and vr is None:
        validity = None
    else:
        def as_arr(v):
            if v is None:
                return jnp.ones(n, jnp.bool_)
            if v is False:
                return jnp.zeros(n, jnp.bool_)
            return v

        validity = jnp.where(c, as_arr(vl), as_arr(vr))
    if cond_validity is not None:
        validity = (jnp.ones(n, jnp.bool_) if validity is None
                    else validity) & cond_validity
    return Column(data, out_t, validity=validity, data2=data2)
