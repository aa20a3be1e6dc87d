"""Boolean kernels: and/or/xor/invert/and_not + Kleene variants.

Reference: cpp/src/arrow/compute/kernels/scalar_boolean.cc. The Kleene
variants implement SQL three-valued logic where the reference manipulates
validity bitmaps directly (scalar_boolean.cc AndOrKleene); here the same
truth tables become fused jnp.where selects on mask arrays:

  and_kleene:  false AND null -> false (valid);  true AND null -> null
  or_kleene:   true  OR  null -> true  (valid);  false OR null -> null
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import dtypes as dt
from ..errors import Invalid
from ..registry import register_function
from .common import intersect_validity, result_column, unpack


def _check_bool(args, name):
    for a in args:
        if not a.dtype.is_boolean:
            raise Invalid(f"{name}: arguments must be boolean, got {a.dtype}")


def _binary_bool(name, op):
    def exec_fn(args, options, ctx):
        _check_bool(args, name)
        (x, y), validities, n = unpack(args)
        r = op(x, y)
        return result_column(r, dt.bool_, intersect_validity(validities, n), n)

    return exec_fn


register_function("and", "scalar", 2, aliases=["and_"])(
    _binary_bool("and", jnp.logical_and))
register_function("or", "scalar", 2, aliases=["or_"])(
    _binary_bool("or", jnp.logical_or))
register_function("xor", "scalar", 2)(_binary_bool("xor", jnp.logical_xor))
register_function("and_not", "scalar", 2)(
    _binary_bool("and_not", lambda x, y: jnp.logical_and(x, jnp.logical_not(y))))


def _invert_exec(args, options, ctx):
    _check_bool(args, "invert")
    (x,), validities, n = unpack(args)
    return result_column(jnp.logical_not(x), dt.bool_,
                         intersect_validity(validities, n), n)


register_function("invert", "scalar", 1)(_invert_exec)


def _mask_of(v, x, n):
    """Validity entry -> concrete bool array aligned with x."""
    if v is None:
        return jnp.ones_like(x, dtype=jnp.bool_)
    if v is False:
        return jnp.zeros_like(x, dtype=jnp.bool_)
    return v


def _kleene(name, dominant: bool, negate_y: bool = False):
    """dominant=False for AND (false dominates), True for OR (true dominates)."""

    def exec_fn(args, options, ctx):
        _check_bool(args, name)
        (x, y), validities, n = unpack(args)
        if negate_y:
            y = jnp.logical_not(y)
        vx = _mask_of(validities[0], x, n)
        vy = _mask_of(validities[1], y, n)
        if dominant:
            r = jnp.logical_or(jnp.where(vx, x, False), jnp.where(vy, y, False))
            # valid iff either side is the dominant value, or both valid
            validity = (vx & x) | (vy & y) | (vx & vy)
        else:
            r = jnp.logical_and(jnp.where(vx, x, True), jnp.where(vy, y, True))
            validity = (vx & ~x) | (vy & ~y) | (vx & vy)
        if validities[0] is None and validities[1] is None:
            validity = None
        return result_column(r, dt.bool_, validity, n)

    return exec_fn


register_function("and_kleene", "scalar", 2)(_kleene("and_kleene", dominant=False))
register_function("or_kleene", "scalar", 2)(_kleene("or_kleene", dominant=True))
register_function("and_not_kleene", "scalar", 2)(
    _kleene("and_not_kleene", dominant=False, negate_y=True))
