"""Elementwise math kernels: ln/log2/log10/log1p/exp/sqrt + trig +
floor/ceil/trunc/round.

Reference: the scalar_arithmetic.cc math additions of the 5.0 cycle
(ln/log2/log10/log1p landed in ARROW-12747 within this snapshot's era)
plus the rounding family. All are trivial VPU maps with
NullHandling::INTERSECTION; integers promote to float64 like the
reference's generated float kernels.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from .. import dtypes as dt
from ..errors import Invalid
from ..registry import register_function
from .common import intersect_validity, result_column, unpack

__all__ = ["RoundOptions"]


@dataclasses.dataclass
class RoundOptions:
    ndigits: int = 0
    round_mode: str = "half_to_even"


def _float_unary(name, fn, int_to_float=True):
    def exec_fn(args, options, ctx):
        (a,) = args
        t = a.dtype
        if not t.is_numeric:
            raise Invalid(f"{name}: expects numeric")
        out_t = t if t.is_floating else (dt.float64 if int_to_float else t)
        (x,), validities, n = unpack(args, out_t)
        return result_column(fn(x), out_t, intersect_validity(validities, n),
                             n)

    return exec_fn


for _name, _fn in [
    ("ln", jnp.log), ("log2", jnp.log2), ("log10", jnp.log10),
    ("log1p", jnp.log1p), ("exp", jnp.exp), ("expm1", jnp.expm1),
    ("sqrt", jnp.sqrt),
    ("sin", jnp.sin), ("cos", jnp.cos), ("tan", jnp.tan),
    ("asin", jnp.arcsin), ("acos", jnp.arccos), ("atan", jnp.arctan),
]:
    register_function(_name, "scalar", 1)(_float_unary(_name, _fn))


def _atan2_exec(args, options, ctx):
    (y, x) = args
    (yv, xv), validities, n = unpack(args, dt.float64)
    return result_column(jnp.arctan2(yv, xv), dt.float64,
                         intersect_validity(validities, n), n)


register_function("atan2", "scalar", 2)(_atan2_exec)


def _int_preserving(name, fn):
    """floor/ceil/trunc: identity on integers, float op on floats
    (reference: the rounding kernels return the input type)."""

    def exec_fn(args, options, ctx):
        (a,) = args
        t = a.dtype
        if not t.is_numeric:
            raise Invalid(f"{name}: expects numeric")
        (x,), validities, n = unpack(args)
        r = fn(x) if t.is_floating else x
        return result_column(r, t, intersect_validity(validities, n), n)

    return exec_fn


register_function("floor", "scalar", 1)(_int_preserving("floor", jnp.floor))
register_function("ceil", "scalar", 1)(_int_preserving("ceil", jnp.ceil))
register_function("trunc", "scalar", 1)(_int_preserving("trunc", jnp.trunc))


def _round_exec(args, options: RoundOptions, ctx):
    (a,) = args
    options = options or RoundOptions()
    t = a.dtype
    if not t.is_numeric:
        raise Invalid("round: expects numeric")
    (x,), validities, n = unpack(args)
    if not t.is_floating:
        return result_column(x, t, intersect_validity(validities, n), n)
    scale = 10.0 ** options.ndigits
    xs = x * scale
    mode = options.round_mode
    if mode == "half_to_even":
        r = jnp.round(xs)  # banker's rounding (ties to even), arrow default
    elif mode == "down":
        r = jnp.floor(xs)
    elif mode == "up":
        r = jnp.ceil(xs)
    elif mode == "towards_zero":
        r = jnp.trunc(xs)
    elif mode == "half_away_from_zero":
        r = jnp.trunc(xs + jnp.where(xs >= 0, 0.5, -0.5))
    else:
        raise Invalid(f"round: unsupported mode {mode!r}")
    return result_column(r / scale, t, intersect_validity(validities, n), n)


register_function("round", "scalar", 1, RoundOptions)(_round_exec)
