"""pyarrow.compute-compatible eager API.

Reference: python/pyarrow/compute.py:190-231 auto-generates one Python
wrapper per registry entry; we do the same so existing pyarrow.compute
call sites translate one-for-one (and the parity test harness can drive
both engines with identical call specs).

Usage:
    import arrow1_tpu.compute as ac
    ac.add(col_a, col_b)
    ac.filter(batch, mask)
    ac.sort_indices(batch, sort_keys=[("a", "ascending")])
"""

from __future__ import annotations

import sys as _sys

from . import ops as _ops  # registers all kernels
from .registry import call_function, function_registry, list_functions

# options classes re-exported like pyarrow.compute does
from .ops.arithmetic import ArithmeticOptions  # noqa: F401
from .ops.cast import CastOptions, cast  # noqa: F401
from .ops.compare import CompareOptions  # noqa: F401


def _make_wrapper(name: str):
    fn = function_registry.get(name)

    def wrapper(*args, options=None, **kwargs):
        return call_function(name, list(args), options=options, **kwargs)

    wrapper.__name__ = name
    wrapper.__qualname__ = name
    wrapper.__doc__ = fn.doc or f"Compute function {name!r}."
    return wrapper


_mod = _sys.modules[__name__]


class FunctionOptions:
    """Marker base for options classes (reference:
    compute/function_options.h FunctionOptions). Our options are plain
    dataclasses; this exists for pyarrow namespace parity."""


def _install_wrappers():
    for _name in list_functions():
        attr = _name
        if attr in ("and", "or", "not"):
            attr = attr + "_"
        if not hasattr(_mod, attr):
            setattr(_mod, attr, _make_wrapper(_name))


def _install_options():
    """Export every registered options class under its own name, plus the
    pyarrow alias names, so pyarrow.compute option imports port 1:1."""
    for _name in list_functions():
        oc = function_registry.get(_name).options_class
        if oc is not None and not hasattr(_mod, oc.__name__):
            setattr(_mod, oc.__name__, oc)
    from .ops.cumulative import CumulativeOptions
    from .ops.strings import ExtractRegexOptions, NormalizeOptions
    for alias, cls in [("Utf8NormalizeOptions", NormalizeOptions),
                       ("ExtractRegexSpanOptions", ExtractRegexOptions),
                       ("CumulativeSumOptions", CumulativeOptions)]:
        if not hasattr(_mod, alias):
            setattr(_mod, alias, cls)


_install_wrappers()
_install_options()


def __getattr__(name):  # late registrations (e.g. plugins)
    if name.rstrip("_") in function_registry or name in function_registry:
        lookup = name if name in function_registry else name.rstrip("_")
        return _make_wrapper(lookup)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
