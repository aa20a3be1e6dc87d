"""Error model.

Reference: cpp/src/arrow/status.h:123 — Status codes propagated without
exceptions. Python-side we use exceptions (as pyarrow does at its binding
layer); on-device kernels cannot raise, so checked kernels compute error
flags that the eager entry point reduces and raises from
(SURVEY.md §7: "error flags reduced out of kernels").
"""


class A1TError(Exception):
    """Base engine error (Status umbrella)."""


class Invalid(A1TError, ValueError):
    """Reference: Status::Invalid — bad arguments / runtime domain errors."""


class NotImplementedError_(A1TError, NotImplementedError):
    """Reference: Status::NotImplemented."""


class IndexError_(A1TError, IndexError):
    """Reference: Status::IndexError — e.g. take boundscheck (int_util.h:101)."""


class KeyError_(A1TError, KeyError):
    """Reference: Status::KeyError — registry lookups."""
