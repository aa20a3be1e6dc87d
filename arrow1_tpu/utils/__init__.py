"""Shared utilities: tiling/padding math, key hashing, timing.

The grab-bag layer mirroring the reference's arrow/util/ — most of that
directory's content (bitmaps, SIMD dispatch, futures) dissolved into the
TPU design (see COMPONENTS.md); what remains generally useful lives here.
"""

from .tiling import (ceil_div, pad_axis, pad_to_multiple_1d,  # noqa: F401
                     round_up)
from .timing import measure_dispatch_overhead, timed_device  # noqa: F401
