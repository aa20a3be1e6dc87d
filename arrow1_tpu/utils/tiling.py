"""Tile/padding arithmetic (the engine's fixed-shape discipline).

Reference analogue: the 64-byte buffer padding rules of the columnar spec
(docs/source/format/Columnar.rst:133-160) — on TPU the relevant granules
are the VPU tile (8x128) and dtype-dependent DMA tilings (see
kernels/TOOLCHAIN_NOTES.md).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["ceil_div", "round_up", "pad_to_multiple_1d", "pad_axis"]


def ceil_div(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, multiple: int) -> int:
    return ceil_div(x, multiple) * multiple


def pad_to_multiple_1d(x, multiple: int, fill=0):
    """Pad a 1-D array's length up to a multiple; returns (padded, n)."""
    n = x.shape[0]
    target = round_up(max(n, 1), multiple)
    if target == n:
        return x, n
    return jnp.concatenate(
        [x, jnp.full(target - n, fill, x.dtype)]), n


def pad_axis(x, axis: int, multiple: int, fill=0):
    n = x.shape[axis]
    target = round_up(max(n, 1), multiple)
    if target == n:
        return x
    pad_widths = [(0, 0)] * x.ndim
    pad_widths[axis] = (0, target - n)
    return jnp.pad(x, pad_widths, constant_values=fill)
