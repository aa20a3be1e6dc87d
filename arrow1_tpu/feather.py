"""pyarrow.feather-compatible module shape.

Reference: python/pyarrow/feather.py — Feather V2 IS the Arrow IPC
file format (ipc/feather.h), so this rides the native IPC
reader/writer. `import arrow1_tpu.feather as feather` ports 1:1.
"""

from __future__ import annotations

from .io.ipc import read_feather as _read_table, write_feather


def read_table(source, columns=None):
    """Feather file -> Table."""
    t = _read_table(source)
    return t.select(columns) if columns else t


def read_feather(source, columns=None):
    """Feather file -> pandas DataFrame (pyarrow.feather shape)."""
    return read_table(source, columns).to_pandas()


def write_table(table, dest, **kwargs):
    return write_feather(table, dest, **kwargs)
