"""pyarrow.feather-compatible module shape.

Reference: python/pyarrow/feather.py + ipc/feather.h — the reference
reads BOTH Feather versions. V2 IS the Arrow IPC file format, so it
rides the native IPC reader/writer; V1 (the legacy flatbuffer layout)
has its own native reader (io/feather1.py, ReaderV1 parity).
"""

from __future__ import annotations

from .io.ipc import read_feather as _read_table, write_feather


def read_table(source, columns=None):
    """Feather file (V1 or V2) -> Table."""
    from .io.feather1 import is_feather_v1, read_feather_v1

    buf = None
    if hasattr(source, "read"):
        buf = source.read()
    elif isinstance(source, (bytes, bytearray)):
        buf = bytes(source)
    else:
        with open(source, "rb") as f:
            head = f.read(4)
        if head == b"FEA1":
            with open(source, "rb") as f:
                buf = f.read()
    if buf is not None and is_feather_v1(buf):
        from .table import Table

        return Table([read_feather_v1(
            buf, list(columns) if columns else None)])
    if buf is not None:
        import io as _io

        source = _io.BytesIO(buf)
    t = _read_table(source)
    return t.select(columns) if columns else t


def read_feather(source, columns=None):
    """Feather file -> pandas DataFrame (pyarrow.feather shape)."""
    return read_table(source, columns).to_pandas()


def write_table(table, dest, **kwargs):
    return write_feather(table, dest, **kwargs)
