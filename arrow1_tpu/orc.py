"""pyarrow.orc-compatible module shape.

Reference: python/pyarrow/orc.py (ORCFile/read_table/write_table).
Reads AND writes are native first (io/orc_native.py decodes the ORC v1
format itself — RLEv1/v2, byte-RLE booleans, all five codecs, nested
types, unions, char/varchar; io/orc_writer.py emits it, liborc-oracle
verified); pyarrow's liborc wrapper remains only as a safety fallback
(io/orc.py routes).
"""

from __future__ import annotations

from .io.orc import orc_available, read_orc, write_orc


class ORCFile:
    """pyarrow.orc.ORCFile shape."""

    def __init__(self, source):
        self._source = source
        self._table = None

    def _load(self):
        if self._table is None:
            self._table = read_orc(self._source)
        return self._table

    @property
    def schema(self):
        return self._load().schema

    @property
    def nrows(self) -> int:
        return self._load().num_rows

    def read(self, columns=None):
        t = self._load()
        return t.select(columns) if columns else t


def read_table(source, columns=None):
    t = read_orc(source, columns=columns)
    return t


def write_table(table, where):
    return write_orc(table, where)
