"""NDJSON reader (reference: cpp/src/arrow/json/ rapidjson pipeline).
Host decode via pyarrow.json."""

from __future__ import annotations

from ..interop import record_batch_from_arrow
from ..table import Table

__all__ = ["read_json"]


def read_json(path_or_buf, read_options=None, parse_options=None) -> Table:
    from pyarrow import json as pajson

    tbl = pajson.read_json(path_or_buf, read_options=read_options,
                           parse_options=parse_options)
    return Table([record_batch_from_arrow(tbl)])
