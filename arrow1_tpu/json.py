"""pyarrow.json-compatible module shape over the native NDJSON parser.

Reference: python/pyarrow/json.py (read_json + ReadOptions/
ParseOptions); the parser is native/src/json.cpp (nested one-level
lists/structs, single speculative pass). `import arrow1_tpu.json as
json` ports 1:1.
"""

from __future__ import annotations

import dataclasses

from .io.json import read_json as _read_json


@dataclasses.dataclass
class ReadOptions:
    """Reference: json/options.h ReadOptions."""
    use_threads: bool = True
    block_size: int = 1 << 20


@dataclasses.dataclass
class ParseOptions:
    """Reference: json/options.h ParseOptions."""
    explicit_schema: object = None
    newlines_in_values: bool = False
    unexpected_field_behavior: str = "infer"


def _to_pa(opts, pa_cls):
    """Our dataclass -> pyarrow options class (the fallback reader
    rejects foreign objects); pyarrow objects pass through."""
    if opts is None or not dataclasses.is_dataclass(opts):
        return opts
    kw = {f.name: getattr(opts, f.name) for f in dataclasses.fields(opts)
          if getattr(opts, f.name) != f.default}
    return pa_cls(**kw)


def read_json(input_file, read_options=None, parse_options=None):
    """pyarrow.json.read_json shape -> Table."""
    from pyarrow import json as pajson

    default_ro = read_options is None or (
        isinstance(read_options, ReadOptions)
        and read_options == ReadOptions())
    default_po = parse_options is None or (
        isinstance(parse_options, ParseOptions)
        and parse_options == ParseOptions())
    return _read_json(
        input_file,
        read_options=None if default_ro
        else _to_pa(read_options, pajson.ReadOptions),
        parse_options=None if default_po
        else _to_pa(parse_options, pajson.ParseOptions))
