"""pyarrow.csv-compatible module shape over the native C++ parser.

Reference: python/pyarrow/csv.py (read_csv/open_csv/write_csv +
ReadOptions/ParseOptions/ConvertOptions/WriteOptions); the parser is
native/src/csv.cpp (single speculative pass). `import arrow1_tpu.csv
as csv` ports 1:1.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

from .io.csv import open_csv_stream, read_csv as _read_csv, write_csv


@dataclasses.dataclass
class ReadOptions:
    """Reference: csv/options.h ReadOptions."""
    use_threads: bool = True
    block_size: int = 1 << 20
    skip_rows: int = 0
    skip_rows_after_names: int = 0
    column_names: Optional[Sequence[str]] = None
    autogenerate_column_names: bool = False
    encoding: str = "utf8"


@dataclasses.dataclass
class ParseOptions:
    """Reference: csv/options.h ParseOptions."""
    delimiter: str = ","
    quote_char: object = '"'
    double_quote: bool = True
    escape_char: object = False
    newlines_in_values: bool = False
    ignore_empty_lines: bool = True


@dataclasses.dataclass
class ConvertOptions:
    """Reference: csv/options.h ConvertOptions."""
    check_utf8: bool = True
    column_types: object = None
    null_values: object = None
    true_values: object = None
    false_values: object = None
    strings_can_be_null: bool = False
    quoted_strings_can_be_null: bool = True
    include_columns: object = None
    include_missing_columns: bool = False
    auto_dict_encode: bool = False
    timestamp_parsers: object = None


@dataclasses.dataclass
class WriteOptions:
    """Reference: csv/options.h WriteOptions."""
    include_header: bool = True
    batch_size: int = 1024
    delimiter: str = ","


def _to_pa(opts, pa_cls, skip=()):
    """Convert our options dataclass to the pyarrow class (the fallback
    reader rejects foreign option objects); non-dataclass (already
    pyarrow) objects pass through."""
    if opts is None or not dataclasses.is_dataclass(opts):
        return opts
    kw = {f.name: getattr(opts, f.name) for f in dataclasses.fields(opts)
          if f.name not in skip and getattr(opts, f.name) != f.default}
    return pa_cls(**kw)


def _pa_options(read_options, parse_options, convert_options):
    from pyarrow import csv as pacsv

    return (_to_pa(read_options, pacsv.ReadOptions),
            _to_pa(parse_options, pacsv.ParseOptions),
            _to_pa(convert_options, pacsv.ConvertOptions))


def read_csv(input_file, read_options=None, parse_options=None,
             convert_options=None):
    """pyarrow.csv.read_csv shape -> Table."""
    co = convert_options
    if isinstance(co, ConvertOptions) and co == ConvertOptions():
        co = None  # all-default ConvertOptions: keep the native path
    ro, po, co = _pa_options(read_options, parse_options, co)
    return _read_csv(input_file, read_options=ro, parse_options=po,
                     convert_options=co)


def open_csv(input_file, read_options=None, parse_options=None,
             convert_options=None):
    """pyarrow.csv.open_csv shape -> incremental batch reader."""
    if read_options is None and parse_options is None and \
            convert_options is None:
        return open_csv_stream(input_file)
    # options given: parse via read_csv (which honors them), then chunk
    t = read_csv(input_file, read_options, parse_options, convert_options)
    combined = t.combine_chunks()
    n = t.num_rows
    step = 1 << 16

    def gen():
        for lo in range(0, max(n, 1), step):
            if lo >= n:
                break
            yield combined.slice(lo, min(step, n - lo))

    return gen()
