"""Native NDJSON reader vs pyarrow.json (the reference's own engine).

Reference: cpp/src/arrow/json/ (reader.cc parallel blocks,
converter.cc inference)."""

import io

import pyarrow as pa
import pytest
from pyarrow import json as pajson

from arrow1_tpu.io.json import read_json
from arrow1_tpu.native import native_available


pytestmark = pytest.mark.skipif(
    not native_available(), reason="native toolchain unavailable")


def assert_matches_oracle(data: bytes, label=""):
    mine = read_json(data).to_arrow()
    oracle = pajson.read_json(io.BytesIO(data)).combine_chunks()
    assert mine.column_names == oracle.column_names, label
    for name in oracle.column_names:
        m, o = mine.column(name), oracle.column(name)
        if pa.types.is_dictionary(m.type) and \
                not pa.types.is_dictionary(o.type):
            m = m.combine_chunks().cast(pa.string())
        assert m.to_pylist() == o.to_pylist(), (label, name)


def test_basic_types():
    assert_matches_oracle(
        b'{"a": 1, "b": 2.5, "c": "x", "d": true}\n'
        b'{"a": 2, "b": 3.5, "c": "y", "d": false}\n')


def test_missing_keys_are_null():
    assert_matches_oracle(
        b'{"a": 1}\n{"a": null, "b": "only-here"}\n{"b": "again"}\n')


def test_string_escapes_incl_surrogate_pairs():
    assert_matches_oracle(
        b'{"s": "esc \\"q\\" \\n tab\\t u\\u00e9 pair\\ud83d\\ude00"}\n')


def test_int_to_float_promotion():
    assert_matches_oracle(b'{"x": 1}\n{"x": 2.5}\n')


def test_all_null_column():
    assert_matches_oracle(b'{"n": null}\n{"n": null}\n')


def test_nested_falls_back_to_pyarrow():
    assert_matches_oracle(
        b'{"o": {"k": 1}, "a": [1, 2]}\n{"o": {"k": 2}, "a": []}\n')


def test_negative_and_big_numbers():
    assert_matches_oracle(
        b'{"i": -9223372036854775808}\n{"i": 9223372036854775807}\n')
    assert_matches_oracle(
        b'{"i": 1e308}\n{"i": -2.5e-10}\n')
