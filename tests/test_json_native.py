"""Native NDJSON reader vs pyarrow.json (the reference's own engine).

Reference: cpp/src/arrow/json/ (reader.cc parallel blocks,
converter.cc inference)."""

import io

import numpy as np

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


class TestNestedNative:
    def test_list_and_struct_columns(self):
        import io as _io

        import pyarrow.json as paj

        data = (b'{"a": 1, "l": [1, 2], "s": {"x": 1, "y": "u"}}\n'
                b'{"a": 2, "l": [], "s": null}\n'
                b'{"a": null, "l": null, "s": {"x": null, "y": "v"}}\n'
                b'{"a": 4, "l": [3, null, 5], "s": {"x": 7}}\n')
        got = read_json(_io.BytesIO(data)).combine_chunks().to_arrow()
        oracle = paj.read_json(_io.BytesIO(data))
        for name in ("a", "l", "s"):
            assert got[name].to_pylist() == oracle[name].to_pylist(), name

    def test_string_and_float_lists(self):
        import io as _io

        data = (b'{"t": ["x", "y"], "f": [1.5]}\n'
                b'{"t": [], "f": [2.5, null]}\n')
        got = read_json(_io.BytesIO(data)).combine_chunks().to_arrow()
        assert got["t"].to_pylist() == [["x", "y"], []]
        assert got["f"].to_pylist() == [[1.5], [2.5, None]]

    def test_native_handles_it_not_fallback(self):
        from arrow1_tpu.io._native_tbl import tbl_lib

        lib = tbl_lib()
        if lib is None:
            pytest.skip("native unavailable")
        data = b'{"l": [1], "s": {"x": 2}}\n'
        h = lib.a1t_json_parse(data, len(data), 0)
        try:
            assert not lib.a1t_tbl_error(h)
            # tree form: l (T_LIST), l.$ (elements), s (presence), s.x
            assert lib.a1t_tbl_ncols(h) == 4
        finally:
            lib.a1t_tbl_free(h)

    def test_deeper_nesting_falls_back(self):
        import io as _io

        data = b'{"ll": [[1], [2, 3]]}\n{"ll": [[4]]}\n'
        got = read_json(_io.BytesIO(data)).combine_chunks().to_arrow()
        assert got["ll"].to_pylist() == [[[1], [2, 3]], [[4]]]

    def test_mixed_scalar_and_array_falls_back(self):
        import io as _io

        data = b'{"m": 1}\n{"m": [2]}\n'
        # pyarrow.json also rejects this; both paths must raise cleanly
        with pytest.raises(Exception):
            read_json(_io.BytesIO(data))


@pytest.mark.parametrize("seed", range(4))
def test_nested_json_differential_fuzz(seed):
    import io as _io
    import json as pyjson

    import pyarrow.json as paj

    rng = np.random.default_rng(seed + 10)
    n = int(rng.integers(1, 50))
    lines = []
    for _ in range(n):
        row = {}
        if rng.random() > 0.1:
            row["a"] = int(rng.integers(-100, 100))
        if rng.random() > 0.1:
            row["l"] = (None if rng.random() < 0.15 else
                        [None if rng.random() < 0.2
                         else float(np.round(rng.standard_normal(), 4))
                         for _ in range(int(rng.integers(0, 4)))])
        if rng.random() > 0.1:
            row["s"] = (None if rng.random() < 0.15 else
                        {"x": int(rng.integers(0, 9)),
                         "y": str(rng.choice(["u", "vv", ""]))})
        lines.append(pyjson.dumps(row))
    data = ("\n".join(lines) + "\n").encode()
    got = read_json(_io.BytesIO(data)).combine_chunks().to_arrow()
    oracle = paj.read_json(_io.BytesIO(data))
    assert set(got.column_names) == set(oracle.column_names), seed
    for name in oracle.column_names:
        assert got[name].to_pylist() == oracle[name].to_pylist(), (
            seed, name)


class TestDeepNesting:
    """Arbitrary-depth native parse (was one-level + fallback)."""

    def _roundtrip(self, lines):
        import io

        from pyarrow import json as pajson

        from arrow1_tpu.io.json import read_json

        data = "\n".join(lines).encode()
        t = read_json(data)
        want = pajson.read_json(io.BytesIO(data))
        got = t.to_arrow()
        assert got.num_rows == want.num_rows
        for name in want.schema.names:
            g = got.column(name)
            w = want.column(name)
            assert g.cast(w.type).equals(w), name
        return t

    def test_list_of_struct(self):
        self._roundtrip([
            '{"tags": [{"k": "a", "v": 1}, {"k": "b", "v": 2}]}',
            '{"tags": []}',
            '{"tags": null}',
            '{"tags": [{"k": "c"}]}',
        ])

    def test_list_of_list(self):
        self._roundtrip([
            '{"m": [[1, 2], [3]], "x": 1}',
            '{"m": [[], [4, 5, 6]], "x": 2}',
            '{"m": null, "x": 3}',
        ])

    def test_struct_of_struct_of_list(self):
        self._roundtrip([
            '{"a": {"b": {"c": [1.5, 2.5], "d": "x"}}}',
            '{"a": {"b": null}}',
            '{"a": null}',
            '{"a": {"b": {"c": [], "d": null}}}',
        ])

    def test_native_not_fallback_deep(self):
        from arrow1_tpu.io._native_tbl import tbl_lib

        lib = tbl_lib()
        if lib is None:
            import pytest

            pytest.skip("native unavailable")
        data = b'{"a": [[{"x": [1]}]]}\n'
        h = lib.a1t_json_parse(data, len(data), 0)
        try:
            assert not lib.a1t_tbl_error(h)
            # a(list), a.$(list), a.$.$(struct), a.$.$.x(list),
            # a.$.$.x.$(int64)
            assert lib.a1t_tbl_ncols(h) == 5
        finally:
            lib.a1t_tbl_free(h)
