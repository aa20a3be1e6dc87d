"""String, temporal, and nested kernel parity vs pyarrow.compute."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

import arrow1_tpu as a1t
import arrow1_tpu.compute as ac
from arrow1_tpu.errors import Invalid
from arrow1_tpu.testing import assert_equals_arrow

S = pa.array(["Hello World", "  padded  ", None, "UPPER", "lower",
              "123", "", "mixed123", "Hello World"])


def check_unary(name, a=S, **kwargs):
    got = getattr(ac, name)(a, **kwargs)
    expected = getattr(pc, name)(a, **kwargs)
    if hasattr(got, "to_arrow"):
        g = got.to_arrow()
        if pa.types.is_dictionary(g.type):
            g = g.cast(expected.type)
        assert g.to_pylist() == expected.to_pylist(), name
    else:
        assert got.as_py() == expected.as_py()


class TestStringTransforms:
    @pytest.mark.parametrize("name", [
        "ascii_upper", "ascii_lower", "utf8_upper", "utf8_lower",
        "ascii_swapcase", "utf8_capitalize", "ascii_reverse",
        "utf8_trim_whitespace", "utf8_ltrim_whitespace",
        "utf8_rtrim_whitespace", "ascii_trim_whitespace",
    ])
    def test_transforms(self, name):
        check_unary(name)

    def test_trim_chars(self):
        check_unary("utf8_trim", a=pa.array(["xxhixx", "xhox", None]),
                    characters="x")

    def test_replace_substring(self):
        check_unary("replace_substring",
                    a=pa.array(["aaa", "abc", None]),
                    pattern="a", replacement="Z")

    def test_replace_regex(self):
        check_unary("replace_substring_regex",
                    a=pa.array(["a1b2", "x9", None]),
                    pattern=r"\d", replacement="#")

    def test_slice(self):
        check_unary("utf8_slice_codeunits",
                    a=pa.array(["hello", "hi", None]), start=1, stop=3)


class TestStringPredicates:
    @pytest.mark.parametrize("name", [
        "ascii_is_alnum", "ascii_is_alpha", "ascii_is_lower",
        "ascii_is_upper", "ascii_is_space", "utf8_is_alnum",
        "utf8_is_alpha", "utf8_is_digit", "utf8_is_lower",
        "utf8_is_upper", "string_is_ascii",
    ])
    def test_predicates(self, name):
        check_unary(name)

    def test_match_substring(self):
        check_unary("match_substring", pattern="World")
        check_unary("match_substring", pattern="world", ignore_case=True)

    def test_match_regex(self):
        check_unary("match_substring_regex", pattern=r"^\d+$")

    def test_starts_ends(self):
        check_unary("starts_with", pattern="Hello")
        check_unary("ends_with", pattern="d")

    def test_match_like(self):
        check_unary("match_like", pattern="Hello%")


class TestStringMeasures:
    def test_lengths(self):
        check_unary("binary_length")
        check_unary("utf8_length", a=pa.array(["héllo", "x", None]))

    def test_count_find(self):
        check_unary("count_substring", a=pa.array(["aaa", "abca", None]),
                    pattern="a")
        check_unary("find_substring", a=pa.array(["abc", "xbc", None]),
                    pattern="b")


class TestSplit:
    def test_split_pattern(self):
        a = pa.array(["a,b,c", "x", None, ",lead"])
        got = ac.split_pattern(a, pattern=",")
        exp = pc.split_pattern(a, pattern=",")
        assert got.to_pylist() == exp.to_pylist()

    def test_split_whitespace(self):
        a = pa.array(["a b  c", " x ", None])
        got = ac.utf8_split_whitespace(a)
        exp = pc.utf8_split_whitespace(a)
        assert got.to_pylist() == exp.to_pylist()

    def test_split_max_splits(self):
        a = pa.array(["a,b,c,d"])
        got = ac.split_pattern(a, pattern=",", max_splits=2)
        exp = pc.split_pattern(a, pattern=",", max_splits=2)
        assert got.to_pylist() == exp.to_pylist()


class TestExtractRegex:
    def test_extract(self):
        a = pa.array(["2020-01", "2021-12", "nope", None])
        got = ac.extract_regex(a, pattern=r"(?P<y>\d{4})-(?P<m>\d{2})")
        exp = pc.extract_regex(a, pattern=r"(?P<y>\d{4})-(?P<m>\d{2})")
        exp_list = exp.to_pylist()
        for i, row in enumerate(exp_list):
            if row is None:
                assert got["y"].to_numpy()[i] is None
            else:
                assert got["y"].to_numpy()[i] == row["y"]
                assert got["m"].to_numpy()[i] == row["m"]


class TestJoinElementWise:
    def test_join(self):
        a = pa.array(["a", "b", None])
        b = pa.array(["x", "y", "z"])
        got = ac.binary_join_element_wise(a, b, "-")
        exp = pc.binary_join_element_wise(a, b, "-")
        assert got.to_arrow().cast(pa.string()).to_pylist() == exp.to_pylist()


class TestTemporal:
    TS = pa.array([0, 1_600_000_000_123_456, None, 86_400_000_000],
                  type=pa.timestamp("us"))

    def test_strptime(self):
        a = pa.array(["2021-03-04T05:06:07", None, "1999-12-31T23:59:59"])
        got = ac.strptime(a, format="%Y-%m-%dT%H:%M:%S", unit="us")
        exp = pc.strptime(a, format="%Y-%m-%dT%H:%M:%S", unit="us")
        assert_equals_arrow(got, exp)

    def test_strptime_error(self):
        a = pa.array(["bogus"])
        with pytest.raises(Invalid):
            ac.strptime(a, format="%Y-%m-%d")

    def test_strptime_error_is_null(self):
        a = pa.array(["bogus", "2020-01-02"])
        got = ac.strptime(a, format="%Y-%m-%d", unit="s", error_is_null=True)
        assert got.to_arrow().to_pylist()[0] is None

    @pytest.mark.parametrize("name", ["year", "month", "day", "hour",
                                      "minute", "second", "day_of_year"])
    def test_components(self, name):
        got = getattr(ac, name)(self.TS)
        exp = getattr(pc, name)(self.TS)
        assert got.to_arrow().cast(pa.int64()).to_pylist() == \
            exp.cast(pa.int64()).to_pylist(), name

    def test_components_date32(self):
        a = pa.array([0, 365, 18993, None], type=pa.date32())
        for name in ["year", "month", "day"]:
            got = getattr(ac, name)(a)
            exp = getattr(pc, name)(a)
            assert got.to_arrow().cast(pa.int64()).to_pylist() == \
                exp.cast(pa.int64()).to_pylist(), name

    def test_strftime(self):
        got = ac.strftime(self.TS, format="%Y-%m-%d")
        exp = pc.strftime(self.TS, format="%Y-%m-%d")
        assert got.to_arrow().cast(pa.string()).to_pylist() == \
            exp.to_pylist()


class TestNested:
    L = pa.array([[1, 2, 3], [], None, [4, 5]], type=pa.list_(pa.int64()))

    def test_roundtrip(self):
        col = a1t.column(self.L)
        assert col.to_pylist() == self.L.to_pylist()

    def test_list_value_length(self):
        got = ac.list_value_length(a1t.column(self.L))
        exp = pc.list_value_length(self.L)
        assert got.to_arrow().cast(pa.int32()).to_pylist() == \
            exp.to_pylist()

    def test_list_flatten(self):
        got = ac.list_flatten(a1t.column(self.L))
        exp = pc.list_flatten(self.L)
        assert got.to_arrow().to_pylist() == exp.to_pylist()

    def test_list_parent_indices(self):
        got = ac.list_parent_indices(a1t.column(self.L))
        exp = pc.list_parent_indices(self.L)
        assert got.to_arrow().cast(pa.int64()).to_pylist() == \
            exp.to_pylist()

    def test_take_list_column(self):
        col = a1t.column(self.L)
        idx = a1t.column(np.array([3, 0, 2], dtype=np.int64))
        got = ac.take(col, idx)
        assert got.to_pylist() == [[4, 5], [1, 2, 3], None]

    def test_filter_list_column(self):
        col = a1t.column(self.L)
        mask = a1t.column(pa.array([True, False, True, True]))
        got = ac.filter(col, mask)
        assert got.to_pylist() == [[1, 2, 3], None, [4, 5]]

    def test_make_struct(self):
        a = a1t.column(np.array([1, 2], dtype=np.int64))
        b = a1t.column(pa.array(["x", "y"]))
        got = a1t.call_function("make_struct", [a, b],
                                field_names=["num", "s"])
        assert got.names == ("num", "s")


class TestFixedSizeList:
    def make(self):
        return pa.array([[1, 2, 3], [4, 5, 6], None, [7, 8, 9]],
                        type=pa.list_(pa.int64(), 3))

    def test_roundtrip_and_slice(self):
        a = self.make()
        col = a1t.column(a)
        assert col.dtype.kind == "fixed_size_list"
        assert col.to_arrow().to_pylist() == a.to_pylist()
        sl = a.slice(1, 3)
        assert a1t.column(sl).to_arrow().to_pylist() == sl.to_pylist()

    def test_2d_ingest_and_view(self):
        x = np.arange(12, dtype=np.float32).reshape(4, 3)
        col = a1t.column(x)
        assert col.dtype.kind == "fixed_size_list"
        np.testing.assert_array_equal(np.asarray(col.to_2d()), x)
        assert a1t.fixed_size_list_column(x).to_arrow().to_pylist() == \
            x.tolist()

    def test_take_filter_concat_preserve_type(self):
        from arrow1_tpu.table import concat_columns

        a = self.make()
        col = a1t.column(a)
        taken = ac.take(col, a1t.column(np.array([3, 0, 2], dtype=np.int64)))
        assert taken.to_arrow().to_pylist() == [[7, 8, 9], [1, 2, 3], None]
        assert str(taken.to_arrow().type) == "fixed_size_list<item: int64>[3]"
        filt = ac.filter(col, a1t.column([True, False, True, True]))
        assert filt.to_arrow().to_pylist() == [[1, 2, 3], None, [7, 8, 9]]
        cc = concat_columns([col, col])
        assert cc.to_arrow().to_pylist() == a.to_pylist() * 2

    def test_nested_kernels_match_pyarrow(self):
        a = self.make()
        col = a1t.column(a)
        for fn in ("list_value_length", "list_flatten",
                   "list_parent_indices"):
            got = a1t.call_function(fn, [col]).to_arrow().to_pylist()
            exp = getattr(pc, fn)(a).to_pylist()
            assert got == exp, fn
        got = a1t.call_function("list_element", [col], index=1)
        assert got.to_arrow().to_pylist() == [2, 5, None, 8]


class TestTemporalRound2:
    TS = pa.array([__import__("datetime").datetime(2021, 2, 28, 13, 45, 59,
                                                   123456),
                   __import__("datetime").datetime(2020, 12, 31, 23, 0, 0),
                   __import__("datetime").datetime(2024, 1, 1, 0, 0, 0),
                   __import__("datetime").datetime(1969, 7, 20, 20, 17, 40),
                   None])

    def test_calendar_components(self):
        for fn in ("quarter", "is_leap_year", "iso_week", "iso_year",
                   "us_week", "us_year", "week", "nanosecond", "subsecond"):
            got = a1t.call_function(fn, [a1t.column(self.TS)]) \
                .to_arrow().to_pylist()
            assert got == getattr(pc, fn)(self.TS).to_pylist(), fn

    def test_struct_outputs(self):
        got = a1t.call_function("iso_calendar", [a1t.column(self.TS)])
        exp = pc.iso_calendar(self.TS).to_pylist()
        d = {n: c.to_arrow().to_pylist() for n, c in zip(got.names,
                                                         got.columns)}
        for i, e in enumerate(exp):
            for f in ("iso_year", "iso_week", "iso_day_of_week"):
                assert d[f][i] == (e[f] if e else None)

    def test_between_family(self):
        import datetime as dtm

        d1 = pa.array([dtm.datetime(2021, 2, 28),
                       dtm.datetime(2020, 6, 15, 23, 59),
                       dtm.datetime(2000, 1, 1)])
        d2 = pa.array([dtm.datetime(2023, 5, 1),
                       dtm.datetime(2020, 6, 16, 0, 1),
                       dtm.datetime(1999, 12, 31, 12)])
        for fn in ("years_between", "quarters_between", "weeks_between",
                   "days_between", "hours_between", "minutes_between",
                   "seconds_between", "milliseconds_between",
                   "microseconds_between"):
            got = a1t.call_function(
                fn, [a1t.column(d1), a1t.column(d2)]).to_arrow().to_pylist()
            assert got == getattr(pc, fn)(d1, d2).to_pylist(), fn

    def test_rounding(self):
        for fn, kw in [("floor_temporal", dict(unit="hour")),
                       ("floor_temporal", dict(unit="week")),
                       ("floor_temporal", dict(unit="month")),
                       ("floor_temporal", dict(unit="quarter")),
                       ("ceil_temporal", dict(unit="month")),
                       ("ceil_temporal", dict(unit="day")),
                       ("round_temporal", dict(multiple=15, unit="minute")),
                       ("round_temporal", dict(unit="year"))]:
            got = a1t.call_function(fn, [a1t.column(self.TS)],
                                    **kw).to_arrow().to_pylist()
            assert got == getattr(pc, fn)(self.TS, **kw).to_pylist(), (fn, kw)

    def test_timezone_passthrough(self):
        import datetime as dtm

        naive = pa.array([dtm.datetime(2021, 6, 1, 12)])
        got = a1t.call_function("assume_timezone", [a1t.column(naive)],
                                timezone="America/New_York").to_arrow()
        exp = pc.assume_timezone(naive, timezone="America/New_York")
        assert got.to_pylist() == exp.to_pylist()


class TestMapType:
    def make(self):
        return pa.array([[("a", 1), ("b", 2)], [("a", 9)], None],
                        type=pa.map_(pa.string(), pa.int64()))

    def test_roundtrip_and_take(self):
        m = self.make()
        col = a1t.column(m)
        assert col.dtype.kind == "map"
        assert col.to_arrow().to_pylist() == m.to_pylist()
        taken = ac.take(col, a1t.column(np.array([2, 0], dtype=np.int64)))
        assert taken.to_arrow().to_pylist() == \
            m.take(pa.array([2, 0])).to_pylist()

    def test_map_lookup_matches_pyarrow(self):
        m = self.make()
        col = a1t.column(m)
        for occ, q in [("first", "a"), ("first", "b"), ("last", "a"),
                       ("first", "z"), ("all", "a")]:
            got = a1t.call_function("map_lookup", [col], query_key=q,
                                    occurrence=occ).to_arrow().to_pylist()
            exp = pc.map_lookup(m, query_key=q,
                                occurrence=occ).to_pylist()
            assert got == exp, (occ, q)

    def test_batch_roundtrip(self):
        m = self.make()
        rb = pa.record_batch({"m": m, "x": pa.array([1, 2, 3])})
        back = a1t.record_batch(rb).to_arrow()
        assert back.column("m").to_pylist() == m.to_pylist()


class TestStructColumn:
    def make(self):
        return pa.array([{"x": 1, "y": 2.0}, {"x": 3, "y": 4.0}, None])

    def test_roundtrip_slice_take(self):
        s = self.make()
        col = a1t.column(s)
        assert col.dtype.kind == "struct"
        assert col.to_arrow().to_pylist() == s.to_pylist()
        assert col.slice(1, 2).to_arrow().to_pylist() == \
            s.slice(1, 2).to_pylist()
        taken = ac.take(col, a1t.column(np.array([2, 0], dtype=np.int64)))
        assert taken.to_arrow().to_pylist() == \
            s.take(pa.array([2, 0])).to_pylist()

    def test_struct_field_and_filter(self):
        s = self.make()
        col = a1t.column(s)
        got = a1t.call_function("struct_field", [col],
                                field="x").to_arrow().to_pylist()
        assert got == pc.struct_field(s, "x").to_pylist()
        rb = pa.record_batch({"s": s, "z": pa.array([1, 2, 3])})
        f = a1t.query(a1t.record_batch(rb)).filter(
            a1t.field("z") > 1).to_batch()
        assert f["s"].to_arrow().to_pylist() == \
            s.take(pa.array([1, 2])).to_pylist()


class TestNativeBytePath:
    """Edge semantics of the device byte kernels (ops/strings_device.py)
    vs the pyarrow oracle — the native path must not drift from the host
    path it replaced."""

    NONASCII = pa.array(["ÜNICODE", "Hello", "", "  sp  ", "tab\there",
                         "Title Case", "aapl AAPL", None])

    def test_native_routing(self):
        # the ascii family actually takes the native path (no pyarrow)
        from arrow1_tpu.ops.strings_device import (NATIVE_PREDICATES,
                                                   NATIVE_TRANSFORMS)
        assert "ascii_upper" in NATIVE_TRANSFORMS
        assert "match_substring" in NATIVE_PREDICATES

    @pytest.mark.parametrize("name", [
        "ascii_upper", "ascii_lower", "ascii_swapcase", "ascii_capitalize",
        "ascii_title", "ascii_trim_whitespace", "ascii_is_alpha",
        "ascii_is_alnum", "ascii_is_decimal", "ascii_is_space",
        "ascii_is_printable", "ascii_is_lower", "ascii_is_upper",
        "ascii_is_title", "string_is_ascii", "binary_length", "utf8_length",
    ])
    def test_nonascii_passthrough(self, name):
        # bytes >= 0x80 flow through untouched / predicate false
        check_unary(name, a=self.NONASCII)

    def test_empty_string_is_printable(self):
        # "" IS printable, unlike every other is_* predicate
        check_unary("ascii_is_printable", a=pa.array(["", "x", "\x01"]))

    def test_reverse_nonascii_raises(self):
        # byte reversal of multi-byte utf8 is rejected, like the
        # reference kernel (scalar_string.cc AsciiReverse)
        with pytest.raises(Invalid, match="Non-ASCII"):
            ac.ascii_reverse(a1t.column(pa.array(["ÜNICODE"])))

    def test_trim_custom_chars_native(self):
        check_unary("ascii_trim", a=pa.array(["xxhixx", "hax", None]),
                    characters="x")
        check_unary("ascii_ltrim", a=pa.array(["aAb", "ba"]), characters="aA")
        check_unary("ascii_rtrim", a=pa.array(["abll", "ba"]), characters="l")

    def test_count_find_native(self):
        a = pa.array(["aaaa", "abab", "", None, "xaax"])
        check_unary("count_substring", a=a, pattern="aa")
        check_unary("find_substring", a=a, pattern="ab")
        check_unary("match_substring", a=a, pattern="aa")
        check_unary("starts_with", a=a, pattern="ab")
        check_unary("ends_with", a=a, pattern="ax")


class TestHostKernelEdgeSemantics:
    """Regressions for the native host string kernels (strings_host.py):
    utf8proc cased-character title words, ignore_case ends_with, the
    reference's utf8 whitespace-split end-of-string quirk, and
    extract_regex null structs."""

    def test_title_cased_not_alpha(self):
        # 'Ⅷ' (Nl, cased via lowercase mapping) starts a word; digits reset
        a = pa.array(["Ⅷx", "a1b", "ʔfg", "_ab 12cd", "ǉa", "ß x"])
        check_unary("utf8_title", a=a)
        check_unary("utf8_capitalize", a=a)
        check_unary("utf8_swapcase", a=pa.array(["Ⅷⅷ", "ǅx"]))

    def test_ends_with_ignore_case(self):
        a = pa.array(["İstanbul", "", "abc", "aBC", None])
        for pat in ["l", "", "bc", "L"]:
            check_unary("ends_with", a=a, pattern=pat, ignore_case=True)
            check_unary("ends_with", a=a, pattern=pat, ignore_case=False)

    def test_utf8_split_whitespace_end_run(self):
        # trailing run >=2 splits run[:-1] + run[-1:] (utf8 only);
        # reverse mode mirrors at the string start
        a = pa.array(["  ", "a  ", "   ", " a ", "x  y\tz", "a \t b", None])
        for kw in [{}, dict(max_splits=1), dict(max_splits=1, reverse=True)]:
            check_unary("utf8_split_whitespace", a=a, **kw)
            check_unary("ascii_split_whitespace", a=a, **kw)

    def test_extract_regex_null_struct(self):
        a = pa.array(["2020-01", "nope", None, "1999-12"])
        got = ac.extract_regex(a, pattern=r"(?P<y>\d{4})-(?P<m>\d{2})")
        exp = pc.extract_regex(a, pattern=r"(?P<y>\d{4})-(?P<m>\d{2})")
        assert got.to_arrow().to_pylist() == exp.to_pylist()
        # field access propagates struct nulls
        assert got["y"].to_numpy()[1] is None

    def test_re2_ascii_classes(self):
        # RE2's \w \d \s \b are ASCII-only (re2 parse.cc); Python's are
        # unicode-aware — the kernels rewrite patterns to RE2 semantics
        a = pa.array(["Ⅷx", "héllo wörld", "a1b_c", "x\vy", "½ cup", None])
        for pat in [r"\w+", r"\d", r"\s", r"\bx", r"[\w]", r"[^\d]"]:
            check_unary("match_substring_regex", a=a, pattern=pat)
            check_unary("count_substring_regex", a=a, pattern=pat)
        check_unary("replace_substring_regex", a=a, pattern=r"\w+",
                    replacement="X")
        got = ac.extract_regex(a, pattern=r"(?P<g>\w+)")
        exp = pc.extract_regex(a, pattern=r"(?P<g>\w+)")
        assert got.to_arrow().to_pylist() == exp.to_pylist()

    def test_re2_rejects_backref_lookaround(self):
        a = pa.array(["ab"])
        for p in [r"(a)\1", r"a(?=b)", r"(?<!x)y"]:
            with pytest.raises(Invalid):
                ac.match_substring_regex(a1t.column(a), pattern=p)
