"""Options parity for functions that previously ignored pyarrow options:
rank family (RankOptions), index (IndexOptions), is_null (NullOptions),
day_of_week/weeks_between (DayOfWeekOptions), min/max_element_wise
(ElementWiseAggregateOptions), list_flatten (ListFlattenOptions),
binary_join_element_wise (JoinOptions), run_end_encode
(RunEndEncodeOptions), round_binary (RoundBinaryOptions),
inverse_permutation (InversePermutationOptions).

Reference: api_vector.h / api_scalar.h options structs; oracle = pyarrow.
"""

import warnings

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

import arrow1_tpu as a1t
import arrow1_tpu.compute as ac

warnings.filterwarnings("ignore", category=FutureWarning)


class TestRankFamily:
    A = pa.array([2.0, float("nan"), None, 1.0, 2.0])

    @pytest.mark.parametrize("np_", ["at_start", "at_end"])
    @pytest.mark.parametrize("tb", ["first", "min", "max", "dense"])
    @pytest.mark.parametrize("order", ["ascending", "descending"])
    def test_rank(self, np_, tb, order):
        got = ac.rank(a1t.column(self.A), sort_keys=order,
                      null_placement=np_, tiebreaker=tb).to_numpy().tolist()
        want = pc.rank(self.A, sort_keys=order, null_placement=np_,
                       tiebreaker=tb).to_pylist()
        assert got == want

    def test_rank_string(self):
        b = pa.array(["b", None, "a", "b"])
        for tb in ["min", "dense", "first", "max"]:
            assert ac.rank(a1t.column(b), tiebreaker=tb).to_numpy().tolist() \
                == pc.rank(b, tiebreaker=tb).to_pylist()

    @pytest.mark.parametrize("np_", ["at_start", "at_end"])
    def test_rank_quantile_normal(self, np_):
        got = ac.rank_quantile(a1t.column(self.A),
                               null_placement=np_).to_numpy().tolist()
        want = pc.rank_quantile(self.A, null_placement=np_).to_pylist()
        assert got == want
        gn = ac.rank_normal(a1t.column(self.A),
                            null_placement=np_).to_numpy()
        wn = pc.rank_normal(self.A, null_placement=np_).to_pylist()
        assert np.allclose(gn, wn)


class TestScalarOptions:
    def test_index_options(self):
        a = pa.array([3.0, 1.0, None, 2.0])
        assert ac.index(a1t.column(a), value=1.0).as_py() == \
            pc.index(a, value=1.0).as_py()
        assert ac.index(a1t.column(a), 9.0).as_py() == -1

    def test_is_null_nan(self):
        f = pa.array([1.0, float("nan"), None])
        for nan in (True, False):
            assert ac.is_null(a1t.column(f), nan_is_null=nan).to_pylist() \
                == pc.is_null(f, nan_is_null=nan).to_pylist()

    def test_day_of_week_options(self):
        d = pa.array([np.datetime64("2026-08-17", "s"),
                      np.datetime64("2026-08-23", "s"), None])
        for kw in [{}, dict(count_from_zero=False), dict(week_start=7),
                   dict(count_from_zero=False, week_start=3)]:
            assert ac.day_of_week(a1t.column(d), **kw).to_pylist() == \
                pc.day_of_week(d, **kw).to_pylist()

    def test_weeks_between_week_start(self):
        d1 = pa.array([np.datetime64("2026-08-16", "s")])  # Sunday
        d2 = pa.array([np.datetime64("2026-08-17", "s")])  # Monday
        for kw in [{}, dict(week_start=7)]:
            assert ac.weeks_between(a1t.column(d1), a1t.column(d2),
                                    **kw).to_pylist() == \
                pc.weeks_between(d1, d2, **kw).to_pylist()

    def test_element_wise_skip_nulls(self):
        x = pa.array([1.0, None, 5.0])
        y = pa.array([None, 2.0, 3.0])
        for sk in (True, False):
            assert ac.min_element_wise(
                a1t.column(x), a1t.column(y),
                skip_nulls=sk).to_pylist() == \
                pc.min_element_wise(x, y, skip_nulls=sk).to_pylist()
            assert ac.max_element_wise(
                a1t.column(x), a1t.column(y),
                skip_nulls=sk).to_pylist() == \
                pc.max_element_wise(x, y, skip_nulls=sk).to_pylist()

    def test_join_options(self):
        sx = pa.array(["a", None])
        sy = pa.array(["b", "c"])
        for nh, nr in [("emit_null", ""), ("skip", ""), ("replace", "NA")]:
            assert ac.binary_join_element_wise(
                a1t.column(sx), a1t.column(sy), "-", null_handling=nh,
                null_replacement=nr).to_pylist() == \
                pc.binary_join_element_wise(
                    sx, sy, "-", null_handling=nh,
                    null_replacement=nr).to_pylist()

    def test_round_binary_mode(self):
        assert ac.round_binary(
            a1t.column(pa.array([2.5, 3.5])), a1t.column(pa.array([0, 0])),
            round_mode="half_up").to_pylist() == [3.0, 4.0]


class TestVectorOptions:
    def test_list_flatten_recursive(self):
        ll = pa.array([[[1, 2]], [[3]], None])
        got = ac.list_flatten(
            a1t.record_batch(pa.record_batch({"x": ll}))["x"],
            recursive=True).to_pylist()
        assert got == pc.list_flatten(ll, recursive=True).to_pylist()

    def test_run_end_type(self):
        r = ac.run_end_encode(a1t.column(pa.array([1, 1, 2])),
                              run_end_type=pa.int16())
        assert "int16" in str(r.column("run_ends").dtype)
        assert r.column("run_ends").to_numpy().tolist() == [2, 3]

    def test_inverse_permutation(self):
        for arr, kw in [(pa.array([2, None, 1]), {}),
                        (pa.array([0, 2]), dict(max_index=4)),
                        (pa.array([1, 1]), {}),
                        (pa.array([2, 0, 1]), {})]:
            assert ac.inverse_permutation(
                a1t.column(arr), **kw).to_pylist() == \
                pc.inverse_permutation(arr, **kw).to_pylist()


def test_option_class_namespace_parity():
    # every pyarrow.compute *Options name resolves in arrow1_tpu.compute
    pa_opts = {n for n in dir(pc) if n.endswith("Options")}
    us_opts = {n for n in dir(ac) if n.endswith("Options")}
    assert pa_opts - us_opts == set()
