"""Distributed compiled pipeline (one shard_map program per stage) vs the
eager engine (VERDICT r1 next #8: config-5's pipeline with the
distributed join + group_by inside the one-dispatch program)."""

import numpy as np
import pyarrow as pa
import pytest

import jax

import arrow1_tpu as a1t
from arrow1_tpu.exec import DistPipelineBuilder
from arrow1_tpu.parallel import make_mesh
from test_groupby_join import assert_same_rows


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8
    return make_mesh(8)


def make_tables(n=1000, m=32, seed=11):
    rng = np.random.default_rng(seed)
    facts = pa.record_batch({
        "k": pa.array(rng.integers(0, m, n)),
        "v": pa.array(rng.integers(-100, 100, n)),
        "f": pa.array(rng.normal(size=n)),
    })
    dims = pa.record_batch({
        "k": pa.array(np.arange(m, dtype=np.int64)),
        "cat": pa.array((np.arange(m) % 5).astype(np.int64)),
    })
    return a1t.record_batch(facts), a1t.record_batch(dims)


class TestDistCompiled:
    def test_filter_group_sort(self, mesh):
        facts, _ = make_tables()
        pipe = (DistPipelineBuilder(mesh)
                .filter(a1t.field("v") > 0)
                .group_by(["k"], [("v", "sum"), ("v", "count")])
                .sort([("k", "ascending")])
                .compile())
        got = pipe(facts)

        mask = (a1t.field("v") > 0).execute(facts)
        hot = a1t.compute.filter(facts, mask)
        agg = a1t.group_by(hot, ["k"], [("v", "sum"), ("v", "count")])
        exp = agg.sort_by([("k", "ascending")])
        assert got.num_rows == exp.num_rows
        got_pa, exp_pa = got.to_arrow(), exp.to_arrow()
        for name in exp_pa.schema.names:
            assert got_pa.column(name).equals(exp_pa.column(name)), name

    def test_full_pipeline_with_join(self, mesh):
        facts, dims = make_tables()
        pipe = (DistPipelineBuilder(mesh)
                .filter(a1t.field("v") > -60)
                .join(dims, "k", fanout=4)
                .group_by(["cat"], [("v", "sum"), ("v", "count"),
                                    ("f", "min")])
                .sort([("cat", "ascending")])
                .compile())
        got = pipe(facts)

        mask = (a1t.field("v") > -60).execute(facts)
        hot = a1t.compute.filter(facts, mask)
        joined = a1t.join(hot, dims, "k", join_type="inner")
        agg = a1t.group_by(joined, ["cat"],
                           [("v", "sum"), ("v", "count"), ("f", "min")])
        exp = agg.sort_by([("cat", "ascending")])
        got_pa, exp_pa = got.to_arrow(), exp.to_arrow()
        assert got_pa.num_rows == exp_pa.num_rows
        for name in exp_pa.schema.names:
            assert got_pa.column(name).equals(exp_pa.column(name)), name

    def test_left_outer_join(self, mesh):
        facts, dims = make_tables()
        # drop half the dims so some probe keys have no match
        half = a1t.compute.filter(
            dims, (a1t.field("k") < 16).execute(dims))
        pipe = (DistPipelineBuilder(mesh)
                .join(half, "k", join_type="left outer", fanout=4)
                .compile())
        got = pipe(facts)
        exp = a1t.join(facts, half, "k", join_type="left outer")
        assert got.num_rows == exp.num_rows
        assert_same_rows(got, exp.to_arrow())

    def test_limit_and_project(self, mesh):
        facts, _ = make_tables()
        pipe = (DistPipelineBuilder(mesh)
                .project([a1t.field("v") * a1t.field("v")], ["v2"])
                .filter(a1t.field("v2") > 2500)
                .sort([("v2", "descending")])
                .limit(7)
                .compile())
        got = pipe(facts)
        assert got.num_rows == 7
        v2 = got.to_arrow().column("v2").to_pylist()
        assert v2 == sorted(v2, reverse=True)
        # oracle: top-7 of v*v above 2500
        va = np.asarray(facts.column("v").data)
        allv2 = np.sort((va * va)[(va * va) > 2500])[::-1][:7]
        assert v2 == allv2.tolist()

    def test_overflow_flag(self, mesh):
        facts, dims = make_tables()
        pipe = (DistPipelineBuilder(mesh)
                .join(dims, "k", fanout=4, shuffle_cap=2)  # absurdly small
                .compile())
        with pytest.raises(a1t.errors.Invalid, match="overflow"):
            pipe(facts)

    def test_single_dispatch(self, mesh):
        """The whole pipeline must execute as ONE jitted computation."""
        facts, dims = make_tables(n=400)
        pipe = (DistPipelineBuilder(mesh)
                .filter(a1t.field("v") > 0)
                .join(dims, "k", fanout=4)
                .group_by(["cat"], [("v", "sum")])
                .sort([("cat", "ascending")])
                .compile())
        n_jit_calls = 0
        import jax as _jax
        orig = _jax.jit

        def counting_jit(*a, **k):
            nonlocal n_jit_calls
            n_jit_calls += 1
            return orig(*a, **k)

        from arrow1_tpu.exec import dist_compiled as dc
        old = dc.jax.jit
        dc.jax.jit = counting_jit
        try:
            pipe(facts)
        finally:
            dc.jax.jit = old
        assert n_jit_calls == 1


def test_group_by_partial_aggregation_matches_rows_path(mesh):
    """Combine-before-shuffle (cap < R routes to the partial path) must
    agree with both the row-shuffle path and the eager oracle, across
    all decomposable aggregates with null keys in play."""
    import numpy as np
    import pyarrow as pa

    import arrow1_tpu as a1t
    from arrow1_tpu.exec.dist_compiled import DistPipelineBuilder

    rng = np.random.default_rng(5)
    n = 8_000
    k = rng.integers(0, 100, n).astype(np.int64)
    kmask = rng.random(n) < 0.05
    batch = a1t.record_batch(pa.record_batch({
        "k": pa.array([None if m else int(x)
                       for m, x in zip(kmask, k)], pa.int64()),
        "v": pa.array(rng.integers(-100, 100, n).astype(np.int64)),
        "f": pa.array(rng.standard_normal(n))}))
    aggs = [("v", "sum"), ("v", "count"), ("f", "min"), ("f", "max"),
            ("f", "mean"), ("f", "variance"), ("f", "stddev")]
    outs = {}
    for cap, label in ((512, "partial"), (None, "rows")):
        q = (DistPipelineBuilder(mesh)
             .group_by(["k"], aggs, shuffle_cap=cap)
             .sort([("k", "ascending")]).compile())
        outs[label] = q(batch)
    e = a1t.group_by(batch, ["k"], aggs)
    assert outs["partial"].num_rows == e.num_rows
    for cn in ("k", "v_sum", "v_count", "f_min", "f_max", "f_mean",
               "f_variance", "f_stddev"):
        a = outs["partial"].column(cn).to_arrow().to_pylist()
        b = outs["rows"].column(cn).to_arrow().to_pylist()
        assert len(a) == len(b)
        for x, y in zip(a, b):
            if isinstance(x, float) and isinstance(y, float):
                assert abs(x - y) < 1e-9, cn
            else:
                assert x == y, cn


def test_group_by_partial_overflow_flags(mesh):
    """More distinct groups per shard than cap -> overflow raised."""
    import numpy as np
    import pyarrow as pa
    import pytest

    import arrow1_tpu as a1t
    from arrow1_tpu.errors import Invalid
    from arrow1_tpu.exec.dist_compiled import DistPipelineBuilder

    rng = np.random.default_rng(0)
    n = 4_000
    batch = a1t.record_batch(pa.record_batch({
        "k": pa.array(np.arange(n, dtype=np.int64)),  # all distinct
        "v": pa.array(rng.integers(0, 10, n).astype(np.int64))}))
    q = (DistPipelineBuilder(mesh)
         .group_by(["k"], [("v", "sum")], shuffle_cap=64)
         .compile())
    with pytest.raises(Invalid):
        q(batch)


class TestDistExactMultiKey:
    """Crafted FNV-fold-colliding tuples must NOT match in the
    distributed compiled join (matching is exact over the full plane
    list; the fold only picks shuffle destinations)."""

    def test_fold_collision_does_not_match(self, mesh):
        M = np.uint64(0x9E3779B97F4A7C15)
        S = np.uint64(1 << 63)

        def u(x):
            return np.uint64(np.int64(x)) ^ S

        with np.errstate(over="ignore"):
            a1_, a2_ = np.int64(1), np.int64(2)
            target = (u(a1_) * M) ^ u(a2_)
            b1_ = np.int64(3)
            b2_ = np.int64((u(b1_) * M) ^ target ^ S)
        probe = a1t.record_batch(pa.record_batch({
            "k1": pa.array([int(a1_), 7] * 8, pa.int64()),
            "k2": pa.array([int(a2_), 8] * 8, pa.int64()),
            "pv": pa.array(list(range(16)), pa.int64()),
        }))
        build = a1t.record_batch(pa.record_batch({
            "k1": pa.array([int(b1_), 7], pa.int64()),
            "k2": pa.array([int(b2_), 8], pa.int64()),
            "w": pa.array([111, 222], pa.int64()),
        }))
        pipe = (DistPipelineBuilder(mesh)
                .join(build, ["k1", "k2"], join_type="left outer",
                      fanout=4)
                .compile())
        got = pipe(probe).to_arrow()
        assert got.num_rows == 16
        for r in got.to_pylist():
            if (r["k1"], r["k2"]) == (7, 8):
                assert r["w"] == 222
            else:
                assert r["w"] is None
