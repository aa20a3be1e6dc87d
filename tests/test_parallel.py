"""Distributed operators on the virtual 8-device CPU mesh.

Validates that shuffle + shard-local kernels reproduce the single-device
eager results exactly (the multi-node-without-a-cluster strategy of
SURVEY.md §4.6)."""

import numpy as np
import pyarrow as pa
import pytest

import jax

import arrow1_tpu as a1t
from arrow1_tpu.parallel import (dist_filter, dist_group_by, dist_join,
                                 make_mesh)
from arrow1_tpu.parallel.distributed import dist_sort
from arrow1_tpu.testing import RandomDataGenerator
from test_groupby_join import assert_same_rows


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return make_mesh(8)


def gen_batch(n=200, seed=3, null_p=0.1):
    gen = RandomDataGenerator(seed)
    return pa.record_batch({
        "k": gen.numeric(n, a1t.int64, null_probability=null_p, low=0, high=20),
        "s": gen.strings(n, num_unique=10, null_probability=null_p),
        "v": gen.numeric(n, a1t.int64, null_probability=null_p,
                         low=-100, high=100),
        "f": gen.numeric(n, a1t.float64, null_probability=null_p),
    })


class TestDistFilter:
    def test_matches_eager(self, mesh):
        rb = gen_batch()
        batch = a1t.record_batch(rb)
        expr = a1t.field("v") > 0
        got = dist_filter(batch, expr, mesh)
        mask = expr.execute(batch)
        exp = a1t.compute.filter(batch, mask)
        assert got.num_rows == exp.num_rows
        assert_same_rows(got, exp.to_arrow())

    def test_stays_sharded(self, mesh, monkeypatch):
        """The op must never gather the input table: compaction runs per
        shard inside shard_map, host transfers are bounded by the output
        size plus the per-shard counts (VERDICT r1 weak #6)."""
        from arrow1_tpu.parallel import distributed as D

        rb = gen_batch(n=400)
        batch = a1t.record_batch(rb)
        expr = a1t.field("v") > 50  # low selectivity: output << input

        def no_unshard(*a, **k):
            raise AssertionError("dist_filter must not unshard the input")

        monkeypatch.setattr(D, "unshard_batch", no_unshard)
        pulled = []
        real_get = jax.device_get

        def counting_get(x):
            pulled.append(int(np.size(x)))
            return real_get(x)

        monkeypatch.setattr(D.jax, "device_get", counting_get)
        got = dist_filter(batch, expr, mesh)
        exp = a1t.compute.filter(batch, expr.execute(batch))
        assert_same_rows(got, exp.to_arrow())
        # only the per-shard counts ride device_get (D scalars)
        assert pulled and max(pulled) <= 8

    def test_padded_form(self, mesh):
        from arrow1_tpu.parallel import dist_filter_padded

        rb = gen_batch(n=333, seed=5)
        batch = a1t.record_batch(rb)
        expr = a1t.field("v") <= 0
        result, counts, names = dist_filter_padded(batch, expr, mesh)
        exp = a1t.compute.filter(batch, expr.execute(batch))
        assert int(counts.sum()) == exp.num_rows
        assert set(names) == set(batch.names)


class TestDistGroupBy:
    def test_sum_count(self, mesh):
        rb = gen_batch()
        batch = a1t.record_batch(rb)
        aggs = [("v", "sum"), ("v", "count")]
        got = dist_group_by(batch, ["k"], aggs, mesh)
        exp = a1t.group_by(batch, ["k"], aggs)
        assert_same_rows(got, exp.to_arrow())

    def test_min_max_mean(self, mesh):
        rb = gen_batch(seed=9)
        batch = a1t.record_batch(rb)
        aggs = [("v", "min"), ("v", "max"), ("f", "mean")]
        got = dist_group_by(batch, ["k"], aggs, mesh)
        exp = a1t.group_by(batch, ["k"], aggs)
        g = sorted(got.to_arrow().to_pylist(), key=lambda r: repr(r["k"]))
        e = sorted(exp.to_arrow().to_pylist(), key=lambda r: repr(r["k"]))
        assert len(g) == len(e)
        for a, b in zip(g, e):
            assert a["k"] == b["k"]
            assert a["v_min"] == b["v_min"]
            assert a["v_max"] == b["v_max"]
            assert a["f_mean"] == pytest.approx(b["f_mean"], nan_ok=True)

    def test_string_key(self, mesh):
        rb = gen_batch(seed=5)
        batch = a1t.record_batch(rb)
        aggs = [("v", "sum")]
        got = dist_group_by(batch, ["s"], aggs, mesh)
        exp = a1t.group_by(batch, ["s"], aggs)
        assert_same_rows(got, exp.to_arrow())

    def test_multi_key(self, mesh):
        rb = gen_batch(seed=7)
        batch = a1t.record_batch(rb)
        aggs = [("v", "sum"), ("f", "min")]
        got = dist_group_by(batch, ["k", "s"], aggs, mesh)
        exp = a1t.group_by(batch, ["k", "s"], aggs)
        assert_same_rows(got, exp.to_arrow())


class TestDistJoin:
    def test_inner(self, mesh):
        gen = RandomDataGenerator(41)
        left = pa.record_batch({
            "k": gen.numeric(150, a1t.int64, null_probability=0.1,
                             low=0, high=30),
            "lv": pa.array(np.arange(150, dtype=np.int64)),
        })
        right = pa.record_batch({
            "k": gen.numeric(60, a1t.int64, null_probability=0.1,
                             low=0, high=30),
            "rv": pa.array(np.arange(60, dtype=np.int64)),
        })
        lb, rb_ = a1t.record_batch(left), a1t.record_batch(right)
        got = dist_join(lb, rb_, keys=["k"], mesh=mesh)
        exp = a1t.join(lb, rb_, keys=["k"])
        assert got.num_rows == exp.num_rows
        assert_same_rows(got, exp.to_arrow())

    def test_left_outer(self, mesh):
        gen = RandomDataGenerator(43)
        left = pa.record_batch({
            "k": gen.numeric(100, a1t.int64, null_probability=0.15,
                             low=0, high=40),
            "lv": pa.array(np.arange(100, dtype=np.int64)),
        })
        right = pa.record_batch({
            "k": gen.numeric(40, a1t.int64, low=0, high=40),
            "rv": pa.array(np.arange(40, dtype=np.int64)),
        })
        lb, rb_ = a1t.record_batch(left), a1t.record_batch(right)
        got = dist_join(lb, rb_, keys=["k"], join_type="left outer", mesh=mesh)
        exp = a1t.join(lb, rb_, keys=["k"], join_type="left outer")
        assert got.num_rows == exp.num_rows
        assert_same_rows(got, exp.to_arrow())


class TestDistSort:
    def test_single_key(self, mesh):
        rb = gen_batch(seed=11)
        batch = a1t.record_batch(rb)
        got = dist_sort(batch, [("v", "ascending")], mesh)
        idx = a1t.compute.sort_indices(batch, sort_keys=[("v", "ascending")])
        exp = a1t.compute.take(batch, a1t.compute.cast(idx, a1t.int64))
        assert got.to_arrow().column("v").to_pylist() == \
            exp.to_arrow().column("v").to_pylist()
        # exact stability: full row equality
        for name in batch.names:
            assert got.to_arrow().column(name).to_pylist() == \
                exp.to_arrow().column(name).to_pylist()

    def test_multi_key_with_strings(self, mesh):
        rb = gen_batch(seed=13)
        batch = a1t.record_batch(rb)
        keys = [("s", "ascending"), ("v", "descending")]
        got = dist_sort(batch, keys, mesh)
        idx = a1t.compute.sort_indices(batch, sort_keys=keys)
        exp = a1t.compute.take(batch, a1t.compute.cast(idx, a1t.int64))
        for name in batch.names:
            assert got.to_arrow().column(name).to_pylist() == \
                exp.to_arrow().column(name).to_pylist()


class TestDistGroupByMore:
    def test_variance_stddev_any_all(self, mesh):
        import pyarrow as pa

        gen = RandomDataGenerator(71)
        rb = pa.record_batch({
            "k": gen.numeric(160, a1t.int64, low=0, high=6),
            "v": gen.numeric(160, a1t.float64, null_probability=0.1),
            "b": gen.numeric(160, a1t.bool_, null_probability=0.1),
        })
        batch = a1t.record_batch(rb)
        got = dist_group_by(batch, ["k"],
                            [("v", "variance"), ("v", "stddev"),
                             ("b", "any"), ("b", "all")], mesh)
        exp = a1t.group_by(batch, ["k"],
                           [("v", "variance"), ("v", "stddev"),
                            ("b", "any"), ("b", "all")])
        g = sorted(got.to_arrow().to_pylist(), key=lambda r: r["k"])
        e = sorted(exp.to_arrow().to_pylist(), key=lambda r: r["k"])
        assert len(g) == len(e)
        for a, b in zip(g, e):
            assert a["k"] == b["k"]
            assert a["v_variance"] == pytest.approx(b["v_variance"],
                                                    nan_ok=True)
            assert a["v_stddev"] == pytest.approx(b["v_stddev"], nan_ok=True)
            assert a["b_any"] == b["b_any"]
            assert a["b_all"] == b["b_all"]


class TestMultihostHelpers:
    def test_single_host_paths(self):
        import jax
        import numpy as np

        from arrow1_tpu.parallel.multihost import (allgather_to_hosts,
                                                   barrier,
                                                   broadcast_from_host0,
                                                   global_batch_from_local,
                                                   global_mesh, initialize,
                                                   process_info)

        initialize()  # no coordinator -> no-op
        info = process_info()
        assert info["process_count"] == 1
        assert info["global_devices"] >= 8
        mesh = global_mesh()
        rb = a1t.record_batch({"x": np.arange(16, dtype=np.int64)})
        g = global_batch_from_local(rb, mesh)
        assert "x" in str(g["x"].data.sharding.spec)
        barrier()
        b = broadcast_from_host0({"t": np.array([7, 8])})
        assert b["t"].tolist() == [7, 8]
        back = allgather_to_hosts(g["x"].data)
        assert np.asarray(back).tolist() == list(range(16))


class TestDistributedDecimal256:
    def test_payload_and_key(self, mesh):
        from decimal import Decimal

        import pyarrow as pa

        from arrow1_tpu.parallel import dist_group_by

        n = 64
        rng = np.random.default_rng(0)
        batch = a1t.record_batch(pa.record_batch({
            "k": pa.array(rng.integers(0, 5, n).astype(np.int64)),
            "d": pa.array([Decimal("1.50")] * n,
                          type=pa.decimal256(50, 2)),
        }))
        out = dist_group_by(batch, ["k"], [("d", "count")], mesh)
        assert out.num_rows == 5
        out2 = dist_group_by(batch, ["d"], [("k", "count")], mesh)
        assert out2.num_rows == 1

    def test_high_limb_payload_all_ops(self, mesh):
        from decimal import Decimal

        import pyarrow as pa

        from arrow1_tpu.parallel import dist_filter, dist_group_by, dist_join
        from arrow1_tpu.parallel.distributed import dist_sort

        n = 64
        rng = np.random.default_rng(1)
        big = Decimal("92233720368547758.08")  # high limb != sign ext
        vals = [big if i % 2 else Decimal("1.00") for i in range(n)]
        batch = a1t.record_batch(pa.record_batch({
            "k": pa.array(rng.integers(0, 3, n).astype(np.int64)),
            "d": pa.array(vals, type=pa.decimal128(38, 2)),
        }))
        out = dist_group_by(batch, ["d"], [("k", "count")], mesh)
        assert sorted(out.to_arrow()["d"].to_pylist()) == \
            [Decimal("1.00"), big]
        f = dist_filter(batch, a1t.field("k") > 0, mesh)
        assert big in f.to_arrow()["d"].to_pylist()
        dims = a1t.record_batch(pa.record_batch({
            "k2": pa.array(np.arange(3, dtype=np.int64)),
            "dd": pa.array([big] * 3, type=pa.decimal128(38, 2)),
        }))
        j = dist_join(batch, dims, keys=["k"], right_keys=["k2"],
                      mesh=mesh)
        assert set(j.to_arrow()["dd"].to_pylist()) == {big}
        srt = dist_sort(batch, [("k", "ascending")], mesh)
        assert sorted(srt.to_arrow()["d"].to_pylist()) == sorted(vals)
        with pytest.raises(Exception, match="decimal"):
            dist_group_by(batch, ["k"], [("d", "sum")], mesh)
