"""Round-3 TPU measurements: BASELINE configs through engine entry points.

Usage: python benchmarks/r3/measure_r3.py <job> [...]
Jobs: groupby3 q1caps
Results land in benchmarks/r3/results_tpu_r3.json.
"""

import json
import os
import sys
import time

import jax
import numpy as np

jax.config.update("jax_enable_x64", True)
try:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception as e:
    print("compilation cache unavailable:", e, flush=True)

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

RESULTS = os.path.join(os.path.dirname(__file__), "results_tpu_r3.json")


def _load():
    try:
        with open(RESULTS) as f:
            return json.load(f)
    except Exception:
        return {}


def _record(name, **kv):
    d = _load()
    kv["at"] = time.strftime("%H:%M:%S")
    d[name] = kv
    with open(RESULTS, "w") as f:
        json.dump(d, f, indent=1, sort_keys=True)
    print(name, json.dumps(kv), flush=True)


def _t(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


class M:
    def __init__(self):
        import jax.numpy as jnp

        tiny = jax.jit(lambda x: x + 1)
        x8 = jnp.zeros(8)
        float(jax.device_get(tiny(x8)[0]))
        self.floor = min(_t(lambda: float(jax.device_get(tiny(x8)[0])))
                         for _ in range(5))
        print(f"dispatch floor {self.floor*1e3:.1f} ms", flush=True)

    def timed(self, fn, args, inner, reps=4):
        import jax.numpy as jnp

        @jax.jit
        def step(*a):
            def body(i, acc):
                return acc + fn(i, *a)

            return jax.lax.fori_loop(0, inner, body, jnp.float64(0.0))

        float(jax.device_get(step(*args)))
        times = [_t(lambda: float(jax.device_get(step(*args))))
                 for _ in range(reps)]
        per = max(min(times) - self.floor, 1e-9) / inner
        return per, sorted(times)


N = 10_000_000


def op_groupby3():
    """BASELINE config 2 through the compiled-pipeline entry point:
    group_by(key) at G = 1K / 100K / 1M, one-dispatch engine path."""
    import jax.numpy as jnp

    from arrow1_tpu import dtypes as dt
    from arrow1_tpu.column import Column
    from arrow1_tpu.exec.compiled import PipelineBuilder
    from arrow1_tpu.table import RecordBatch

    m = M()
    rng = np.random.default_rng(3)
    vals = rng.standard_normal(N)
    done = set()
    try:
        done = {k for k in _load() if k.startswith("groupby3_")}
    except Exception:
        pass
    # sum across ALL cardinalities first (the VERDICT ask), then the
    # 4-agg variant — a wedged compile mid-queue can't starve G=1M
    for aggs, tag in (
            ([("v", "sum")], "sum"),
            ([("v", "sum"), ("v", "count"), ("v", "min"),
              ("v", "max")], "scmm")):
      for G in (1_000, 100_000, 1_000_000):
        if f"groupby3_{tag}_10M_G{G}" in done:
            continue
        keys = rng.integers(0, G, N).astype(np.int64)
        batch = RecordBatch(
            (Column(jnp.asarray(keys), dt.int64),
             Column(jnp.asarray(vals), dt.float64,
                    bits=jnp.asarray(vals.view(np.int64)))),
            ("k", "v"))
        if True:
            p = (PipelineBuilder()
                 .group_by(["k"], aggs, max_groups=G)
                 .compile())

            def fn(i, batch, p=p):
                k = batch.column("k")
                pert = Column(k.data + (i - i), k.dtype)
                b2 = RecordBatch((pert,) + tuple(batch.columns[1:]),
                                 batch.names)
                out, live, _ = p._trace(b2)
                return (jnp.sum(live).astype(jnp.float64) +
                        sum(jnp.sum(jnp.where(live, c.data, 0))
                            .astype(jnp.float64) for c in out.columns))

            inner = 4 if G <= 100_000 else 2
            per, times = m.timed(fn, (batch,), inner=inner)
            _record(f"groupby3_{tag}_10M_G{G}", ms=round(per * 1e3, 1),
                    mrows_s=round(N / per / 1e6, 1),
                    times=[round(x, 3) for x in times])


def op_q1caps():
    """q1 at max_groups 4096 (vs the 65536 default measured in r2 slot)."""
    import jax.numpy as jnp

    from arrow1_tpu import dtypes as dt
    from arrow1_tpu.column import Column
    from arrow1_tpu.exec.compiled import PipelineBuilder
    from arrow1_tpu.expr import field
    from arrow1_tpu.table import RecordBatch

    m = M()
    rng = np.random.default_rng(0)
    ship = rng.integers(0, 5000, N).astype(np.int64)
    flag = rng.integers(0, 3, N).astype(np.int64)
    qty = rng.integers(1, 50, N).astype(np.int64)
    price_b = rng.standard_normal(N)
    lineitem = RecordBatch(
        (Column(jnp.asarray(ship), dt.int64),
         Column(jnp.asarray(flag), dt.int64),
         Column(jnp.asarray(qty), dt.int64),
         Column(jnp.asarray(price_b), dt.float64,
                bits=jnp.asarray(price_b.view(np.int64)))),
        ("l_shipdate_days", "l_returnflag", "l_quantity",
         "l_extendedprice"))
    q1 = (PipelineBuilder()
          .filter(field("l_shipdate_days") <= 2500)
          .group_by(["l_returnflag"],
                    [("l_quantity", "sum"), ("l_extendedprice", "sum"),
                     ("l_quantity", "count")], max_groups=4096)
          .sort([("l_returnflag", "ascending")])
          .compile())

    def fn_q1(i, batch):
        sh = batch.column("l_shipdate_days")
        pert = Column(sh.data + (i - i), sh.dtype)
        b2 = RecordBatch((pert,) + tuple(batch.columns[1:]), batch.names)
        out, live, _ = q1._trace(b2)
        return (jnp.sum(live).astype(jnp.float64) +
                sum(jnp.sum(c.data).astype(jnp.float64)
                    for c in out.columns))

    per, times = m.timed(fn_q1, (lineitem,), inner=4)
    _record("tpch_q1_10M_g4k", ms=round(per * 1e3, 2),
            rows_per_s=round(N / per),
            times=[round(x, 3) for x in times])


def op_sortmceng():
    """BASELINE config 3 through the ENGINE entry points (VERDICT r2 #5:
    the r2 100M numbers timed raw lax.sort, not ops/sort.py). Keys:
    dict-string (1000 uniques) + int64 with 1% nulls; payloads ride the
    variadic sort (materialize_sorted) or a separate perm (sort_indices
    path)."""
    import jax.numpy as jnp

    from arrow1_tpu import dtypes as dt
    from arrow1_tpu.column import Column, Dictionary
    from arrow1_tpu.ops.sort import _radix_perm, materialize_sorted
    from arrow1_tpu.table import RecordBatch

    m = M()
    rng = np.random.default_rng(9)
    for N in (10_000_000, 100_000_000):
        tag = f"{N // 1_000_000}M"
        codes = rng.integers(0, 1000, N).astype(np.int32)
        k = rng.integers(-(1 << 60), 1 << 60, N).astype(np.int64)
        valid = rng.random(N) >= 0.01
        pay = rng.integers(0, 1 << 30, N).astype(np.int64)
        price = rng.standard_normal(N)
        uniq = np.asarray([f"sym{i:04d}" for i in range(1000)], object)
        batch = RecordBatch(
            (Column(jnp.asarray(codes), dt.string,
                    dictionary=Dictionary(uniq)),
             Column(jnp.asarray(k), dt.int64,
                    validity=jnp.asarray(valid)),
             Column(jnp.asarray(pay), dt.int64),
             Column(jnp.asarray(price), dt.float64,
                    bits=jnp.asarray(price.view(np.int64)))),
            ("s", "k", "pay", "price"))
        sort_keys = [("s", "ascending"), ("k", "descending")]

        def fn_idx(i, batch):
            c0 = batch.column("s")
            pert = Column(c0.data + (i - i).astype(c0.data.dtype),
                          c0.dtype, dictionary=c0.dictionary)
            b2 = RecordBatch((pert,) + tuple(batch.columns[1:]),
                             batch.names)
            perm = _radix_perm(
                [(b2.column(n), o) for n, o in sort_keys])
            return (perm[0].astype(jnp.float64) +
                    perm[-1].astype(jnp.float64))

        per, times = m.timed(fn_idx, (batch,), inner=2)
        _record(f"sortmceng_indices_{tag}", ms=round(per * 1e3, 1),
                mrows_s=round(N / per / 1e6, 1),
                times=[round(x, 3) for x in times])

        def fn_mat(i, batch):
            c0 = batch.column("s")
            pert = Column(c0.data + (i - i).astype(c0.data.dtype),
                          c0.dtype, dictionary=c0.dictionary)
            b2 = RecordBatch((pert,) + tuple(batch.columns[1:]),
                             batch.names)
            out = materialize_sorted(b2, sort_keys)
            return (out.column("pay").data[0].astype(jnp.float64) +
                    jnp.sum(out.column("k").mask()[:8].astype(
                        jnp.float64)))

        per, times = m.timed(fn_mat, (batch,), inner=2)
        _record(f"sortmceng_materialize_{tag}", ms=round(per * 1e3, 1),
                mrows_s=round(N / per / 1e6, 1),
                times=[round(x, 3) for x in times])


def op_compact8():
    """v8 (hoisted prefix, R=128) vs v7 champion at the flagship shape."""
    import jax.numpy as jnp

    from arrow1_tpu.kernels.compaction_v7 import compact_v7
    from arrow1_tpu.kernels.compaction_v8 import compact_v8

    m = M()
    rng = np.random.default_rng(0)
    R8 = 128
    variants = [("v8t8_r128", lambda mk, c: compact_v8(
        mk, c, rows=128, t_tiles=8)),
        ("v8t4_r128", lambda mk, c: compact_v8(mk, c, rows=128,
                                               t_tiles=4)),
        ("v8t16_r128", lambda mk, c: compact_v8(mk, c, rows=128,
                                                t_tiles=16)),
        ("v8t8_r64", lambda mk, c: compact_v8(mk, c, rows=64,
                                              t_tiles=8)),
        ("v7t8_r64", lambda mk, c: compact_v7(mk, c, rows=64,
                                              t_tiles=8))]
    TILE = 256 * 128 * 16
    n = 10_000_000 // TILE * TILE
    key = jnp.asarray(rng.integers(0, 1 << 40, n).astype(np.int64))
    v = jnp.asarray(rng.integers(-(1 << 30), 1 << 30, n).astype(np.int64))
    fb = jnp.asarray(rng.standard_normal(n).view(np.int64))
    f = np.asarray(fb).view(np.float64)
    maskh = (f > 0.0) & (np.asarray(v) > 0)
    for name, fun in variants:
        def fn(i, key, v, fb, fun=fun):
            ff = jax.lax.bitcast_convert_type(fb, jnp.float64)
            mask = (ff > i.astype(jnp.float64) * 1e-12) & (
                v > jnp.int64(0))
            (ok, ov, ofb), count = fun(mask, (key, v, fb))
            return (count.astype(jnp.float64) +
                    jnp.sum(ok).astype(jnp.float64) +
                    jnp.sum(ov).astype(jnp.float64))

        try:
            per, times = m.timed(fn, (key, v, fb), inner=8)
        except Exception as e:
            _record(f"compact_{name}_ab6", error=repr(e)[:300])
            continue
        (ok, ov, ofb), count = jax.jit(
            lambda mask, c, fun=fun: fun(mask, c))(
                jnp.asarray(maskh), (key, v, fb))
        cnt = int(count)
        exact = (cnt == int(maskh.sum()) and
                 np.array_equal(np.asarray(ok[:cnt]),
                                np.asarray(key)[maskh]) and
                 np.array_equal(np.asarray(ov[:cnt]),
                                np.asarray(v)[maskh]) and
                 np.array_equal(np.asarray(ofb[:cnt]),
                                np.asarray(fb)[maskh]))
        _record(f"compact_{name}_ab6", ms=round(per * 1e3, 2),
                mrows_s=round(n / per / 1e6, 1), exact=bool(exact),
                times=[round(x, 3) for x in times])


def op_compact9():
    """v9 (sublane-roll router) vs v7 champion at the flagship shape."""
    import jax.numpy as jnp

    from arrow1_tpu.kernels.compaction_v7 import compact_v7
    from arrow1_tpu.kernels.compaction_v9 import compact_v9

    m = M()
    rng = np.random.default_rng(0)
    variants = [
        ("v9t8_r128", lambda mk, c: compact_v9(mk, c, rows=128,
                                               t_tiles=8)),
        ("v9t4_r128", lambda mk, c: compact_v9(mk, c, rows=128,
                                               t_tiles=4)),
        ("v9t16_r128", lambda mk, c: compact_v9(mk, c, rows=128,
                                                t_tiles=16)),
        ("v9t16_r64", lambda mk, c: compact_v9(mk, c, rows=64,
                                               t_tiles=16)),
        ("v7t8_r64b", lambda mk, c: compact_v7(mk, c, rows=64,
                                               t_tiles=8)),
    ]
    TILE = 256 * 128 * 16
    n = 10_000_000 // TILE * TILE
    key = jnp.asarray(rng.integers(0, 1 << 40, n).astype(np.int64))
    v = jnp.asarray(rng.integers(-(1 << 30), 1 << 30, n).astype(np.int64))
    fb = jnp.asarray(rng.standard_normal(n).view(np.int64))
    f = np.asarray(fb).view(np.float64)
    maskh = (f > 0.0) & (np.asarray(v) > 0)
    done = {k for k in _load() if k.startswith("compact_v9")}
    for name, fun in variants:
        if f"compact_{name}_ab6" in done:
            continue
        def fn(i, key, v, fb, fun=fun):
            ff = jax.lax.bitcast_convert_type(fb, jnp.float64)
            mask = (ff > i.astype(jnp.float64) * 1e-12) & (
                v > jnp.int64(0))
            (ok, ov, ofb), count = fun(mask, (key, v, fb))
            return (count.astype(jnp.float64) +
                    jnp.sum(ok).astype(jnp.float64) +
                    jnp.sum(ov).astype(jnp.float64))

        try:
            per, times = m.timed(fn, (key, v, fb), inner=8)
        except Exception as e:
            _record(f"compact_{name}_ab6", error=repr(e)[:300])
            continue
        (ok, ov, ofb), count = jax.jit(
            lambda mask, c, fun=fun: fun(mask, c))(
                jnp.asarray(maskh), (key, v, fb))
        cnt = int(count)
        exact = (cnt == int(maskh.sum()) and
                 np.array_equal(np.asarray(ok[:cnt]),
                                np.asarray(key)[maskh]) and
                 np.array_equal(np.asarray(ov[:cnt]),
                                np.asarray(v)[maskh]) and
                 np.array_equal(np.asarray(ofb[:cnt]),
                                np.asarray(fb)[maskh]))
        _record(f"compact_{name}_ab6", ms=round(per * 1e3, 2),
                mrows_s=round(n / per / 1e6, 1), exact=bool(exact),
                times=[round(x, 3) for x in times])



def op_compact10():
    """v10 (sublane-scan prefix) vs v9 at the flagship shape."""
    import jax.numpy as jnp

    from arrow1_tpu.kernels.compaction_v10 import compact_v10
    from arrow1_tpu.kernels.compaction_v9 import compact_v9

    m = M()
    rng = np.random.default_rng(0)
    variants = [
        ("v10t8_r128", lambda mk, c: compact_v10(mk, c, rows=128,
                                                 t_tiles=8)),
        ("v10t16_r128", lambda mk, c: compact_v10(mk, c, rows=128,
                                                  t_tiles=16)),
        ("v10t4_r128", lambda mk, c: compact_v10(mk, c, rows=128,
                                                 t_tiles=4)),
    ]
    TILE = 256 * 128 * 16
    n = 10_000_000 // TILE * TILE
    key = jnp.asarray(rng.integers(0, 1 << 40, n).astype(np.int64))
    v = jnp.asarray(rng.integers(-(1 << 30), 1 << 30, n).astype(np.int64))
    fb = jnp.asarray(rng.standard_normal(n).view(np.int64))
    f = np.asarray(fb).view(np.float64)
    maskh = (f > 0.0) & (np.asarray(v) > 0)
    done = {k for k in _load() if k.startswith("compact_v10")}
    for name, fun in variants:
        if f"compact_{name}_ab6" in done:
            continue
        def fn(i, key, v, fb, fun=fun):
            ff = jax.lax.bitcast_convert_type(fb, jnp.float64)
            mask = (ff > i.astype(jnp.float64) * 1e-12) & (
                v > jnp.int64(0))
            (ok, ov, ofb), count = fun(mask, (key, v, fb))
            return (count.astype(jnp.float64) +
                    jnp.sum(ok).astype(jnp.float64) +
                    jnp.sum(ov).astype(jnp.float64))

        try:
            per, times = m.timed(fn, (key, v, fb), inner=8)
        except Exception as e:
            _record(f"compact_{name}_ab6", error=repr(e)[:300])
            continue
        (ok, ov, ofb), count = jax.jit(
            lambda mask, c, fun=fun: fun(mask, c))(
                jnp.asarray(maskh), (key, v, fb))
        cnt = int(count)
        exact = (cnt == int(maskh.sum()) and
                 np.array_equal(np.asarray(ok[:cnt]),
                                np.asarray(key)[maskh]) and
                 np.array_equal(np.asarray(ov[:cnt]),
                                np.asarray(v)[maskh]) and
                 np.array_equal(np.asarray(ofb[:cnt]),
                                np.asarray(fb)[maskh]))
        _record(f"compact_{name}_ab6", ms=round(per * 1e3, 2),
                mrows_s=round(n / per / 1e6, 1), exact=bool(exact),
                times=[round(x, 3) for x in times])


def op_compact11():
    """v11 (OR-merge routing butterfly) at the flagship shape."""
    import jax.numpy as jnp

    from arrow1_tpu.kernels.compaction_v11 import compact_v11
    from arrow1_tpu.kernels.compaction_v9 import compact_v9

    m = M()
    rng = np.random.default_rng(0)
    variants = [
        ("v11t8_r128", lambda mk, c: compact_v11(mk, c, rows=128,
                                                 t_tiles=8)),
        ("v11t16_r128", lambda mk, c: compact_v11(mk, c, rows=128,
                                                  t_tiles=16)),
        ("v11t4_r128", lambda mk, c: compact_v11(mk, c, rows=128,
                                                 t_tiles=4)),
    ]
    TILE = 256 * 128 * 16
    n = 10_000_000 // TILE * TILE
    key = jnp.asarray(rng.integers(0, 1 << 40, n).astype(np.int64))
    v = jnp.asarray(rng.integers(-(1 << 30), 1 << 30, n).astype(np.int64))
    fb = jnp.asarray(rng.standard_normal(n).view(np.int64))
    f = np.asarray(fb).view(np.float64)
    maskh = (f > 0.0) & (np.asarray(v) > 0)
    done = {k for k in _load() if k.startswith("compact_v11")}
    for name, fun in variants:
        if f"compact_{name}_ab6" in done:
            continue
        def fn(i, key, v, fb, fun=fun):
            ff = jax.lax.bitcast_convert_type(fb, jnp.float64)
            mask = (ff > i.astype(jnp.float64) * 1e-12) & (
                v > jnp.int64(0))
            (ok, ov, ofb), count = fun(mask, (key, v, fb))
            return (count.astype(jnp.float64) +
                    jnp.sum(ok).astype(jnp.float64) +
                    jnp.sum(ov).astype(jnp.float64))

        try:
            per, times = m.timed(fn, (key, v, fb), inner=8)
        except Exception as e:
            _record(f"compact_{name}_ab6", error=repr(e)[:300])
            continue
        (ok, ov, ofb), count = jax.jit(
            lambda mask, c, fun=fun: fun(mask, c))(
                jnp.asarray(maskh), (key, v, fb))
        cnt = int(count)
        exact = (cnt == int(maskh.sum()) and
                 np.array_equal(np.asarray(ok[:cnt]),
                                np.asarray(key)[maskh]) and
                 np.array_equal(np.asarray(ov[:cnt]),
                                np.asarray(v)[maskh]) and
                 np.array_equal(np.asarray(ofb[:cnt]),
                                np.asarray(fb)[maskh]))
        _record(f"compact_{name}_ab6", ms=round(per * 1e3, 2),
                mrows_s=round(n / per / 1e6, 1), exact=bool(exact),
                times=[round(x, 3) for x in times])



def main():
    jobs = sys.argv[1:] or ["groupby3", "q1caps"]
    m = None
    for j in jobs:
        fn = globals().get("op_" + j)
        if fn is None:
            print("unknown job", j)
            continue
        print("=== job", j, time.strftime("%H:%M:%S"), flush=True)
        try:
            fn()
        except Exception as e:
            _record(j + "_error", error=repr(e)[:500])


if __name__ == "__main__":
    main()
