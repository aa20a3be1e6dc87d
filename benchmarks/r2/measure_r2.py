"""Round-2 TPU operator measurements (VERDICT #4: measure everything).

Usage: python benchmarks/r2/measure_r2.py <op> [<op> ...]
Ops: probe compact join groupby sort sortmerge rowgather broadcast segsum

Each op appends/overwrites its entries in benchmarks/r2/results_tpu_r2.json.
Methodology: K kernel executions inside ONE jitted dispatch (fori_loop with
a per-iteration perturbation so nothing is loop-invariant), minus the
measured dispatch floor, divided by K — the axon tunnel's ~28 ms dispatch
latency would otherwise swamp ms-scale kernels. Run each op under a shell
`timeout`: the remote compile service can wedge for hours (BENCH_NOTES.md).
"""

import json
import os
import sys
import time

import jax
import numpy as np

jax.config.update("jax_enable_x64", True)
# Persistent compilation cache: a timed-out op's compile work survives into
# the retry process (the axon remote-compile step is the 25-min killer).
try:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception as e:  # cache support is best-effort
    print("compilation cache unavailable:", e, flush=True)

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

RESULTS = os.path.join(os.path.dirname(__file__), "results_tpu_r2.json")


def _load():
    try:
        with open(RESULTS) as f:
            return json.load(f)
    except Exception:
        return {}


def _save(d):
    with open(RESULTS, "w") as f:
        json.dump(d, f, indent=1, sort_keys=True)


def _record(name, **kv):
    d = _load()
    kv["at"] = time.strftime("%H:%M:%S")
    d[name] = kv
    _save(d)
    print(name, json.dumps(kv), flush=True)


def _t(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


class M:
    """Measurement harness: dispatch floor + timed jitted loops."""

    def __init__(self):
        import jax
        import jax.numpy as jnp

        self.jax, self.jnp = jax, jnp
        tiny = jax.jit(lambda x: x + 1)
        x8 = jnp.zeros(8)
        float(jax.device_get(tiny(x8)[0]))
        self.floor = min(_t(lambda: float(jax.device_get(tiny(x8)[0])))
                         for _ in range(5))
        print(f"dispatch floor {self.floor*1e3:.1f} ms", flush=True)

    def timed(self, fn, args, inner, reps=4):
        """fn(i, *args) -> scalar; runs fori_loop(inner) in one jit."""
        jax, jnp = self.jax, self.jnp

        @jax.jit
        def step(*a):
            def body(i, acc):
                return acc + fn(i, *a)

            return jax.lax.fori_loop(0, inner, body, jnp.float64(0.0))

        float(jax.device_get(step(*args)))  # compile+warm
        times = [_t(lambda: float(jax.device_get(step(*args))))
                 for _ in range(reps)]
        per = max(min(times) - self.floor, 1e-9) / inner
        return per, sorted(times)


def op_probe():
    import jax
    import jax.numpy as jnp

    t0 = time.perf_counter()
    v = float(jax.device_get(jnp.sum(jnp.arange(16))))
    dt_ = time.perf_counter() - t0
    dev = str(jax.devices()[0])
    _record("probe", ok=(v == 120.0), seconds=round(dt_, 2), device=dev)


def op_compact():
    import jax.numpy as jnp

    from arrow1_tpu.kernels.compaction_v4 import compact_v4

    m = M()
    jnp_ = jnp
    N = 10_000_000
    rng = np.random.default_rng(0)
    for R in (8, 32, 64, 128):
        TILE = R * 128
        n = N // TILE * TILE
        key = jnp_.asarray(rng.integers(0, 1 << 40, n).astype(np.int64))
        v = jnp_.asarray(rng.integers(-(1 << 30), 1 << 30, n).astype(np.int64))
        fb = jnp_.asarray(rng.standard_normal(n).view(np.int64))

        def fn(i, key, v, fb, R=R):
            f = m.jax.lax.bitcast_convert_type(fb, jnp_.float64)
            mask = (f > i.astype(jnp_.float64) * 1e-12) & (v > jnp_.int64(0))
            (ok, ov, ofb), count = compact_v4(mask, (key, v, fb), rows=R)
            return (count.astype(jnp_.float64) +
                    jnp_.sum(ok).astype(jnp_.float64) +
                    jnp_.sum(ov).astype(jnp_.float64))

        per, times = m.timed(fn, (key, v, fb), inner=8)
        # exactness check once per R (host oracle)
        f = np.asarray(fb).view(np.float64)
        maskh = (f > 0.0) & (np.asarray(v) > 0)
        import jax

        (ok, ov, ofb), count = jax.jit(
            lambda mask, c: compact_v4(mask, c, rows=R))(
                jnp_.asarray(maskh), (key, v, fb))
        cnt = int(count)
        exact = (cnt == int(maskh.sum()) and
                 np.array_equal(np.asarray(ok[:cnt]),
                                np.asarray(key)[maskh]) and
                 np.array_equal(np.asarray(ov[:cnt]),
                                np.asarray(v)[maskh]) and
                 np.array_equal(np.asarray(ofb[:cnt]),
                                np.asarray(fb)[maskh]))
        _record(f"compact_v4_r{R}", n=n, ms=round(per * 1e3, 2),
                mrows_s=round(n / per / 1e6, 1), exact=bool(exact),
                times=[round(x, 3) for x in times])


def op_join():
    import jax.numpy as jnp

    from arrow1_tpu.kernels.hashtable import (join_build, join_probe,
                                              table_bits_for)

    m = M()
    rng = np.random.default_rng(1)
    NB = 10_000_000
    NP = 100_000_000
    build = jnp.asarray(
        rng.integers(0, NB, NB).astype(np.uint64))
    probe = jnp.asarray(
        rng.integers(0, NB, NP).astype(np.uint64))
    bits = table_bits_for(NB)

    # build (includes the build-side sort)
    def bfn(i, build):
        order, tbl = join_build(build ^ i.astype(jnp.uint64), bits=bits)
        return (tbl.overflow.astype(jnp.float64) +
                order[0].astype(jnp.float64) + tbl.keys[0, 0].astype(
                    jnp.float64))

    per, times = m.timed(bfn, (build,), inner=4)
    _record("join_build_10M", ms=round(per * 1e3, 1),
            mrows_s=round(NB / per / 1e6, 1),
            times=[round(x, 3) for x in times])

    # probe against a fixed table. Chunked via lax.map: an unchunked
    # probe materializes [100M, ways] u64 bucket rows (12.8 GB) — the
    # chunking bounds the gather intermediate to [4M, 8] (256 MB).
    order, tbl = join_build(build, bits=bits)
    ov = int(tbl.overflow)
    CHUNK = 4_000_000

    def pfn(i, keys, pay, probe):
        from arrow1_tpu.kernels.hashtable import HashTable

        t = HashTable(keys, pay, bits, 8, jnp.int32(0))

        def one(pk):
            lo, cnt = join_probe(t, pk ^ (i.astype(jnp.uint64) &
                                          jnp.uint64(0)))
            return (jnp.sum(cnt).astype(jnp.float64) +
                    lo[0].astype(jnp.float64))

        parts = jax.lax.map(one, probe.reshape(-1, CHUNK))
        return jnp.sum(parts) + i.astype(jnp.float64)

    per, times = m.timed(pfn, (tbl.keys, tbl.payload, probe), inner=4)
    _record("join_probe_100Mx10M", overflow=ov, ms=round(per * 1e3, 1),
            mrows_s=round(NP / per / 1e6, 1),
            times=[round(x, 3) for x in times])

    # skewed probe (BASELINE config 4 calls for skewed keys): zipf-ish —
    # 50% of probes hit 0.1% of the key space
    hot = rng.integers(0, NB // 1000, NP // 2)
    cold = rng.integers(0, NB, NP - NP // 2)
    probe_skew = jnp.asarray(np.concatenate([hot, cold]).astype(np.uint64))
    per, times = m.timed(pfn, (tbl.keys, tbl.payload, probe_skew), inner=4)
    _record("join_probe_100Mx10M_skew", ms=round(per * 1e3, 1),
            mrows_s=round(NP / per / 1e6, 1),
            times=[round(x, 3) for x in times])


def op_sortmerge():
    import jax.numpy as jnp

    from arrow1_tpu.ops.padded import probe_ranges_sortmerge

    m = M()
    rng = np.random.default_rng(2)
    NB = 1_000_000
    NP = 10_000_000
    build = jnp.asarray(rng.integers(0, NB, NB))
    probe = jnp.asarray(rng.integers(0, NB, NP))

    def fn(i, probe, build):
        bo, lo, cnt = probe_ranges_sortmerge(probe + i, build)
        return (jnp.sum(cnt).astype(jnp.float64) +
                bo[0].astype(jnp.float64) + lo[0].astype(jnp.float64))

    per, times = m.timed(fn, (probe, build), inner=2)
    _record("sortmerge_probe_10Mx1M", ms=round(per * 1e3, 1),
            mrows_s=round(NP / per / 1e6, 1),
            times=[round(x, 3) for x in times])


def op_groupby():
    import jax
    import jax.numpy as jnp

    m = M()
    rng = np.random.default_rng(3)
    N = 10_000_000
    for G in (1_000, 100_000, 1_000_000):
        keys = jnp.asarray(rng.integers(0, G, N).astype(np.int64))
        vals = jnp.asarray(rng.standard_normal(N))

        def fn(i, keys, vals, G=G):
            # mirrors the engine's scatter-free grouping (ops/hash.py
            # _group_core): ONE variadic sort carries the value payload,
            # boundaries come from searchsorted on the sorted ids
            u = jax.lax.bitcast_convert_type(keys + i, jnp.uint64) \
                ^ jnp.uint64(1 << 63)
            iota = jnp.arange(N, dtype=jnp.int64)
            ks, order, xs = jax.lax.sort((u, iota, vals), num_keys=1,
                                         is_stable=True)
            first = jnp.concatenate(
                [jnp.ones(1, jnp.bool_), ks[1:] != ks[:-1]])
            gid_sorted = jnp.cumsum(first) - 1
            c = jnp.cumsum(xs)
            pos = jnp.searchsorted(gid_sorted,
                                   jnp.arange(G, dtype=gid_sorted.dtype))
            hi = jnp.concatenate(
                [pos[1:] - 1, jnp.asarray([N - 1], pos.dtype)])
            sums = c[hi] - jnp.where(pos > 0, c[jnp.maximum(pos - 1, 0)], 0.0)
            return (jnp.sum(sums) + order[0].astype(jnp.float64))

        per, times = m.timed(fn, (keys, vals), inner=4)
        _record(f"groupby_sum_10M_G{G}", ms=round(per * 1e3, 1),
                mrows_s=round(N / per / 1e6, 1),
                times=[round(x, 3) for x in times])


def op_compact5():
    """A/B: stacked-roll butterfly (v5) vs per-plane rolls (v4)."""
    import jax.numpy as jnp

    from arrow1_tpu.kernels.compaction_v4 import compact_v4
    from arrow1_tpu.kernels.compaction_v5 import compact_v5

    m = M()
    N = 10_000_000
    rng = np.random.default_rng(0)
    R = 64
    TILE = R * 128
    n = N // TILE * TILE
    key = jnp.asarray(rng.integers(0, 1 << 40, n).astype(np.int64))
    v = jnp.asarray(rng.integers(-(1 << 30), 1 << 30, n).astype(np.int64))
    fb = jnp.asarray(rng.standard_normal(n).view(np.int64))

    for name, fun in (("v5", compact_v5), ("v4", compact_v4)):
        def fn(i, key, v, fb, fun=fun):
            f = m.jax.lax.bitcast_convert_type(fb, jnp.float64)
            mask = (f > i.astype(jnp.float64) * 1e-12) & (v > jnp.int64(0))
            (ok, ov, ofb), count = fun(mask, (key, v, fb), rows=R)
            return (count.astype(jnp.float64) +
                    jnp.sum(ok).astype(jnp.float64) +
                    jnp.sum(ov).astype(jnp.float64))

        per, times = m.timed(fn, (key, v, fb), inner=8)
        # exactness once per variant
        import jax

        f = np.asarray(fb).view(np.float64)
        maskh = (f > 0.0) & (np.asarray(v) > 0)
        (ok, ov, ofb), count = jax.jit(
            lambda mask, c, fun=fun: fun(mask, c, rows=R))(
                jnp.asarray(maskh), (key, v, fb))
        cnt = int(count)
        exact = (cnt == int(maskh.sum()) and
                 np.array_equal(np.asarray(ok[:cnt]),
                                np.asarray(key)[maskh]) and
                 np.array_equal(np.asarray(ov[:cnt]),
                                np.asarray(v)[maskh]) and
                 np.array_equal(np.asarray(ofb[:cnt]),
                                np.asarray(fb)[maskh]))
        _record(f"compact_{name}_r{R}_ab", n=n, ms=round(per * 1e3, 2),
                mrows_s=round(n / per / 1e6, 1), exact=bool(exact),
                times=[round(x, 3) for x in times])


def op_compact6():
    """A/B: multi-tile stacked rolls (v6, T in {2,4,8}) vs v5 vs v4 —
    the roll-amortization pivot (BENCH_NOTES 'v6 compaction
    direction')."""
    import jax
    import jax.numpy as jnp

    from arrow1_tpu.kernels.compaction_v4 import compact_v4
    from arrow1_tpu.kernels.compaction_v5 import compact_v5
    from arrow1_tpu.kernels.compaction_v6 import compact_v6

    m = M()
    N = 10_000_000
    rng = np.random.default_rng(0)
    R = 64
    variants = [("v4", lambda mk, c: compact_v4(mk, c, rows=R)),
                ("v5", lambda mk, c: compact_v5(mk, c, rows=R))]
    for T in (2, 4, 8):
        variants.append(
            (f"v6t{T}", lambda mk, c, T=T: compact_v6(mk, c, rows=R,
                                                      t_tiles=T)))
    TILE = R * 128 * 8                # n divisible by every variant
    n = N // TILE * TILE
    key = jnp.asarray(rng.integers(0, 1 << 40, n).astype(np.int64))
    v = jnp.asarray(rng.integers(-(1 << 30), 1 << 30, n).astype(np.int64))
    fb = jnp.asarray(rng.standard_normal(n).view(np.int64))

    f = np.asarray(fb).view(np.float64)
    maskh = (f > 0.0) & (np.asarray(v) > 0)
    for name, fun in variants:
        def fn(i, key, v, fb, fun=fun):
            ff = m.jax.lax.bitcast_convert_type(fb, jnp.float64)
            mask = (ff > i.astype(jnp.float64) * 1e-12) & (v > jnp.int64(0))
            (ok, ov, ofb), count = fun(mask, (key, v, fb))
            return (count.astype(jnp.float64) +
                    jnp.sum(ok).astype(jnp.float64) +
                    jnp.sum(ov).astype(jnp.float64))

        per, times = m.timed(fn, (key, v, fb), inner=8)
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
        _record(f"compact_{name}_r{R}_ab6", n=n, ms=round(per * 1e3, 2),
                mrows_s=round(n / per / 1e6, 1), exact=bool(exact),
                times=[round(x, 3) for x in times])


def op_groupby2():
    """Engine group-by fast paths (post segsum-v2): MXU two-level
    factored one-hot for dense keys (G <= 128K), narrow-key variadic
    sort + flagged scan for G = 1M."""
    import jax
    import jax.numpy as jnp

    from arrow1_tpu.kernels.segsum2 import ColPlanes, segment_sums_mxu

    m = M()
    rng = np.random.default_rng(3)
    N = 10_000_000
    vals = rng.integers(0, 1 << 30, N).astype(np.int64)
    vlo = jnp.asarray((vals & 0xFFFFFFFF).astype(np.uint32).view(np.int32))

    for G in (1_000, 100_000):
        Gp = -(-G // 128) * 128
        keys = jnp.asarray(rng.integers(0, G, N).astype(np.int32))

        def fn(i, keys, vlo, Gp=Gp):
            gid = keys ^ (i.astype(jnp.int32) & jnp.int32(0))
            occ, res = segment_sums_mxu(
                gid, [ColPlanes((vlo,), None, 4)], Gp)
            cnt, s = res[0]
            return (jnp.sum(occ).astype(jnp.float64) +
                    jnp.sum(jax.lax.bitcast_convert_type(
                        s, jnp.int64)).astype(jnp.float64) +
                    i.astype(jnp.float64))

        per, times = m.timed(fn, (keys, vlo), inner=4)
        _record(f"groupby2_mxu_10M_G{G}", ms=round(per * 1e3, 1),
                mrows_s=round(N / per / 1e6, 1),
                times=[round(x, 3) for x in times])

    # G = 1M: narrow-key variadic sort + flagged segment scan
    G = 1_000_000
    keys32 = jnp.asarray(rng.integers(0, G, N).astype(np.uint32))
    v64 = jnp.asarray(vals)

    def fn1m(i, keys32, v64):
        ks, xs = jax.lax.sort((keys32 + i.astype(jnp.uint32), v64),
                              num_keys=1, is_stable=True)
        first = jnp.concatenate(
            [jnp.ones(1, jnp.bool_), ks[1:] != ks[:-1]])

        def comb(a, b):
            av, af = a
            bv, bf = b
            return jnp.where(bf, bv, av + bv), af | bf

        sums, _ = jax.lax.associative_scan(comb, (xs, first))
        is_end = jnp.concatenate([first[1:], jnp.ones(1, jnp.bool_)])
        return (jnp.sum(jnp.where(is_end, sums, 0)).astype(jnp.float64) +
                ks[0].astype(jnp.float64))

    per, times = m.timed(fn1m, (keys32, v64), inner=2)
    _record("groupby2_sortscan_10M_G1000000", ms=round(per * 1e3, 1),
            mrows_s=round(N / per / 1e6, 1),
            times=[round(x, 3) for x in times])


def op_sort():
    import jax
    import jax.numpy as jnp

    m = M()
    rng = np.random.default_rng(4)
    for N in (10_000_000, 100_000_000):
        keys = jnp.asarray(rng.integers(0, 1 << 40, N).astype(np.int64))

        def fn(i, keys):
            u = jax.lax.bitcast_convert_type(keys + i, jnp.uint64)
            order = jnp.argsort(u)
            return order[0].astype(jnp.float64) + order[-1].astype(
                jnp.float64)

        per, times = m.timed(fn, (keys,), inner=2)
        _record(f"argsort_u64_{N//1_000_000}M", ms=round(per * 1e3, 1),
                mrows_s=round(N / per / 1e6, 1),
                times=[round(x, 3) for x in times])


def op_sortmc():
    """BASELINE config 3: multi-column (dict-string, int64) sort keys.

    Engine path (kernels/radix.py): minimal-width packing -> variadic
    lax.sort (2 key words + iota / payloads). Baseline: classic
    lexsort = per-key stable argsort + permutation gathers."""
    import jax
    import jax.numpy as jnp

    m = M()
    rng = np.random.default_rng(8)
    for N in (10_000_000, 100_000_000):
        tag = f"{N//1_000_000}M"
        dic = jnp.asarray(rng.integers(0, 1000, N).astype(np.uint64))
        k64 = jnp.asarray(rng.integers(0, 1 << 62, N).astype(np.uint64))
        pay = jnp.asarray(rng.integers(0, 1 << 30, N).astype(np.int64))

        def eng(i, dic, k64):
            iota = jnp.arange(N, dtype=jnp.int64)
            w0 = dic ^ (i.astype(jnp.uint64) & jnp.uint64(0))
            out = jax.lax.sort((w0, k64, iota), num_keys=2,
                               is_stable=True)
            perm = out[-1]
            return (perm[0].astype(jnp.float64) +
                    perm[-1].astype(jnp.float64) + i.astype(jnp.float64))

        per, times = m.timed(eng, (dic, k64), inner=2)
        _record(f"sortmc_packed_{tag}", ms=round(per * 1e3, 1),
                mrows_s=round(N / per / 1e6, 1),
                times=[round(x, 3) for x in times])

        def eng_mat(i, dic, k64, pay):
            w0 = dic ^ (i.astype(jnp.uint64) & jnp.uint64(0))
            out = jax.lax.sort((w0, k64, pay), num_keys=2,
                               is_stable=True)
            return (out[-1][0].astype(jnp.float64) +
                    i.astype(jnp.float64))

        per, times = m.timed(eng_mat, (dic, k64, pay), inner=2)
        _record(f"sortmc_materialize_{tag}", ms=round(per * 1e3, 1),
                mrows_s=round(N / per / 1e6, 1),
                times=[round(x, 3) for x in times])

        def base(i, dic, k64, pay):
            o1 = jnp.argsort(k64 ^ (i.astype(jnp.uint64) &
                                    jnp.uint64(0)), stable=True)
            o2 = jnp.argsort(dic[o1], stable=True)
            perm = o1[o2]
            mat = pay[perm]
            return (perm[0].astype(jnp.float64) +
                    mat[0].astype(jnp.float64) + i.astype(jnp.float64))

        per, times = m.timed(base, (dic, k64, pay), inner=2)
        _record(f"sortmc_argsort_gather_{tag}", ms=round(per * 1e3, 1),
                mrows_s=round(N / per / 1e6, 1),
                times=[round(x, 3) for x in times])


def op_rowgather():
    """Queued r1 probe: do XLA row gathers move whole rows per index?"""
    import jax.numpy as jnp

    m = M()
    rng = np.random.default_rng(5)
    N = 10_000_000
    idx = jnp.asarray(rng.integers(0, N, N).astype(np.int32))
    flat = jnp.asarray(rng.integers(0, 1 << 30, N).astype(np.int32))
    packed = jnp.asarray(
        rng.integers(0, 1 << 30, (N, 6)).astype(np.int32))

    def f1(i, flat, idx):
        return jnp.sum(flat[idx + i]).astype(jnp.float64)

    per, times = m.timed(f1, (flat, idx), inner=2)
    _record("gather_1word_10M", ms=round(per * 1e3, 1),
            mrows_s=round(N / per / 1e6, 1),
            times=[round(x, 3) for x in times])

    def f6(i, packed, idx):
        return jnp.sum(packed[idx + i, :]).astype(jnp.float64)

    per, times = m.timed(f6, (packed, idx), inner=2)
    _record("gather_row6_10M", ms=round(per * 1e3, 1),
            mrows_s=round(N / per / 1e6, 1),
            times=[round(x, 3) for x in times])


def op_broadcast():
    import jax.numpy as jnp

    from arrow1_tpu.kernels.hashtable import broadcast_probe

    m = M()
    rng = np.random.default_rng(6)
    N = 10_000_000
    n = N // 16384 * 16384
    for T in (256, 1024, 2048):
        build = jnp.asarray(
            np.sort(rng.integers(0, 1 << 40, T).astype(np.uint64)))
        probe = jnp.asarray(rng.integers(0, 1 << 40, n).astype(np.uint64))

        def fn(i, build, probe):
            lo, cnt = broadcast_probe(build, probe ^ (i.astype(jnp.uint64)
                                                      & jnp.uint64(0)))
            return (jnp.sum(cnt).astype(jnp.float64) +
                    lo[0].astype(jnp.float64) + i.astype(jnp.float64))

        per, times = m.timed(fn, (build, probe), inner=4)
        _record(f"broadcast_probe_10M_T{T}", ms=round(per * 1e3, 1),
                mrows_s=round(n / per / 1e6, 1),
                times=[round(x, 3) for x in times])




def op_variadic():
    """Variadic lax.sort (key + payload operands) vs argsort+gathers —
    the design probe for sort_by/groupby/join materialization: XLA's
    sort moves payload inside the sort network (no random gather)."""
    import jax
    import jax.numpy as jnp

    m = M()
    rng = np.random.default_rng(7)
    N = 10_000_000
    key = jnp.asarray(rng.integers(0, 1 << 40, N).astype(np.int64))
    c1 = jnp.asarray(rng.integers(0, 1 << 30, N).astype(np.int64))
    c2 = jnp.asarray(rng.standard_normal(N))
    c3 = jnp.asarray(rng.integers(0, 1 << 30, N).astype(np.int32))

    def var3(i, key, c1, c2, c3):
        u = jax.lax.bitcast_convert_type(key + i, jnp.uint64)
        ks, a, b, c = jax.lax.sort((u, c1, c2, c3), num_keys=1,
                                   is_stable=True)
        return (ks[0].astype(jnp.float64) + a[0].astype(jnp.float64)
                + b[0] + c[0].astype(jnp.float64))

    per, times = m.timed(var3, (key, c1, c2, c3), inner=2)
    _record("variadic_sort_3payload_10M", ms=round(per * 1e3, 1),
            mrows_s=round(N / per / 1e6, 1),
            times=[round(x, 3) for x in times])

    def ag3(i, key, c1, c2, c3):
        u = jax.lax.bitcast_convert_type(key + i, jnp.uint64)
        order = jnp.argsort(u, stable=True)
        a, b, c = c1[order], c2[order], c3[order]
        return (order[0].astype(jnp.float64) + a[0].astype(jnp.float64)
                + b[0] + c[0].astype(jnp.float64))

    per, times = m.timed(ag3, (key, c1, c2, c3), inner=2)
    _record("argsort_gather_3payload_10M", ms=round(per * 1e3, 1),
            mrows_s=round(N / per / 1e6, 1),
            times=[round(x, 3) for x in times])

    # key-width effect: u32 keys packed with rowid vs u64 argsort
    k32 = jnp.asarray(rng.integers(0, 1 << 31, N).astype(np.uint32))

    def packed(i, k32):
        packed = (k32.astype(jnp.uint64) << jnp.uint64(32)) | (
            jnp.arange(N, dtype=jnp.uint64) ^ i.astype(jnp.uint64))
        s = jnp.sort(packed)
        return s[0].astype(jnp.float64) + s[-1].astype(jnp.float64)

    per, times = m.timed(packed, (k32,), inner=2)
    _record("packed_u64_valuesort_10M", ms=round(per * 1e3, 1),
            mrows_s=round(N / per / 1e6, 1),
            times=[round(x, 3) for x in times])




def op_join_small():
    """1M build x 10M probe — a compile-light first datapoint for the
    hash path (the 10Mx100M config repeatedly hit the 25-min window)."""
    import jax
    import jax.numpy as jnp

    from arrow1_tpu.kernels.hashtable import (join_build, join_probe,
                                              table_bits_for)

    m = M()
    rng = np.random.default_rng(1)
    NB = 1_000_000
    NP = 10_000_000
    build = jnp.asarray(rng.integers(0, NB, NB).astype(np.uint64))
    probe = jnp.asarray(rng.integers(0, NB, NP).astype(np.uint64))
    bits = table_bits_for(NB)

    def bfn(i, build):
        order, tbl = join_build(build ^ i.astype(jnp.uint64), bits=bits)
        return (tbl.overflow.astype(jnp.float64) +
                order[0].astype(jnp.float64) +
                tbl.keys[0, 0].astype(jnp.float64))

    per, times = m.timed(bfn, (build,), inner=2)
    _record("join_build_1M", ms=round(per * 1e3, 1),
            mrows_s=round(NB / per / 1e6, 1),
            times=[round(x, 3) for x in times])

    order, tbl = join_build(build, bits=bits)
    ov = int(tbl.overflow)

    def pfn(i, keys, pay, probe):
        from arrow1_tpu.kernels.hashtable import HashTable

        t = HashTable(keys, pay, bits, 8, jnp.int32(0))
        lo, cnt = join_probe(t, probe ^ (i.astype(jnp.uint64) &
                                         jnp.uint64(0)))
        return (jnp.sum(cnt).astype(jnp.float64) +
                lo[0].astype(jnp.float64) + i.astype(jnp.float64))

    per, times = m.timed(pfn, (tbl.keys, tbl.payload, probe), inner=2)
    _record("join_probe_10Mx1M", overflow=ov, ms=round(per * 1e3, 1),
            mrows_s=round(NP / per / 1e6, 1),
            times=[round(x, 3) for x in times])


def op_sortmerge_small():
    """1M probe x 100K build — compile-light sort-merge datapoint."""
    import jax.numpy as jnp

    from arrow1_tpu.ops.padded import probe_ranges_sortmerge

    m = M()
    rng = np.random.default_rng(2)
    NB = 100_000
    NP = 1_000_000
    build = jnp.asarray(rng.integers(0, NB, NB))
    probe = jnp.asarray(rng.integers(0, NB, NP))

    def fn(i, probe, build):
        bo, lo, cnt = probe_ranges_sortmerge(probe + i, build)
        return (jnp.sum(cnt).astype(jnp.float64) +
                bo[0].astype(jnp.float64) + lo[0].astype(jnp.float64))

    per, times = m.timed(fn, (probe, build), inner=2)
    _record("sortmerge_probe_1Mx100K", ms=round(per * 1e3, 1),
            mrows_s=round(NP / per / 1e6, 1),
            times=[round(x, 3) for x in times])


def op_takepacked():
    """Batch take: packed row gather vs per-column gathers (10M rows,
    6 columns: 3x i64 + f64-bits + i32 + bool validity)."""
    import jax.numpy as jnp

    import arrow1_tpu as a1t
    from arrow1_tpu import dtypes as dt
    from arrow1_tpu.column import Column
    from arrow1_tpu.ops.selection import gather_batch_packed, take_column
    from arrow1_tpu.table import RecordBatch

    m = M()
    N = 10_000_000
    rng = np.random.default_rng(0)

    def col_i64():
        return Column(jnp.asarray(rng.integers(-(1 << 40), 1 << 40, N)
                                  .astype(np.int64)), dt.int64)

    f = rng.standard_normal(N)
    cols = (col_i64(), col_i64(), col_i64(),
            Column(jnp.asarray(f), dt.float64,
                   bits=jnp.asarray(f.view(np.int64))),
            Column(jnp.asarray(rng.integers(0, 99, N).astype(np.int32)),
                   dt.int32),
            Column(jnp.asarray(rng.integers(0, 9, N).astype(np.int64)),
                   dt.int64,
                   validity=jnp.asarray(rng.integers(0, 2, N)
                                        .astype(bool))))
    batch = RecordBatch(cols, ("a", "b", "c", "f", "i", "v"))
    idx = jnp.asarray(rng.integers(0, N, N).astype(np.int32))

    def fn_packed(i, batch, idx):
        out = gather_batch_packed(batch, (idx + i) % N)
        return sum(jnp.sum(c.data).astype(jnp.float64)
                   if c.dtype.kind != "float64"
                   else jnp.sum(c.bits).astype(jnp.float64)
                   for c in out.columns)

    per, times = m.timed(fn_packed, (batch, idx), inner=4)
    _record("take_batch6_packed_10M", ms=round(per * 1e3, 2),
            rows_per_s=round(N / per), times=[round(x, 3) for x in times])

    def fn_percol(i, batch, idx):
        ix = (idx + i) % N
        out = [take_column(c, ix) for c in batch.columns]
        return sum(jnp.sum(c.data).astype(jnp.float64)
                   if c.dtype.kind != "float64"
                   else jnp.sum(c.data).astype(jnp.float64)
                   for c in out)

    per, times = m.timed(fn_percol, (batch, idx), inner=4)
    _record("take_batch6_percol_10M", ms=round(per * 1e3, 2),
            rows_per_s=round(N / per), times=[round(x, 3) for x in times])


def op_tpch():
    """End-to-end one-dispatch pipelines (VERDICT #8 / BASELINE config 5
    single chip): Q1-shape filter+group_by+sort at 10M rows; Q3-shape
    join(1M build)+group_by+sort at 10M probe rows."""
    import jax.numpy as jnp

    import arrow1_tpu as a1t
    from arrow1_tpu import dtypes as dt
    from arrow1_tpu.column import Column
    from arrow1_tpu.exec.compiled import PipelineBuilder
    from arrow1_tpu.expr import field
    from arrow1_tpu.table import RecordBatch

    m = M()
    N = 10_000_000
    rng = np.random.default_rng(0)

    def mk(arr, t=dt.int64):
        return Column(jnp.asarray(arr), t)

    ship = rng.integers(0, 5000, N).astype(np.int64)
    flag = rng.integers(0, 3, N).astype(np.int64)
    qty = rng.integers(1, 50, N).astype(np.int64)
    price_b = rng.standard_normal(N)
    lineitem = RecordBatch(
        (mk(ship), mk(flag), mk(qty),
         Column(jnp.asarray(price_b), dt.float64,
                bits=jnp.asarray(price_b.view(np.int64)))),
        ("l_shipdate_days", "l_returnflag", "l_quantity",
         "l_extendedprice"))

    q1 = (PipelineBuilder()
          .filter(field("l_shipdate_days") <= 2500)
          .group_by(["l_returnflag"],
                    [("l_quantity", "sum"), ("l_extendedprice", "sum"),
                     ("l_quantity", "count")])
          .sort([("l_returnflag", "ascending")])
          .compile())

    def fn_q1(i, batch):
        sh = batch.column("l_shipdate_days")
        pert = Column(sh.data + (i - i), sh.dtype)  # keeps i live
        b2 = RecordBatch((pert,) + tuple(batch.columns[1:]), batch.names)
        out, live, _ = q1._trace(b2)
        return (jnp.sum(live).astype(jnp.float64) +
                sum(jnp.sum(c.data).astype(jnp.float64)
                    for c in out.columns))

    per, times = m.timed(fn_q1, (lineitem,), inner=4)
    _record("tpch_q1_10M", ms=round(per * 1e3, 2),
            rows_per_s=round(N / per), times=[round(x, 3) for x in times])

    NB = 1_000_000
    orders = RecordBatch(
        (mk(np.arange(NB)), mk(rng.integers(0, 5, NB).astype(np.int64))),
        ("o_orderkey", "o_orderpriority"))
    okey = rng.integers(0, NB, N).astype(np.int64)
    lineitem3 = RecordBatch(
        (mk(okey), mk(qty),
         Column(jnp.asarray(price_b), dt.float64,
                bits=jnp.asarray(price_b.view(np.int64)))),
        ("l_orderkey", "l_quantity", "l_extendedprice"))
    q3 = (PipelineBuilder()
          .join(orders, keys=["l_orderkey"], right_keys=["o_orderkey"])
          .group_by(["o_orderpriority"],
                    [("l_extendedprice", "sum"), ("l_quantity", "count")])
          .sort([("l_extendedprice_sum", "descending")])
          .compile())

    def fn_q3(i, batch):
        k = batch.column("l_orderkey")
        pert = Column(k.data + (i - i), k.dtype)
        b2 = RecordBatch((pert,) + tuple(batch.columns[1:]), batch.names)
        out, live, _ = q3._trace(b2)
        return (jnp.sum(live).astype(jnp.float64) +
                sum(jnp.sum(c.data).astype(jnp.float64)
                    for c in out.columns))

    per, times = m.timed(fn_q3, (lineitem3,), inner=4)
    _record("tpch_q3_10Mx1M", ms=round(per * 1e3, 2),
            rows_per_s=round(N / per), times=[round(x, 3) for x in times])


def op_compact7():
    """A/B: v7 (fully batched merge/acc, compaction_v7.py) vs the best
    v6 — targets the ~4 ms of per-tile op-issue overhead the v6 stage
    ablation attributes to merge math + acc ring."""
    import jax
    import jax.numpy as jnp

    from arrow1_tpu.kernels.compaction_v7 import compact_v7

    m = M()
    N = 10_000_000
    rng = np.random.default_rng(0)
    R = 64
    variants = []
    for T in (4, 8, 16):
        variants.append(
            (f"v7t{T}", lambda mk, c, T=T: compact_v7(mk, c, rows=R,
                                                      t_tiles=T)))
    TILE = R * 128 * 16               # n divisible by every variant
    n = N // TILE * TILE
    key = jnp.asarray(rng.integers(0, 1 << 40, n).astype(np.int64))
    v = jnp.asarray(rng.integers(-(1 << 30), 1 << 30, n).astype(np.int64))
    fb = jnp.asarray(rng.standard_normal(n).view(np.int64))

    f = np.asarray(fb).view(np.float64)
    maskh = (f > 0.0) & (np.asarray(v) > 0)
    for name, fun in variants:
        def fn(i, key, v, fb, fun=fun):
            ff = m.jax.lax.bitcast_convert_type(fb, jnp.float64)
            mask = (ff > i.astype(jnp.float64) * 1e-12) & (v > jnp.int64(0))
            (ok, ov, ofb), count = fun(mask, (key, v, fb))
            return (count.astype(jnp.float64) +
                    jnp.sum(ok).astype(jnp.float64) +
                    jnp.sum(ov).astype(jnp.float64))

        per, times = m.timed(fn, (key, v, fb), inner=8)
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
        _record(f"compact_{name}_r{R}_ab6", n=n, ms=round(per * 1e3, 2),
                mrows_s=round(n / per / 1e6, 1), exact=bool(exact),
                times=[round(x, 3) for x in times])


OPS = {"variadic": op_variadic, "join_small": op_join_small,
       "takepacked": op_takepacked, "tpch": op_tpch,
       "sortmerge_small": op_sortmerge_small, "probe": op_probe, "compact": op_compact, "join": op_join,
       "sortmerge": op_sortmerge, "groupby": op_groupby,
       "groupby2": op_groupby2, "compact5": op_compact5,
       "compact6": op_compact6, "compact7": op_compact7,
       "sortmc": op_sortmc, "sort": op_sort,
       "rowgather": op_rowgather, "broadcast": op_broadcast}


if __name__ == "__main__":
    for name in sys.argv[1:]:
        OPS[name]()
