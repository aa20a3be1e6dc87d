"""Round-4 TPU measurements.

Jobs:
  join100m   BASELINE config 4 at spec scale (100M probe x 10M build,
             uniform + skewed) — unmeasured for two rounds because the
             one-program form blew the remote compiler (r3 rc=124 after
             90 min). This version is compile-light by construction:
             build / probe / materialize are SEPARATE dispatches, the
             probe is one 10M-chunk jit driven by a host loop (no
             lax.map, no fori_loop wrapper), and the persistent
             compilation cache (.jax_cache) makes retries resume.
  gbbisect   stage timings for group-by at G=1M (where do the 142 ms
             go: main variadic sort / startpos sort / seg scans).
  gbbisect2  the residual hunt: gbbisect's components sum to ~53 ms but
             the engine measures 142 — time the f64 blocked cumsum, the
             1M-sized gathers, the flag-compaction alternative, and the
             full engine path (with the startpos compaction landed
             100655a) separately.

Usage: python benchmarks/r4/measure_r4.py [job ...]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp  # noqa: E402

import arrow1_tpu  # noqa: E402,F401

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "results_tpu_r4.json")


def _record(name, **kv):
    try:
        with open(RESULTS) as f:
            res = json.load(f)
    except Exception:
        res = {}
    kv["at"] = time.strftime("%H:%M:%S")
    res[name] = kv
    with open(RESULTS, "w") as f:
        json.dump(res, f, indent=1, sort_keys=True)
    print(name, json.dumps(kv), flush=True)


def _t(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def _sync(x):
    return float(jax.device_get(jnp.asarray(x).reshape(-1)[0]))


def _overhead():
    tiny = jax.jit(lambda x: x + 1)
    x8 = jnp.zeros(8)
    _sync(tiny(x8))
    return min(_t(lambda: _sync(tiny(x8))) for _ in range(5))


def op_join100m():
    from arrow1_tpu.kernels.hashtable import (HashTable,
                                              join_build_staged,
                                              join_probe, table_bits_for)

    try:
        with open(RESULTS) as f:
            done = set(json.load(f))
    except Exception:
        done = set()
    rng = np.random.default_rng(1)
    NB = 10_000_000
    NP = 100_000_000
    CHUNK = 10_000_000
    build = jnp.asarray(rng.integers(0, NB, NB).astype(np.uint64))
    bits = table_bits_for(NB)
    ov_dispatch = _overhead()

    # ---- build: STAGED (3 dispatches — the one-jit build graph blew
    # the remote compiler two rounds running; each stage compiles
    # standalone and caches independently) ----------------------------
    def bfn(b, bits=bits):
        return join_build_staged(b, bits=bits)

    t0 = time.perf_counter()
    order, tbl = bfn(build)
    ov = int(jax.device_get(tbl.overflow))
    compile_s = time.perf_counter() - t0
    if "join100m_build_10M" not in done:
        times = []
        for _ in range(4):
            t0 = time.perf_counter()
            o2, t2 = bfn(build)
            _sync(t2.keys[0, 0])
            times.append(time.perf_counter() - t0)
        per = min(times) - 3 * ov_dispatch
        _record("join100m_build_10M", ms=round(per * 1e3, 1),
                mrows_s=round(NB / per / 1e6, 1), overflow=ov,
                compile_s=round(compile_s, 1), staged=True,
                times=[round(x, 3) for x in times])

    # ---- probe: ONE chunk jit + host loop over chunks ----------------
    @jax.jit
    def pfn(keys, pay, pk):
        t = HashTable(keys, pay, bits, 8, jnp.int32(0))
        lo, cnt = join_probe(t, pk)
        return jnp.sum(cnt), jnp.sum(lo[:8])

    for tag, mk in (("uniform",
                     lambda: rng.integers(0, NB, NP).astype(np.uint64)),
                    ("skew",
                     lambda: np.concatenate([
                         rng.integers(0, NB // 1000, NP // 2),
                         rng.integers(0, NB, NP - NP // 2)])
                     .astype(np.uint64))):
        if f"join100m_probe_{tag}" in done:
            mk()  # keep the rng stream aligned for later legs
            continue
        probe_h = mk()
        chunks = [jnp.asarray(probe_h[i:i + CHUNK])
                  for i in range(0, NP, CHUNK)]
        t0 = time.perf_counter()
        _sync(pfn(tbl.keys, tbl.payload, chunks[0])[0])
        compile_s = time.perf_counter() - t0
        times = []
        total = 0
        for _ in range(3):
            t0 = time.perf_counter()
            acc = 0.0
            for c in chunks:
                s, _ = pfn(tbl.keys, tbl.payload, c)
                acc += _sync(s)
            times.append(time.perf_counter() - t0)
            total = acc
        per = min(times) - ov_dispatch * len(chunks)
        _record(f"join100m_probe_{tag}", ms=round(per * 1e3, 1),
                mrows_s=round(NP / per / 1e6, 1),
                matches=int(total), compile_s=round(compile_s, 1),
                chunks=len(chunks),
                times=[round(x, 3) for x in times])

    # ---- materialize (left-outer first-match): payload gather --------
    @jax.jit
    def mfn(keys, pay, pk, bpay):
        t = HashTable(keys, pay, bits, 8, jnp.int32(0))
        lo, cnt = join_probe(t, pk)
        hit = cnt > 0
        val = bpay[lo]                      # first-match row gather
        val = jnp.where(hit, val, 0)
        return jnp.sum(val), jnp.sum(hit.astype(jnp.int32))

    if "join100m_materialize_louter" in done and \
            "join100m_overflow_rebuild" in done:
        return
    bpay = jnp.asarray(rng.integers(0, 1 << 30, NB).astype(np.int64))
    probe_h = rng.integers(0, NB, NP).astype(np.uint64)
    if "join100m_materialize_louter" not in done:
        chunks = [jnp.asarray(probe_h[i:i + CHUNK])
                  for i in range(0, NP, CHUNK)]
        t0 = time.perf_counter()
        _sync(mfn(tbl.keys, tbl.payload, chunks[0], bpay)[0])
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            for c in chunks:
                sres, _ = mfn(tbl.keys, tbl.payload, c, bpay)
            _sync(sres)
            times.append(time.perf_counter() - t0)
        per = min(times) - ov_dispatch * len(chunks)
        _record("join100m_materialize_louter", ms=round(per * 1e3, 1),
                mrows_s=round(NP / per / 1e6, 1),
                compile_s=round(compile_s, 1),
                times=[round(x, 3) for x in times])

    # ---- overflow -> rebuild cost at scale (VERDICT r3 weak #6) ------
    # a table deliberately one bit too small overflows; the rebuild is
    # one more build at bits+1. Record the replan cost explicitly.
    if "join100m_overflow_rebuild" not in done:
        t0 = time.perf_counter()
        _, tbl_small = bfn(build, bits=bits - 1)
        ov_small = int(jax.device_get(tbl_small.overflow))
        first_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        order, tbl2 = bfn(build)
        _sync(tbl2.keys[0, 0])
        rebuild_s = time.perf_counter() - t0
        _record("join100m_overflow_rebuild", overflowed=bool(ov_small),
                detect_s=round(first_s, 2), rebuild_s=round(rebuild_s, 3))


def op_gbbisect():
    """Where do group-by G=1M's 142 ms go? Time the two sorts and the
    seg-scan tail separately at the exact shapes the engine uses."""
    from arrow1_tpu.kernels.blockscan import cumsum_blocked

    rng = np.random.default_rng(3)
    N = 10_000_000
    G = 1_000_000
    keys = jnp.asarray(rng.integers(0, G, N).astype(np.uint64))
    vbits = jnp.asarray(rng.standard_normal(N).view(np.int64))
    ovh = _overhead()

    def timed(name, fn, *args, reps=4):
        _sync(fn(*args))
        times = [_t(lambda: _sync(fn(*args))) for _ in range(reps)]
        per = min(times) - ovh
        _record(name, ms=round(per * 1e3, 1),
                mrows_s=round(N / per / 1e6, 1),
                times=[round(x, 3) for x in times])

    # (a) the main variadic sort: u32-narrowed key + i64 payload
    @jax.jit
    def main_sort(k, v):
        k32 = k.astype(jnp.uint32)
        ks, vs = jax.lax.sort((k32, v), num_keys=1, is_stable=False)
        return ks[0].astype(jnp.float64) + vs[-1].astype(jnp.float64)

    timed("gb1m_main_sort_u32key_i64pay", main_sort, keys, vbits)

    # (a2) single fused word, no payload (embedded-id form)
    @jax.jit
    def fused_sort(k):
        iota = jax.lax.iota(jnp.uint64, N)
        w = (k << jnp.uint64(24)) | iota
        ws = jax.lax.sort(w, is_stable=False)
        return ws[0].astype(jnp.float64)

    timed("gb1m_fused_sort_u64", fused_sort, keys)

    # (b) the startpos narrow sort ((~first u8, iota i32))
    first_h = np.zeros(N, np.uint8)
    first_h[rng.random(N) < G / N] = 1
    first = jnp.asarray(1 - first_h)

    @jax.jit
    def start_sort(nf):
        iota = jnp.arange(N, dtype=jnp.int32)
        _, pos = jax.lax.sort((nf, iota), num_keys=1, is_stable=True)
        return pos[0].astype(jnp.float64)

    timed("gb1m_startpos_sort_u8", start_sort, first)

    # (c) seg-scan tail: adjacent compare + one blocked cumsum + takes
    @jax.jit
    def segtail(k, v):
        same = k[1:] == k[:-1]
        firstf = jnp.concatenate(
            [jnp.ones(1, jnp.bool_), ~same])
        c = cumsum_blocked(firstf.astype(jnp.int32))
        return c[-1].astype(jnp.float64) + v[0].astype(jnp.float64)

    timed("gb1m_segtail", segtail, keys, vbits)


def op_gbbisect2():
    """Residual bisect for group-by G=1M (engine 142 ms vs 53 ms of
    measured components): f64 cumsum emulation cost, 1M-gather cost,
    the flag-compaction alternative, and the engine end-to-end."""
    from arrow1_tpu.kernels.blockscan import cumsum_blocked
    from arrow1_tpu.kernels.compaction_v4 import compact

    rng = np.random.default_rng(3)
    N = 10_000_000
    G = 1_000_000
    vals = rng.standard_normal(N)
    v64 = jnp.asarray(vals)                      # f64
    vi32 = jnp.asarray(rng.integers(0, 1 << 30, N).astype(np.int32))
    idx = jnp.asarray(rng.integers(0, N, G).astype(np.int32))
    first_h = np.zeros(N, np.bool_)
    first_h[rng.random(N) < G / N] = True
    first_h[0] = True
    first = jnp.asarray(first_h)
    ovh = _overhead()

    try:
        with open(RESULTS) as f:
            done = set(json.load(f))
    except Exception:
        done = set()

    def timed(name, fn, *args, reps=4, inner=1):
        if name in done:        # resumable across tunnel-wedge retries
            return
        _sync(fn(*args))
        times = [_t(lambda: _sync(fn(*args))) for _ in range(reps)]
        per = (min(times) - ovh) / inner
        _record(name, ms=round(per * 1e3, 2),
                times=[round(x, 3) for x in times])

    @jax.jit
    def cs64(v):
        def body(i, a):
            return a + cumsum_blocked(v + i.astype(jnp.float64))[-1]
        return jax.lax.fori_loop(0, 4, body, jnp.float64(0))

    timed("gb1m2_cumsum_f64_10M_x4", cs64, v64, inner=4)

    @jax.jit
    def cs32(v):
        def body(i, a):
            return a + cumsum_blocked(v + i)[-1]
        return jax.lax.fori_loop(0, 4, body, jnp.int32(0))

    timed("gb1m2_cumsum_i32_10M_x4", cs32, vi32, inner=4)

    @jax.jit
    def g64(v, ix):
        def body(i, a):
            return a + jnp.sum(v[(ix + i) % N][:64])
        return jax.lax.fori_loop(0, 4, body, jnp.float64(0))

    timed("gb1m2_gather_1M_from_10M_f64_x4", g64, v64, idx, inner=4)

    @jax.jit
    def g32(v, ix):
        def body(i, a):
            return a + jnp.sum(v[(ix + i) % N][:64]).astype(jnp.int64)
        return jax.lax.fori_loop(0, 4, body, jnp.int64(0))

    timed("gb1m2_gather_1M_from_10M_i32_x4", g32, vi32, idx, inner=4)

    # flag compaction of an i32 plane (v7:8) — the gather replacement
    @jax.jit
    def fcomp(f, v):
        def body(i, a):
            (o,), cnt = compact(f, (v + i,), variant="v7:8")
            return (a + o[0].astype(jnp.int64)
                    + cnt.astype(jnp.int64))
        return jax.lax.fori_loop(0, 4, body, jnp.int64(0))

    timed("gb1m2_compact_i32_by_flag_x4", fcomp, first, vi32, inner=4)

    # f64 plane via multi-payload stable u8 sort (the f64-safe extractor)
    @jax.jit
    def fsort(f, v):
        nf = (~f).astype(jnp.uint8)
        _, c = jax.lax.sort((nf, v), num_keys=1, is_stable=True)
        return c[0]

    timed("gb1m2_sortextract_f64_by_flag", fsort, first, v64)

    # engine end-to-end at G=1M (startpos compaction landed 100655a)
    if "gb1m2_engine_sum_10M_G1M" in done:
        return
    from arrow1_tpu import dtypes as dt
    from arrow1_tpu.column import Column
    from arrow1_tpu.exec.compiled import PipelineBuilder
    from arrow1_tpu.table import RecordBatch

    keys = rng.integers(0, G, N).astype(np.int64)
    batch = RecordBatch(
        (Column(jnp.asarray(keys), dt.int64),
         Column(v64, dt.float64,
                bits=jnp.asarray(vals.view(np.int64)))),
        ("k", "v"))
    p = PipelineBuilder().group_by(
        ["k"], [("v", "sum")], max_groups=G).compile()

    def efn(i, b=batch, p=p):
        k = b.column("k")
        pert = Column(k.data + (i - i), k.dtype)
        b2 = RecordBatch((pert,) + tuple(b.columns[1:]), b.names)
        out, live, _ = p._trace(b2)
        return (jnp.sum(live).astype(jnp.float64) +
                sum(jnp.sum(jnp.where(live, c.data, 0)).astype(jnp.float64)
                    for c in out.columns))

    @jax.jit
    def ef():
        # traced loop counter keeps the two iterations distinct (no CSE)
        return jax.lax.fori_loop(
            0, 2, lambda i, acc: acc + efn(i), jnp.float64(0))

    _sync(ef())
    times = [_t(lambda: _sync(ef())) for _ in range(4)]
    per = (min(times) - ovh) / 2
    _record("gb1m2_engine_sum_10M_G1M", ms=round(per * 1e3, 1),
            mrows_s=round(N / per / 1e6, 1),
            times=[round(x, 3) for x in times])


def op_gbengine():
    """BASELINE config 2 through the compiled engine AFTER the round-4
    tail rewrite (startpos/key-word compaction + batched packed-gather
    extraction): sum and sum/count/min/max at G = 1M, 10M rows."""
    from arrow1_tpu import dtypes as dt
    from arrow1_tpu.column import Column
    from arrow1_tpu.exec.compiled import PipelineBuilder
    from arrow1_tpu.table import RecordBatch

    rng = np.random.default_rng(3)
    N = 10_000_000
    vals = rng.standard_normal(N)
    ovh = _overhead()
    try:
        with open(RESULTS) as f:
            gdone = set(json.load(f))
    except Exception:
        gdone = set()
    for aggs, tag in (([("v", "sum")], "sum"),
                      ([("v", "sum"), ("v", "count"), ("v", "min"),
                        ("v", "max")], "scmm")):
        for G in (1_000_000, 100_000):
            keys = rng.integers(0, G, N).astype(np.int64)
            if f"gb4_{tag}_10M_G{G}" in gdone:
                continue
            batch = RecordBatch(
                (Column(jnp.asarray(keys), dt.int64),
                 Column(jnp.asarray(vals), dt.float64,
                        bits=jnp.asarray(vals.view(np.int64)))),
                ("k", "v"))
            p = (PipelineBuilder()
                 .group_by(["k"], aggs, max_groups=G)
                 .compile())

            def efn(i, b=batch, p=p):
                k = b.column("k")
                pert = Column(k.data + (i - i), k.dtype)
                b2 = RecordBatch((pert,) + tuple(b.columns[1:]),
                                 b.names)
                out, live, _ = p._trace(b2)
                return (jnp.sum(live).astype(jnp.float64) +
                        sum(jnp.sum(jnp.where(live, c.data, 0))
                            .astype(jnp.float64) for c in out.columns))

            inner = 2

            @jax.jit
            def ef():
                return jax.lax.fori_loop(
                    0, inner, lambda i, acc: acc + efn(i),
                    jnp.float64(0))

            t0 = time.perf_counter()
            _sync(ef())
            compile_s = time.perf_counter() - t0
            times = [_t(lambda: _sync(ef())) for _ in range(4)]
            per = (min(times) - ovh) / inner
            _record(f"gb4_{tag}_10M_G{G}", ms=round(per * 1e3, 1),
                    mrows_s=round(N / per / 1e6, 1),
                    compile_s=round(compile_s, 1),
                    times=[round(x, 3) for x in times])


def op_q1():
    """tpch q1 (r3 harness shape, 10M rows, G=4096) through the engine
    AFTER the round-4 tail/kernel changes — comparable to r3's
    tpch_q1_10M_g4k (80.3 ms)."""
    from arrow1_tpu import dtypes as dt
    from arrow1_tpu.column import Column
    from arrow1_tpu.exec.compiled import PipelineBuilder
    from arrow1_tpu.expr import field
    from arrow1_tpu.table import RecordBatch

    N = 10_000_000
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

    def fn_q1(i, batch=lineitem):
        sh = batch.column("l_shipdate_days")
        pert = Column(sh.data + (i - i), sh.dtype)
        b2 = RecordBatch((pert,) + tuple(batch.columns[1:]),
                         batch.names)
        out, live, _ = q1._trace(b2)
        return (jnp.sum(live).astype(jnp.float64) +
                sum(jnp.sum(c.data).astype(jnp.float64)
                    for c in out.columns))

    ovh = _overhead()

    @jax.jit
    def step():
        return jax.lax.fori_loop(
            0, 4, lambda i, acc: acc + fn_q1(i), jnp.float64(0))

    t0 = time.perf_counter()
    _sync(step())
    compile_s = time.perf_counter() - t0
    times = [_t(lambda: _sync(step())) for _ in range(4)]
    per = (min(times) - ovh) / 4
    _record("q1_r4_10M_g4k", ms=round(per * 1e3, 2),
            mrows_s=round(N / per / 1e6, 1),
            compile_s=round(compile_s, 1),
            times=[round(x, 3) for x in times])


def op_sortmc():
    """BASELINE config 3 through the engine entry points AFTER d48b85b
    (split word packing + embedded-id unstable sort + key-decode
    materialization) — the round-3 verdict flagged that work as landed
    but unmeasured (r3 datapoints: indices 57.4 M rows/s, materialize
    55.1 M; raw packed sort 87.7 M). Keys: dict-string (1000 uniques)
    + int64 with 1% nulls. Resumable per leg."""
    from arrow1_tpu import dtypes as dt
    from arrow1_tpu.column import Column, Dictionary
    from arrow1_tpu.ops.sort import _radix_perm, materialize_sorted
    from arrow1_tpu.table import RecordBatch

    rng = np.random.default_rng(9)
    ovh = _overhead()
    try:
        with open(RESULTS) as f:
            done = set(json.load(f))
    except Exception:
        done = set()
    for N in (10_000_000, 100_000_000):
        tag = f"{N // 1_000_000}M"
        if (f"sortmc4_indices_{tag}" in done
                and f"sortmc4_materialize_{tag}" in done):
            continue
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
        inner = 2

        def fn_idx(i, batch=batch):
            c0 = batch.column("s")
            pert = Column(c0.data + (i - i).astype(c0.data.dtype),
                          c0.dtype, dictionary=c0.dictionary)
            b2 = RecordBatch((pert,) + tuple(batch.columns[1:]),
                             batch.names)
            perm = _radix_perm(
                [(b2.column(n), o) for n, o in sort_keys])
            return (perm[0].astype(jnp.float64) +
                    perm[-1].astype(jnp.float64))

        def fn_mat(i, batch=batch):
            c0 = batch.column("s")
            pert = Column(c0.data + (i - i).astype(c0.data.dtype),
                          c0.dtype, dictionary=c0.dictionary)
            b2 = RecordBatch((pert,) + tuple(batch.columns[1:]),
                             batch.names)
            out = materialize_sorted(b2, sort_keys)
            return (out.column("pay").data[0].astype(jnp.float64) +
                    jnp.sum(out.column("k").mask()[:8].astype(
                        jnp.float64)))

        for leg, fn in (("indices", fn_idx), ("materialize", fn_mat)):
            name = f"sortmc4_{leg}_{tag}"
            if name in done:
                continue

            @jax.jit
            def step(fn=fn):
                return jax.lax.fori_loop(
                    0, inner, lambda i, acc: acc + fn(i),
                    jnp.float64(0))

            t0 = time.perf_counter()
            _sync(step())
            compile_s = time.perf_counter() - t0
            times = [_t(lambda: _sync(step())) for _ in range(3)]
            per = (min(times) - ovh) / inner
            _record(name, ms=round(per * 1e3, 1),
                    mrows_s=round(N / per / 1e6, 1),
                    compile_s=round(compile_s, 1),
                    times=[round(x, 3) for x in times])


JOBS = {"join100m": op_join100m, "gbbisect": op_gbbisect,
        "gbbisect2": op_gbbisect2, "gbengine": op_gbengine,
        "q1": op_q1, "sortmc": op_sortmc}


def main():
    for job in (sys.argv[1:] or ["gbbisect"]):
        JOBS[job]()


if __name__ == "__main__":
    main()
