"""Round-5 TPU measurements.

Jobs:
  join100m_engine  BASELINE config 4 ENGINE-grade (VERDICT r4 #2): the
                   real ops/join.py path (multi-match expansion,
                   unmatched-null emission) at 100M probe x 10M build,
                   uniform + skewed, inner + left outer. Parity: total
                   pair count + a key-grouped payload checksum
                   sum_k PV_k * BW_k (exact int64 wraparound) vs a
                   numpy host oracle, plus row-exact comparison on a
                   deterministic 1M probe slice.
  gb5staged        staged group-by (exec/staged_groupby.py) at G=1M,
                   10M rows: runtime (the fused program measured
                   27.2 ms at 367.9 M rows/s) with per-dispatch
                   overhead accounting.
  gb5cold          same, but against a FRESH compile cache in a
                   subprocess: the honest cold-compile number the
                   fused program paid 1552 s for (VERDICT r4 #4 done
                   bar: < 120 s).

Usage: python benchmarks/r5/measure_r5.py [job ...]
"""

import json
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402

if os.environ.get("A1T_R5_FRESH_CACHE"):
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["A1T_R5_FRESH_CACHE"])
else:
    jax.config.update("jax_compilation_cache_dir",
                      "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp  # noqa: E402

import arrow1_tpu  # noqa: E402,F401

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "results_tpu_r5.json")


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


def _overhead():
    tiny = jax.jit(lambda x: x + 1)
    x8 = jnp.zeros(8)
    float(jax.device_get(tiny(x8)[0]))
    return min(_t(lambda: float(jax.device_get(tiny(x8)[0])))
               for _ in range(5))


# ---------------------------------------------------------------------
# config 4, engine grade
# ---------------------------------------------------------------------

def _join_data(kind, npr=100_000_000, nb=10_000_000,
               scale=1):
    """Build: 8M singleton keys + 1M doubled keys (multi-match is real).
    Probe: uniform over [0, 12M) (so ~25% of probes have no match —
    left outer emits them with nulls); 'skew' routes 10% of probes to
    ONE hot (doubled) key."""
    rng = np.random.default_rng(42)
    npr, nb = npr // scale, nb // scale
    single, uniq, dom = (8_000_000 // scale, 9_000_000 // scale,
                         12_000_000 // scale)
    bk = np.concatenate([np.arange(single, dtype=np.int64),
                         np.tile(np.arange(single, uniq,
                                           dtype=np.int64), 2)])
    rng.shuffle(bk)
    bw = rng.integers(0, 1 << 20, nb).astype(np.int64)
    pk = rng.integers(0, dom, npr).astype(np.int64)
    if kind == "skew":
        hot = np.int64((single + uniq) // 2)  # a doubled key
        sel = rng.random(npr) < 0.10
        pk[sel] = hot
    pv = rng.integers(0, 1 << 20, npr).astype(np.int64)
    return pk, pv, bk, bw


def _oracle_counts_checksum(pk, pv, bk, bw, outer):
    """count + sum_k PV_k*BW_k with int64 wraparound, via bincount.

    Per-key sums stay < 2^53 (values < 2^20, hot-key count <= 10M) so
    float64 bincount weights are exact integers; the cross products
    wrap mod 2^64 exactly like the device-side int64 checksum."""
    dom = int(max(pk.max(), bk.max())) + 1
    cnt_b = np.bincount(bk, minlength=dom)
    cnt_p = np.bincount(pk, minlength=dom)
    sum_bw = np.bincount(bk, weights=bw.astype(np.float64),
                         minlength=dom).astype(np.int64)
    sum_pv = np.bincount(pk, weights=pv.astype(np.float64),
                         minlength=dom).astype(np.int64)
    with np.errstate(over="ignore"):
        pairs = int((cnt_p * cnt_b).sum())
        checksum = np.int64((sum_pv * sum_bw).sum())
        total = pairs
        n_null = 0
        null_pv = np.int64(0)
        if outer:
            unmatched = cnt_b == 0
            n_null = int(cnt_p[unmatched].sum())
            null_pv = np.int64(sum_pv[unmatched].sum())
            total = pairs + n_null
    return total, checksum, n_null, null_pv


def _oracle_slice_rows(pk, pv, bk, bw, outer, lo, hi):
    """Row-exact expected output for probe rows [lo, hi): engine order
    is probe order, matches in build order (ops/join.py docstring)."""
    order = np.argsort(bk, kind="stable")
    bks = bk[order]
    ls = np.searchsorted(bks, pk[lo:hi], side="left")
    rs = np.searchsorted(bks, pk[lo:hi], side="right")
    cnt = rs - ls
    emit = np.maximum(cnt, 1) if outer else cnt
    out_k, out_pv, out_bw, out_valid = [], [], [], []
    for i in range(hi - lo):
        if cnt[i] == 0:
            if outer:
                out_k.append(pk[lo + i])
                out_pv.append(pv[lo + i])
                out_bw.append(0)
                out_valid.append(False)
            continue
        for j in range(ls[i], rs[i]):
            out_k.append(pk[lo + i])
            out_pv.append(pv[lo + i])
            out_bw.append(bw[order[j]])
            out_valid.append(True)
    return (np.array(out_k, np.int64), np.array(out_pv, np.int64),
            np.array(out_bw, np.int64), np.array(out_valid, bool))


def op_join100m_engine():
    import arrow1_tpu as a1t
    from arrow1_tpu import dtypes as dt
    from arrow1_tpu.column import Column
    from arrow1_tpu.table import RecordBatch

    ovh = _overhead()
    try:
        with open(RESULTS) as f:
            done = set(json.load(f))
    except Exception:
        done = set()
    for kind in ("uniform", "skew"):
        pk, pv, bk, bw = _join_data(kind)
        npr = pk.shape[0]
        probe = RecordBatch(
            (Column(jnp.asarray(pk), dt.int64),
             Column(jnp.asarray(pv), dt.int64)), ("k", "pv"))
        build = RecordBatch(
            (Column(jnp.asarray(bk), dt.int64),
             Column(jnp.asarray(bw), dt.int64)), ("k", "bw"))
        for jt, tag in (("inner", "inner"), ("left outer", "louter")):
            name = f"join100m_engine_{tag}_{kind}"
            if name in done:
                continue
            outer = jt == "left outer"
            exp_total, exp_ck, exp_nnull, exp_nullpv = \
                _oracle_counts_checksum(pk, pv, bk, bw, outer)

            t0 = time.perf_counter()
            out = a1t.join(probe, build, keys=["k"], join_type=jt)
            jax.block_until_ready(out.column("pv").data)
            t_first = time.perf_counter() - t0
            times = [t_first]
            for _ in range(2):
                t0 = time.perf_counter()
                out = a1t.join(probe, build, keys=["k"], join_type=jt)
                jax.block_until_ready(out.column("pv").data)
                times.append(time.perf_counter() - t0)

            got_total = out.num_rows
            opv = out.column("pv").data
            obw = out.column("bw").data
            bvalid = out.column("bw").validity
            if bvalid is None:
                bvalid = jnp.ones(got_total, jnp.bool_)
            with np.errstate(over="ignore"):
                ck = jnp.sum(jnp.where(bvalid, opv * obw, 0))
                nnull = jnp.sum(~bvalid)
                nullpv = jnp.sum(jnp.where(bvalid, 0, opv))
            got_ck = np.uint64(jax.device_get(
                ck.astype(jnp.uint64))).astype(np.int64)
            got_nnull = int(jax.device_get(nnull))
            got_nullpv = np.uint64(jax.device_get(
                nullpv.astype(jnp.uint64))).astype(np.int64)

            # row-exact slice: probe rows [0, 1M)
            SL = 1_000_000
            sl_probe = RecordBatch(
                (Column(jnp.asarray(pk[:SL]), dt.int64),
                 Column(jnp.asarray(pv[:SL]), dt.int64)), ("k", "pv"))
            sl_out = a1t.join(sl_probe, build, keys=["k"], join_type=jt)
            ek, epv, ebw, evalid = _oracle_slice_rows(
                pk, pv, bk, bw, outer, 0, SL)
            gk = np.asarray(jax.device_get(sl_out.column("k").data))
            gpv = np.asarray(jax.device_get(sl_out.column("pv").data))
            gbw = np.asarray(jax.device_get(sl_out.column("bw").data))
            gv = sl_out.column("bw").validity
            gv = (np.ones(len(gk), bool) if gv is None
                  else np.asarray(jax.device_get(gv)))
            rows_exact = (len(gk) == len(ek)
                          and bool(np.array_equal(gk, ek))
                          and bool(np.array_equal(gpv, epv))
                          and bool(np.array_equal(gv, evalid))
                          and bool(np.array_equal(gbw[gv],
                                                  ebw[evalid])))

            per = max(min(times) - ovh, 1e-9)
            _record(name,
                    s=round(per, 3),
                    mrows_s=round(npr / per / 1e6, 1),
                    out_rows=int(got_total),
                    count_parity=bool(got_total == exp_total),
                    checksum_parity=bool(got_ck == exp_ck),
                    null_parity=bool(got_nnull == exp_nnull
                                     and got_nullpv == exp_nullpv),
                    slice1m_rows_exact=bool(rows_exact),
                    times=[round(t, 3) for t in times])
            del out, sl_out
        del probe, build


# ---------------------------------------------------------------------
# staged group-by
# ---------------------------------------------------------------------

def _gb5_run(record_name):
    from arrow1_tpu import dtypes as dt
    from arrow1_tpu.column import Column
    from arrow1_tpu.exec.staged_groupby import staged_group_by
    from arrow1_tpu.table import RecordBatch

    rng = np.random.default_rng(3)
    N, G = 10_000_000, 1_000_000
    keys = rng.integers(0, G, N).astype(np.int64)
    vals = rng.standard_normal(N)
    batch = RecordBatch(
        (Column(jnp.asarray(keys), dt.int64),
         Column(jnp.asarray(vals), dt.float64,
                bits=jnp.asarray(vals.view(np.int64)))),
        ("k", "v"))
    ovh = _overhead()
    for aggs, tag, ndisp in (([("v", "sum")], "sum", 10),
                             ([("v", "sum"), ("v", "count"),
                               ("v", "min"), ("v", "max")], "scmm", 14)):
        t0 = time.perf_counter()
        out, gv, ovf = staged_group_by(batch, ["k"], aggs, max_groups=G)
        jax.block_until_ready(out.column("k").data)
        cold_s = time.perf_counter() - t0

        def run():
            out, gv, _ = staged_group_by(batch, ["k"], aggs,
                                         max_groups=G)
            jax.block_until_ready(out.column("k").data)

        times = [_t(run) for _ in range(4)]
        raw = min(times)
        # dispatches are ASYNC (the host enqueues the next stage while
        # the device runs the previous one), so per-dispatch tunnel
        # latency OVERLAPS device time: raw wall is an UPPER bound on
        # device time and raw - ndisp*ovh a (possibly vacuous) lower
        # bound. Report both; rows/s uses the honest upper bound.
        lower = max(raw - ndisp * ovh, 0.0)
        ng = int(jax.device_get(jnp.sum(gv)))
        _record(f"{record_name}_{tag}", first_call_s=round(cold_s, 1),
                ms_raw=round(raw * 1e3, 1),
                ms_device_lower_bound=round(lower * 1e3, 1),
                mrows_s=round(N / raw / 1e6, 1),
                n_dispatches=ndisp, overhead_ms=round(ovh * 1e3, 1),
                num_groups=ng, overflow=bool(ovf),
                times=[round(t, 3) for t in times])


def op_gb5staged():
    _gb5_run("gb5staged")


def op_gb5cold():
    """Re-exec in a subprocess against a FRESH compile cache: the
    honest cold-compile wall (VERDICT done bar: < 120 s)."""
    with tempfile.TemporaryDirectory() as td:
        env = dict(os.environ, A1T_R5_FRESH_CACHE=td)
        t0 = time.perf_counter()
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "gb5coldinner"],
            env=env, capture_output=True, text=True, timeout=3000)
        wall = time.perf_counter() - t0
        ok = p.returncode == 0
        _record("gb5cold", wall_s=round(wall, 1), ok=ok,
                tail=p.stdout[-300:] if ok else p.stderr[-300:])


def op_gb5coldinner():
    _gb5_run("gb5cold_inner")


JOBS = {"join100m_engine": op_join100m_engine,
        "gb5staged": op_gb5staged, "gb5cold": op_gb5cold,
        "gb5coldinner": op_gb5coldinner}



# ---------------------------------------------------------------------
# VERDICT r4 #5: probe/build toward bandwidth
# ---------------------------------------------------------------------

def op_join5perf():
    """Flat PackedTable probe (kernels/hashtable.py) at 100M x 10M —
    the r5 layout fix: the [2^bits, ways] u64 table tiles (8,128) on
    TPU and pads 16x (the engine-grade run OOMed on it); the flat
    1-D form probes with ONE windowed gather per key. Plus per-stage
    staged-build timings (where do the 1.62 s go)."""
    from arrow1_tpu.kernels.hashtable import (join_build_packed,
                                              probe_packed,
                                              table_bits_for)

    rng = np.random.default_rng(1)
    NB = 10_000_000
    NP = 100_000_000
    CHUNK = 4_000_000
    build = jnp.asarray(rng.integers(0, NB, NB).astype(np.uint64))
    bits = table_bits_for(NB)
    ovh = _overhead()

    while True:
        order, pt, ovf = join_build_packed(build, bits=bits)
        if int(jax.device_get(ovf)) == 0:
            break
        bits += 1
    jax.block_until_ready(pt.words)

    pfn = jax.jit(lambda w, pk: (lambda lo, cnt:
                                 (jnp.sum(cnt), jnp.sum(lo[:8])))(
        *probe_packed(type(pt)(w, pt.bits, pt.ways), pk)))

    probe_h = rng.integers(0, NB, NP).astype(np.uint64)
    chunks = [jnp.asarray(probe_h[i:i + CHUNK])
              for i in range(0, NP, CHUNK)]
    t0 = time.perf_counter()
    float(jax.device_get(pfn(pt.words, chunks[0])[0]))
    compile_s = time.perf_counter() - t0
    times = []
    total = 0
    for _ in range(3):
        t0 = time.perf_counter()
        acc = 0.0
        for c in chunks:
            sres, _ = pfn(pt.words, c)
            acc += float(jax.device_get(sres))
        times.append(time.perf_counter() - t0)
        total = acc
    per = min(times) - ovh * len(chunks)
    _record("join5_probe_packed_uniform", ms=round(per * 1e3, 1),
            mrows_s=round(NP / per / 1e6, 1), matches=int(total),
            bits=bits, compile_s=round(compile_s, 1),
            chunks=len(chunks),
            times=[round(x, 3) for x in times])

    # per-stage staged-build timing: which dispatch is the 1.62 s?
    from arrow1_tpu.kernels import hashtable as ht

    stage_times = {}

    def t_of(name, fn, *args):
        out = fn(*args)
        jax.block_until_ready(out)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(*args)
            jax.block_until_ready(out)
            ts.append(time.perf_counter() - t0)
        stage_times[name] = round((min(ts) - ovh) * 1e3, 1)
        return out

    bs, ks, order_s = t_of("sort", ht._jb_sort, build, bits)
    t_of("runs", ht._jb_runs, bs, ks)
    t_of("full_packed_build",
         lambda b: ht.join_build_packed(b, bits=bits), build)
    _record("join5_build_stages", **stage_times)


JOBS["join5perf"] = op_join5perf


def op_overflow5():
    """Clean overflow->replan timing (VERDICT r4 Weak #4: r4's
    detect_s=54.6 conflated the bits-1 variant's COMPILE with
    detection). Phase 0 compiles both table sizes untimed; the timed
    cycle is detect (run small + read the flag) then rebuild."""
    from arrow1_tpu.kernels.hashtable import (join_build_staged,
                                              table_bits_for)

    rng = np.random.default_rng(1)
    NB = 10_000_000
    build = jnp.asarray(rng.integers(0, NB, NB).astype(np.uint64))
    bits = table_bits_for(NB)
    ovh = _overhead()

    # phase 0: warm both program sizes (compile excluded from timings)
    _, t_small = join_build_staged(build, bits=bits - 1)
    jax.block_until_ready(t_small.keys)
    _, t_full = join_build_staged(build, bits=bits)
    jax.block_until_ready(t_full.keys)

    det, reb = [], []
    for _ in range(3):
        t0 = time.perf_counter()
        _, ts = join_build_staged(build, bits=bits - 1)
        ov = int(jax.device_get(ts.overflow))   # the host-sync detect
        det.append(time.perf_counter() - t0)
        assert ov > 0
        t0 = time.perf_counter()
        _, tf = join_build_staged(build, bits=bits)
        jax.block_until_ready(tf.keys)
        reb.append(time.perf_counter() - t0)
    _record("join5_overflow_replan",
            detect_s=round(min(det) - 3 * ovh, 3),
            rebuild_s=round(min(reb) - 3 * ovh, 3),
            overflowed=True)


JOBS["overflow5"] = op_overflow5


if __name__ == "__main__":
    for job in (sys.argv[1:] or ["gb5staged", "join100m_engine"]):
        JOBS[job]()
