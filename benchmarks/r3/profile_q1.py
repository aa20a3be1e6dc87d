"""Round-3: stage-by-stage profile of the compiled TPC-H q1 pathology.

VERDICT r2 #1: tpch_q1_10M runs at 5.5 M rows/s while its constituent
kernels run at 278 M (MXU group-by) / 309 M (packed sort). This script
times each stage of exec/compiled.py's q1 plan in isolation, plus the
candidate replacements, so the rebuild targets the measured cost.

Usage: python benchmarks/r3/profile_q1.py <job> [...]
Jobs: filter grouping grouped_n grouped_cap sortfull sorttiny
      sortedspace direct_mxu q1_now
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


def _q1_data():
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    ship = jnp.asarray(rng.integers(0, 5000, N).astype(np.int64))
    flag = jnp.asarray(rng.integers(0, 3, N).astype(np.int64))
    qty = jnp.asarray(rng.integers(1, 50, N).astype(np.int64))
    price = rng.standard_normal(N)
    price_f = jnp.asarray(price)
    price_b = jnp.asarray(price.view(np.int64))
    return ship, flag, qty, price_f, price_b


def job_filter(m):
    import jax.numpy as jnp

    ship, flag, qty, price_f, price_b = _q1_data()

    def fn(i, ship):
        live = (ship + (i - i)) <= 2500
        return jnp.sum(live).astype(jnp.float64)

    per, times = m.timed(fn, (ship,), inner=8)
    _record("q1_stage_filter", ms=round(per * 1e3, 2),
            times=[round(x, 3) for x in times])


def job_grouping(m):
    """grouping_padded over [dead-u8, key-u64] exactly as _op_group_by."""
    import jax.numpy as jnp

    from arrow1_tpu.ops.padded import grouping_padded

    ship, flag, qty, price_f, price_b = _q1_data()

    def fn(i, ship, flag):
        live = (ship + (i - i)) <= 2500
        key = flag.astype(jnp.uint64) ^ jnp.uint64(1 << 63)
        g = grouping_padded([(~live).astype(jnp.uint8), key])
        return (jnp.sum(g.group_ids).astype(jnp.float64) +
                g.num_groups.astype(jnp.float64))

    per, times = m.timed(fn, (ship, flag), inner=2)
    _record("q1_stage_grouping", ms=round(per * 1e3, 2),
            times=[round(x, 3) for x in times])


def _grouped_block(cap):
    import jax.numpy as jnp

    from arrow1_tpu.parallel.distributed import _grouped_padded

    def fn(i, gids, live, qty, price_f):
        g = gids + (i - i).astype(jnp.int32)
        ones = jnp.ones(N, jnp.bool_)
        s1, c1 = _grouped_padded(qty, ones, live, "sum", g, cap)
        s2, c2 = _grouped_padded(price_f, ones, live, "sum", g, cap)
        c3, _ = _grouped_padded(qty, ones, live, "count", g, cap)
        return (jnp.sum(s1).astype(jnp.float64) + jnp.sum(s2) +
                jnp.sum(c3).astype(jnp.float64))

    return fn


def job_grouped_n(m):
    import jax.numpy as jnp

    ship, flag, qty, price_f, price_b = _q1_data()
    rng = np.random.default_rng(1)
    gids = jnp.asarray(rng.integers(0, 3, N).astype(np.int32))
    live = ship <= 2500
    per, times = m.timed(_grouped_block(N), (gids, live, qty, price_f),
                         inner=2)
    _record("q1_stage_grouped_capN", ms=round(per * 1e3, 2),
            times=[round(x, 3) for x in times])


def job_grouped_cap(m):
    import jax.numpy as jnp

    ship, flag, qty, price_f, price_b = _q1_data()
    rng = np.random.default_rng(1)
    gids = jnp.asarray(rng.integers(0, 3, N).astype(np.int32))
    live = ship <= 2500
    per, times = m.timed(_grouped_block(4096), (gids, live, qty, price_f),
                         inner=2)
    _record("q1_stage_grouped_cap4k", ms=round(per * 1e3, 2),
            times=[round(x, 3) for x in times])


def job_sortfull(m):
    """_op_sort equivalent: radix sort_rows over 10M-capacity state with
    q1's plane count (1 key pair + live + 7 agg/key planes)."""
    import jax.numpy as jnp

    from arrow1_tpu.kernels.radix import sort_rows

    ship, flag, qty, price_f, price_b = _q1_data()
    live = ship <= 2500

    def fn(i, flag, live, qty, price_b):
        key = (flag + (i - i)).astype(jnp.uint64)
        pairs = [((~live).astype(jnp.uint64), 1), (key, 2)]
        payloads = [live, qty, price_b, qty, flag, qty, price_b]
        out = sort_rows(pairs, payloads)
        return sum(jnp.sum(o).astype(jnp.float64) for o in out[:2])

    per, times = m.timed(fn, (flag, live, qty, price_b), inner=2)
    _record("q1_stage_sort_capN", ms=round(per * 1e3, 2),
            times=[round(x, 3) for x in times])


def job_sorttiny(m):
    import jax.numpy as jnp

    from arrow1_tpu.kernels.radix import sort_rows

    rng = np.random.default_rng(2)
    G = 4096
    key = jnp.asarray(rng.integers(0, 3, G).astype(np.uint64))
    live = jnp.asarray(rng.integers(0, 2, G).astype(bool))
    v = jnp.asarray(rng.integers(0, 100, G).astype(np.int64))

    def fn(i, key, live, v):
        pairs = [((~live).astype(jnp.uint64), 1), (key + (i - i), 2)]
        out = sort_rows(pairs, [live, v, v, v, v, v, v])
        return sum(jnp.sum(o).astype(jnp.float64) for o in out[:2])

    per, times = m.timed(fn, (key, live, v), inner=8)
    _record("q1_stage_sort_cap4k", ms=round(per * 1e3, 2),
            times=[round(x, 3) for x in times])


def job_sortedspace(m):
    """Candidate A: one variadic lax.sort carrying all payloads, then
    flagged-scan aggregation + searchsorted compaction to G slots."""
    import jax.numpy as jnp

    ship, flag, qty, price_f, price_b = _q1_data()
    G = 4096

    def fn(i, ship, flag, qty, price_f):
        live = (ship + (i - i)) <= 2500
        key = jnp.where(live, flag.astype(jnp.uint32),
                        jnp.uint32(0xFFFFFFFF))
        ks, q_s, p_s, lv = jax.lax.sort(
            (key, qty, price_f, live.astype(jnp.int8)),
            num_keys=1, is_stable=False)
        first = jnp.concatenate([jnp.ones(1, jnp.bool_), ks[1:] != ks[:-1]])
        gid_sorted = (jnp.cumsum(first) - 1).astype(jnp.int32)
        cq = jnp.cumsum(jnp.where(lv > 0, q_s, 0))
        cp = jnp.cumsum(jnp.where(lv > 0, p_s, 0.0))
        cc = jnp.cumsum((lv > 0).astype(jnp.int64))
        # per-slot end position: binary search over monotone gid_sorted
        slots = jnp.arange(G, dtype=jnp.int32)
        endpos = jnp.searchsorted(gid_sorted, slots, side="right") - 1
        ok = endpos >= jnp.searchsorted(gid_sorted, slots, side="left")
        sq = jnp.where(ok, cq[jnp.maximum(endpos, 0)], 0)
        sp = jnp.where(ok, cp[jnp.maximum(endpos, 0)], 0.0)
        sc = jnp.where(ok, cc[jnp.maximum(endpos, 0)], 0)
        # subtract prefix before segment start
        startpos = jnp.searchsorted(gid_sorted, slots, side="left")
        prev = startpos - 1
        sq = sq - jnp.where(ok & (prev >= 0), cq[jnp.maximum(prev, 0)], 0)
        sp = sp - jnp.where(ok & (prev >= 0), cp[jnp.maximum(prev, 0)], 0.0)
        sc = sc - jnp.where(ok & (prev >= 0), cc[jnp.maximum(prev, 0)], 0)
        return (jnp.sum(sq).astype(jnp.float64) + jnp.sum(sp) +
                jnp.sum(sc).astype(jnp.float64))

    per, times = m.timed(fn, (ship, flag, qty, price_f), inner=2)
    _record("q1_cand_sortedspace", ms=round(per * 1e3, 2),
            mrows_s=round(N / per / 1e6, 1),
            times=[round(x, 3) for x in times])


def job_direct_mxu(m):
    """Candidate B: speculative dense-range gid (key - min) + MXU
    segment sums; f64 summed via on-device fixed-point planes."""
    import jax.numpy as jnp

    from arrow1_tpu.kernels.segsum2 import ColPlanes, segment_sums_mxu

    ship, flag, qty, price_f, price_b = _q1_data()
    G = 128

    def fn(i, ship, flag, qty, price_f):
        live = (ship + (i - i)) <= 2500
        kd = flag
        kmin = jnp.min(jnp.where(live, kd, jnp.int64(2**62)))
        gid = jnp.where(live, (kd - kmin).astype(jnp.int32), jnp.int32(G))
        gid = jnp.where(gid < G, gid, G)  # overflow rows -> dead slot
        # qty: bias by on-device min, static 8 planes (2 words)
        vmin = jnp.min(jnp.where(live, qty, jnp.int64(2**62)))
        vu = (qty - vmin).astype(jnp.uint64)
        qlo = jax.lax.bitcast_convert_type(
            (vu & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32), jnp.int32)
        qhi = jax.lax.bitcast_convert_type(
            (vu >> jnp.uint64(32)).astype(jnp.uint32), jnp.int32)
        # price f64 -> fixed point: scale so (x - min) spans < 2^39
        pmin = jnp.min(jnp.where(live, price_f, jnp.inf))
        pmax = jnp.max(jnp.where(live, price_f, -jnp.inf))
        spread = jnp.maximum(pmax - pmin, 1e-300)
        scale = jnp.exp2(39.0 - jnp.ceil(jnp.log2(spread)))
        q = jnp.round((price_f - pmin) * scale)
        qu = jnp.clip(q, 0.0, 2.0**40).astype(jnp.uint64)
        plo = jax.lax.bitcast_convert_type(
            (qu & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32), jnp.int32)
        phi = jax.lax.bitcast_convert_type(
            (qu >> jnp.uint64(32)).astype(jnp.uint32), jnp.int32)
        occ, res = segment_sums_mxu(
            gid,
            [ColPlanes((qlo, qhi), None, 8),
             ColPlanes((plo, phi), None, 8)], G)
        (cq, sq), (cp, sp) = res
        sumq = jax.lax.bitcast_convert_type(
            sq + cq.astype(jnp.uint64) *
            jax.lax.bitcast_convert_type(vmin, jnp.uint64), jnp.int64)
        sump = (sp.astype(jnp.float64) / scale +
                cp.astype(jnp.float64) * pmin)
        return (jnp.sum(occ).astype(jnp.float64) + jnp.sum(sumq) +
                jnp.sum(sump))

    per, times = m.timed(fn, (ship, flag, qty, price_f), inner=2)
    _record("q1_cand_direct_mxu", ms=round(per * 1e3, 2),
            mrows_s=round(N / per / 1e6, 1),
            times=[round(x, 3) for x in times])


def main():
    jobs = sys.argv[1:] or ["filter", "grouping", "grouped_n",
                            "grouped_cap", "sortfull", "sorttiny",
                            "sortedspace", "direct_mxu"]
    m = M()
    for j in jobs:
        fn = globals().get("job_" + j)
        if fn is None:
            print("unknown job", j)
            continue
        print("=== job", j, time.strftime("%H:%M:%S"), flush=True)
        try:
            fn(m)
        except Exception as e:
            _record("q1_job_" + j + "_error", error=repr(e)[:500])


if __name__ == "__main__":
    main()
