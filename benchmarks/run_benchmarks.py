"""Operator benchmark harness.

Replicates the *shape* of the reference's benchmark infrastructure
(SURVEY.md §6): Google-Benchmark-style grids (size x selectivity x
null-proportion, cf. vector_selection_benchmark.cc:157-263 and
util/benchmark_util.h RegressionArgs) emitting rows/sec + bytes/sec per
case, as JSON consumable by compare.py (the `archery benchmark diff`
analogue, dev/archery/archery/benchmark/).

Usage:
  python benchmarks/run_benchmarks.py [--rows N] [--out results.json]
        [--ops filter,take,sort,groupby,join,unique,aggregate]

Timing methodology: the axon TPU tunnel adds ~28.5 ms fixed dispatch
latency per call, so each case runs K iterations inside one
jax.lax.fori_loop dispatch and reports (wall - overhead) / K.
"""

from __future__ import annotations

import argparse
import json
import os
import platform
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K_INNER = 10
_overhead_cache = [None]


def dispatch_overhead_s() -> float:
    """Measured per-dispatch round-trip (the axon TPU tunnel adds ~28.5 ms;
    local CPU is ~0.1 ms). Subtracted from loop timings."""
    if _overhead_cache[0] is None:
        import jax
        import jax.numpy as jnp

        f = jax.jit(lambda x: x + 1)
        x = jnp.zeros(8)
        float(jax.device_get(f(x)[0]))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(jax.device_get(f(x)[0]))
            ts.append(time.perf_counter() - t0)
        _overhead_cache[0] = min(ts)
    return _overhead_cache[0]


def _timed_loop(fn, args, k=K_INNER, reps=3):
    """Loop-amortized timing of `fn(i, *args) -> scalar checksum`."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def loop(*args):
        return jax.lax.fori_loop(
            0, k, lambda i, acc: acc + fn(i, *args).astype(jnp.float64), 0.0)

    float(jax.device_get(loop(*args)))  # compile+warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(jax.device_get(loop(*args)))
        ts.append(time.perf_counter() - t0)
    per = (min(ts) - dispatch_overhead_s()) / k
    return max(per, 1e-9)


def bench_filter(n, results):
    import jax
    import jax.numpy as jnp

    from arrow1_tpu.kernels.compaction import compact_u64_xla
    from arrow1_tpu.kernels.compaction_v3 import TILE, compact_v3

    n = n // TILE * TILE
    use_pallas = jax.default_backend() == "tpu"
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.integers(-(1 << 30), 1 << 30, n).astype(np.int64))
    f = jnp.asarray(rng.standard_normal(n))
    for sel in (0.01, 0.5, 0.99):
        thresh = float(np.quantile(np.asarray(f), 1 - sel))

        def fn(i, v, f, thresh=thresh):
            mask = f > (thresh + i.astype(jnp.float64) * 1e-12)
            if use_pallas:
                (cv,), c = compact_v3(mask, (v,))
            else:
                (cv,), c = compact_u64_xla(mask, (v,))
            # consume the full output so XLA cannot dead-code the gather
            return c.astype(jnp.float64) + jnp.sum(cv).astype(jnp.float64)

        per = _timed_loop(fn, (v, f))
        results.append({
            "benchmark": f"FilterInt64/sel={sel}", "rows_per_sec": n / per,
            "bytes_per_sec": n * (16 + 8 * sel) / per, "rows": n})


def bench_take(n, results):
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    v = jnp.asarray(rng.integers(0, 1 << 40, n).astype(np.int64))
    idx = jnp.asarray(rng.integers(0, n, n).astype(np.int32))

    def fn(i, v, idx):
        # perturb indices per iteration: a loop-invariant gather gets
        # hoisted out of the fori_loop and the bench measures nothing
        idx2 = (idx + i) % v.shape[0]
        return jnp.sum(v[idx2]).astype(jnp.float64)

    per = _timed_loop(fn, (v, idx))
    results.append({"benchmark": "TakeInt64/random", "rows_per_sec": n / per,
                    "bytes_per_sec": n * 20 / per, "rows": n})


def bench_sort(n, results):
    import jax.numpy as jnp

    rng = np.random.default_rng(2)
    narrow = jnp.asarray(rng.integers(0, 100, n).astype(np.int64))
    wide = jnp.asarray(rng.integers(0, 1 << 60, n).astype(np.int64))
    for name, arr in [("narrow", narrow), ("wide", wide)]:
        def fn(i, x):
            return jnp.sum(jnp.argsort(x + i)[::1024]).astype(jnp.float64)

        per = _timed_loop(fn, (arr,), k=3)
        results.append({"benchmark": f"ArraySortIndicesInt64/{name}",
                        "rows_per_sec": n / per,
                        "bytes_per_sec": n * 16 / per, "rows": n})


def bench_groupby(n, results):
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    for ngroups in (1_000, 1_000_000):
        gid = jnp.asarray(rng.integers(0, ngroups, n).astype(np.int32))
        v = jnp.asarray(rng.integers(-100, 100, n).astype(np.int64))

        def fn(i, gid, v, ngroups=ngroups):
            g2 = (gid + i) % ngroups
            s = jnp.zeros(ngroups, jnp.int64).at[g2].add(v)
            c = jnp.zeros(ngroups, jnp.int64).at[g2].add(1)
            return (jnp.sum(s) + jnp.sum(c)).astype(jnp.float64)

        per = _timed_loop(fn, (gid, v), k=5)
        results.append({"benchmark": f"GroupBySum/groups={ngroups}",
                        "rows_per_sec": n / per,
                        "bytes_per_sec": n * 12 / per, "rows": n})


def bench_join(n, results):
    import jax.numpy as jnp

    rng = np.random.default_rng(4)
    nb = max(n // 10, 1)
    probe = jnp.asarray(rng.integers(0, nb, n).astype(np.int64))
    build = jnp.asarray(rng.permutation(nb).astype(np.int64))

    def fn(i, probe, build):
        order = jnp.argsort(build + i)
        sorted_b = build[order]
        lo = jnp.searchsorted(sorted_b, probe)
        return jnp.sum(lo, dtype=jnp.int64).astype(jnp.float64)

    per = _timed_loop(fn, (probe, build), k=5)
    results.append({"benchmark": f"HashJoinProbe/build={nb}",
                    "rows_per_sec": n / per,
                    "bytes_per_sec": n * 16 / per, "rows": n})


def bench_unique(n, results):
    import jax.numpy as jnp

    rng = np.random.default_rng(5)
    v = jnp.asarray(rng.integers(0, 10_000, n).astype(np.int64))

    def fn(i, v):
        s = jnp.sort(v + i)
        distinct = jnp.sum(s[1:] != s[:-1]) + 1
        return distinct.astype(jnp.float64)

    per = _timed_loop(fn, (v,), k=3)
    results.append({"benchmark": "UniqueInt64", "rows_per_sec": n / per,
                    "bytes_per_sec": n * 8 / per, "rows": n})


def bench_aggregate(n, results):
    import jax.numpy as jnp

    rng = np.random.default_rng(6)
    v = jnp.asarray(rng.integers(-100, 100, n).astype(np.int64))
    f = jnp.asarray(rng.standard_normal(n))
    for name, arr in [("SumKernelInt64", v), ("SumKernelDouble", f)]:
        def fn(i, x):
            # sum(x+i) folds to sum(x)+n*i and hoists; mask-rotate instead
            return jnp.sum(jnp.where((jnp.arange(x.shape[0]) % 17)
                                     == (i % 17), 0, x)).astype(jnp.float64)

        per = _timed_loop(fn, (arr,))
        results.append({"benchmark": name, "rows_per_sec": n / per,
                        "bytes_per_sec": n * 8 / per, "rows": n})


BENCHES = {
    "filter": bench_filter, "take": bench_take, "sort": bench_sort,
    "groupby": bench_groupby, "join": bench_join, "unique": bench_unique,
    "aggregate": bench_aggregate,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=10_000_000)
    ap.add_argument("--out", default=None)
    ap.add_argument("--ops", default=",".join(BENCHES))
    ap.add_argument("--cpu", action="store_true",
                    help="pin to CPU backend (skip the TPU tunnel)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import arrow1_tpu  # noqa: F401  (x64)

    results = []
    for op in args.ops.split(","):
        BENCHES[op.strip()](args.rows, results)
        print(f"[{op}] done", file=sys.stderr)

    payload = {
        "context": {
            "backend": jax.default_backend(),
            "device": str(jax.devices()[0]),
            "hostname": platform.node(),
            "timestamp": time.time(),
        },
        "benchmarks": results,
    }
    text = json.dumps(payload, indent=2)
    if args.out:
        with open(args.out, "w") as fh:
            fh.write(text)
    print(text)


if __name__ == "__main__":
    main()
