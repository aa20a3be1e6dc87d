"""TPU remote-compile cost bisect (resumable, records to results json).

Context: with the axon tunnel, .lower().compile() goes through the
remote TPU compile service; measured costs there are what wedge the
measurement queue (groupby3 G=100K never finished a compile in 40 min).
True-CPU compiles of the same graphs are <1s, so this is a TPU-compile
property, not an XLA-frontend one. Jobs time individual candidate
graphs at the groupby3 shape to locate the expensive op.
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


def main():
    import jax.numpy as jnp

    N = 1_000_000
    G = 100_000
    rng = np.random.default_rng(0)
    k = jnp.asarray(rng.integers(0, 1 << 40, N).astype(np.uint64))
    v = jnp.asarray(rng.standard_normal(N))
    u8 = jnp.asarray(rng.integers(0, 2, N).astype(np.uint8))
    iota32 = jnp.arange(N, dtype=jnp.int32)
    idxG = jnp.asarray((np.arange(G, dtype=np.int32) * 7) % N)

    done = set(_load())

    def t(tag, f, *args):
        name = f"ctime_{tag}"
        if name in done:
            return
        t0 = time.perf_counter()
        try:
            jax.jit(f).lower(*args).compile()
            _record(name, compile_s=round(time.perf_counter() - t0, 1))
        except Exception as e:
            _record(name, error=repr(e)[:200])

    # ladder at the groupby3 shape
    t("cumsum_f64_1M", lambda v: jnp.cumsum(v)[-1], v)
    t("cumsum_i64_1M", lambda v: jnp.cumsum(v)[-1],
      jnp.asarray(rng.integers(0, 100, N).astype(np.int64)))
    t("sort1_1M", lambda k: jax.lax.sort((k,), num_keys=1)[0][0], k)
    t("sort2_1M", lambda k, v: jax.lax.sort(
        (k, v), num_keys=1)[1][0], k, v)
    t("sort2_stable_u8_1M", lambda u8, i: jax.lax.sort(
        (u8, i), num_keys=1, is_stable=True)[1][0], u8, iota32)
    t("gatherG_1M", lambda v, ix: v[ix].sum(), v, idxG)
    t("sort2_cumsum_gathers", lambda k, v, ix: jnp.cumsum(
        jax.lax.sort((k, v), num_keys=1)[1])[ix].sum(), k, v, idxG)
    t("assoc_scan_max_1M", lambda x: jax.lax.associative_scan(
        jnp.maximum, x)[-1],
      jnp.asarray(rng.integers(0, N, N).astype(np.int64)))
    t("searchsortedG_1M", lambda x, q: jnp.searchsorted(
        x, q, side="right").sum(),
      jnp.sort(jnp.asarray(rng.integers(0, N, N).astype(np.int32))),
      jnp.asarray(rng.integers(0, N, G).astype(np.int32)))

    # n-scaling of the sort compile (the join100m build fn wedges at
    # 10M): same graph at 2M and 10M
    # 10M scan probes removed: answered (superlinear; scan_max_10M
    # never finished inside the 3000s job). Blocked scans are the fix.
    for NN in (2_000_000,):
        kk = jnp.asarray(rng.integers(0, 1 << 40, NN).astype(np.uint64))
        vv = jnp.asarray(rng.standard_normal(NN))
        t(f"sort2_{NN//1_000_000}M", lambda k, v: jax.lax.sort(
            (k, v), num_keys=1)[1][0], kk, vv)
        t(f"sort2_stable_{NN//1_000_000}M", lambda k, v: jax.lax.sort(
            (k, v), num_keys=1, is_stable=True)[1][0], kk, vv)
        t(f"scan_max_{NN//1_000_000}M", lambda x: jax.lax.associative_scan(
            jnp.maximum, x)[-1],
          jnp.asarray(rng.integers(0, NN, NN).astype(np.int64)))
        t(f"cumsum_{NN//1_000_000}M", lambda v: jnp.cumsum(v)[-1], vv)
    # blocked forms at 10M: these must compile in seconds for the
    # blockscan sweep to hold at config scales
    from arrow1_tpu.kernels.blockscan import cumsum_blocked, scan_blocked
    NN = 10_000_000
    vv10 = jnp.asarray(rng.standard_normal(NN))
    t("cumsum_blocked_10M", lambda v: cumsum_blocked(v)[-1], vv10)
    t("scanmax_blocked_10M", lambda x: scan_blocked(jnp.maximum, x)[-1],
      jnp.asarray(rng.integers(0, NN, NN).astype(np.int64)))
    # the join build scatter shape: [n,2] rows into [nb*ways, 2]
    NN = 10_000_000
    nb = 1 << 21
    slot = jnp.asarray(rng.integers(0, nb * 8, NN).astype(np.int32))
    rows = jnp.asarray(rng.integers(0, 1 << 40, (NN, 2)).astype(np.uint64))
    t("row_scatter_10M", lambda s_, r_: jnp.zeros(
        (nb * 8, 2), jnp.uint64).at[s_].set(r_, mode="drop")[0, 0]
        .astype(jnp.float64), slot, rows)


if __name__ == "__main__":
    main()
