"""join_build compile-cost bisect at 10M rows (config-4 blocker).

The one-jit build graph has never finished a remote compile (r3: killed
at 90 min; r4 attempt: >40 min, zero artifacts). Every piece below is
compiled STANDALONE so the hog is identified by subtraction. Legs run
as separate subprocesses under a deadline; partial results survive.

Usage: python benchmarks/r4/jb_bisect.py [leg ...]
  legs: sort3 scanmax scanminrev cumsumi32 runsall scatter fullbuild
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "results_tpu_r4.json")
M = 10_000_000


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


def run_leg(leg):
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp

    import arrow1_tpu  # noqa: F401
    from arrow1_tpu.kernels.blockscan import cumsum_blocked, scan_blocked
    from arrow1_tpu.kernels.hashtable import (_bucket_of, join_build,
                                              table_bits_for)

    rng = np.random.default_rng(1)
    keys = jnp.asarray(rng.integers(0, M, M).astype(np.uint64))
    bits = table_bits_for(M)
    nb = 1 << bits

    def timeit(fn, *args):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        run_s = time.perf_counter() - t0
        del out
        return compile_s, run_s

    if leg == "sort3":
        @jax.jit
        def f(k):
            b = _bucket_of(k, bits)
            bs, ks, order = jax.lax.sort(
                (b, k, jnp.arange(M)), num_keys=2, is_stable=False)
            return bs[0] + ks[0] + order[0]
    elif leg == "scanmax":
        @jax.jit
        def f(k):
            pos = jnp.arange(M)
            first = jnp.concatenate(
                [jnp.ones(1, jnp.bool_), k[1:] != k[:-1]])
            return scan_blocked(
                jnp.maximum, jnp.where(first, pos, 0))[-1]
    elif leg == "scanminrev":
        @jax.jit
        def f(k):
            pos = jnp.arange(M)
            first = jnp.concatenate(
                [jnp.ones(1, jnp.bool_), k[1:] != k[:-1]])
            nxt = jnp.where(first, pos, M)
            return scan_blocked(jnp.minimum, nxt, reverse=True)[0]
    elif leg == "cumsumi32":
        @jax.jit
        def f(k):
            first = jnp.concatenate(
                [jnp.ones(1, jnp.bool_), k[1:] != k[:-1]])
            return cumsum_blocked(first.astype(jnp.int32))[-1]
    elif leg == "runsall":
        # everything between the sort and the scatter
        @jax.jit
        def f(ks, bs):
            m = M
            pos = jnp.arange(m)
            first = jnp.concatenate(
                [jnp.ones(1, jnp.bool_),
                 (ks[1:] != ks[:-1]) | (bs[1:] != bs[:-1])])
            bfirst = jnp.concatenate(
                [jnp.ones(1, jnp.bool_), bs[1:] != bs[:-1]])
            run_start = scan_blocked(jnp.maximum, jnp.where(first, pos, 0))
            nxt = jnp.where(first, pos, m)
            suf = scan_blocked(jnp.minimum, nxt, reverse=True)
            run_end = jnp.concatenate([suf[1:], jnp.full(1, m, suf.dtype)])
            cnt = (run_end - run_start).astype(jnp.int64)
            kcum = cumsum_blocked(first.astype(jnp.int32))
            brun0 = scan_blocked(jnp.maximum, jnp.where(bfirst, kcum, 0))
            way = kcum - brun0
            return run_start[-1] + cnt[0] + way[-1]
    elif leg == "scatter":
        @jax.jit
        def f(ks):
            slot = (ks % jnp.uint64(nb * 8)).astype(jnp.int64)
            pay = ks + jnp.uint64(1)
            tkp = jnp.zeros((nb * 8 + 1, 2), jnp.uint64).at[slot].set(
                jnp.stack([ks, pay], axis=1), mode="drop")
            return tkp[0, 0] + tkp[-1, 1]
    elif leg == "fullbuild":
        @jax.jit
        def f(k):
            order, tbl = join_build(k, bits=bits)
            return order[0] + tbl.keys[0, 0] + tbl.overflow

    if leg == "runsall":
        b = _bucket_of(keys, bits)
        bs, ks, _ = jax.lax.sort((b, keys, jnp.arange(M)), num_keys=2)
        jax.block_until_ready((bs, ks))
        compile_s, run_s = timeit(f, ks, bs)
    else:
        compile_s, run_s = timeit(f, keys)
    _record(f"jb_{leg}_10M", compile_s=round(compile_s, 1),
            run_s=round(run_s, 3))


def main():
    legs = sys.argv[1:] or ["sort3", "scanmax", "scanminrev", "cumsumi32",
                            "runsall", "scatter", "fullbuild"]
    if os.environ.get("A1T_JB_CHILD"):
        run_leg(legs[0])
        return
    for leg in legs:
        deadline = int(os.environ.get("A1T_JB_DEADLINE", 900))
        env = dict(os.environ, A1T_JB_CHILD="1")
        t0 = time.time()
        try:
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), leg],
                env=env, timeout=deadline)
            rc = p.returncode
        except subprocess.TimeoutExpired:
            rc = "timeout"
        if rc != 0:
            _record(f"jb_{leg}_10M", compile_s=None, error=str(rc),
                    wall_s=round(time.time() - t0, 1))


if __name__ == "__main__":
    main()
