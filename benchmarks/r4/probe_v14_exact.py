"""v14 exactness on REAL TPU at 10M (the v13 lesson: interpret-mode
green does not certify the TPU lowering), plus raw kernel time, in
both input modes (i64 columns / pre-split word planes) and with
out_limit. Writes benchmarks/r4/results_tpu_r4.json. Resumable.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp  # noqa: E402

import arrow1_tpu  # noqa: E402,F401

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "results_tpu_r4.json")
N = 10_000_000


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


def main():
    try:
        with open(RESULTS) as f:
            done = set(json.load(f))
    except Exception:
        done = set()
    from arrow1_tpu.kernels.compaction_v4 import _to_words
    from arrow1_tpu.kernels.compaction_v14 import compact_v14

    R, BAND = 256, 152
    n = N // (R * 128) * (R * 128)
    rng = np.random.default_rng(0)
    keyh = rng.integers(-(1 << 62), 1 << 62, n).astype(np.int64)
    vh = rng.integers(0, 1 << 63, n).astype(np.uint64) * 2 + 1
    fbh = rng.standard_normal(n).view(np.int64)
    maskh = rng.random(n) < 0.5
    key, v, fb = jnp.asarray(keyh), jnp.asarray(vh), jnp.asarray(fbh)
    mask = jnp.asarray(maskh)
    LIM = (int(maskh.sum()) + 16384 + 127) // 128 * 128

    tiny = jax.jit(lambda z: z + 1)
    x8 = jnp.zeros(8)
    float(jax.device_get(tiny(x8)[0]))
    ovh = min(_t(lambda: float(jax.device_get(tiny(x8)[0])))
              for _ in range(5))

    def check(tag, outs, count):
        cnt = int(count)
        ok, ov, of = outs
        exact = (cnt == int(maskh.sum())
                 and np.array_equal(np.asarray(ok[:cnt]), keyh[maskh])
                 and np.array_equal(np.asarray(ov[:cnt]), vh[maskh])
                 and np.array_equal(np.asarray(of[:cnt]), fbh[maskh]))
        return cnt, bool(exact)

    if "v14p_exact_10M" not in done:
        t0 = time.perf_counter()
        outs, count = compact_v14(mask, (key, v, fb), rows=R, band=BAND)
        jax.block_until_ready(outs[0])
        compile_s = time.perf_counter() - t0
        cnt, exact = check("cols", outs, count)
        _record("v14p_exact_10M", ok=exact, count=cnt,
                compile_s=round(compile_s, 1))

    arrs, pm = [], []
    for c in (key, v, fb):
        ws, meta = _to_words(c)
        pm.append((len(ws), meta))
        arrs.extend(ws)
    pm = tuple(pm)
    arrs = tuple(jax.device_put(w) for w in arrs)

    if "v14p_exact_10M_planes" not in done:
        t0 = time.perf_counter()
        outs, count = compact_v14(mask, arrs, rows=R, band=BAND,
                                  out_limit=LIM, planes_meta=pm)
        jax.block_until_ready(outs[0])
        compile_s = time.perf_counter() - t0
        cnt, exact = check("planes", outs, count)
        exact = exact and all(o.shape[0] == LIM for o in outs)
        _record("v14p_exact_10M_planes", ok=exact, count=cnt,
                compile_s=round(compile_s, 1))

    if f"v14p_kernel_r{R}b{BAND}" not in done:
        @jax.jit
        def step(m, a, b, c):
            def body(i, acc):
                (o1, o2, o3), ct = compact_v14(m, (a + i, b, c),
                                               rows=R, band=BAND)
                return (acc + o1[0] + o3[0]
                        + o2[0].astype(jnp.int64)
                        + ct.astype(jnp.int64))
            return jax.lax.fori_loop(0, 8, body, jnp.int64(0))

        t0 = time.perf_counter()
        int(jax.device_get(step(mask, key, v, fb)))
        compile_s = time.perf_counter() - t0
        times = [_t(lambda: int(jax.device_get(step(mask, key, v, fb))))
                 for _ in range(4)]
        per = (min(times) - ovh) / 8
        _record(f"v14p_kernel_r{R}b{BAND}", ms=round(per * 1e3, 3),
                mrows_s=round(n / per / 1e6, 1),
                compile_s=round(compile_s, 1),
                times=[round(t, 3) for t in times])


if __name__ == "__main__":
    main()
